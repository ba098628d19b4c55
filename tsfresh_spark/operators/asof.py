"""As-of join — the time-series join primitive Spark lacks natively.

For every left row, attach the most recent right row with
``right_time <= left_time`` (direction="backward"; "forward" mirrors it),
optionally bounded by a tolerance.

Physical form: the classic union + window trick — tag both sides, union by
key, one window ordered by (time, side) carries the latest right values
forward, then filter back to left rows.  One hash shuffle on the key, no
range-join row explosion, AQE-friendly; equality semantics match DuckDB's
native ``ASOF JOIN`` (inclusive on equal timestamps), which serves as the
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join; right ``value_cols`` arrive as ``<col><suffix>``
    (null when no match / outside tolerance).  ``tolerance`` is in the time
    column's own units."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if "_rt" in value_cols:
        # the struct carries the matched right timestamp under this field
        # name; a value column with the same name would make field
        # extraction ambiguous
        raise ValueError("value column name '_rt' is reserved by asof_join")
    reserved = {"_t", "_side", "_r", "_m"}
    clashes = (set(left.columns) | set(value_cols)) & reserved
    if clashes:
        # these are the internal working columns of the union+window plan;
        # a left/value column with the same name would be silently shadowed
        raise ValueError(
            f"column names {sorted(clashes)} are reserved by asof_join"
        )
    left_cols = [c for c in left.columns]
    # All right payload travels as ONE struct so a single
    # last/first(ignorenulls=True) picks the whole matched row atomically —
    # per-column fills could mix columns from different right rows whenever a
    # value column holds NULL, and the tolerance gate would then use a _rt
    # that doesn't belong to every value.
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
        + [StructField("_rt", right.schema[right_time].dataType)]
    )
    l = left.select(
        *left_cols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_time).alias("_rt"),
        ).alias("_r"),
    ).select(*l.columns)
    u = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left rows at equal time → inclusive match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.asc("_t"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = F.last("_r", ignorenulls=True).over(w)
    else:
        # reversed running frame: Spark evaluates [current, unboundedFollowing]
        # by re-aggregating per row (O(n²) per key); the running last() over
        # the exact reverse ordering is the O(n) form with identical values
        w = (
            Window.partitionBy(*on)
            .orderBy(F.desc("_t"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = F.last("_r", ignorenulls=True).over(w)

    matched = u.select(*u.columns, picked.alias("_m")).filter(
        F.col("_side") == 1
    )

    rt = F.col("_m")["_rt"]
    if tolerance is not None:
        gap = (
            (F.col("_t") - rt)
            if direction == "backward"
            else (rt - F.col("_t"))
        )
        in_tol = rt.isNotNull() & (gap <= F.lit(tolerance))
    else:
        in_tol = rt.isNotNull()

    return matched.select(
        *left_cols,
        *[
            F.when(in_tol, F.col("_m")[c]).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
