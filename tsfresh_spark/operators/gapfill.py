"""Gap handling: regularize a series onto a fixed time grid and fill the
holes — forward-fill or linear interpolation — entirely with window
functions (no UDFs, no per-row Python).

The reference rejects NaN input and only *warns* about non-uniform sampling
(/root/reference/tsfresh/utilities/dataframe_functions.py:532-546,
tsfresh/feature_extraction/data.py:148-167); this engine makes gap repair an
explicit, testable stage before windowed rollup (BASELINE.json north_rule).

Scale notes: every step is one window over (id) ordered by time — a single
hash-partition shuffle per fill, reused by Catalyst across the chained
window expressions.  Grid generation is `sequence()` + `explode` per series
(rows ∝ output size, no driver loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_forward(
    df: DataFrame,
    *,
    id_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Replace nulls with the most recent non-null value within the series.

    Leading nulls (no predecessor) remain null.
    """
    out_col = out_col or value_col
    w = (
        Window.partitionBy(*id_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def fill_backward(
    df: DataFrame,
    *,
    id_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Replace nulls with the next non-null value within the series.

    Expressed as a running last() over the REVERSED ordering: Spark
    evaluates ``[current, unboundedFollowing]`` frames by re-aggregating
    from each row to the partition end — O(n²) per series — while the
    reversed running frame is the O(n) streaming form with identical
    values.
    """
    out_col = out_col or value_col
    w = (
        Window.partitionBy(*id_cols)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def fill_linear(
    df: DataFrame,
    *,
    id_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation between the surrounding non-null neighbours.

    Position is the order column cast to double (timestamps → epoch
    seconds).  Edge semantics follow pandas ``interpolate(method="linear")``:
    leading nulls stay null, trailing nulls take the last valid value.
    """
    out_col = out_col or value_col
    order_type = df.schema[order_col].dataType.simpleString()
    # TIMESTAMP_NTZ cannot cast straight to double; route through TIMESTAMP
    # (session tz — pinned UTC by build_session) so pos = epoch seconds for
    # every timestamp flavor
    pos = (
        F.col(order_col).cast("timestamp").cast("double")
        if order_type.startswith("timestamp")
        else F.col(order_col).cast("double")
    )
    v = F.col(value_col)
    wb = (
        Window.partitionBy(*id_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward neighbours via the reversed running frame — Spark's
    # [current, unboundedFollowing] frame re-aggregates per row (O(n²) per
    # series; measured 81 s vs 4 s on the sf0.1 hourly grid), the reversed
    # running last() is the O(n) streaming form with identical values
    wf = (
        Window.partitionBy(*id_cols)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(wb)
    next_v = F.last(v, ignorenulls=True).over(wf)
    next_t = F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(wf)
    interpolated = prev_v + (next_v - prev_v) * (pos - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), F.lit(None))  # leading gap
        .when(next_v.isNull(), prev_v)  # trailing gap → last valid
        .otherwise(interpolated)
    )
    return df.withColumn(out_col, filled)


def regularize(
    df: DataFrame,
    *,
    id_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    bucket_agg: str = "last",
) -> DataFrame:
    """Snap observations onto a fixed ``step`` grid per series.

    Buckets with observations aggregate to one value (``last`` by arrival
    order, or ``mean``/``min``/``max``/``sum``); empty buckets between the
    series' first and last observation appear with a null value, ready for
    :func:`fill_forward` / :func:`fill_linear`.

    Output: id_cols + ``bucket_ts`` + value_col (nullable).
    """
    bucket = F.window(F.col(ts_col), step)["start"].alias("bucket_ts")
    if bucket_agg == "last":
        agg = F.max_by(F.col(value_col), F.col(ts_col)).alias(value_col)
    elif bucket_agg in ("mean", "avg"):
        agg = F.avg(value_col).alias(value_col)
    elif bucket_agg in ("min", "max", "sum"):
        agg = getattr(F, bucket_agg)(value_col).alias(value_col)
    else:
        raise ValueError(f"unsupported bucket_agg {bucket_agg!r}")
    observed = df.groupBy(*id_cols, bucket).agg(agg)

    bounds = observed.groupBy(*id_cols).agg(
        F.min("bucket_ts").alias("_first"), F.max("bucket_ts").alias("_last")
    )
    grid = bounds.select(
        *id_cols,
        F.explode(
            F.sequence(F.col("_first"), F.col("_last"), F.expr(f"interval {step}"))
        ).alias("bucket_ts"),
    )
    return grid.join(observed, [*id_cols, "bucket_ts"], "left")


def regularize_and_fill(
    df: DataFrame,
    *,
    id_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    method: str = "ffill",
    bucket_agg: str = "last",
) -> DataFrame:
    """regularize → fill in one call; ``method`` ∈ {"ffill", "linear"}.

    Physical form (round-6 optimization): because the grid spans the FIRST
    to LAST **observed** bucket per series, every gap is interior — both
    neighbours of a missing bucket are observed rows.  The fill therefore
    never needs the materialized null grid at all: each observed bucket,
    together with its successor (one ``lead()`` window over the observed
    table), generates its gap run ``[bucket, next_bucket)`` directly via
    ``sequence`` + ``explode``, carrying the forward-filled or interpolated
    value as a plain projection.  Compared with the composed
    ``regularize → fill_*`` pipeline this removes the bounds aggregation,
    the grid↔observed join and the full-grid window sorts (ffill: 4
    Exchanges + 1 grid sort → 2 Exchanges + 1 observed-side sort; linear
    additionally drops the second, descending full-grid sort), and the only
    window runs over the observed rows — a fraction of the output grid.
    Values are identical: the interpolation expression evaluates the exact
    same double arithmetic on the exact same operands as
    :func:`fill_linear` (A/B-asserted in tests/test_gapfill.py).

    The composed operators :func:`regularize`, :func:`fill_forward` and
    :func:`fill_linear` remain available for frames with genuinely exterior
    gaps (e.g. grids widened beyond the observed span), where their edge
    semantics (leading null / trailing carry) matter.
    """
    if method not in ("ffill", "linear"):
        raise ValueError(f"unsupported fill method {method!r}")
    bucket = F.window(F.col(ts_col), step)["start"].alias("bucket_ts")
    if bucket_agg == "last":
        agg = F.max_by(F.col(value_col), F.col(ts_col)).alias(value_col)
    elif bucket_agg in ("mean", "avg"):
        agg = F.avg(value_col).alias(value_col)
    elif bucket_agg in ("min", "max", "sum"):
        agg = getattr(F, bucket_agg)(value_col).alias(value_col)
    else:
        raise ValueError(f"unsupported bucket_agg {bucket_agg!r}")
    observed = df.groupBy(*id_cols, bucket).agg(agg)

    w = Window.partitionBy(*id_cols).orderBy("bucket_ts")
    nxt_ts = F.lead("bucket_ts").over(w)
    nxt_v = F.lead(value_col).over(w)
    run = observed.select(
        *id_cols,
        F.col("bucket_ts").alias("_t0"),
        F.col(value_col).alias("_v0"),
        nxt_ts.alias("_t1"),
        nxt_v.alias("_v1"),
    ).select(
        *id_cols,
        "_t0",
        "_v0",
        "_t1",
        "_v1",
        F.explode(
            F.sequence(
                F.col("_t0"),
                # up to (but excluding) the next observed bucket; the last
                # observed row contributes exactly itself
                F.coalesce(
                    F.col("_t1") - F.expr(f"INTERVAL {step}"), F.col("_t0")
                ),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias("bucket_ts"),
    )
    if method == "ffill":
        filled = F.col("_v0")
    else:
        # identical operands/operations to fill_linear's
        #   prev_v + (next_v - prev_v) * (pos - prev_t) / (next_t - prev_t)
        # (epoch-second doubles; observed rows keep their own value)
        pos = F.col("bucket_ts").cast("timestamp").cast("double")
        t0 = F.col("_t0").cast("timestamp").cast("double")
        t1 = F.col("_t1").cast("timestamp").cast("double")
        filled = F.when(F.col("bucket_ts") == F.col("_t0"), F.col("_v0")).otherwise(
            F.col("_v0") + (F.col("_v1") - F.col("_v0")) * (pos - t0) / (t1 - t0)
        )
    return run.select(*id_cols, "bucket_ts", filled.alias(value_col))
