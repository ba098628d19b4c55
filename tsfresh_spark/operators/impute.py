"""Post-extraction imputation — reference semantics
(/root/reference/tsfresh/utilities/dataframe_functions.py:49-213):

per feature column, −inf → min(finite), +inf → max(finite), NaN → median
(finite); a column with no finite value at all imputes to 0.

Two physical forms:

* :func:`impute_long` — over the long (id, variable, value) frame: one
  aggregation per variable → broadcast join back.  The scale path: stats
  side is #features rows (tiny), data side is never pivoted.
* :func:`impute_wide` — over a wide matrix: one single-pass agg builds every
  column's stats, then a broadcast 1-row cross join feeds the CASE
  rewrites.  No per-column jobs, no driver loops.

Both also expose the ``replace all non-finite with zero`` fast variant and
the explicit-range form (impute_dataframe_zero / impute_dataframe_range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _finite(col):
    return col.isNotNull() & ~F.isnan(col) & (F.abs(col) != float("inf"))


def impute_long(
    df: DataFrame, *, value_col: str = "value", variable_col: str = "variable"
) -> DataFrame:
    """Impute the long feature frame in place (value column rewritten)."""
    v = F.col(value_col)
    fin = F.when(_finite(v), v)
    stats = df.groupBy(variable_col).agg(
        F.min(fin).alias("_col_min"),
        F.max(fin).alias("_col_max"),
        F.percentile(fin, F.lit(0.5)).alias("_col_median"),
    )
    joined = df.join(F.broadcast(stats), variable_col, "left")
    replaced = (
        F.when(_finite(v), v)
        .when(v == float("-inf"), F.coalesce(F.col("_col_min"), F.lit(0.0)))
        .when(v == float("inf"), F.coalesce(F.col("_col_max"), F.lit(0.0)))
        .otherwise(F.coalesce(F.col("_col_median"), F.lit(0.0)))
    )
    return joined.withColumn(value_col, replaced).drop(
        "_col_min", "_col_max", "_col_median"
    )


def get_range_values_per_column(df: DataFrame, columns: list[str]) -> dict:
    """{column: (min, max, median)} over finite values, 0s when none —
    the reference's get_range_values_per_column
    (dataframe_functions.py:176-213), one aggregation pass for all columns."""
    aggs = []
    for c in columns:
        v = F.col(c)
        fin = F.when(_finite(v), v)
        aggs += [
            F.min(fin).alias(f"{c}__min"),
            F.max(fin).alias(f"{c}__max"),
            F.percentile(fin, F.lit(0.5)).alias(f"{c}__median"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in columns:
        mn, mx, med = row[f"{c}__min"], row[f"{c}__max"], row[f"{c}__median"]
        out[c] = (
            mn if mn is not None else 0.0,
            mx if mx is not None else 0.0,
            med if med is not None else 0.0,
        )
    return out


def impute_dataframe_range(
    df: DataFrame, col_to_range: dict, columns: list[str] | None = None
) -> DataFrame:
    """Explicit-range impute (dataframe_functions.py:102-173): −inf→min,
    +inf→max, NaN→median from the supplied dict."""
    exprs = {}
    for c in columns or list(col_to_range):
        mn, mx, med = col_to_range[c]
        for val, name in [(mn, "min"), (mx, "max"), (med, "median")]:
            if val is None or (isinstance(val, float) and (val != val or abs(val) == float("inf"))):
                raise ValueError(f"replacement {name} for column {c} is not finite")
        v = F.col(c)
        exprs[c] = (
            F.when(_finite(v), v)
            .when(v == float("-inf"), F.lit(mn))
            .when(v == float("inf"), F.lit(mx))
            .otherwise(F.lit(med))
        )
    return df.withColumns(exprs)


def impute_wide(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Default impute over a wide matrix (dataframe_functions.py:49-77)."""
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("double", "float")
        ]
    ranges = get_range_values_per_column(df, columns)
    return impute_dataframe_range(df, ranges, columns)


def impute_zero(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """All non-finite → 0 (dataframe_functions.py:80-99)."""
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("double", "float")
        ]
    return df.withColumns(
        {c: F.when(_finite(F.col(c)), F.col(c)).otherwise(F.lit(0.0)) for c in columns}
    )
