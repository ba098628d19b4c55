"""Rolling-window generation — the reference's materialized windowing ops
(/root/reference/tsfresh/utilities/dataframe_functions.py:294-784) as window
functions + explode:

* :func:`roll_time_series` — one sub-series per (id, end-point), row-based
  window of up to ``max_timeshift + 1`` observations; new composite id
  ``struct(orig_id, window_end_sort)`` (the reference's tuple id,
  dataframe_functions.py:369);
* :func:`make_forecasting_frame` — (X windows, y next-value) pairs;
* :func:`add_sub_time_series_index` — chop series into fixed-length
  consecutive sub-series, id ``struct(chunk, orig_id)``.

Plan shape: one Window per call (single hash shuffle on the series key),
then ``explode`` — output row count is the sum of window sizes, produced
executor-side with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roll_time_series(
    df: DataFrame,
    *,
    column_id: str,
    column_sort: str,
    column_kind: str | None = None,
    column_value: str = "value",
    max_timeshift: int | None = None,
    min_timeshift: int = 0,
    rolling_direction: int = 1,
) -> DataFrame:
    """Sliding sub-series: for every observation, the window of up to
    ``max_timeshift + 1`` rows ending (direction=1) or starting
    (direction=-1) at it; windows shorter than ``min_timeshift + 1`` are
    dropped.  Output is long-format with ``id = struct(orig, shift)`` where
    ``shift`` is the window's end (resp. start) sort value.
    """
    if rolling_direction not in (1, -1):
        raise ValueError("rolling_direction must be 1 or -1")
    part = [column_id] + ([column_kind] if column_kind else [])
    w = Window.partitionBy(*part).orderBy(column_sort)
    if rolling_direction == 1:
        lo = Window.unboundedPreceding if max_timeshift is None else -max_timeshift
        w = w.rowsBetween(lo, 0)
    else:
        hi = Window.unboundedFollowing if max_timeshift is None else max_timeshift
        w = w.rowsBetween(0, hi)

    windowed = df.withColumn(
        "_window", F.collect_list(F.struct(column_sort, column_value)).over(w)
    ).filter(F.size("_window") >= min_timeshift + 1)

    exploded = windowed.select(
        F.struct(
            F.col(column_id).alias("orig"), F.col(column_sort).alias("shift")
        ).alias("id"),
        *([F.col(column_kind).alias("kind")] if column_kind else []),
        F.explode("_window").alias("_obs"),
    ).select(
        "id",
        *(["kind"] if column_kind else []),
        F.col(f"_obs.{column_sort}").alias(column_sort),
        F.col(f"_obs.{column_value}").alias(column_value),
    )
    return exploded


def make_forecasting_frame(
    df: DataFrame,
    *,
    column_id: str,
    column_sort: str,
    column_value: str = "value",
    max_timeshift: int | None = None,
    min_timeshift: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """X/y pairs for autoregressive forecasting: for each observation t, X is
    the window of (up to max_timeshift) *strictly earlier* values under the
    composite id struct(orig, t), and y is the value at t (the reference's
    roll + next-value recipe, dataframe_functions.py:606-678)."""
    w = Window.partitionBy(column_id).orderBy(column_sort)
    lo = Window.unboundedPreceding if max_timeshift is None else -max_timeshift
    wx = w.rowsBetween(lo, -1)
    base = df.withColumn(
        "_window", F.collect_list(F.struct(column_sort, column_value)).over(wx)
    ).filter(F.size("_window") >= max(min_timeshift, 1))
    # the max(..., 1): at min_timeshift=0 the reference still drops the
    # first observation's pair — its window holds only the predicted row,
    # which the mask removes, leaving nothing to forecast from
    # (dataframe_functions.py:656-670; found by the reference crosscheck)
    window_id = F.struct(
        F.col(column_id).alias("orig"), F.col(column_sort).alias("shift")
    ).alias("id")
    X = base.select(window_id, F.explode("_window").alias("_obs")).select(
        "id",
        F.col(f"_obs.{column_sort}").alias(column_sort),
        F.col(f"_obs.{column_value}").alias(column_value),
    )
    y = base.select(window_id, F.col(column_value).alias("y"))
    return X, y


def add_sub_time_series_index(
    df: DataFrame,
    sub_length: int,
    *,
    column_id: str,
    column_sort: str,
    column_kind: str | None = None,
) -> DataFrame:
    """Chop each series into consecutive chunks of ``sub_length`` rows; new
    id = struct(chunk#, orig id) — the reference's
    add_sub_time_series_index (dataframe_functions.py:683-784)."""
    part = [column_id] + ([column_kind] if column_kind else [])
    w = Window.partitionBy(*part).orderBy(column_sort)
    chunk = F.floor((F.row_number().over(w) - 1) / sub_length).alias("chunk")
    return df.withColumn("_chunk", chunk).select(
        F.struct(F.col("_chunk").alias("chunk"), F.col(column_id).alias("orig")).alias(
            "id"
        ),
        *[c for c in df.columns if c != column_id],
    )
