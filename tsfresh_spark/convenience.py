"""Drop-in style convenience API mirroring the reference's top-level entry
points (tsfresh.extract_features / select_features /
extract_relevant_features — /root/reference/tsfresh/feature_extraction/
extraction.py:30-190, feature_selection/selection.py:17-181,
convenience/relevant_extraction.py:17-219), so a reference user can switch
with the same call shapes.

Accepts a pandas DataFrame (wide or long, like the reference's to_tsdata
dispatch) or a Spark DataFrame.  pandas in → pandas wide feature matrix out
(computed through Spark); Spark in → Spark DataFrame out (long or pivoted).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession

from tsfresh_spark.extract import (
    extract_features_long,
    melt_wide,
    pivot_features,
)
from tsfresh_spark.operators.impute import impute_long
from tsfresh_spark.settings import comprehensive_settings


def _get_spark() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from tsfresh_spark.session import build_session

    return build_session("tsfresh_spark-convenience")


def extract_features(
    timeseries_container,
    *,
    column_id: str,
    column_sort: str | None = None,
    column_kind: str | None = None,
    column_value: str | None = None,
    default_fc_parameters: dict | None = None,
    kind_to_fc_parameters: dict | None = None,
    impute_function=None,
    pivot: bool = True,
):
    """The reference's flagship signature over Spark execution.

    Wide pandas/Spark input (no column_kind) is melted so every value column
    becomes a kind, exactly like the reference's WideTsFrameAdapter.
    """
    settings = default_fc_parameters or comprehensive_settings()
    is_pandas = isinstance(timeseries_container, pd.DataFrame)
    spark = _get_spark() if is_pandas else timeseries_container.sparkSession
    sdf = (
        spark.createDataFrame(timeseries_container)
        if is_pandas
        else timeseries_container
    )

    if column_kind is None:
        sdf = melt_wide(
            sdf,
            column_id=column_id,
            column_sort=column_sort,
            value_columns=None if column_value is None else [column_value],
        )
        column_kind, column_value = "kind", "value"
    elif column_value is None:
        candidates = [
            c
            for c in sdf.columns
            if c not in (column_id, column_sort, column_kind)
        ]
        if len(candidates) != 1:
            raise ValueError(
                f"could not infer the value column among {candidates}"
            )
        column_value = candidates[0]

    long_feats = extract_features_long(
        sdf,
        settings,
        column_id=column_id,
        column_kind=column_kind,
        column_sort=column_sort,
        column_value=column_value,
        kind_to_settings=kind_to_fc_parameters,
    )
    if impute_function is not None:
        long_feats = impute_function(long_feats)

    if not pivot:
        return long_feats if not is_pandas else long_feats.toPandas()

    wide = pivot_features(long_feats.drop(column_kind), id_cols=column_id)
    if not is_pandas:
        return wide
    out = wide.toPandas().set_index(column_id)
    out.index.name = None
    return out[sorted(out.columns)].sort_index()


def select_features(X, y, *, fdr_level: float = 0.05, ml_task: str = "auto"):
    """FRESH selection with the reference's call shape; X pandas or Spark
    (id column "id" for Spark; pandas uses the index)."""
    from tsfresh_spark.operators.selection import select_features as _select

    if isinstance(X, pd.DataFrame):
        spark = _get_spark()
        sdf = spark.createDataFrame(X.rename_axis("id").reset_index())
        selected, _ = _select(
            sdf, pd.Series(y, index=X.index), id_col="id",
            fdr_level=fdr_level, ml_task=ml_task,
        )
        out = selected.toPandas().set_index("id").sort_index()
        out.index.name = None
        return out
    selected, _ = _select(
        X, y, id_col="id", fdr_level=fdr_level, ml_task=ml_task
    )
    return selected


def extract_relevant_features(
    timeseries_container,
    y,
    *,
    column_id: str,
    column_sort: str | None = None,
    column_kind: str | None = None,
    column_value: str | None = None,
    default_fc_parameters: dict | None = None,
    fdr_level: float = 0.05,
):
    """extract → impute → select, fused like the reference
    (relevant_extraction.py:17-219)."""
    X = extract_features(
        timeseries_container,
        column_id=column_id,
        column_sort=column_sort,
        column_kind=column_kind,
        column_value=column_value,
        default_fc_parameters=default_fc_parameters,
        impute_function=impute_long,
        pivot=True,
    )
    return select_features(X, y, fdr_level=fdr_level)
