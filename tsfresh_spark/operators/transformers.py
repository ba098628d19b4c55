"""Estimator/transformer API surface — the Spark analog of the reference's
sklearn transformers (/root/reference/tsfresh/transformers/*):

* :class:`FeatureAugmenter` — extract features for exactly the ids present
  in X (broadcast semi-join), pivot, left-join onto X
  (feature_augmenter.py:13-200);
* :class:`FeatureSelector` — fit computes the FRESH relevance table,
  transform projects the relevant columns (feature_selector.py:12-237);
* :class:`RelevantFeatureAugmenter` — fused extract+select without double
  extraction (relevant_feature_augmenter.py:21-376).

X/y contract: X is a Spark DataFrame keyed by ``id_col``; y is a small
pandas Series indexed by id (labels are tiny next to the corpus, so they
live driver-side and broadcast, exactly like the selection plane).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsfresh_spark.extract import extract_features_long, pivot_features
from tsfresh_spark.operators.impute import impute_long
from tsfresh_spark.operators.selection import calculate_relevance_table


class FeatureAugmenter:
    def __init__(
        self,
        settings: dict,
        timeseries: DataFrame,
        *,
        column_id: str = "id",
        column_kind: str = "kind",
        column_sort: str | None = "time",
        column_value: str = "value",
        impute: bool = True,
    ):
        self.settings = settings
        self.timeseries = timeseries
        self.column_id = column_id
        self.column_kind = column_kind
        self.column_sort = column_sort
        self.column_value = column_value
        self.impute = impute

    def fit(self, X: DataFrame | None = None, y=None):
        return self

    def _features_for(self, ids: DataFrame) -> DataFrame:
        restricted = self.timeseries.join(
            F.broadcast(ids), self.column_id, "left_semi"
        )
        long_df = extract_features_long(
            restricted,
            self.settings,
            column_id=self.column_id,
            column_kind=self.column_kind,
            column_sort=self.column_sort,
            column_value=self.column_value,
        )
        if self.impute:
            long_df = impute_long(long_df)
        return pivot_features(
            long_df.drop(self.column_kind), id_cols=self.column_id
        )

    def transform(self, X: DataFrame) -> DataFrame:
        ids = X.select(self.column_id).distinct()
        features = self._features_for(ids)
        return X.join(features, self.column_id, "left")


class FeatureSelector:
    def __init__(
        self,
        *,
        column_id: str = "id",
        fdr_level: float = 0.05,
        hypotheses_independent: bool = False,
        ml_task: str = "auto",
    ):
        self.column_id = column_id
        self.fdr_level = fdr_level
        self.hypotheses_independent = hypotheses_independent
        self.ml_task = ml_task
        self.relevant_features: list[str] | None = None
        self.relevance_table: pd.DataFrame | None = None

    def fit(self, X: DataFrame, y: pd.Series):
        self.relevance_table = calculate_relevance_table(
            X,
            y,
            id_col=self.column_id,
            ml_task=self.ml_task,
            fdr_level=self.fdr_level,
            hypotheses_independent=self.hypotheses_independent,
        )
        self.relevant_features = list(
            self.relevance_table[self.relevance_table.relevant].feature
        )
        return self

    def transform(self, X: DataFrame) -> DataFrame:
        if self.relevant_features is None:
            raise RuntimeError("FeatureSelector.transform called before fit")
        return X.select(self.column_id, *self.relevant_features)

    def fit_transform(self, X: DataFrame, y: pd.Series) -> DataFrame:
        return self.fit(X, y).transform(X)


class RelevantFeatureAugmenter:
    """Extract once, select, join — the fused pipeline
    (relevant_feature_augmenter.py:280-376)."""

    def __init__(self, settings: dict, timeseries: DataFrame, **kwargs):
        selector_keys = {"fdr_level", "hypotheses_independent", "ml_task"}
        selector_kwargs = {k: v for k, v in kwargs.items() if k in selector_keys}
        augmenter_kwargs = {k: v for k, v in kwargs.items() if k not in selector_keys}
        self.augmenter = FeatureAugmenter(settings, timeseries, **augmenter_kwargs)
        self.selector = FeatureSelector(
            column_id=self.augmenter.column_id, **selector_kwargs
        )
        self._features: DataFrame | None = None

    def fit(self, X: DataFrame, y: pd.Series):
        ids = X.select(self.augmenter.column_id).distinct()
        self._features = self.augmenter._features_for(ids).cache()
        self.selector.fit(self._features, y)
        return self

    def transform(self, X: DataFrame) -> DataFrame:
        if self._features is None:
            raise RuntimeError("transform called before fit")
        selected = self.selector.transform(self._features)
        return X.join(selected, self.augmenter.column_id, "left")

    def fit_transform(self, X: DataFrame, y: pd.Series) -> DataFrame:
        return self.fit(X, y).transform(X)


class PerColumnImputer:
    """Two-step column-wise imputer over a wide feature matrix — the Spark
    analog of the reference's sklearn ``PerColumnImputer``
    (transformers/per_column_imputer.py:15-132): ``fit`` computes per-column
    (min, max, median) over finite values, ``transform`` replaces
    −inf→min, +inf→max, NaN→median.  Preset dictionaries override the
    fitted values per column; preset keys must be a subset of the fitted
    columns (ValueError otherwise, like the reference)."""

    def __init__(
        self,
        col_to_NINF_repl_preset: dict | None = None,
        col_to_PINF_repl_preset: dict | None = None,
        col_to_NAN_repl_preset: dict | None = None,
    ):
        self.col_to_NINF_repl_preset = col_to_NINF_repl_preset
        self.col_to_PINF_repl_preset = col_to_PINF_repl_preset
        self.col_to_NAN_repl_preset = col_to_NAN_repl_preset
        self._ranges: dict | None = None

    def fit(self, X: DataFrame, y=None):
        from tsfresh_spark.operators.impute import get_range_values_per_column

        columns = [
            f.name
            for f in X.schema.fields
            if f.dataType.simpleString() in ("double", "float")
        ]
        ranges = get_range_values_per_column(X, columns)
        for preset, idx in (
            (self.col_to_NINF_repl_preset, 0),
            (self.col_to_PINF_repl_preset, 1),
            (self.col_to_NAN_repl_preset, 2),
        ):
            if preset is None:
                continue
            if not set(columns) >= set(preset):
                raise ValueError(
                    "preset dictionary contains keys not present in X"
                )
            for c, val in preset.items():
                r = list(ranges[c])
                r[idx] = val
                ranges[c] = tuple(r)
        self._ranges = ranges
        return self

    def transform(self, X: DataFrame) -> DataFrame:
        from tsfresh_spark.operators.impute import impute_dataframe_range

        if self._ranges is None:
            raise RuntimeError("PerColumnImputer is not fitted")
        return impute_dataframe_range(X, self._ranges)

    def fit_transform(self, X: DataFrame, y=None) -> DataFrame:
        return self.fit(X, y).transform(X)
