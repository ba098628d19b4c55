"""Transformer API surface: augment → select → fused pipeline."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.operators.transformers import (
    FeatureAugmenter,
    FeatureSelector,
    RelevantFeatureAugmenter,
)
from tsfresh_spark.settings import minimal_settings


@pytest.fixture(scope="module")
def ts_and_labels(spark):
    rng = np.random.RandomState(11)
    rows = []
    labels = {}
    for i in range(40):
        label = i % 2
        labels[i] = label
        base = 100.0 if label else 10.0  # mean separates the classes
        for t in range(30):
            rows.append((i, "a", t, float(base + rng.randn())))
    ts = spark.createDataFrame(rows, "id long, kind string, time long, value double")
    y = pd.Series(labels)
    return ts, y


def test_feature_augmenter(spark, ts_and_labels):
    ts, y = ts_and_labels
    X = spark.createDataFrame(pd.DataFrame({"id": list(range(10))}))
    aug = FeatureAugmenter(minimal_settings(), ts)
    out = aug.transform(X).toPandas()
    assert len(out) == 10
    assert "a__mean" in out.columns
    assert out.set_index("id").loc[1, "a__mean"] == pytest.approx(100.0, abs=1.0)
    assert out.set_index("id").loc[0, "a__mean"] == pytest.approx(10.0, abs=1.0)


def test_selector_and_fused(spark, ts_and_labels):
    ts, y = ts_and_labels
    X = spark.createDataFrame(pd.DataFrame({"id": sorted(y.index)}))
    fused = RelevantFeatureAugmenter(minimal_settings(), ts)
    out = fused.fit_transform(X, y).toPandas()
    kept = set(out.columns) - {"id"}
    assert "a__mean" in kept  # mean separates the classes perfectly
    table = fused.selector.relevance_table
    assert table.loc["a__mean", "relevant"]
    # length is constant (30 for everyone) → typed constant, never selected
    assert table.loc["a__length", "type"] == "constant"


def test_selector_raises_before_fit(spark, ts_and_labels):
    with pytest.raises(RuntimeError):
        FeatureSelector().transform(ts_and_labels[0])


def test_per_column_imputer_fit_transform(spark):
    from tsfresh_spark.operators.transformers import PerColumnImputer

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, nan, -inf), (3, 3.0, inf), (4, 5.0, 20.0)],
        "id long, a double, b double",
    )
    imp = PerColumnImputer().fit(df)
    out = imp.transform(df).toPandas().set_index("id")
    assert out.loc[2, "a"] == 3.0  # NaN -> median of finite {1,3,5}
    assert out.loc[2, "b"] == 10.0  # -inf -> min of finite {10,20}
    assert out.loc[3, "b"] == 20.0  # +inf -> max
    # presets override fitted values; unknown preset keys raise
    imp2 = PerColumnImputer(col_to_NAN_repl_preset={"a": -7.0}).fit(df)
    out2 = imp2.transform(df).toPandas().set_index("id")
    assert out2.loc[2, "a"] == -7.0
    with pytest.raises(ValueError):
        PerColumnImputer(col_to_NAN_repl_preset={"zzz": 0.0}).fit(df)
    with pytest.raises(RuntimeError):
        PerColumnImputer().transform(df)
