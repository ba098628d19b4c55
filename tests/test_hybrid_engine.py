"""Hybrid engine: Catalyst-subset + kernel-remainder must equal the pure
kernel path bit-for-bit on integer tokens, and the covered branch must stay
out of Python entirely."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.extract import extract_features_tokens
from tsfresh_spark.functions.sql_features import hybrid_plan
from tsfresh_spark.settings import (
    comprehensive_settings,
    efficient_settings,
    minimal_settings,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    rng = np.random.RandomState(13)
    rows = []
    for i in range(25):
        n = int(rng.randint(2, 120))
        rows.append(
            (f"d{i}", rng.randint(0, 50257, n).astype(int).tolist(), "web" if i % 2 else "code")
        )
    rows.append(("empty-ish", [5], "web"))
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")


def _collect(df):
    pdf = df.toPandas().sort_values(["doc_id", "variable"]).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize(
    "settings_fn", [minimal_settings, efficient_settings]
)
def test_hybrid_equals_kernels(spark, tokens_df, settings_fn):
    settings = settings_fn()
    a = _collect(extract_features_tokens(tokens_df, settings, engine="kernels"))
    b = _collect(extract_features_tokens(tokens_df, settings, engine="hybrid"))
    assert list(a.variable) == list(b.variable)
    va, vb = a.value.values, b.value.values
    both_nan = pd.isna(va) & pd.isna(vb)
    assert (both_nan | (va == vb)).all(), (
        a[~(both_nan | (va == vb))].head().to_string(),
        b[~(both_nan | (va == vb))].head().to_string(),
    )


def test_hybrid_coverage_extent():
    covered, rest = hybrid_plan("tokens", comprehensive_settings())
    # the whole simple-stat family moves JVM-side
    assert len(covered) >= 40
    covered_names = {s.split("__")[0] for s, _ in covered}
    assert "variance" not in covered_names  # float-order-sensitive stays out
    assert "fft_coefficient" not in {k for k in rest} or True
    assert "fft_coefficient" in rest


def test_hybrid_minimal_is_pure_jvm(spark, tokens_df):
    """With minimal-minus-variance settings the plan must contain no python
    evaluation at all."""
    settings = {
        k: v
        for k, v in minimal_settings().items()
        if k not in ("variance", "standard_deviation")
    }
    df = extract_features_tokens(tokens_df, settings, engine="hybrid")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_hybrid_rejects_unsupported_combos(spark, tokens_df):
    with pytest.raises(ValueError):
        extract_features_tokens(
            tokens_df, {"mean": None}, engine="hybrid", output="map"
        )
    with pytest.raises(ValueError):
        extract_features_tokens(
            tokens_df,
            {"mean": None},
            engine="hybrid",
            kind_to_settings={"web": {"mean": None}},
        )
