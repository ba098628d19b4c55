"""The SQL fast path must agree with the kernel (tier-exact) path — exactly
on integral input, to float tolerance otherwise."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.extract import compute_series_features
from tsfresh_spark.functions.sql_features import (
    agg_feature_exprs,
    array_feature_exprs,
    count_above_expr,
    count_below_expr,
    quantile_expr,
    range_count_expr,
    value_count_expr,
)
from tsfresh_spark.kernels import KERNELS


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.RandomState(21)
    rows = []
    for sid in range(12):
        n = int(rng.randint(3, 60))
        vals = rng.randint(-50, 50, n)
        rows += [(sid, int(t), int(v)) for t, v in enumerate(vals)]
    return spark.createDataFrame(rows, "id long, t int, v long"), rows


AGG_KEYS = [
    "length", "sum_values", "mean", "minimum", "maximum", "absolute_maximum",
    "abs_energy", "root_mean_square", "variance", "standard_deviation",
    "median", "has_duplicate", "ratio_value_number_to_time_series_length",
]


def test_agg_exprs_match_kernels(spark, series_df):
    df, rows = series_df
    exprs = agg_feature_exprs(F.col("v"))
    got = (
        df.groupBy("id")
        .agg(*[exprs[k].alias(k) for k in AGG_KEYS])
        .toPandas()
        .set_index("id")
    )
    pdf = pd.DataFrame(rows, columns=["id", "t", "v"])
    for sid, grp in pdf.groupby("id"):
        x = grp.sort_values("t").v.values.astype(np.int64)
        for k in AGG_KEYS:
            want = float(KERNELS[k].func(x))
            assert got.loc[sid, k] == pytest.approx(want, rel=1e-12), (sid, k)


ARRAY_KEYS = [
    "mean_change", "mean_abs_change", "absolute_sum_of_changes",
    "mean_second_derivative_central", "first_location_of_maximum",
    "last_location_of_maximum", "first_location_of_minimum",
    "last_location_of_minimum", "count_above_mean", "count_below_mean",
]


def test_array_exprs_match_kernels(spark, series_df):
    df, rows = series_df
    toks = df.groupBy("id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("t", "v"))), lambda s: s["v"]).alias("tokens")
    )
    exprs = array_feature_exprs(F.col("tokens"))
    got = toks.select("id", *[exprs[k].alias(k) for k in ARRAY_KEYS]).toPandas().set_index("id")
    pdf = pd.DataFrame(rows, columns=["id", "t", "v"])
    for sid, grp in pdf.groupby("id"):
        x = grp.sort_values("t").v.values.astype(np.int64)
        for k in ARRAY_KEYS:
            want = float(KERNELS[k].func(x))
            g = got.loc[sid, k]
            if np.isnan(want):
                assert pd.isna(g), (sid, k)
            else:
                assert g == pytest.approx(want, rel=1e-12), (sid, k)


def test_scalar_exprs_match_kernels(spark, series_df):
    df, rows = series_df
    got = (
        df.groupBy("id")
        .agg(
            quantile_expr("v", 0.3).alias("q30"),
            count_above_expr("v", 0).alias("ca"),
            count_below_expr("v", 0).alias("cb"),
            value_count_expr("v", 7).alias("vc"),
            range_count_expr("v", -10, 10).alias("rc"),
        )
        .toPandas()
        .set_index("id")
    )
    pdf = pd.DataFrame(rows, columns=["id", "t", "v"])
    for sid, grp in pdf.groupby("id"):
        x = grp.v.values.astype(np.int64)
        assert got.loc[sid, "q30"] == pytest.approx(KERNELS["quantile"].func(x, 0.3), rel=1e-12)
        assert got.loc[sid, "ca"] == pytest.approx(KERNELS["count_above"].func(x, 0))
        assert got.loc[sid, "cb"] == pytest.approx(KERNELS["count_below"].func(x, 0))
        assert got.loc[sid, "vc"] == KERNELS["value_count"].func(x, 7)
        assert got.loc[sid, "rc"] == KERNELS["range_count"].func(x, -10, 10)
