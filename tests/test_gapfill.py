"""Gap-fill semantics pinned by hand-computed expectations (FIXTURES.md F7)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.operators.gapfill import (
    fill_backward,
    fill_forward,
    fill_linear,
    regularize,
    regularize_and_fill,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def gappy(spark):
    rows = [
        ("a", ts(0), 1.0),
        ("a", ts(1), None),
        ("a", ts(2), None),
        ("a", ts(3), 4.0),
        ("a", ts(4), None),
        ("b", ts(0), None),
        ("b", ts(1), 10.0),
    ]
    return spark.createDataFrame(rows, "id string, t timestamp, v double")


def _series(pdf, sid):
    return pdf[pdf.id == sid].sort_values("t").v.tolist()


def test_fill_forward(spark, gappy):
    out = fill_forward(gappy, id_cols=["id"], order_col="t", value_col="v").toPandas()
    assert _series(out, "a") == [1.0, 1.0, 1.0, 4.0, 4.0]
    got_b = _series(out, "b")
    assert np.isnan(got_b[0]) and got_b[1] == 10.0  # leading gap stays null


def test_fill_backward(spark, gappy):
    out = fill_backward(gappy, id_cols=["id"], order_col="t", value_col="v").toPandas()
    a = _series(out, "a")
    assert a[:4] == [1.0, 4.0, 4.0, 4.0]
    assert np.isnan(a[4])  # trailing gap stays null
    assert _series(out, "b") == [10.0, 10.0]


def test_fill_linear(spark, gappy):
    out = fill_linear(gappy, id_cols=["id"], order_col="t", value_col="v").toPandas()
    a = _series(out, "a")
    assert a[0] == 1.0
    assert a[1] == pytest.approx(2.0)  # 1 + (4-1) * 1/3
    assert a[2] == pytest.approx(3.0)
    assert a[3] == 4.0
    assert a[4] == 4.0  # trailing → last valid (pandas interpolate semantics)
    b = _series(out, "b")
    assert np.isnan(b[0])  # leading stays null
    assert b[1] == 10.0


def test_regularize_inserts_missing_buckets(spark):
    rows = [
        ("a", ts(0), 1.0),
        ("a", ts(0.5), 2.0),  # same bucket as minute 0 → "last" wins
        ("a", ts(3), 9.0),  # minutes 1, 2 missing
    ]
    df = spark.createDataFrame(rows, "id string, t timestamp, v double")
    out = (
        regularize(df, id_cols=["id"], ts_col="t", value_col="v", step="1 minute")
        .toPandas()
        .sort_values("bucket_ts")
    )
    assert len(out) == 4
    vals = out.v.tolist()
    assert vals[0] == 2.0  # last-by-ts within the bucket
    assert np.isnan(vals[1]) and np.isnan(vals[2])
    assert vals[3] == 9.0


def test_regularize_and_fill_ffill(spark):
    rows = [("a", ts(0), 1.0), ("a", ts(3), 9.0)]
    df = spark.createDataFrame(rows, "id string, t timestamp, v double")
    out = (
        regularize_and_fill(
            df, id_cols=["id"], ts_col="t", value_col="v", step="1 minute",
            method="ffill",
        )
        .toPandas()
        .sort_values("bucket_ts")
    )
    assert out.v.tolist() == [1.0, 1.0, 1.0, 9.0]


def test_regularize_and_fill_linear(spark):
    rows = [("a", ts(0), 1.0), ("a", ts(3), 4.0)]
    df = spark.createDataFrame(rows, "id string, t timestamp, v double")
    out = (
        regularize_and_fill(
            df, id_cols=["id"], ts_col="t", value_col="v", step="1 minute",
            method="linear",
        )
        .toPandas()
        .sort_values("bucket_ts")
    )
    assert out.v.tolist() == pytest.approx([1.0, 2.0, 3.0, 4.0])


def test_fill_plan_single_shuffle(spark, gappy):
    plan = (
        fill_forward(gappy, id_cols=["id"], order_col="t", value_col="v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one hash partitioning on id, reused


def test_fused_fill_equals_composed_pipeline(spark):
    """Round-6: regularize_and_fill generates gap runs directly from
    consecutive observed buckets (lead + sequence-explode).  This A/B pins
    it EXACTLY — bit-equal values, same rows, same dtypes — against the
    composed regularize → fill_forward / fill_linear pipeline it replaced,
    on randomized gappy integer series (the oracle value regime)."""
    rng = np.random.RandomState(42)
    rows = []
    for sid in range(12):
        n_obs = rng.randint(1, 20)
        minutes = np.sort(
            rng.choice(np.arange(0, 240), size=n_obs, replace=False)
        )
        for m in minutes:
            # several observations inside one bucket exercise the
            # last-by-ts bucket aggregation on both paths
            for sub in range(rng.randint(1, 3)):
                rows.append(
                    (
                        f"s{sid}",
                        ts(float(m) + 0.2 * sub),
                        float(rng.randint(-1000, 1000)),
                    )
                )
    df = spark.createDataFrame(rows, "id string, t timestamp, v double")

    for method in ("ffill", "linear"):
        fused = regularize_and_fill(
            df, id_cols=["id"], ts_col="t", value_col="v", step="1 minute",
            method=method,
        )
        grid = regularize(
            df, id_cols=["id"], ts_col="t", value_col="v", step="1 minute"
        )
        fill = fill_forward if method == "ffill" else fill_linear
        composed = fill(
            grid, id_cols=["id"], order_col="bucket_ts", value_col="v"
        )
        a = fused.toPandas().sort_values(["id", "bucket_ts"]).reset_index(drop=True)
        b = composed.toPandas().sort_values(["id", "bucket_ts"]).reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        pd.testing.assert_frame_equal(a, b, check_exact=True)
