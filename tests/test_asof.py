"""as-of join semantics: hand-checked cases + DuckDB native ASOF JOIN cross
validation on random data."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 20), ("b", 7)],
        "key string, lt long",
    )
    right = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 10, 100.0), ("a", 15, 150.0), ("c", 1, 1.0)],
        "key string, rt long, v double",
    )
    return left, right


def test_backward_basic(spark, frames):
    left, right = frames
    out = (
        asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            value_cols=["v"],
        )
        .toPandas()
        .set_index(["key", "lt"])
    )
    assert out.loc[("a", 5), "v_asof"] == 30.0
    assert out.loc[("a", 10), "v_asof"] == 100.0  # equal timestamps match
    assert out.loc[("a", 20), "v_asof"] == 150.0
    assert pd.isna(out.loc[("b", 7), "v_asof"])  # key without right rows


def test_backward_tolerance(spark, frames):
    left, right = frames
    out = (
        asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            value_cols=["v"], tolerance=3,
        )
        .toPandas()
        .set_index(["key", "lt"])
    )
    assert out.loc[("a", 5), "v_asof"] == 30.0  # gap 2 ≤ 3
    assert out.loc[("a", 10), "v_asof"] == 100.0  # gap 0
    assert pd.isna(out.loc[("a", 20), "v_asof"])  # gap 5 > 3


def test_forward(spark, frames):
    left, right = frames
    out = (
        asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            value_cols=["v"], direction="forward",
        )
        .toPandas()
        .set_index(["key", "lt"])
    )
    assert out.loc[("a", 5), "v_asof"] == 100.0  # next at rt=10
    assert out.loc[("a", 10), "v_asof"] == 100.0  # inclusive
    assert pd.isna(out.loc[("a", 20), "v_asof"])  # nothing after


def test_multi_value_cols_with_nulls_stay_row_atomic(spark):
    """A NULL in one value column must NOT be forward-filled from an older
    right row — all matched columns come from the single as-of row."""
    left = spark.createDataFrame(
        [("a", 10), ("a", 20)], "key string, lt long"
    )
    right = spark.createDataFrame(
        [("a", 5, 1.0, 100.0), ("a", 15, None, 200.0)],
        "key string, rt long, u double, v double",
    )
    out = (
        asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            value_cols=["u", "v"],
        )
        .toPandas()
        .set_index(["key", "lt"])
    )
    # lt=10 matches rt=5 entirely
    assert out.loc[("a", 10), "u_asof"] == 1.0
    assert out.loc[("a", 10), "v_asof"] == 100.0
    # lt=20 matches rt=15: u is NULL there and must STAY NULL (not 1.0)
    assert pd.isna(out.loc[("a", 20), "u_asof"])
    assert out.loc[("a", 20), "v_asof"] == 200.0


def test_tolerance_gate_uses_matched_row_time(spark):
    """With a NULL value in the newest in-tolerance right row, the gap is
    still measured against THAT row, and the value stays NULL rather than
    resurrecting an out-of-tolerance older value."""
    left = spark.createDataFrame([("a", 20)], "key string, lt long")
    right = spark.createDataFrame(
        [("a", 5, 50.0), ("a", 19, None)], "key string, rt long, v double"
    )
    out = (
        asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            value_cols=["v"], tolerance=3,
        )
        .toPandas()
    )
    assert pd.isna(out.v_asof.iloc[0])


def test_matches_duckdb_asof(spark):
    rng = np.random.RandomState(17)
    lpdf = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], 300),
            "lt": rng.randint(0, 1000, 300).astype("int64"),
        }
    ).drop_duplicates(["key", "lt"])
    rpdf = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], 200),
            "rt": rng.randint(0, 1000, 200).astype("int64"),
        }
    ).drop_duplicates(["key", "rt"])
    rpdf["v"] = rng.randint(0, 10000, len(rpdf)).astype("int64")
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on=["key"], left_time="lt", right_time="rt", value_cols=["v"],
        )
        .toPandas()
        .sort_values(["key", "lt"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = con.sql(
        "SELECT l.key, l.lt, r.v AS v_asof FROM l "
        "ASOF LEFT JOIN r ON l.key = r.key AND l.lt >= r.rt "
        "ORDER BY l.key, l.lt"
    ).df().reset_index(drop=True)
    assert len(got) == len(want)
    ga, wa = got.v_asof.values, want.v_asof.values
    both_nan = pd.isna(ga) & pd.isna(wa)
    assert (both_nan | (ga == wa)).all()
