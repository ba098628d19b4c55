"""Rolling-window op semantics (reference dataframe_functions golden cases)."""

import pandas as pd
import pytest

from tsfresh_spark.operators.rolling import (
    add_sub_time_series_index,
    make_forecasting_frame,
    roll_time_series,
)


@pytest.fixture(scope="module")
def simple(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 1, 2, 2],
            "t": [1, 2, 3, 4, 8, 9],
            "value": [10.0, 20.0, 30.0, 40.0, 80.0, 90.0],
        }
    )
    return spark.createDataFrame(pdf)


def test_roll_forward_windows(spark, simple):
    rolled = roll_time_series(
        simple, column_id="id", column_sort="t", max_timeshift=2, min_timeshift=0
    ).toPandas()
    rolled["orig"] = rolled.id.apply(lambda r: r["orig"])
    rolled["shift"] = rolled.id.apply(lambda r: r["shift"])
    # window ending at t=4 for id=1 holds the last 3 observations (2,3,4)
    w4 = rolled[(rolled.orig == 1) & (rolled["shift"] == 4)].sort_values("t")
    assert w4.t.tolist() == [2, 3, 4]
    assert w4.value.tolist() == [20.0, 30.0, 40.0]
    # first window has just one point
    w1 = rolled[(rolled.orig == 1) & (rolled["shift"] == 1)]
    assert w1.t.tolist() == [1]
    # id=2 windows never mix with id=1
    w9 = rolled[(rolled.orig == 2) & (rolled["shift"] == 9)].sort_values("t")
    assert w9.value.tolist() == [80.0, 90.0]


def test_roll_min_timeshift_drops_short_windows(spark, simple):
    rolled = roll_time_series(
        simple, column_id="id", column_sort="t", max_timeshift=2, min_timeshift=1
    ).toPandas()
    shifts = {(r["orig"], r["shift"]) for r in rolled.id}
    assert (1, 1) not in shifts  # 1-point window dropped
    assert (1, 2) in shifts


def test_roll_backwards(spark, simple):
    rolled = roll_time_series(
        simple,
        column_id="id",
        column_sort="t",
        max_timeshift=1,
        rolling_direction=-1,
    ).toPandas()
    rolled["orig"] = rolled.id.apply(lambda r: r["orig"])
    rolled["shift"] = rolled.id.apply(lambda r: r["shift"])
    w1 = rolled[(rolled.orig == 1) & (rolled["shift"] == 1)].sort_values("t")
    assert w1.t.tolist() == [1, 2]  # window starting at t=1 looks forward


def test_make_forecasting_frame(spark, simple):
    X, y = make_forecasting_frame(
        simple, column_id="id", column_sort="t", max_timeshift=2, min_timeshift=1
    )
    Xp, yp = X.toPandas(), y.toPandas()
    yp["orig"] = yp.id.apply(lambda r: r["orig"])
    yp["shift"] = yp.id.apply(lambda r: r["shift"])
    # target at t=3 is 30, with X window = values at t 1..2
    assert yp[(yp.orig == 1) & (yp["shift"] == 3)].y.iloc[0] == 30.0
    Xp["orig"] = Xp.id.apply(lambda r: r["orig"])
    Xp["shift"] = Xp.id.apply(lambda r: r["shift"])
    w3 = Xp[(Xp.orig == 1) & (Xp["shift"] == 3)].sort_values("t")
    assert w3.value.tolist() == [10.0, 20.0]  # strictly earlier only
    # first point of each id has no window → no y row
    assert (1, 1) not in {(r.orig, r["shift"]) for _, r in yp.iterrows()}


def test_add_sub_time_series_index(spark, simple):
    out = add_sub_time_series_index(
        simple, 2, column_id="id", column_sort="t"
    ).toPandas()
    out["chunk"] = out.id.apply(lambda r: r["chunk"])
    out["orig"] = out.id.apply(lambda r: r["orig"])
    one = out[out.orig == 1].sort_values("t")
    assert one.chunk.tolist() == [0, 0, 1, 1]
    assert out[out.orig == 2].chunk.tolist() == [0, 0]
