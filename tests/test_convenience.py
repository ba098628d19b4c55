"""Reference-shaped convenience API: pandas in → pandas wide matrix out."""

import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.convenience import (
    extract_features,
    extract_relevant_features,
    select_features,
)
from tsfresh_spark.settings import minimal_settings


@pytest.fixture(scope="module")
def long_pdf():
    rng = np.random.RandomState(6)
    rows = []
    for i in range(12):
        for t in range(20):
            rows.append((i, "a", t, float(rng.randint(0, 9))))
            rows.append((i, "b", t, float(rng.randint(0, 9))))
    return pd.DataFrame(rows, columns=["id", "kind", "time", "value"])


def test_extract_features_long_pandas(spark, long_pdf):
    X = extract_features(
        long_pdf,
        column_id="id",
        column_sort="time",
        column_kind="kind",
        column_value="value",
        default_fc_parameters=minimal_settings(),
    )
    assert isinstance(X, pd.DataFrame)
    assert X.shape == (12, 2 * len(minimal_settings()))
    assert list(X.columns) == sorted(X.columns)
    assert "a__mean" in X.columns and "b__maximum" in X.columns
    want = long_pdf[(long_pdf.id == 3) & (long_pdf.kind == "a")].value.mean()
    assert X.loc[3, "a__mean"] == pytest.approx(want)


def test_extract_features_wide_pandas(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "time": [0, 1, 0, 1],
            "F_x": [1.0, 3.0, 5.0, 5.0],
            "F_y": [2.0, 2.0, 0.0, 4.0],
        }
    )
    X = extract_features(
        pdf,
        column_id="id",
        column_sort="time",
        default_fc_parameters={"mean": None, "maximum": None},
    )
    assert X.loc[1, "F_x__mean"] == 2.0
    assert X.loc[2, "F_y__maximum"] == 4.0


def test_extract_features_spark_passthrough(spark, long_pdf):
    sdf = spark.createDataFrame(long_pdf)
    out = extract_features(
        sdf,
        column_id="id",
        column_sort="time",
        column_kind="kind",
        column_value="value",
        default_fc_parameters=minimal_settings(),
        pivot=False,
    )
    assert not isinstance(out, pd.DataFrame)
    assert out.count() == 12 * 2 * len(minimal_settings())


def test_extract_relevant_features_pandas(spark):
    rng = np.random.RandomState(2)
    rows = []
    y = {}
    for i in range(30):
        label = i % 2
        y[i] = label
        base = 50.0 if label else 5.0
        for t in range(25):
            rows.append((i, "a", t, base + rng.randn()))
    pdf = pd.DataFrame(rows, columns=["id", "kind", "time", "value"])
    X = extract_relevant_features(
        pdf,
        pd.Series(y),
        column_id="id",
        column_sort="time",
        column_kind="kind",
        column_value="value",
        default_fc_parameters=minimal_settings(),
    )
    assert isinstance(X, pd.DataFrame)
    assert "a__mean" in X.columns  # separates the classes
    assert len(X) == 30
