"""Round-6: q_matrix_profile derives the per-series `_n_features` count
from the settings grid (via `_settings_grid_width`) instead of evaluating
and discarding the 788 non-matrix-profile calculators.  These tests pin the
equivalence that restructure rests on: the long-output row count per series
is a property of the settings grid alone — one row per configured
(calculator, params) for EVERY series, regardless of length, values or NaN
results — so probe width == what the old groupBy().count() measured.
(The DuckDB oracle itself compares the count against the literal 794.0.)

No Spark needed: compute_series_features is the exact per-series loop the
grouped UDF runs.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from tsfresh_spark.extract import compute_series_features
from tsfresh_spark.settings import comprehensive_settings


@pytest.fixture(scope="module")
def full_settings():
    return comprehensive_settings(include_matrix_profile=True)


def _width(settings):
    from __spark_entry__ import _settings_grid_width

    return _settings_grid_width(settings)


def test_probe_width_is_the_794_grid(full_settings):
    assert _width(full_settings) == 794


@pytest.mark.parametrize(
    "series",
    [
        np.array([3.0, 1.0, 2.0]),  # below every model-kernel minimum
        np.arange(5, dtype=float),
        np.full(16, 7.0),  # constant, matrix-profile-eligible length
        np.arange(24, dtype=float)[::-1].copy(),  # the gate's max length
        np.array([1.0, np.nan, 3.0, 4.0, np.nan, 6.0, 7.0, 8.0]),  # NaN rows
    ],
)
def test_row_count_is_settings_invariant(full_settings, series):
    """Every series — short, constant, NaN-bearing — emits exactly one row
    per grid entry: NaN feature values surface as rows, never drop."""
    idx = pd.DatetimeIndex(
        pd.date_range("2020-01-01", periods=len(series), freq="h")
    )
    n = sum(
        1
        for _ in compute_series_features(
            series, "t", full_settings, timestamps=idx
        )
    )
    assert n == _width(full_settings) == 794
