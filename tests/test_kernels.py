"""Golden-value tests for the kernel library.

Expected values are behavioral facts of the reference implementation
(blue-yonder/tsfresh), taken from its documented semantics and published unit
expectations (tests/units/feature_extraction/test_feature_calculations.py).
Each case runs on both a python list-as-array and an np.array to pin dtype
independence, like the reference's "on all array types" helpers.
"""

import math

import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.kernels import KERNELS


def k(name):
    return KERNELS[name].func


def both(x):
    """list and ndarray variants of the same input."""
    return [np.asarray(x), np.asarray(x, dtype=float)]


GOLDEN_SIMPLE = [
    # (kernel, input, kwargs, expected)
    ("sum_values", [1, 2, 3, 4.1], {}, 10.1),
    ("sum_values", [-1.2, -2, -3, -4], {}, -10.2),
    ("sum_values", [], {}, 0),
    ("abs_energy", [1, 1, 1], {}, 3),
    ("abs_energy", [1, 2, 3], {}, 14),
    ("abs_energy", [-1, 2, -3], {}, 14),
    ("abs_energy", [-1, 1.3], {}, 2.69),
    ("cid_ce", [1, 1, 1], {"normalize": True}, 0),
    ("cid_ce", [0, 4], {"normalize": True}, 2),
    ("cid_ce", [100, 104], {"normalize": True}, 2),
    ("cid_ce", [1, 1, 1], {"normalize": False}, 0),
    ("cid_ce", [0.5, 3.5, 7.5], {"normalize": False}, 5),
    ("mean_abs_change", [-2, 2, 5], {}, 3.5),
    ("mean_abs_change", [1, 2, -1], {}, 2),
    ("mean_change", [-2, 2, 5], {}, 3.5),
    ("mean_change", [1, 2, -1], {}, -1),
    ("mean_change", [10, 20], {}, 10),
    ("mean_second_derivative_central", [1, 3, 5], {}, 0),
    ("median", [1, 1, 2, 2], {}, 1.5),
    ("median", [0.5, 0.5, 2, 3.5, 10], {}, 2),
    ("mean", [1, 1, 2, 2], {}, 1.5),
    ("mean", [0.5, 0.5, 2, 3.5, 10], {}, 3.3),
    ("length", [1, 2, 3, 4], {}, 4),
    ("length", [1, 2, 3, np.nan], {}, 4),
    ("length", [], {}, 0),
    ("standard_deviation", [1, 1, -1, -1], {}, 1),
    ("variance", [1, 1, -1, -1], {}, 1),
    ("variance", [1, 2, -2, -1], {}, 2.5),
    ("skewness", [1, 1, 1, 2, 2, 2], {}, 0),
    ("skewness", [1, 1, 1, 2, 2], {}, 0.6085806194501855),
    ("skewness", [1, 1, 1], {}, 0),
    ("kurtosis", [1, 1, 1, 2, 2], {}, -3.333333333333333),
    ("kurtosis", [1, 1, 1, 1], {}, 0),
    # pandas default skipna=True: NaNs masked, computed over the 5 valid
    # (pd.Series([1,2,3,4,nan,6]).kurtosis() == -0.021913805697591826)
    ("kurtosis", [1, 2, 3, 4, np.nan, 6], {}, -0.021913805697591826),
    ("root_mean_square", [1, 1, 1, 2, 2], {}, 1.4832396974191),
    ("root_mean_square", [0], {}, 0),
    ("root_mean_square", [1], {}, 1),
    ("root_mean_square", [-1], {}, 1),
    ("mean_n_absolute_max", [-1, -5, 4, 10], {"number_of_maxima": 3}, 6.33333333333),
    ("mean_n_absolute_max", [0, -5, -9], {"number_of_maxima": 2}, 7.0),
    ("mean_n_absolute_max", [0, 0, 0], {"number_of_maxima": 1}, 0),
    ("absolute_sum_of_changes", [1, 1, 1, 1, 2, 1], {}, 2),
    ("absolute_sum_of_changes", [1, -1, 1, -1], {}, 6),
    ("absolute_sum_of_changes", [1], {}, 0),
    ("absolute_sum_of_changes", [], {}, 0),
    ("longest_strike_below_mean", [1, 2, 1, 1, 1, 2, 2, 2], {}, 3),
    ("longest_strike_below_mean", [1, 2, 3, 4, 5, 6], {}, 3),
    ("longest_strike_below_mean", [1, 2, 3, 4, 5], {}, 2),
    ("longest_strike_below_mean", [1, 2, 1], {}, 1),
    ("longest_strike_below_mean", [], {}, 0),
    ("longest_strike_above_mean", [1, 2, 1, 2, 1, 2, 2, 1], {}, 2),
    ("longest_strike_above_mean", [1, 2, 3, 4, 5, 6], {}, 3),
    ("longest_strike_above_mean", [], {}, 0),
    ("count_above_mean", [1, 2, 1, 2, 1, 2], {}, 3),
    ("count_above_mean", [1, 1, 1, 1, 1, 2], {}, 1),
    ("count_above_mean", [1, 1, 1, 1, 1], {}, 0),
    ("count_below_mean", [1, 2, 1, 2, 1, 2], {}, 3),
    ("count_below_mean", [1, 1, 1, 1, 1, 2], {}, 5),
    ("last_location_of_maximum", [1, 2, 1, 2, 1], {}, 0.8),
    ("last_location_of_maximum", [1, 2, 1, 1, 2], {}, 1.0),
    ("last_location_of_maximum", [2, 1, 1, 1, 1], {}, 0.2),
    ("last_location_of_maximum", [1, 1, 1, 1, 1], {}, 1.0),
    ("first_location_of_maximum", [1, 2, 1, 2, 1], {}, 0.2),
    ("first_location_of_maximum", [2, 1, 1, 1, 1], {}, 0.0),
    ("last_location_of_minimum", [1, 2, 1, 2, 1], {}, 1.0),
    ("last_location_of_minimum", [1, 2, 1, 2, 2], {}, 0.6),
    ("last_location_of_minimum", [2, 1, 1, 1, 2], {}, 0.8),
    ("first_location_of_minimum", [1, 2, 1, 2, 1], {}, 0.0),
    ("first_location_of_minimum", [2, 2, 1, 2, 2], {}, 0.4),
    ("first_location_of_minimum", [2, 1, 1, 1, 2], {}, 0.2),
    (
        "percentage_of_reoccurring_datapoints_to_all_datapoints",
        [1, 1, 2, 3, 4],
        {},
        0.4,
    ),
    (
        "percentage_of_reoccurring_datapoints_to_all_datapoints",
        [1, 1.5, 2, 3],
        {},
        0,
    ),
    (
        "percentage_of_reoccurring_datapoints_to_all_datapoints",
        [1.111, -2.45, 1.111, 2.45],
        {},
        0.5,
    ),
    ("percentage_of_reoccurring_values_to_all_values", [1, 1, 2, 3, 4], {}, 0.25),
    ("percentage_of_reoccurring_values_to_all_values", [1, 1.5, 2, 3], {}, 0),
    (
        "percentage_of_reoccurring_values_to_all_values",
        [1.111, -2.45, 1.111, 2.45],
        {},
        1.0 / 3.0,
    ),
    ("sum_of_reoccurring_values", [1, 1, 2, 3, 4, 4], {}, 5),
    ("sum_of_reoccurring_values", [1, 1.5, 2, 3], {}, 0),
    ("sum_of_reoccurring_values", [1.111, -2.45, 1.111, 2.45], {}, 1.111),
    ("sum_of_reoccurring_data_points", [1, 1, 2, 3, 4, 4], {}, 10),
    ("sum_of_reoccurring_data_points", [1.111, -2.45, 1.111, 2.45], {}, 2.222),
    ("ratio_value_number_to_time_series_length", [1, 1, 2, 3, 4], {}, 0.8),
    ("ratio_value_number_to_time_series_length", [1, 1.5, 2, 3], {}, 1),
    ("number_crossing_m", [10, -10, 10, -10], {"m": 0}, 3),
    ("number_crossing_m", [10, -10, 10, -10], {"m": 10}, 0),
    ("number_crossing_m", [10, 20, 20, 30], {"m": 0}, 0),
    ("c3", [1] * 10, {"lag": 1}, 1),
    ("c3", [1] * 10, {"lag": 2}, 1),
    ("c3", [1] * 10, {"lag": 3}, 1),
    ("time_reversal_asymmetry_statistic", [1] * 10, {"lag": 1}, 0),
    ("time_reversal_asymmetry_statistic", [1, 2, -3, 4], {"lag": 1}, -10),
    ("time_reversal_asymmetry_statistic", [1, 2, -3, 4], {"lag": 2}, 0),
    ("time_reversal_asymmetry_statistic", [1, 2, -3, 4], {"lag": 3}, 0),
    ("autocorrelation", [1, 2, 1, 2, 1, 2], {"lag": 1}, -1),
    ("autocorrelation", [1, 2, 1, 2, 1, 2], {"lag": 2}, 1),
    ("autocorrelation", [1, 2, 1, 2, 1, 2], {"lag": 3}, -1),
    ("quantile", [1, 1, 1, 3, 4, 7, 9, 11, 13, 13], {"q": 0.2}, 1.0),
    ("quantile", [1, 1, 1, 3, 4, 7, 9, 11, 13, 13], {"q": 0.9}, 13),
    ("value_count", [1] * 10, {"value": 1}, 10),
    ("value_count", list(range(10)), {"value": 0}, 1),
    ("value_count", [1] * 10, {"value": 0}, 0),
    ("value_count", [np.nan, 0, 1] * 3, {"value": 0}, 3),
    ("range_count", [1] * 10, {"min": 1, "max": 1}, 0),
    ("range_count", [1] * 10, {"min": 0.9, "max": 1}, 0),
    ("range_count", [1] * 10, {"min": 1, "max": 1.1}, 10),
    ("range_count", list(range(10)), {"min": 0, "max": 9}, 9),
    ("lempel_ziv_complexity", [1, 1, 1], {"bins": 2}, 2.0 / 3),
    ("lempel_ziv_complexity", [1, 1, 1], {"bins": 5}, 2.0 / 3),
    # published cases, reference test_feature_calculations.py:432-461
    ("lempel_ziv_complexity", [1, 1, 1, 1, 1, 1, 1], {"bins": 2}, 0.4285714285),
    ("lempel_ziv_complexity", [1, 1, 1, 2, 1, 1, 1], {"bins": 2}, 0.5714285714),
    (
        "lempel_ziv_complexity",
        [-1, 4.3, 5, 1, -4.5, 1, 5, 7, -3.4, 6],
        {"bins": 10},
        0.8,
    ),
    (
        "lempel_ziv_complexity",
        [-1, np.nan, 5, 1, -4.5, 1, 5, 7, -3.4, 6],
        {"bins": 10},
        0.4,
    ),
    ("lempel_ziv_complexity", np.linspace(0, 1, 10).tolist(), {"bins": 3}, 0.6),
    ("lempel_ziv_complexity", [1, 1, 2, 3, 4, 5, 6, 0, 7, 8], {"bins": 3}, 0.6),
    ("fourier_entropy", [1, 2, 1], {"bins": 2}, 0.693147180),
    ("fourier_entropy", [1, 2, 1], {"bins": 5}, 0.693147180),
    # Welch-PSD-dependent published values (test_feature_calculations.py:
    # 463-487) — these pin the welch_psd re-derivation to scipy's output
    ("fourier_entropy", [1, 1, 2, 1, 1, 1, 1], {"bins": 5}, 0.5623351446188083),
    ("fourier_entropy", [1, 1, 1, 1, 2, 1, 1], {"bins": 5}, 1.0397207708399179),
    (
        "fourier_entropy",
        [-1, 4.3, 5, 1, -4.5, 1, 5, 7, -3.4, 6],
        {"bins": 10},
        1.5607104090414063,
    ),
    (
        "permutation_entropy",
        [4, 7, 9, 10, 6, 11, 3],
        {"tau": 1, "dimension": 3},
        1.054920167,
    ),
    # published cases, test_feature_calculations.py:488-531
    (
        "permutation_entropy",
        [1, -1, 1, -1, 1, -1, 1, -1],
        {"tau": 1, "dimension": 3},
        0.6931471805599453,
    ),
    (
        "permutation_entropy",
        [1, -1, 1, -1, 1, 1, 1, -1],
        {"tau": 1, "dimension": 3},
        1.3296613488547582,
    ),
    (
        "permutation_entropy",
        [-1, 4.3, 5, 1, -4.5, 1, 5, 7, -3.4, 6],
        {"tau": 2, "dimension": 3},
        1.0397207708399179,
    ),
    # nan is treated like any other number
    (
        "permutation_entropy",
        [-1, 4.3, 5, 1, -4.5, 1, 5, np.nan, -3.4, 6],
        {"tau": 2, "dimension": 3},
        1.0397207708399179,
    ),
    ("binned_entropy", [10] * 100, {"max_bins": 10}, 0),
    (
        "binned_entropy",
        [10] * 10 + [1],
        {"max_bins": 10},
        -(10 / 11 * math.log(10 / 11) + 1 / 11 * math.log(1 / 11)),
    ),
    ("number_peaks", [0, 1, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1], {"n": 1}, 2),
    ("number_peaks", [0, 1, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1], {"n": 2}, 2),
    ("number_peaks", [0, 1, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1], {"n": 3}, 1),
    ("number_peaks", [0, 1, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1], {"n": 4}, 1),
    ("number_peaks", [0, 1, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1], {"n": 5}, 0),
    ("ratio_beyond_r_sigma", [0, 1] * 10 + [10], {"r": 20}, 0),
    ("count_above", [1, 2, 3], {"t": 2}, 2 / 3),
    ("count_below", [1, 2, 3], {"t": 2}, 2 / 3),
]


@pytest.mark.parametrize("name,x,kwargs,expected", GOLDEN_SIMPLE)
def test_golden_simple(name, x, kwargs, expected):
    for arr in both(x):
        result = k(name)(arr, **kwargs)
        assert result == pytest.approx(expected, abs=1e-6), (name, arr.dtype)


GOLDEN_NAN = [
    ("mean_change", [1], {}),
    ("mean_change", [], {}),
    ("median", [], {}),
    ("mean", [], {}),
    ("standard_deviation", [], {}),
    ("variance", [], {}),
    ("skewness", [1, 1], {}),
    ("kurtosis", [1, 1, 1], {}),
    ("root_mean_square", [], {}),
    ("mean_n_absolute_max", [], {"number_of_maxima": 1}),
    ("mean_n_absolute_max", [12, 3], {"number_of_maxima": 10}),
    ("last_location_of_maximum", [], {}),
    ("first_location_of_maximum", [], {}),
    ("last_location_of_minimum", [], {}),
    ("first_location_of_minimum", [], {}),
    ("percentage_of_reoccurring_datapoints_to_all_datapoints", [], {}),
    ("percentage_of_reoccurring_values_to_all_values", [], {}),
    ("ratio_value_number_to_time_series_length", [], {}),
    ("variation_coefficient", [], {}),
    ("absolute_maximum", [], {}),
    # NaN-bearing series breaks the Welch PSD like the reference
    # (test_feature_calculations.py:484-486)
    ("fourier_entropy", [-1, np.nan, 5, 1, -4.5, 1, 5, 7, -3.4, 6], {"bins": 10}),
]


@pytest.mark.parametrize("name,x,kwargs", GOLDEN_NAN)
def test_golden_nan(name, x, kwargs):
    for arr in both(x):
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                result = k(name)(arr, **kwargs)
        assert np.isnan(float(result)), (name, arr.dtype)


GOLDEN_BOOL = [
    ("has_duplicate_max", [2.1, 0, 0, 2.1, 1.1], {}, True),
    ("has_duplicate_max", [2.1, 0, 0, 1.1], {}, False),
    ("has_duplicate_max", [1, 1, 1, 1], {}, True),
    ("has_duplicate_max", [0], {}, False),
    ("has_duplicate_min", [-2.1, 0, 0, -2.1, 1.1], {}, True),
    ("has_duplicate_min", [2.1, 0, -1, 2, 1.1], {}, False),
    ("has_duplicate", [-2.1, 0, 0, -2.1], {}, True),
    ("has_duplicate", [1.1, 1.2, 1.3, 1.4], {}, False),
    ("has_duplicate", [1], {}, False),
    ("has_duplicate", [], {}, False),
    ("large_standard_deviation", [1, 1, 1, 1], {"r": 0}, False),
    ("large_standard_deviation", [-1, -1, 1, 1], {"r": 0.25}, True),
    ("large_standard_deviation", [-1, -1, 1, 1], {"r": 0.3}, True),
    ("large_standard_deviation", [-1, -1, 1, 1], {"r": 0.5}, False),
    ("variance_larger_than_standard_deviation", [1, 2, 3, 4, 5], {}, True),
    ("variance_larger_than_standard_deviation", [1, 1.1, 0.9, 1], {}, False),
]


@pytest.mark.parametrize("name,x,kwargs,expected", GOLDEN_BOOL)
def test_golden_bool(name, x, kwargs, expected):
    for arr in both(x):
        assert bool(k(name)(arr, **kwargs)) is expected, (name, arr.dtype)


# ------------------------------------------------------------------ combiners


def test_symmetry_looking():
    res = dict(k("symmetry_looking")(np.array([-1, -1, 1, 1]), [{"r": 0.05}, {"r": 0.75}, {"r": 0}]))
    assert bool(res["r_0.05"]) is True
    assert bool(res["r_0.75"]) is True
    assert bool(res["r_0"]) is False


def test_agg_autocorrelation():
    res = dict(
        k("agg_autocorrelation")(np.array([1, 1, 1, 1, 1, 1, 1]), [{"f_agg": "mean", "maxlag": 10}])
    )
    assert res['f_agg_"mean"__maxlag_10'] == pytest.approx(0, abs=1e-4)
    res2 = dict(
        k("agg_autocorrelation")(
            np.arange(10), [{"f_agg": "mean", "maxlag": 1}, {"f_agg": "mean", "maxlag": 10}]
        )
    )
    assert res2['f_agg_"mean"__maxlag_1'] == pytest.approx(0.77777777, abs=1e-4)
    assert res2['f_agg_"mean"__maxlag_10'] == pytest.approx(-0.64983164983165, abs=1e-4)


def test_index_mass_quantile():
    res = dict(k("index_mass_quantile")(np.array([1] * 101), [{"q": 0.5}]))
    assert res["q_0.5"] == pytest.approx(0.5, abs=0.05)
    res = dict(k("index_mass_quantile")(np.array([0] * 1000 + [1]), [{"q": 0.5}, {"q": 0.99}]))
    assert res["q_0.5"] == pytest.approx(1, abs=0.05)
    res = dict(
        k("index_mass_quantile")(np.array([0, 1, 1, 0, 0, 1, 0, 0]), [{"q": 0.3}, {"q": 0.6}, {"q": 0.9}])
    )
    assert res["q_0.3"] == pytest.approx(0.25, abs=0.05)
    assert res["q_0.6"] == pytest.approx(0.375, abs=0.05)
    assert res["q_0.9"] == pytest.approx(0.75, abs=0.05)
    res = dict(k("index_mass_quantile")(np.array([0, 0, 0]), [{"q": 0.5}]))
    assert np.isnan(res["q_0.5"])


def test_fft_coefficient():
    param = [{"coeff": c, "attr": a} for a in ["real", "imag", "angle", "abs"] for c in range(3)]
    res = dict(k("fft_coefficient")(np.arange(10), param))
    assert res['attr_"imag"__coeff_0'] == pytest.approx(0, abs=1e-6)
    assert res['attr_"real"__coeff_0'] == pytest.approx(45, abs=1e-6)
    assert res['attr_"abs"__coeff_0'] == pytest.approx(45, abs=1e-6)
    res = dict(k("fft_coefficient")(np.array([0, 1, 0, 0]), param))
    assert res['attr_"real"__coeff_0'] == pytest.approx(1, abs=1e-6)
    assert res['attr_"imag"__coeff_1'] == pytest.approx(-1, abs=1e-6)
    assert res['attr_"angle"__coeff_1'] == pytest.approx(-90, abs=1e-6)
    assert res['attr_"real"__coeff_2'] == pytest.approx(-1, abs=1e-6)
    res = dict(k("fft_coefficient")(np.arange(5), [{"coeff": 10, "attr": "real"}]))
    assert np.isnan(res['attr_"real"__coeff_10'])


def test_fft_aggregated():
    param = [{"aggtype": t} for t in ["centroid", "variance", "skew", "kurtosis"]]
    res = dict(k("fft_aggregated")(np.arange(10), param))
    assert res['aggtype_"centroid"'] == pytest.approx(1.135, abs=1e-3)
    assert res['aggtype_"variance"'] == pytest.approx(2.368, abs=1e-3)
    assert res['aggtype_"skew"'] == pytest.approx(1.249, abs=1e-3)
    assert res['aggtype_"kurtosis"'] == pytest.approx(3.643, abs=1e-3)
    # scale invariance
    res10 = dict(k("fft_aggregated")(10 * np.arange(10), param))
    assert res10['aggtype_"centroid"'] == pytest.approx(res['aggtype_"centroid"'], abs=1e-9)
    # dirac-like spectrum → skew/kurtosis NaN
    x = np.sin(2 * np.pi / 10 * np.arange(30))
    res = dict(k("fft_aggregated")(x, param))
    assert res['aggtype_"centroid"'] == pytest.approx(3.0, abs=1e-5)
    assert res['aggtype_"variance"'] == pytest.approx(0.0, abs=1e-5)
    assert np.isnan(res['aggtype_"skew"'])
    assert np.isnan(res['aggtype_"kurtosis"'])


def test_energy_ratio_by_chunks():
    param = [{"num_segments": 6, "segment_focus": i} for i in range(6)]
    out = k("energy_ratio_by_chunks")(np.arange(90), param)
    assert out[0][1] == pytest.approx(0.0043, abs=1e-3)
    assert out[1][1] == pytest.approx(0.0316, abs=1e-3)
    assert sum(v for _, v in out) == pytest.approx(1.0, abs=1e-9)


def test_ar_coefficient():
    x = [1.0] + 9 * [0.0]
    for i in range(1, len(x)):
        x[i] = 2.5 * x[i - 1] + 1
    res = dict(k("ar_coefficient")(np.array(x), [{"k": 1, "coeff": 0}, {"k": 1, "coeff": 1}]))
    assert res["coeff_0__k_1"] == pytest.approx(1, abs=1e-2)
    assert res["coeff_1__k_1"] == pytest.approx(2.5, abs=1e-2)


def test_ar_coefficient_order_two_reference_golden():
    """Published AR(2) case (reference test_feature_calculations.py:
    1096-1126): X_i = 3.5 X_{i-1} - 2 X_{i-2} + 1 recovers its own
    coefficients; coeff beyond k is NaN."""
    x = [1.0, 1.0] + 5 * [0.0]
    for i in range(2, len(x)):
        x[i] = (-2) * x[i - 2] + 3.5 * x[i - 1] + 1
    param = [{"k": 2, "coeff": c} for c in range(4)]
    res = dict(k("ar_coefficient")(np.array(x), param))
    assert res["coeff_0__k_2"] == pytest.approx(1, abs=1e-2)
    assert res["coeff_1__k_2"] == pytest.approx(3.5, abs=1e-2)
    assert res["coeff_2__k_2"] == pytest.approx(-2, abs=1e-2)
    assert np.isnan(res["coeff_3__k_2"])


def test_augmented_dickey_fuller_reference_golden():
    """Published ADF cases (reference test_feature_calculations.py:346-395):
    a random-drift series keeps H0 (pvalue > 0.10, usedlag 0); an AR(1)
    with phi=0.5 rejects it (pvalue <= 0.05, usedlag 0)."""
    rng = np.random.RandomState(42)
    x = np.cumsum(rng.uniform(size=100))
    param = [{"attr": a} for a in ["teststat", "pvalue", "usedlag"]]
    res = dict(k("augmented_dickey_fuller")(x, param))
    assert res['attr_"pvalue"__autolag_"AIC"'] > 0.10
    assert res['attr_"usedlag"__autolag_"AIC"'] == 0
    rng = np.random.RandomState(42)
    e = rng.normal(0.1, 0.1, size=100)
    xs = [0.0] * 50
    xs[0] = 100
    for i in range(1, 50):
        xs[i] = xs[i - 1] * 0.5 + e[i]
    res = dict(k("augmented_dickey_fuller")(np.array(xs), param))
    assert res['attr_"pvalue"__autolag_"AIC"'] <= 0.05
    assert res['attr_"usedlag"__autolag_"AIC"'] == 0
    # error paths return NaN (all-NaN series, empty series)
    for bad in (np.full(100, np.nan), np.array([])):
        for _, val in k("augmented_dickey_fuller")(bad, param):
            assert np.isnan(val)


def test_linear_trend():
    param = [{"attr": a} for a in ["pvalue", "rvalue", "intercept", "slope", "stderr"]]
    res = dict(k("linear_trend")(np.arange(10, dtype=float), param))
    assert res['attr_"slope"'] == pytest.approx(1.0, abs=1e-9)
    assert res['attr_"intercept"'] == pytest.approx(0.0, abs=1e-9)
    assert res['attr_"rvalue"'] == pytest.approx(1.0, abs=1e-9)
    assert res['attr_"pvalue"'] == pytest.approx(0.0, abs=1e-9)
    assert res['attr_"stderr"'] == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize(
    "values,stamps",
    [
        # hours / days / seconds / years published cases (reference
        # test_feature_calculations.py:1796-1930): unit conversion to hours
        # elapsed must make each of these an exact slope-1 line
        (
            [0, 1, 3, 6],
            ["2018-01-01 04:00:00", "2018-01-01 05:00:00",
             "2018-01-01 07:00:00", "2018-01-01 10:00:00"],
        ),
        (
            [0, 24, 48, 72],
            ["2018-01-01 04:00:00", "2018-01-02 04:00:00",
             "2018-01-03 04:00:00", "2018-01-04 04:00:00"],
        ),
        (
            [0, 1 / 3600.0, 2 / 3600.0, 3 / 3600.0],
            ["2018-01-01 04:00:01", "2018-01-01 04:00:02",
             "2018-01-01 04:00:03", "2018-01-01 04:00:04"],
        ),
        (
            [0, 365 * 24, 365 * 48, 365 * 72 + 24],  # 2020 is a leap year
            ["2018-01-01 04:00:00", "2019-01-01 04:00:00",
             "2020-01-01 04:00:00", "2021-01-01 04:00:00"],
        ),
    ],
)
def test_linear_trend_timewise_units_reference_golden(values, stamps):
    x = pd.Series(values, index=pd.DatetimeIndex(stamps))
    param = [{"attr": a} for a in ["pvalue", "rvalue", "intercept", "slope", "stderr"]]
    res = dict(k("linear_trend_timewise")(x, param))
    assert res['attr_"slope"'] == pytest.approx(1.0, abs=1e-3)
    assert res['attr_"intercept"'] == pytest.approx(0.0, abs=1e-3)
    assert res['attr_"pvalue"'] == pytest.approx(0.0, abs=1e-3)
    assert res['attr_"stderr"'] == pytest.approx(0.0, abs=1e-3)


def test_change_quantiles_seeded():
    # exact value pins the pd.qcut corridor semantics
    np.random.seed(0)
    x = np.random.rand(10000) * 1000
    res = k("change_quantiles")(x, 0.1, 0.2, False, "mean")
    assert res == pytest.approx(-0.9443846621365727, abs=1e-9)


def test_change_quantiles_edges():
    assert k("change_quantiles")(np.array([0, 1, 0, 1]), 0.6, 0.2, False, "mean") == 0.0
    assert k("change_quantiles")(np.array([1, 1, 1, 1]), 0.1, 0.9, True, "mean") == 0.0


def test_sample_entropy_matches_definition():
    # hand-checkable small case: strongly regular series → small entropy,
    # plus invariance of the estimator to scale of tolerance definition
    x = np.array([1, 4, 5, 1, 7, 3, 1, 2, 5, 8, 9, 7, 3, 7, 9, 5, 4, 3] * 3, dtype=float)
    v = k("sample_entropy")(x)
    assert np.isfinite(v) and v > 0


def test_sample_entropy_short_and_degenerate_series():
    """Short/degenerate inputs must return NaN/inf like the reference
    (feature_calculators.py:1744-1754 numpy 0/0 division), never raise."""
    se = k("sample_entropy")
    # n=1..4 non-constant: too few template matches -> B==0 -> nan
    for n in range(1, 5):
        x = np.arange(n, dtype=float) * 3.7 + 1
        assert np.isnan(se(x)), f"n={n}"
    assert np.isnan(se(np.array([], dtype=float)))
    # constant n=3: B=2, A=0 -> -log(0) = +inf (matches reference)
    assert np.isposinf(se(np.ones(3)))
    # constant n>=4: finite -log(A/B)
    assert se(np.ones(5)) == pytest.approx(-np.log(6 / 12))
    # two identical halves, n large enough for matches at both widths
    x = np.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0])
    assert np.isfinite(se(x))


def test_autocorrelation_lag0_and_constant():
    assert k("autocorrelation")(np.array([1, 2, 1, 2]), 0) == pytest.approx(1.0)
    assert np.isnan(k("autocorrelation")(np.array([1, 1, 1, 1]), 1))


def test_partial_autocorrelation_reference_golden():
    """Published expectations (reference test_feature_calculations.py:282-301).

    lag_1 == -1.0 to 4 places holds ONLY with the adjusted (n-k)
    autocovariance that statsmodels pacf(method='ld') uses — the biased
    estimator gives -0.8333, so this pins the estimator choice."""
    res = dict(
        k("partial_autocorrelation")(
            np.array([1, 2, 1, 2, 1, 2], dtype=float),
            [{"lag": lag} for lag in range(3)],
        )
    )
    assert res["lag_0"] == pytest.approx(1.0, abs=1e-4)
    assert res["lag_1"] == pytest.approx(-1.0, abs=1e-4)
    assert np.isnan(res["lag_2"])
    # linear signal: lag_1 -> 1, lag_2 -> 0 (2 places, as published)
    res = dict(
        k("partial_autocorrelation")(
            np.linspace(0, 1, 3000), [{"lag": lag} for lag in range(3)]
        )
    )
    assert res["lag_1"] == pytest.approx(1.0, abs=1e-2)
    assert res["lag_2"] == pytest.approx(0.0, abs=1e-2)


def test_partial_autocorrelation_ar1():
    # AR(1) process: pacf lag1 ~ phi, lag2+ ~ 0
    rng = np.random.RandomState(42)
    x = np.zeros(500)
    for i in range(1, 500):
        x[i] = 0.6 * x[i - 1] + rng.randn()
    res = dict(k("partial_autocorrelation")(x, [{"lag": lag} for lag in range(4)]))
    assert res["lag_0"] == pytest.approx(1.0)
    assert res["lag_1"] == pytest.approx(0.6, abs=0.1)
    assert abs(res["lag_2"]) < 0.15
    res_short = dict(k("partial_autocorrelation")(np.array([1.0]), [{"lag": 1}]))
    assert np.isnan(res_short["lag_1"])


def test_number_cwt_peaks():
    x = [1, 1, 1, 1, 1, 1, 1, 5, 1, 1, 1, 1, 1, 1, 5, 1, 1, 1, 1, 1, 1]
    assert k("number_cwt_peaks")(np.array(x, dtype=float), 2) == 2


def test_cwt_coefficients_names_and_nan():
    param = [
        {"widths": (1, 2, 3), "coeff": 2, "w": 1},
        {"widths": (1, 3), "coeff": 2, "w": 3},
        {"widths": (1, 3), "coeff": 5, "w": 3},
    ]
    res = dict(k("cwt_coefficients")(np.array([0.1, 0.2, 0.3]), param))
    assert set(res) == {
        "coeff_2__w_1__widths_(1, 2, 3)",
        "coeff_2__w_3__widths_(1, 3)",
        "coeff_5__w_3__widths_(1, 3)",
    }
    assert math.isnan(res["coeff_5__w_3__widths_(1, 3)"])


def test_spkt_welch_density_nan_for_large_coeff():
    res = dict(k("spkt_welch_density")(np.arange(10), [{"coeff": 1}, {"coeff": 10}]))
    assert np.isnan(res["coeff_10"])
    assert np.isfinite(res["coeff_1"])


def test_friedrich_and_langevin():
    rng = np.random.RandomState(0)
    # Langevin-ish: dx = -x + noise
    x = np.zeros(1000)
    for i in range(1, 1000):
        x[i] = x[i - 1] - 0.1 * x[i - 1] + 0.1 * rng.randn()
    res = dict(
        k("friedrich_coefficients")(x, [{"coeff": c, "m": 3, "r": 30} for c in range(4)])
    )
    assert all(np.isfinite(v) for v in res.values())
    # drift slope should be negative (mean reversion)
    assert res["coeff_2__m_3__r_30"] < 0 or res["coeff_3__m_3__r_30"] != 0
    mlfp = k("max_langevin_fixed_point")(x, r=30, m=3)
    assert np.isfinite(mlfp)
    # a constant 2-point series → duplicate qcut edges → NaN coefficients
    short = dict(k("friedrich_coefficients")(np.array([1.0, 1.0]), [{"coeff": 0, "m": 3, "r": 30}]))
    assert np.isnan(short["coeff_0__m_3__r_30"])


def test_augmented_dickey_fuller_behavior():
    param = [{"attr": "teststat"}, {"attr": "pvalue"}, {"attr": "usedlag"}]
    rng = np.random.RandomState(7)
    stationary = rng.randn(200)
    res = dict(k("augmented_dickey_fuller")(stationary, param))
    assert res['attr_"pvalue"__autolag_"AIC"'] < 0.05  # clearly stationary
    walk = np.cumsum(rng.randn(200))
    res_w = dict(k("augmented_dickey_fuller")(walk, param))
    assert res_w['attr_"pvalue"__autolag_"AIC"'] > 0.01
    tiny = dict(k("augmented_dickey_fuller")(np.array([1.0, 2.0]), param))
    assert np.isnan(tiny['attr_"teststat"__autolag_"AIC"'])


def test_query_similarity_count_default_nan():
    res = dict(
        k("query_similarity_count")(np.arange(20), [{"query": None, "threshold": 0.0}])
    )
    assert np.isnan(res["query_None__threshold_0.0"])


def test_query_similarity_count_exact_match():
    x = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0], dtype=float)
    res = dict(
        k("query_similarity_count")(
            x, [{"query": np.array([0.0, 1.0, 2.0]), "threshold": 1e-9}]
        )
    )
    (count,) = res.values()
    assert count == 4  # z-normalized: [0,1,2] matches every ascending ramp window


def test_benford_correlation():
    fib = [0, 1]
    for i in range(2, 200):
        fib.append(fib[i - 1] + fib[i - 2])
    v = k("benford_correlation")(np.array(fib, dtype=float))
    assert v == pytest.approx(1.0, abs=0.01)  # Fibonacci follows Benford
    equal = k("benford_correlation")(np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=float))
    assert np.isnan(equal)  # uniform digit distribution → zero variance → NaN


def test_sample_entropy_reference_golden():
    """Published reference expectations for sample_entropy."""
    se = k("sample_entropy")
    assert se(np.array([1] * 10, dtype=float)) == pytest.approx(0.25131442)
    assert se(np.array([1, 1, 2, 1, 1, 1, 1, 1, 1, 1], dtype=float)) == pytest.approx(
        0.74193734
    )
    assert se(np.array([1, 1, 1, 2, 1, 1, 1, 1, 1, 1], dtype=float)) == pytest.approx(
        0.74193734
    )
    assert se(np.array([1, -1, 1, -1, 1, -1], dtype=float)) == pytest.approx(
        0.69314718
    )
    assert np.isnan(se(np.array([1, -1, 1, np.nan, 1, -1])))
    assert se(np.arange(1000, dtype=float)) == pytest.approx(0.0010314596066622707)


def test_agg_linear_trend_reference_golden():
    """range(9) in chunks of 3 → per-chunk aggregates fit a perfect line
    (reference published expectations; ndarray path, default-grid f_aggs)."""
    param = [
        {"attr": attr, "chunk_len": 3, "f_agg": f}
        for f in ["max", "min", "mean"]
        for attr in ["intercept", "slope"]
    ]
    res = dict(k("agg_linear_trend")(np.arange(9), param))
    assert res['attr_"intercept"__chunk_len_3__f_agg_"max"'] == pytest.approx(2)
    assert res['attr_"slope"__chunk_len_3__f_agg_"max"'] == pytest.approx(3)
    assert res['attr_"intercept"__chunk_len_3__f_agg_"min"'] == pytest.approx(0)
    assert res['attr_"slope"__chunk_len_3__f_agg_"min"'] == pytest.approx(3)
    assert res['attr_"intercept"__chunk_len_3__f_agg_"mean"'] == pytest.approx(1)
    assert res['attr_"slope"__chunk_len_3__f_agg_"mean"'] == pytest.approx(3)
    # chunk_len >= len(x) → NaN
    res2 = dict(
        k("agg_linear_trend")(np.arange(3), [{"attr": "slope", "chunk_len": 5, "f_agg": "max"}])
    )
    assert np.isnan(res2['attr_"slope"__chunk_len_5__f_agg_"max"'])
    # NaN input propagates through ndarray chunk aggregation (engine path
    # passes ndarrays, whose .max does not skip NaN)
    res3 = dict(
        k("agg_linear_trend")(
            np.array([np.nan, np.nan, np.nan, -3.0, -3.0, -3.0]),
            [{"attr": "slope", "chunk_len": 3, "f_agg": "max"}],
        )
    )
    assert np.isnan(res3['attr_"slope"__chunk_len_3__f_agg_"max"'])


def test_cid_ce_normalized_golden():
    # reference: z-normalized complexity of a ramp
    x = np.array([-4.33, -1.33, 1.67, 4.67])
    v = k("cid_ce")(x, normalize=True)
    # z-devs are ±1.3416, ±0.4472 -> diffs 0.8944 each -> sqrt(3*0.8) = sqrt(2.4)
    assert v == pytest.approx(np.sqrt(2.4), abs=1e-6)


def test_count_above_below_nan_inf_golden():
    """Published reference behaviors for NaN/inf inputs."""
    ca, cb = k("count_above"), k("count_below")
    assert ca(np.array([1.0] * 10), t=1) == 1
    assert ca(np.arange(10), t=0) == 1
    assert ca(np.arange(10), t=5) == 0.5
    assert ca(np.array([np.nan, 0, 1] * 3), t=0) == pytest.approx(2 / 3)
    assert ca(np.array([-np.inf, 0, 1] * 3), t=0) == pytest.approx(2 / 3)
    assert ca(np.array([np.inf, 0, 1] * 3), t=0) == 1
    assert cb(np.array([np.nan, 0, 1] * 3), t=1) == pytest.approx(2 / 3)
    assert cb(np.array([np.inf, 0, 1] * 3), t=1) == pytest.approx(2 / 3)


def test_variance_larger_than_std_boundary():
    # var == 1 exactly → strictly greater is False
    x = np.array([1.0, 1.0, -1.0, -1.0])
    assert not bool(k("variance_larger_than_standard_deviation")(x))


def test_reoccurring_sums_nan_poisons_like_reference():
    """The reference's masked-counts formula makes a NaN unique value poison
    the sum (0*nan = nan) — replicated exactly (feature_calculators.py:
    1013-1016, 1040-1041)."""
    x = np.array([1.0, np.nan, 3.0, 4.0, 5.0])
    assert np.isnan(k("sum_of_reoccurring_values")(x))
    assert np.isnan(k("sum_of_reoccurring_data_points")(x))
    # NaN with actual duplicates: still NaN
    x2 = np.array([2.0, 2.0, np.nan, 1.0])
    assert np.isnan(k("sum_of_reoccurring_values")(x2))
    assert np.isnan(k("sum_of_reoccurring_data_points")(x2))
    # published finite cases unchanged
    assert k("sum_of_reoccurring_values")(np.array([2, 2, 2, 2, 1])) == 2
    assert k("sum_of_reoccurring_data_points")(np.array([2, 2, 2, 2, 1])) == 8


def _ridge_lines_reference(mat, max_distances, gap_thresh):
    """The pre-optimization ridge-line identifier (argsort finalization) —
    kept verbatim as the A/B reference for the incremental min-row form."""
    from tsfresh_spark.kernels.spectral import _relative_maxima

    all_max = _relative_maxima(mat)
    rows_with_max = np.nonzero(all_max.any(axis=1))[0]
    if len(rows_with_max) == 0:
        return []
    start_row = rows_with_max[-1]
    lines = [[[start_row], [col], 0] for col in np.nonzero(all_max[start_row])[0]]
    final = []
    for row in range(start_row - 1, -1, -1):
        this_cols = np.nonzero(all_max[row])[0]
        for line in lines:
            line[2] += 1
        prev_cols = np.array([line[1][-1] for line in lines])
        if len(prev_cols) and len(this_cols):
            diffs = np.abs(this_cols[:, None] - prev_cols[None, :])
            closest = np.argmin(diffs, axis=1)
            best = diffs[np.arange(len(this_cols)), closest]
            within = best <= max_distances[row]
        else:
            closest = np.zeros(len(this_cols), dtype=int)
            within = np.zeros(len(this_cols), dtype=bool)
        for i, col in enumerate(this_cols):
            if within[i]:
                attached = lines[closest[i]]
                attached[0].append(row)
                attached[1].append(int(col))
                attached[2] = 0
            else:
                lines.append([[row], [int(col)], 0])
        for i in range(len(lines) - 1, -1, -1):
            if lines[i][2] > gap_thresh:
                final.append(lines[i])
                del lines[i]
    out = []
    for rows, cols, _gap in final + lines:
        order = np.argsort(rows)
        out.append(([rows[i] for i in order], [cols[i] for i in order]))
    return out


def test_ridge_lines_incremental_equals_argsort_reference():
    """A/B: the incremental (first_row, first_col, length) tracker must
    reproduce np.argsort-based line heads EXACTLY — including duplicate-row
    tie order — across random series, scales, and lengths."""
    from tsfresh_spark.kernels.spectral import (
        _identify_ridge_lines,
        cwt_ricker,
    )

    rng = np.random.RandomState(99)
    checked = 0
    for trial in range(40):
        n = int(rng.randint(8, 600))
        kind = trial % 3
        if kind == 0:
            x = rng.randn(n) * 10
        elif kind == 1:
            x = rng.randint(-4, 5, size=n).astype(float)  # heavy ties
        else:
            x = np.sin(np.linspace(0, rng.randint(1, 9) * np.pi, n)) * 5
        scales = int(rng.randint(1, 11))
        widths = np.arange(1, scales + 1, dtype=float)
        mat = cwt_ricker(x, widths)
        got = _identify_ridge_lines(mat, widths / 4.0, np.ceil(widths[0]))
        want = [
            (rows[0], cols[0], len(rows))
            for rows, cols in _ridge_lines_reference(
                mat, widths / 4.0, np.ceil(widths[0])
            )
        ]
        assert got == want, (trial, n, scales)
        checked += len(got)
    assert checked > 500


def test_nearest_lines_equals_matrix_argmin():
    """A/B: the sorted nearest-line search must reproduce the distance
    matrix argmin EXACTLY — including the smallest-line-index tie-break
    among duplicate columns and among two equidistant distinct values —
    over heavy-duplicate integer fuzz."""
    from tsfresh_spark.kernels.spectral import _nearest_lines

    rng = np.random.RandomState(3)
    for trial in range(3000):
        L = int(rng.randint(1, 40))
        C = int(rng.randint(1, 40))
        hi = int(rng.randint(2, 50))
        prev = rng.randint(0, hi, L)
        cols = np.sort(rng.randint(0, hi, C))
        diffs = np.abs(cols[:, None] - prev[None, :])
        closest = np.argmin(diffs, axis=1)
        best = diffs[np.arange(len(cols)), closest]
        got_c, got_b = _nearest_lines(cols, prev)
        assert np.array_equal(got_c, closest), (trial, cols, prev)
        assert np.array_equal(got_b, best), (trial, cols, prev)


def test_ridge_lines_columnar_equals_loop():
    """A/B: the columnar ridge tracker must reproduce the python attach
    loop EXACTLY — same lines, same order — across random, tied, plateau
    and sparse CWT planes.  Called directly (not through the dispatcher)
    so the equivalence is exercised below the size threshold too; the
    dispatcher path is covered by test_ridge_lines_incremental_equals_
    argsort_reference plus the >16-point abstention check here."""
    from tsfresh_spark.kernels.spectral import (
        _identify_ridge_lines,
        _identify_ridge_lines_loop,
        _relative_maxima,
        _ridge_lines_columnar,
        cwt_ricker,
    )

    rng = np.random.RandomState(5)
    checked = abstained = 0
    for trial in range(200):
        n = int(rng.randint(3, 800))
        kind = trial % 5
        if kind == 0:
            x = rng.randn(n) * 10
        elif kind == 1:
            x = rng.randint(-4, 5, size=n).astype(float)  # heavy ties
        elif kind == 2:
            x = np.sin(np.linspace(0, rng.randint(1, 9) * np.pi, n)) * 5
        elif kind == 3:
            x = np.repeat(rng.randn(max(1, n // 7)), 7)[:n]  # plateaus
        else:
            x = rng.randn(n)
            x[rng.rand(n) < 0.3] = 0.0  # sparse/tied zeros
        scales = int(rng.randint(1, 11))
        widths = np.arange(1, scales + 1, dtype=float)
        mat = cwt_ricker(np.asarray(x, float), widths)
        am = _relative_maxima(mat)
        md, gt = widths / 4.0, np.ceil(widths[0])
        loop = _identify_ridge_lines_loop(am, md, gt)
        col = _ridge_lines_columnar(am, md, gt)
        key = lambda L: [tuple(int(v) for v in t) for t in L]
        if col is None:
            # abstention is only allowed when a >16-point line exists —
            # the loop form must then show one
            assert any(line[2] > 16 for line in loop), (trial, n, scales)
            abstained += 1
        else:
            assert key(col) == key(loop), (trial, n, scales)
        assert key(_identify_ridge_lines(mat, md, gt)) == key(loop), (
            trial,
            n,
            scales,
        )
        checked += len(loop)
    assert checked > 3000


def test_sliding_percentile_partition_equals_np_percentile():
    """A/B: the partition-based interior must be bit-equal to the full
    np.percentile over sliding windows, across widths/percentiles/dtypes."""
    from tsfresh_spark.kernels.spectral import _sliding_percentile

    rng = np.random.RandomState(17)
    for trial in range(25):
        n = int(rng.randint(10, 800))
        row = rng.randn(n) * 100 if trial % 2 else rng.randint(0, 9, n).astype(float)
        width = int(rng.randint(1, min(n, 80)))
        half, odd = width // 2, width % 2
        perc = float(rng.choice([10, 25, 50, 75, 90, 33.3]))
        got = _sliding_percentile(np.abs(row), half, odd, perc)
        full = np.lib.stride_tricks.sliding_window_view(np.abs(row), width)
        want_interior = np.percentile(full, perc, axis=1)
        assert np.array_equal(
            got[half : half + len(want_interior)], want_interior
        ), (trial, n, width, perc)


def test_lempel_ziv_trie_equals_slice_set():
    """A/B: the trie-based LZ parse must equal the reference-shaped
    set-of-byte-slices parse on random data (incl. short, constant, and
    two-valued sequences) for every default bins value."""
    import numpy as np

    from tsfresh_spark.kernels import KERNELS

    def slice_set_form(x, bins):
        x = np.asarray(x)
        edges = np.linspace(np.min(x), np.max(x), bins + 1)[1:]
        sequence = np.searchsorted(edges, x, side="left")
        n = len(sequence)
        buf = sequence.astype(np.int64).tobytes()
        words = set()
        ind, inc = 0, 1
        while ind + inc <= n:
            word = buf[ind * 8 : (ind + inc) * 8]
            if word in words:
                inc += 1
            else:
                words.add(word)
                ind += inc
                inc = 1
        return len(words) / n

    lz = KERNELS["lempel_ziv_complexity"].func
    rng = np.random.RandomState(11)
    cases = [
        rng.randint(0, 50257, 1024),
        rng.randint(0, 5, 200),
        rng.randint(0, 2, 64),
        np.full(32, 7),
        np.arange(17),
        rng.randint(0, 100, 3),
    ]
    for x in cases:
        for bins in (2, 3, 5, 10, 100):
            assert lz(x, bins) == slice_set_form(x, bins), (len(x), bins)


def test_sliding_percentile_at_equals_full():
    """A/B: the selective noise-floor evaluator must equal the full sliding
    percentile at every requested column, across widths, odd/even windows,
    edge columns, and the degenerate window >= n case."""
    import numpy as np

    from tsfresh_spark.kernels.spectral import (
        _sliding_percentile,
        _sliding_percentile_at,
    )

    rng = np.random.RandomState(5)
    for n in (1024, 200, 37, 8):
        row = np.abs(rng.randn(n))
        for width in (int(np.ceil(n / 20.0)), 5, 4, n, n + 3):
            half, odd = width // 2, width % 2
            full = _sliding_percentile(row, half, odd, 10)
            cols = np.unique(rng.randint(0, n, size=min(n, 50)))
            sel = _sliding_percentile_at(row, cols, half, odd, 10)
            assert np.array_equal(sel, full[cols]), (n, width)


def test_slice_forms_equal_roll_forms():
    """Round-6: number_peaks / c3 / time_reversal_asymmetry_statistic now
    compare against plain slices (the reference's roll(x, ±k) never wraps
    over the retained region).  A/B the slice forms against verbatim
    roll-based re-implementations on randomized data — ties, NaN, int64
    (overflow wraps must agree) and short series included."""
    from tsfresh_spark.kernels.helpers import circular_shift
    from tsfresh_spark.kernels.ordered import (
        c3,
        number_peaks,
        time_reversal_asymmetry_statistic,
    )

    def np_roll(x, n):
        x = np.asarray(x)
        core = x[n:-n]
        res = np.ones(core.shape, dtype=bool)
        for i in range(1, n + 1):
            res &= core > circular_shift(x, i)[n:-n]
            res &= core > circular_shift(x, -i)[n:-n]
        return int(np.sum(res))

    def c3_roll(x, lag):
        x = np.asarray(x)
        n = x.size
        if 2 * lag >= n:
            return 0.0
        return np.mean(
            (circular_shift(x, -2 * lag) * circular_shift(x, -lag) * x)[: n - 2 * lag]
        )

    def trev_roll(x, lag):
        x = np.asarray(x)
        n = len(x)
        if 2 * lag >= n:
            return 0.0
        one = circular_shift(x, -lag)
        two = circular_shift(x, -2 * lag)
        return np.mean((two * two * one - one * x * x)[: n - 2 * lag])

    rng = np.random.RandomState(123)
    cases = []
    for ln in (3, 5, 11, 13, 29, 101, 500):
        cases.append(rng.randint(-5, 5, size=ln).astype(np.int64))  # ties
        cases.append(rng.randn(ln))
        cases.append((rng.randint(0, 3, size=ln) * (2**31)).astype(np.int64))
        nanv = rng.randn(ln)
        nanv[rng.randint(0, ln, size=max(1, ln // 7))] = np.nan
        cases.append(nanv)
    for x in cases:
        for n in (1, 3, 5, 10, 50):
            a, b = number_peaks(x, n), np_roll(x, n)
            assert a == b, (len(x), n)
        for lag in (1, 2, 3, 7):
            for new, old in ((c3, c3_roll), (time_reversal_asymmetry_statistic, trev_roll)):
                a, b = new(x, lag), old(x, lag)
                assert (np.isnan(a) and np.isnan(b)) or a == b, (len(x), lag, new)


def test_energy_ratio_single_chunk_equals_array_split():
    """Round-6: energy_ratio_by_chunks computes only the focus chunk's
    array_split boundaries; A/B against the verbatim array_split form."""
    from tsfresh_spark.kernels.ordered import energy_ratio_by_chunks

    def ref(x, param):
        x = np.asarray(x)
        full = np.sum(x**2)
        out = []
        for cfg in param:
            k, f = cfg["num_segments"], cfg["segment_focus"]
            if full == 0:
                out.append(np.nan)
            else:
                chunk = np.array_split(x, k)[f]
                out.append(np.sum(chunk**2.0) / full)
        return out

    rng = np.random.RandomState(7)
    grid = [
        {"num_segments": k, "segment_focus": f}
        for k in (1, 2, 3, 7, 10)
        for f in list(range(-k, k))
    ]
    for ln in (1, 2, 5, 9, 10, 11, 29, 257):
        for x in (rng.randint(-9, 9, ln).astype(np.int64), rng.randn(ln)):
            got = [v for _, v in energy_ratio_by_chunks(x, grid)]
            want = ref(x, grid)
            for g, w in zip(got, want):
                assert (np.isnan(g) and np.isnan(w)) or g == w
