"""Settings cost-class/subset objects mirror the reference's FCParameters
family (reference tests/units/feature_extraction/test_settings.py:226-280)."""

from tsfresh_spark.kernels import KERNELS
from tsfresh_spark.settings import (
    comprehensive_settings,
    efficient_settings,
    expand_feature_names,
    index_based_settings,
    minimal_settings,
    settings_from_feature_names,
    time_based_settings,
)


def test_index_based_contains_exactly_the_series_input_calculators():
    s = index_based_settings()
    want = {name for name, info in KERNELS.items() if info.input == "series" and info.available}
    assert set(s) == want
    # the reference's four: skewness, kurtosis, reoccurring %, timewise trend
    assert set(s) == {
        "skewness",
        "kurtosis",
        "percentage_of_reoccurring_datapoints_to_all_datapoints",
        "linear_trend_timewise",
    }
    # grids come straight from the comprehensive defaults
    comp = comprehensive_settings()
    for name, params in s.items():
        assert params == comp[name]


def test_time_based_contains_exactly_the_datetime_calculators():
    s = time_based_settings()
    assert set(s) == {"linear_trend_timewise"}
    assert s["linear_trend_timewise"] == comprehensive_settings()["linear_trend_timewise"]


def test_subsets_nest():
    comp = set(comprehensive_settings())
    assert set(time_based_settings()) <= set(index_based_settings()) <= comp
    assert set(minimal_settings()) <= comp
    assert set(efficient_settings()) <= comp


def test_subsets_round_trip_through_feature_names():
    """Subset settings survive name-expansion → settings_from_feature_names
    (the reference's from_columns replay)."""
    for settings in (index_based_settings(), time_based_settings()):
        names = expand_feature_names(settings, "kindA")
        replay = settings_from_feature_names(names)["kindA"]
        assert set(replay) == set(settings)
        for calc, params in settings.items():
            if params is None:
                assert replay[calc] is None
