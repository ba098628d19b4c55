"""Side-by-side cross-check: every kernel whose reference implementation
does not need the absent scipy/statsmodels/pywt/stumpy dependencies is
executed against the reference's actual ``feature_calculators.py`` (loaded
standalone with those deps stubbed — they are absent for the reference in
this sandbox too) over random / integer / constant / NaN-bearing series,
including the full comprehensive parameter grids.  ~7.7k comparison points,
1e-9 relative tolerance, NaN⇔NaN and matching raised-exception classes.
"""

import importlib.util
import inspect
import math
import sys
import types
import warnings

import numpy as np
import pandas as pd
import pytest

REF_ROOT = "/root/reference"

# kernels whose REFERENCE implementation calls the stubbed dependencies —
# unverifiable here (covered instead by vendored published golden values)
DEP_GATED = {
    "number_cwt_peaks", "spkt_welch_density", "cwt_coefficients",
    "partial_autocorrelation", "augmented_dickey_fuller", "ar_coefficient",
    "linear_trend", "agg_linear_trend", "matrix_profile",
    "query_similarity_count", "linear_trend_timewise", "fourier_entropy",
}
# friedrich_coefficients / max_langevin_fixed_point are NOT dep-gated: the
# reference implementation is pure numpy+pandas (feature_calculators.py:
# 131-173, 2082-2167), so our numpy qcut re-derivation is executed
# side-by-side against the reference's real pd.qcut path below.


def _stub(name, **attrs):
    import importlib.machinery

    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (used by pyspark's
    # dependency probing) doesn't choke on the stub
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    class _Err(Exception):
        pass

    saved = dict(sys.modules)
    _stub("tqdm", tqdm=lambda x, *a, **k: x)
    _stub("pywt", cwt=None, ContinuousWavelet=None)
    _stub("stumpy", stump=None)
    _stub("scipy")
    _stub("scipy.signal", find_peaks_cwt=None, welch=None, ricker=None, cwt=None)
    _stub("scipy.stats", linregress=None)
    _stub("statsmodels")
    _stub("statsmodels.tools")
    _stub("statsmodels.tools.sm_exceptions", MissingDataError=_Err)
    _stub("statsmodels.tsa")
    _stub("statsmodels.tsa.ar_model", AutoReg=None)
    _stub("statsmodels.tsa.stattools", acf=None, adfuller=None, pacf=None)
    _stub("matrixprofile")
    pkg = types.ModuleType("tsfresh")
    pkg.__path__ = [f"{REF_ROOT}/tsfresh"]
    sys.modules["tsfresh"] = pkg
    sub = types.ModuleType("tsfresh.utilities")
    sub.__path__ = [f"{REF_ROOT}/tsfresh/utilities"]
    sys.modules["tsfresh.utilities"] = sub
    s2 = importlib.util.spec_from_file_location(
        "tsfresh.utilities.string_manipulation",
        f"{REF_ROOT}/tsfresh/utilities/string_manipulation.py",
    )
    smm = importlib.util.module_from_spec(s2)
    s2.loader.exec_module(smm)
    sys.modules["tsfresh.utilities.string_manipulation"] = smm
    spec = importlib.util.spec_from_file_location(
        "ref_calculators",
        f"{REF_ROOT}/tsfresh/feature_extraction/feature_calculators.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    # restore module table so other tests see the real (absent) modules
    for name in list(sys.modules):
        if name not in saved:
            del sys.modules[name]
    sys.modules.update(saved)


def _inputs():
    rng = np.random.RandomState(123)
    out = []
    for n in (1, 2, 3, 5, 13, 64, 257):
        out.append(rng.randn(n) * 10)
        out.append(rng.randint(-3, 4, size=n).astype(float))
    out += [
        np.ones(17),
        np.zeros(9),
        np.array([1.0, np.nan, 3.0, 4.0, 5.0]),
        np.array([2.0, 2.0, np.nan, 1.0]),
    ]
    return out


def _eqv(a, b):
    try:
        a, b = float(a), float(b)
    except Exception:
        return a == b
    if math.isnan(a) and math.isnan(b):
        return True
    if math.isinf(a) or math.isinf(b):
        return a == b
    return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


def test_parameterless_kernels_match_reference(ref):
    from tsfresh_spark.kernels import KERNELS

    bad = []
    checked = 0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for name, info in sorted(KERNELS.items()):
            if name in DEP_GATED or info.fctype != "simple" or not info.available:
                continue
            if len(inspect.signature(info.func).parameters) != 1:
                continue
            rf = getattr(ref, name, None)
            if rf is None:
                continue
            for x in _inputs():
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                try:
                    mine = info.func(xin)
                except Exception as ex:
                    mine = ("RAISE", type(ex).__name__)
                try:
                    theirs = rf(arr)
                except Exception as ex:
                    theirs = ("RAISE", type(ex).__name__)
                checked += 1
                ok = (
                    mine == theirs
                    if isinstance(mine, tuple) or isinstance(theirs, tuple)
                    else _eqv(mine, theirs)
                )
                if not ok:
                    bad.append((name, len(x), mine, theirs))
    assert checked > 500
    assert bad == []


def test_parameterized_kernels_match_reference_on_default_grids(ref):
    from tsfresh_spark.kernels import KERNELS
    from tsfresh_spark.settings import comprehensive_settings

    dep = set(DEP_GATED)
    if "acf(" in inspect.getsource(ref.agg_autocorrelation):
        dep.add("agg_autocorrelation")
    rng = np.random.RandomState(7)
    inputs = []
    for n in (3, 5, 13, 64, 257):
        inputs.append(rng.randn(n) * 10)
        inputs.append(rng.randint(-3, 4, size=n).astype(float))
    inputs += [np.ones(17), np.zeros(9)]
    bad = []
    checked = 0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for name, params in sorted(comprehensive_settings().items()):
            info = KERNELS.get(name)
            if info is None or not info.available or name in dep or params is None:
                continue
            rf = getattr(ref, name, None)
            if rf is None:
                continue
            for x in inputs:
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                if info.fctype == "combiner":
                    try:
                        mine = dict(info.func(xin, param=params))
                    except Exception as ex:
                        mine = {"RAISE": type(ex).__name__}
                    try:
                        theirs = dict(rf(arr, param=params))
                    except Exception as ex:
                        theirs = {"RAISE": type(ex).__name__}
                    for key in theirs:
                        checked += 1
                        if key not in mine or not _eqv(mine.get(key), theirs[key]):
                            bad.append((name, len(x), key, mine.get(key), theirs[key]))
                else:
                    for p in params:
                        checked += 1
                        try:
                            mine = info.func(xin, **p)
                        except Exception as ex:
                            mine = ("RAISE", type(ex).__name__)
                        try:
                            theirs = rf(arr, **p)
                        except Exception as ex:
                            theirs = ("RAISE", type(ex).__name__)
                        ok = (
                            mine == theirs
                            if isinstance(mine, tuple) or isinstance(theirs, tuple)
                            else _eqv(mine, theirs)
                        )
                        if not ok:
                            bad.append((name, len(x), p, mine, theirs))
    assert checked > 5000
    assert bad[:10] == [] and not bad


try:
    from hypothesis import HealthCheck
    from hypothesis import given
    from hypothesis import settings as hsettings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @st.composite
    def _fuzz_series(draw, min_size=0):
        """Adversarial series the fixed suite doesn't enumerate: arbitrary
        lengths 0..40, mixed magnitudes, interior NaNs, heavy ties."""
        n = draw(st.integers(min_value=min_size, max_value=40))
        kind = draw(st.sampled_from(["float", "int", "nan", "tied"]))
        if kind == "int":
            vals = draw(
                st.lists(st.integers(-50, 50), min_size=n, max_size=n)
            )
        elif kind == "tied":
            vals = draw(
                st.lists(st.sampled_from([0, 1, 1, 2]), min_size=n, max_size=n)
            )
        else:
            # allow_subnormal=False: an ALL-subnormal series makes the
            # reference's friedrich path crash with an uncaught TypeError
            # (qcut builds an all-NaN IntervalIndex, dropna empties the
            # frame, polyfit raises on the empty vector) where our kernel
            # returns NaN — a deliberate graceful deviation on inputs
            # unreachable through real extraction, like the empty-series
            # ZeroDivisionError above.  Mixed subnormal/normal edges (the
            # reachable ValueError → NaN path) stay covered.
            elem = st.floats(
                min_value=-1e4,
                max_value=1e4,
                allow_nan=False,
                allow_infinity=False,
                allow_subnormal=False,
            )
            if kind == "nan":
                elem = st.one_of(elem, st.just(float("nan")))
            vals = draw(st.lists(elem, min_size=n, max_size=n))
        return np.asarray(vals, dtype=float)

    @given(x=_fuzz_series())
    @hsettings(
        max_examples=60,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_parameterless_kernels_match_reference(ref, x):
        """Hypothesis layer over the side-by-side crosscheck: every
        dependency-free parameterless kernel must agree with the
        reference's own code on arbitrary series (same value within 1e-9
        relative, NaN⇔NaN, or the same exception class).  derandomize
        keeps the suite deterministic."""
        from tsfresh_spark.kernels import KERNELS

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for name, info in sorted(KERNELS.items()):
                if (
                    name in DEP_GATED
                    or info.fctype != "simple"
                    or not info.available
                ):
                    continue
                if len(inspect.signature(info.func).parameters) != 1:
                    continue
                rf = getattr(ref, name, None)
                if rf is None:
                    continue
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                try:
                    mine = info.func(xin)
                except Exception as ex:
                    mine = ("RAISE", type(ex).__name__)
                try:
                    theirs = rf(x.copy())
                except Exception as ex:
                    theirs = ("RAISE", type(ex).__name__)
                ok = (
                    mine == theirs
                    if isinstance(mine, tuple) or isinstance(theirs, tuple)
                    else _eqv(mine, theirs)
                )
                assert ok, (name, len(x), x[:8], mine, theirs)

    # min_size=1 below: on EMPTY series the reference propagates a
    # pandas-internal ZeroDivisionError out of change_quantiles' qcut —
    # an input unreachable through extract_features (groups are never
    # empty); our kernels return the documented too-short fallback instead
    @given(x=_fuzz_series(min_size=1))
    @hsettings(
        max_examples=40,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_parameterized_kernels_match_reference(ref, x):
        """Every dependency-free simple parameterized kernel against the
        reference on arbitrary series, over its FULL comprehensive grid."""
        from tsfresh_spark.kernels import KERNELS
        from tsfresh_spark.settings import comprehensive_settings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for name, params in sorted(comprehensive_settings().items()):
                info = KERNELS.get(name)
                if (
                    info is None
                    or not info.available
                    or name in DEP_GATED
                    or info.fctype != "simple"
                    or params is None
                ):
                    continue
                rf = getattr(ref, name, None)
                if rf is None:
                    continue
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                for p in params:
                    try:
                        mine = info.func(xin, **p)
                    except Exception as ex:
                        mine = ("RAISE", type(ex).__name__)
                    try:
                        theirs = rf(x.copy(), **p)
                    except Exception as ex:
                        theirs = ("RAISE", type(ex).__name__)
                    ok = (
                        mine == theirs
                        if isinstance(mine, tuple) or isinstance(theirs, tuple)
                        else _eqv(mine, theirs)
                    )
                    assert ok, (name, p, len(x), x[:8], mine, theirs)


if _HAVE_HYPOTHESIS:

    @given(x=_fuzz_series(min_size=1))
    @hsettings(
        max_examples=25,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_combiner_kernels_match_reference(ref, x):
        """Combiner kernels (one call returns the whole grid) against the
        reference on arbitrary series, full comprehensive parameter grids."""
        from tsfresh_spark.kernels import KERNELS
        from tsfresh_spark.settings import comprehensive_settings

        dep = set(DEP_GATED)
        if "acf(" in inspect.getsource(ref.agg_autocorrelation):
            dep.add("agg_autocorrelation")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for name, params in sorted(comprehensive_settings().items()):
                info = KERNELS.get(name)
                if (
                    info is None
                    or not info.available
                    or name in dep
                    or info.fctype != "combiner"
                    or params is None
                ):
                    continue
                rf = getattr(ref, name, None)
                if rf is None:
                    continue
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                try:
                    mine = dict(info.func(xin, param=params))
                except Exception as ex:
                    mine = {"RAISE": type(ex).__name__}
                try:
                    theirs = dict(rf(x.copy(), param=params))
                except Exception as ex:
                    theirs = {"RAISE": type(ex).__name__}
                assert set(mine) == set(theirs), (name, len(x), x[:8])
                for key in theirs:
                    assert _eqv(mine[key], theirs[key]), (
                        name,
                        key,
                        len(x),
                        x[:8],
                        mine[key],
                        theirs[key],
                    )


@pytest.fixture(scope="module")
def ref_dfn(ref):
    """The reference's dataframe_functions, loaded standalone (reuses the
    stub environment the ``ref`` fixture installed)."""
    _stub(
        "tsfresh.defaults",
        CHUNKSIZE=None, N_PROCESSES=1, PROFILING=False,
        PROFILING_FILENAME="x", PROFILING_SORTING="cumulative",
        DISABLE_PROGRESSBAR=True, SHOW_WARNINGS=False, PARALLELISATION=None,
        IMPUTE_FUNCTION=None,
    )
    # distribution pulls the feature_extraction package; provide it from the
    # already-loaded standalone calculators module
    fe = types.ModuleType("tsfresh.feature_extraction")
    fe.__path__ = [f"{REF_ROOT}/tsfresh/feature_extraction"]
    fe.feature_calculators = ref
    sys.modules["tsfresh.feature_extraction"] = fe
    sys.modules["tsfresh.feature_extraction.feature_calculators"] = ref
    sd = importlib.util.spec_from_file_location(
        "tsfresh.feature_extraction.data",
        f"{REF_ROOT}/tsfresh/feature_extraction/data.py",
    )
    data_mod = importlib.util.module_from_spec(sd)
    sd.loader.exec_module(data_mod)
    sys.modules["tsfresh.feature_extraction.data"] = data_mod
    s0 = importlib.util.spec_from_file_location(
        "tsfresh.utilities.distribution",
        f"{REF_ROOT}/tsfresh/utilities/distribution.py",
    )
    dist = importlib.util.module_from_spec(s0)
    s0.loader.exec_module(dist)
    sys.modules["tsfresh.utilities.distribution"] = dist
    s1 = importlib.util.spec_from_file_location(
        "tsfresh.utilities.dataframe_functions",
        f"{REF_ROOT}/tsfresh/utilities/dataframe_functions.py",
    )
    dfn = importlib.util.module_from_spec(s1)
    s1.loader.exec_module(dfn)
    return dfn


@pytest.mark.parametrize("max_ts,min_ts", [(2, 1), (3, 0), (None, 2)])
def test_roll_time_series_matches_reference(spark, ref_dfn, max_ts, min_ts):
    """operators/rolling.roll_time_series produces the same (window, time,
    value) membership as the reference's pandas roller (rolling_direction=1),
    window identity mapped (orig, shift) ⇔ reference tuple-id."""
    from tsfresh_spark.operators.rolling import roll_time_series

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "id": np.repeat([1, 2, 3], 7),
            "time": np.tile(np.arange(7), 3),
            "value": rng.randint(0, 100, 21).astype(float),
        }
    )
    want = ref_dfn.roll_time_series(
        pdf, column_id="id", column_sort="time",
        max_timeshift=max_ts, min_timeshift=min_ts,
        rolling_direction=1, disable_progressbar=True, n_jobs=0,
    )
    want_set = {
        (int(r["id"][0]), int(r["id"][1]), int(r["time"]), float(r["value"]))
        for _, r in want.iterrows()
    }
    got = roll_time_series(
        spark.createDataFrame(pdf),
        column_id="id", column_sort="time", column_value="value",
        max_timeshift=max_ts, min_timeshift=min_ts,
    ).toPandas()
    got_set = {
        (int(r["id"]["orig"]), int(r["id"]["shift"]), int(r["time"]), float(r["value"]))
        for _, r in got.iterrows()
    }
    assert got_set == want_set


if _HAVE_HYPOTHESIS:

    @st.composite
    def _roll_case(draw):
        """Irregular multi-series frames + shift bounds + direction, the
        combinations the fixed roll crosscheck doesn't enumerate."""
        n_groups = draw(st.integers(1, 3))
        frames = []
        for gid in range(1, n_groups + 1):
            n = draw(st.integers(1, 8))
            # strictly increasing but gappy times
            gaps = draw(st.lists(st.integers(1, 3), min_size=n, max_size=n))
            times = np.cumsum(gaps)
            vals = draw(st.lists(st.integers(0, 99), min_size=n, max_size=n))
            frames.append(
                pd.DataFrame({"id": gid, "time": times, "value": np.asarray(vals, dtype=float)})
            )
        pdf = pd.concat(frames, ignore_index=True)
        # the reference raises an EAGER ValueError on frames with <= 1
        # total rows — a row-count action has no place in a lazy Spark
        # plan, so our operator simply emits the (empty/degenerate)
        # windows; scope the fuzz to the common domain
        if len(pdf) < 2:
            pdf = pd.concat([pdf, pdf.assign(time=pdf.time + 1)], ignore_index=True)
        max_ts = draw(st.sampled_from([None, 1, 2, 4]))
        min_ts = draw(st.integers(0, 2))
        direction = draw(st.sampled_from([1, -1]))
        return pdf, max_ts, min_ts, direction

    @given(case=_roll_case())
    @hsettings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_roll_time_series_matches_reference(spark, ref_dfn, case):
        from tsfresh_spark.operators.rolling import roll_time_series

        pdf, max_ts, min_ts, direction = case
        want = ref_dfn.roll_time_series(
            pdf.copy(), column_id="id", column_sort="time",
            max_timeshift=max_ts, min_timeshift=min_ts,
            rolling_direction=direction, disable_progressbar=True, n_jobs=0,
        )
        want_set = {
            (int(r["id"][0]), int(r["id"][1]), int(r["time"]), float(r["value"]))
            for _, r in want.iterrows()
        }
        got = roll_time_series(
            spark.createDataFrame(pdf),
            column_id="id", column_sort="time", column_value="value",
            max_timeshift=max_ts, min_timeshift=min_ts,
            rolling_direction=direction,
        ).toPandas()
        got_set = {
            (int(r["id"]["orig"]), int(r["id"]["shift"]), int(r["time"]), float(r["value"]))
            for _, r in got.iterrows()
        }
        assert got_set == want_set, (max_ts, min_ts, direction, pdf.to_dict("list"))


@pytest.mark.parametrize("max_ts,min_ts", [(3, 1), (2, 0), (None, 2)])
def test_make_forecasting_frame_matches_reference(spark, ref_dfn, max_ts, min_ts):
    """Window membership and target pairing equal the reference's
    make_forecasting_frame (single series; the reference's mask drops the
    predicted row from each window, y = the value at the window's end
    time — exactly our strictly-earlier X / y-at-shift contract)."""
    from tsfresh_spark.operators.rolling import make_forecasting_frame

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 50, 9).astype(float)
    want_X, want_y = ref_dfn.make_forecasting_frame(
        pd.Series(vals, index=range(9)), kind="v",
        max_timeshift=max_ts, rolling_direction=1, min_timeshift=min_ts,
    )
    want_rows = {
        (int(r["id"][1]), int(r["time"]), float(r["value"]))
        for _, r in want_X.iterrows()
    }
    # reference y is positionally aligned with the masked windows: window
    # ending at w predicts the value AT w
    kept_w = sorted({int(r["id"][1]) for _, r in want_X.iterrows()})
    want_targets = {w: float(vals[w]) for w in kept_w}

    pdf = pd.DataFrame({"id": 1, "t": range(9), "value": vals})
    X, y = make_forecasting_frame(
        spark.createDataFrame(pdf), column_id="id", column_sort="t",
        max_timeshift=max_ts, min_timeshift=min_ts,
    )
    Xp, yp = X.toPandas(), y.toPandas()
    got_rows = {
        (int(r["id"]["shift"]), int(r["t"]), float(r["value"]))
        for _, r in Xp.iterrows()
    }
    got_targets = {
        int(r["id"]["shift"]): float(r["y"]) for _, r in yp.iterrows()
    }
    assert got_rows == want_rows
    assert got_targets == want_targets


@pytest.fixture(scope="module")
def ref_extraction(ref):
    """The reference's extraction.py loaded standalone: its
    _do_extraction_on_chunk is the per-series dispatch + naming engine —
    executing it against compute_series_features checks the FULL
    chunk-level contract (dispatch, parameter naming grammar, values)."""
    _stub("tsfresh.defaults", CHUNKSIZE=None, N_PROCESSES=1, PROFILING=False,
          PROFILING_FILENAME="x", PROFILING_SORTING="cumulative",
          DISABLE_PROGRESSBAR=True, IMPUTE_FUNCTION=None, SHOW_WARNINGS=False,
          PARALLELISATION=None)
    sub = types.ModuleType("tsfresh.feature_extraction")
    sub.__path__ = [f"{REF_ROOT}/tsfresh/feature_extraction"]
    sys.modules["tsfresh.feature_extraction"] = sub
    sys.modules["tsfresh.feature_extraction.feature_calculators"] = ref
    _stub("tsfresh.feature_extraction.data", to_tsdata=None)
    _stub("tsfresh.feature_extraction.settings", ComprehensiveFCParameters=None)
    _stub("tsfresh.utilities.profiling", end_profiling=None, start_profiling=None)
    _stub("tsfresh.utilities.distribution", ApplyDistributor=None,
          DistributorBaseClass=None, MapDistributor=None,
          MultiprocessingDistributor=None)
    spec = importlib.util.spec_from_file_location(
        "ref_extraction_mod",
        f"{REF_ROOT}/tsfresh/feature_extraction/extraction.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if _HAVE_HYPOTHESIS:

    @given(x=_fuzz_series(min_size=1))
    @hsettings(
        max_examples=30,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_chunk_extraction_matches_reference(ref, ref_extraction, x):
        """END-TO-END chunk contract: compute_series_features (our per-series
        engine behind both physical extraction strategies) against the
        reference's own _do_extraction_on_chunk — same dispatch, same
        feature-name grammar, same values — over a mixed settings dict
        (parameterless + parameterized + combiner kernels)."""
        from tsfresh_spark.extract import compute_series_features

        fc = {
            "mean": None,
            "length": None,
            "quantile": [{"q": 0.1}, {"q": 0.9}],
            "autocorrelation": [{"lag": 1}, {"lag": 2}],
            "number_peaks": [{"n": 1}],
            "index_mass_quantile": [{"q": 0.5}],
            "symmetry_looking": [{"r": 0.25}],
            "agg_autocorrelation": [{"f_agg": "mean", "maxlag": 5}],
            "fft_coefficient": [
                {"coeff": k, "attr": a} for k in (0, 1) for a in ("real", "abs")
            ],
            "friedrich_coefficients": [
                {"m": 3, "r": 5, "coeff": c} for c in range(2)
            ],
        }
        if "acf(" in inspect.getsource(ref.agg_autocorrelation):
            fc.pop("agg_autocorrelation")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = {
                name: val
                for _, name, val in ref_extraction._do_extraction_on_chunk(
                    (7, "k", pd.Series(x.copy())), fc, None, show_warnings=False
                )
            }
            got = dict(compute_series_features(x.copy(), "k", fc))
        assert set(got) == set(want), (set(got) ^ set(want), x[:8])
        for name in want:
            assert _eqv(got[name], want[name]), (name, x[:8], got[name], want[name])


@pytest.mark.parametrize("sub_length", [2, 3])
def test_add_sub_time_series_index_matches_reference(spark, ref_dfn, sub_length):
    """Chunk assignment equals the reference's on pre-sorted input (the
    reference assigns chunks in the frame's INPUT row order before
    sorting — an ordering concept Spark frames don't have, so our
    operator is defined on the sorted order; sorted input is the common,
    well-defined domain)."""
    from tsfresh_spark.operators.rolling import add_sub_time_series_index

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame(
        {
            "mid": np.repeat([1, 2], [7, 5]),
            "t": np.concatenate([np.arange(7), np.arange(5)]),
            "value": rng.randint(0, 9, 12).astype(float),
        }
    )
    want = ref_dfn.add_sub_time_series_index(
        pdf.copy(), sub_length, column_id="mid", column_sort="t"
    )
    want_set = {
        (int(r["id"][1]), int(r["t"]), int(r["id"][0])) for _, r in want.iterrows()
    }
    got = add_sub_time_series_index(
        spark.createDataFrame(pdf), sub_length, column_id="mid", column_sort="t"
    ).toPandas()
    got_set = {
        (int(r["id"]["orig"]), int(r["t"]), int(r["id"]["chunk"]))
        for _, r in got.iterrows()
    }
    assert got_set == want_set


def test_impute_range_matches_reference(spark, ref_dfn):
    """Spark impute_dataframe_range == the reference's pandas version on a
    NaN/±inf-bearing matrix with explicit replacement dicts."""
    from tsfresh_spark.operators.impute import impute_dataframe_range

    nan, inf = float("nan"), float("inf")
    pdf = pd.DataFrame(
        {
            "a": [1.0, nan, inf, -inf, 5.0],
            "b": [nan, 2.0, 3.0, inf, -inf],
        }
    )
    col_to_max = {"a": 100.0, "b": 200.0}
    col_to_min = {"a": -100.0, "b": -200.0}
    col_to_median = {"a": 7.0, "b": 8.0}
    want = ref_dfn.impute_dataframe_range(
        pdf.copy(), col_to_max, col_to_min, col_to_median
    )
    ranges = {
        c: (col_to_min[c], col_to_max[c], col_to_median[c]) for c in ("a", "b")
    }
    got = (
        impute_dataframe_range(spark.createDataFrame(pdf), ranges)
        .toPandas()
        .reset_index(drop=True)
    )
    for c in ("a", "b"):
        assert np.allclose(got[c].values, want[c].values)


if _HAVE_HYPOTHESIS:

    @st.composite
    def _impute_case(draw):
        n = draw(st.integers(1, 10))
        nan, inf = float("nan"), float("inf")
        elem = st.one_of(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False,
                      allow_subnormal=False),
            st.just(nan), st.just(inf), st.just(-inf),
        )
        cols = {}
        repl = {}
        for c in ("a", "b"):
            cols[c] = draw(st.lists(elem, min_size=n, max_size=n))
            bounds = st.floats(-50, 50, allow_nan=False, allow_infinity=False,
                               allow_subnormal=False)
            repl[c] = (draw(bounds), draw(bounds), draw(bounds))
        return pd.DataFrame(cols), repl

    @given(case=_impute_case())
    @hsettings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_impute_range_matches_reference(spark, ref_dfn, case):
        """Arbitrary NaN/±inf mixes and arbitrary (min, max, median)
        replacement triples — including min > max and negative medians —
        against the reference's pandas impute."""
        from tsfresh_spark.operators.impute import impute_dataframe_range

        pdf, repl = case
        col_to_min = {c: repl[c][0] for c in repl}
        col_to_max = {c: repl[c][1] for c in repl}
        col_to_median = {c: repl[c][2] for c in repl}
        want = ref_dfn.impute_dataframe_range(
            pdf.copy(), col_to_max, col_to_min, col_to_median
        )
        ranges = {c: (col_to_min[c], col_to_max[c], col_to_median[c]) for c in repl}
        got = (
            impute_dataframe_range(spark.createDataFrame(pdf), ranges)
            .toPandas()
            .reset_index(drop=True)
        )
        for c in repl:
            g, w = got[c].values, want[c].values
            assert np.array_equal(g, w) or np.allclose(g, w, equal_nan=True), (
                c, pdf[c].tolist(), repl[c], g, w
            )
