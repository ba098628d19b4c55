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
    "friedrich_coefficients", "max_langevin_fixed_point",
}


def _stub(name, **attrs):
    m = types.ModuleType(name)
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
