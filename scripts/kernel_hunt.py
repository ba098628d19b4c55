#!/usr/bin/env python
"""Randomized long-series kernel hunt against the reference.

Extends the in-suite Hypothesis crosscheck (tests/test_reference_crosscheck.py,
series length <= 40, derandomized) with a fresh-entropy hunt over series up to
length 600 — the regime where tie-handling paths (ridge lines, argsort
stability), quantile-edge collisions (the ADVICE salt concern), and
accumulation-order drift would live if they existed.  Every kernel whose
reference implementation runs without scipy/statsmodels/pywt is executed
side-by-side: parameterless simples, parameterized simples over the full
comprehensive grid, and combiners.  Same comparator as the suite (1e-9
relative, NaN<=>NaN, matching exception classes).

Usage:  python scripts/kernel_hunt.py [n_examples] [seed] [max_len] [extreme]
        extreme=1 widens float magnitudes to 10^[-150, 300) — exercises
        the overflow/underflow paths (inf<=>inf, nan<=>nan must match)
Prints one line per distinct (kernel, param-key) failure, then a summary.
Exit code 1 on any failure.
"""

from __future__ import annotations

import importlib.util
import inspect
import os
import sys
import time
import types
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from tests.test_reference_crosscheck import DEP_GATED, REF_ROOT, _eqv, _stub


def load_reference():
    """Standalone load of the reference feature_calculators with absent
    heavy deps stubbed — same recipe as the test fixture."""

    class _Err(Exception):
        pass

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
    return mod


def random_series(
    rng: np.random.RandomState, max_len: int = 600, extreme: bool = False
) -> np.ndarray:
    """Adversarial series: mixed length regimes (short/mid/long up to
    ``max_len``), float/int/tied/NaN-bearing/blocky value kinds."""
    r = rng.rand()
    if r < 0.3:
        n = rng.randint(1, 41)
    elif r < 0.7:
        n = rng.randint(41, min(201, max_len + 1))
    else:
        n = rng.randint(min(201, max_len), max_len + 1)
    kind = rng.randint(5)
    if kind == 0:
        # extreme caps at 10^154: x**2 sums overflow to inf from ~1e154
        # (variance) and x**4 from ~1e77 (kurtosis) — the inf paths we
        # want — while staying clear of LAPACK misbehavior (see
        # _LSTSQ_KERNELS below for the remaining guard)
        expo = rng.randint(-100, 155) if extreme else rng.randint(-2, 4)
        x = rng.randn(n) * 10.0 ** expo
    elif kind == 1:
        x = rng.randint(-50, 51, size=n).astype(float)
    elif kind == 2:  # heavy ties
        x = rng.choice([0.0, 1.0, 1.0, 2.0], size=n)
    elif kind == 3:  # NaN-bearing float
        x = rng.randn(n) * 10
        x[rng.rand(n) < 0.1] = np.nan
    else:  # constant blocks (runs, duplicate quantile edges)
        n_blocks = max(1, n // max(1, rng.randint(2, 20)))
        vals = rng.randint(-5, 6, size=n_blocks).astype(float)
        x = np.repeat(vals, int(np.ceil(n / n_blocks)))[:n]
    return x


def main() -> None:
    n_examples = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    max_len = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    extreme = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False

    ref = load_reference()
    from tsfresh_spark.kernels import KERNELS
    from tsfresh_spark.settings import comprehensive_settings

    dep = set(DEP_GATED)
    if "acf(" in inspect.getsource(ref.agg_autocorrelation):
        dep.add("agg_autocorrelation")
    grids = comprehensive_settings()

    plan = []  # (name, info, rf, params-or-None)
    for name, info in sorted(KERNELS.items()):
        if name in dep or not info.available:
            continue
        rf = getattr(ref, name, None)
        if rf is None:
            continue
        params = grids.get(name)
        if info.fctype == "simple" and params is None:
            if len(inspect.signature(info.func).parameters) != 1:
                continue
        plan.append((name, info, rf, params))

    # lstsq/polyfit-backed kernels: LAPACK's DGELSD hangs (DLASCL illegal
    # value, observed looping for minutes) when the design-column scale
    # spread is astronomical — e.g. friedrich's x**3 column at |x|~1e-91
    # is ~1e-273 against the constant column 1.  The REFERENCE makes the
    # identical np.polyfit/np.linalg.lstsq call, so this is an
    # environment pathology, not a semantics divergence; skip these
    # kernels when |x| leaves [1e-30, 1e30] and keep the moment/energy
    # kernels' inf/underflow coverage.
    _LSTSQ_KERNELS = {
        "friedrich_coefficients",
        "max_langevin_fixed_point",
        "ar_coefficient",
    }

    rng = np.random.RandomState(seed)
    fails: list[tuple] = []
    checked = 0
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for i in range(n_examples):
            x = random_series(rng, max_len, extreme)
            with np.errstate(all="ignore"):
                mag = float(np.nanmax(np.abs(x))) if len(x) else 0.0
            wild = not (1e-30 <= mag <= 1e30) and mag == mag and mag > 0
            for name, info, rf, params in plan:
                if wild and name in _LSTSQ_KERNELS:
                    continue
                arr = x.copy()
                xin = pd.Series(arr) if info.input == "series" else arr
                if info.fctype == "combiner":
                    try:
                        mine = dict(info.func(xin, param=params))
                    except Exception as ex:
                        mine = {"RAISE": type(ex).__name__}
                    try:
                        theirs = dict(rf(x.copy(), param=params))
                    except Exception as ex:
                        theirs = {"RAISE": type(ex).__name__}
                    for key in theirs:
                        checked += 1
                        if key not in mine or not _eqv(mine.get(key), theirs[key]):
                            fails.append((name, key, len(x), mine.get(key), theirs[key]))
                elif params:
                    for p in params:
                        checked += 1
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
                        if not ok:
                            fails.append((name, str(p), len(x), mine, theirs))
                else:
                    checked += 1
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
                    if not ok:
                        fails.append((name, "", len(x), mine, theirs))
            if (i + 1) % 50 == 0:
                print(
                    f"  {i + 1}/{n_examples} examples, {checked} comparisons, "
                    f"{len(fails)} failures, {time.perf_counter() - t0:.0f} s",
                    flush=True,
                )

    distinct = {}
    for name, key, n, mine, theirs in fails:
        distinct.setdefault((name, key), (n, mine, theirs))
    for (name, key), (n, mine, theirs) in sorted(distinct.items()):
        print(f"FAIL {name} {key} n={n}: mine={mine!r} theirs={theirs!r}")
    print(
        f"hunt: {n_examples} examples (seed {seed}, max_len {max_len}, "
        f"extreme {int(extreme)}), {len(plan)} kernels, "
        f"{checked} comparisons, {len(distinct)} distinct failures "
        f"({len(fails)} raw) in {time.perf_counter() - t0:.0f} s"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
