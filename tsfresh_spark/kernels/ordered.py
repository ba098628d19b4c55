"""Ordered / positional kernels — need the observation order within a series.

Semantics match the same-named calculators in
/root/reference/tsfresh/feature_extraction/feature_calculators.py (line refs
per kernel).  A SQL fast path for several of these exists in
tsfresh_spark.functions.sql_features via higher-order array functions.
"""

from __future__ import annotations

import numpy as np

from tsfresh_spark.kernels.helpers import run_lengths_where
from tsfresh_spark.kernels.registry import kernel


@kernel("mean_abs_change", "simple")
def mean_abs_change(x):
    """Mean |first difference| (feature_calculators.py:604-620)."""
    return np.mean(np.abs(np.diff(x)))


@kernel("mean_change", "simple")
def mean_change(x):
    """(x_n - x_1) / (n - 1); NaN for n<2 (feature_calculators.py:624-640)."""
    x = np.asarray(x)
    return (x[-1] - x[0]) / (len(x) - 1) if len(x) > 1 else np.nan


@kernel("mean_second_derivative_central", "simple")
def mean_second_derivative_central(x):
    """Telescoped central second derivative mean (feature_calculators.py:644-658)."""
    x = np.asarray(x)
    return (x[-1] - x[-2] - x[1] + x[0]) / (2 * (len(x) - 2)) if len(x) > 2 else np.nan


@kernel("absolute_sum_of_changes", "simple")
def absolute_sum_of_changes(x):
    """Sum of |first differences| (feature_calculators.py:796-809)."""
    return np.sum(np.abs(np.diff(x)))


@kernel("cid_ce", "simple")
def cid_ce(x, normalize):
    """sqrt(sum(diff^2)), optionally on the z-normalized series
    (feature_calculators.py:567-600)."""
    x = np.asarray(x)
    if normalize:
        s = np.std(x)
        if s == 0:
            return 0.0
        x = (x - np.mean(x)) / s
    d = np.diff(x)
    return np.sqrt(np.dot(d, d))


@kernel("number_crossing_m", "simple")
def number_crossing_m(x, m):
    """Sign changes of the indicator x > m (feature_calculators.py:1980-1998)."""
    x = np.asarray(x)
    return int(np.count_nonzero(np.diff(x > m)))


@kernel("number_peaks", "simple")
def number_peaks(x, n):
    """Peaks with support n: strictly greater than all n neighbours on both
    sides (feature_calculators.py:1235-1271).

    The reference's ``roll(x, ±i)[n:-n]`` never wraps for ``i ≤ n`` when the
    core is non-empty, so each comparison operand is the plain slice
    ``x[n∓i : len(x)-n∓i]`` — identical values without the reference's
    per-shift concatenate copies; an empty core (``len(x) ≤ 2n``) sums to 0
    without running the 2n-shift loop (A/B vs the roll form in
    tests/test_kernels.py, plus the randomized reference hunt)."""
    x = np.asarray(x)
    m = len(x)
    if m <= 2 * n:
        return 0
    core = x[n:-n]
    res = np.ones(core.shape, dtype=bool)
    for i in range(1, n + 1):
        res &= core > x[n - i : m - n - i]
        res &= core > x[n + i : m - n + i]
    return int(np.sum(res))


@kernel("longest_strike_above_mean", "simple")
def longest_strike_above_mean(x):
    """Longest run of x > mean (feature_calculators.py:828-839)."""
    x = np.asarray(x)
    return int(np.max(run_lengths_where(x > np.mean(x)))) if x.size else 0


@kernel("longest_strike_below_mean", "simple")
def longest_strike_below_mean(x):
    """Longest run of x < mean (feature_calculators.py:813-824)."""
    x = np.asarray(x)
    return int(np.max(run_lengths_where(x < np.mean(x)))) if x.size else 0


@kernel("first_location_of_maximum", "simple")
def first_location_of_maximum(x):
    """argmax / n (feature_calculators.py:886-898)."""
    x = np.asarray(x)
    return np.argmax(x) / len(x) if len(x) else np.nan


@kernel("last_location_of_maximum", "simple")
def last_location_of_maximum(x):
    """1 - argmax(reversed) / n (feature_calculators.py:871-882)."""
    x = np.asarray(x)
    return 1.0 - np.argmax(x[::-1]) / len(x) if len(x) else np.nan


@kernel("first_location_of_minimum", "simple")
def first_location_of_minimum(x):
    """argmin / n (feature_calculators.py:917-929)."""
    x = np.asarray(x)
    return np.argmin(x) / len(x) if len(x) else np.nan


@kernel("last_location_of_minimum", "simple")
def last_location_of_minimum(x):
    """1 - argmin(reversed) / n (feature_calculators.py:902-913)."""
    x = np.asarray(x)
    return 1.0 - np.argmin(x[::-1]) / len(x) if len(x) else np.nan


@kernel("time_reversal_asymmetry_statistic", "simple")
def time_reversal_asymmetry_statistic(x, lag):
    """E[L²(X)²·L(X) − L(X)·X²] over the valid prefix; 0 when 2·lag ≥ n
    (feature_calculators.py:1557-1596)."""
    x = np.asarray(x)
    n = len(x)
    if 2 * lag >= n:
        return 0.0
    # roll(x, -k)[: n-2·lag] never wraps for k ≤ 2·lag — plain slices, same
    # operand values and multiply order as the rolled form (A/B-tested)
    two = x[2 * lag :]
    one = x[lag : n - lag]
    head = x[: n - 2 * lag]
    return np.mean(two * two * one - one * head * head)


@kernel("c3", "simple")
def c3(x, lag):
    """E[L²(X)·L(X)·X] over the valid prefix; 0 when 2·lag ≥ n
    (feature_calculators.py:1600-1639)."""
    x = np.asarray(x)
    n = x.size
    if 2 * lag >= n:
        return 0.0
    # same slice identity as time_reversal_asymmetry_statistic above
    return np.mean(x[2 * lag :] * x[lag : n - lag] * x[: n - 2 * lag])


@kernel("autocorrelation", "simple")
def autocorrelation(x, lag):
    """ACF at one lag with the (n-lag)-denominator / global-variance
    normalization (feature_calculators.py:1919-1959).  Deliberately NOT
    Spark's F.corr (different estimator)."""
    x = np.asarray(x)
    if len(x) < lag:
        return np.nan
    y1 = x[: len(x) - lag]
    y2 = x[lag:]
    x_mean = np.mean(x)
    sum_product = np.sum((y1 - x_mean) * (y2 - x_mean))
    v = np.var(x)
    if np.isclose(v, 0):
        return np.nan
    return sum_product / ((len(x) - lag) * v)


@kernel("mean_n_absolute_max", "simple")
def mean_n_absolute_max(x, number_of_maxima):
    """Mean of the n largest |x|; NaN when n >= len(x)
    (feature_calculators.py:1643-1662)."""
    if number_of_maxima <= 0:
        raise ValueError("number_of_maxima must be positive")
    if len(x) <= number_of_maxima:
        return np.nan
    top = np.sort(np.absolute(x))[-number_of_maxima:]
    return np.mean(top)


@kernel("index_mass_quantile", "combiner")
def index_mass_quantile(x, param):
    """Relative index where q of the |x| mass lies to the left
    (feature_calculators.py:1275-1304)."""
    x = np.asarray(x)
    abs_x = np.abs(x)
    s = np.sum(abs_x)
    if s == 0:
        return [(f"q_{cfg['q']}", np.nan) for cfg in param]
    mass = np.cumsum(abs_x) / s
    return [
        (f"q_{cfg['q']}", (np.argmax(mass >= cfg["q"]) + 1) / len(x)) for cfg in param
    ]


@kernel("change_quantiles", "simple")
def change_quantiles(x, ql, qh, isabs, f_agg):
    """Aggregate of consecutive changes inside the [ql, qh]-quantile corridor
    (feature_calculators.py:1511-1553).  Corridor membership replicates
    pd.qcut(x, [ql, qh], labels=False): both edges inclusive (include_lowest),
    duplicate edges → 0.0; only changes that start AND end inside count."""
    if ql >= qh:
        return 0.0
    x = np.asarray(x)
    if len(x) < 2:
        return 0.0
    # pd.qcut's corridor edges come from Series.quantile, which IGNORES
    # NaN (np.quantile would propagate it and empty the corridor — found
    # by the hypothesis crosscheck on a NaN-bearing series); NaN elements
    # themselves fall outside the corridor (NaN comparisons are False),
    # matching qcut's NaN bin
    finite = x[~np.isnan(x)]
    if finite.size == 0:
        return 0.0  # qcut on all-NaN raises → reference returns 0
    lo = np.quantile(finite, ql)
    hi = np.quantile(finite, qh)
    if lo == hi:
        return 0.0  # pd.qcut raises on non-unique bin edges → reference returns 0
    inside = (x >= lo) & (x <= hi)
    div = np.diff(x)
    if isabs:
        div = np.abs(div)
    # (inside & roll(inside, 1))[1:] never consults the wrapped element —
    # it is exactly inside[1:] & inside[:-1]
    ind = inside[1:] & inside[:-1]
    if np.sum(ind) == 0:
        return 0.0
    agg = getattr(np, f_agg)
    return agg(div[np.where(ind)])


def change_quantiles_batch(x, param_list):
    """Batched evaluator for a change_quantiles parameter grid: shares the
    diff arrays, quantiles, and corridor selections across the (ql, qh,
    isabs, f_agg) combinations — same per-parameter values as calling
    :func:`change_quantiles` 60 times, ~6x cheaper.  Used by the extraction
    engine; the scalar kernel remains the semantic reference."""
    from tsfresh_spark.naming import cached_param_names

    names = cached_param_names(param_list)
    x = np.asarray(x)
    out = []
    if len(x) < 2:
        return [(name, 0.0) for name in names]
    div = np.diff(x)
    abs_div = np.abs(div)
    # one vectorized quantile call for every distinct q in the grid —
    # per-q values identical to individual np.quantile calls
    uq = sorted(
        {p["ql"] for p in param_list if p["ql"] < p["qh"]}
        | {p["qh"] for p in param_list if p["ql"] < p["qh"]}
    )
    # NaN-ignoring quantiles, like the scalar kernel (pandas semantics)
    finite = x[~np.isnan(x)]
    if finite.size == 0:
        return [(name, 0.0) for name in names]
    qcache: dict = dict(zip(uq, np.quantile(finite, uq))) if uq else {}
    # corridor mask depends on (ql, qh) only — cache it one level above the
    # (ql, qh, isabs) selections so the two isabs variants share one mask
    corridors: dict = {}
    selections: dict = {}
    # np.mean / np.var stripped to their exact internal operation sequence
    # (umr_sum == np.add.reduce, same order ⇒ bit-identical — guarded by
    # test_batched_equivalence) without the per-call dispatch machinery,
    # which profiled at ~1/3 of this evaluator's cost
    _sum = np.add.reduce
    for p, name in zip(param_list, names):
        ql, qh, isabs, f_agg = p["ql"], p["qh"], p["isabs"], p["f_agg"]
        if ql >= qh:
            out.append((name, 0.0))
            continue
        key = (ql, qh, bool(isabs))
        if key not in selections:
            ckey = (ql, qh)
            if ckey not in corridors:
                lo, hi = qcache[ql], qcache[qh]
                if lo == hi:
                    corridors[ckey] = None
                else:
                    inside = (x >= lo) & (x <= hi)
                    ind = inside[1:] & inside[:-1]
                    corridors[ckey] = ind if ind.any() else None
            ind = corridors[ckey]
            selections[key] = (
                None if ind is None else (abs_div if isabs else div)[ind]
            )
        sel = selections[key]
        if sel is None:
            out.append((name, 0.0))
            continue
        m = _sum(sel) / sel.size
        if f_agg == "mean":
            out.append((name, float(m)))
        elif f_agg == "var":
            d = sel - m
            out.append((name, float(_sum(d * d) / sel.size)))
        else:
            out.append((name, float(getattr(np, f_agg)(sel))))
    return out


@kernel("energy_ratio_by_chunks", "combiner")
def energy_ratio_by_chunks(x, param):
    """Energy of chunk i over total energy, np.array_split remainder rule
    (feature_calculators.py:2226-2268).  Only the focus chunk's boundaries
    are computed (np.array_split's divmod sizing rule, including negative
    list indexing) instead of materializing every chunk per config; the
    squared array for the numerators is shared across the grid — slice
    values, op order and sums are identical (A/B in test_kernels.py)."""
    x = np.asarray(x)
    n = len(x)
    full_energy = np.sum(x**2)
    xsq = None
    out = []
    for cfg in param:
        num_segments = cfg["num_segments"]
        segment_focus = cfg["segment_focus"]
        name = f"num_segments_{num_segments}__segment_focus_{segment_focus}"
        if full_energy == 0:
            out.append((name, np.nan))
        else:
            j = segment_focus if segment_focus >= 0 else segment_focus + num_segments
            if not 0 <= j < num_segments:
                raise IndexError("list index out of range")
            neach, extras = divmod(n, num_segments)
            if j < extras:
                start = j * (neach + 1)
                end = start + neach + 1
            else:
                start = extras * (neach + 1) + (j - extras) * neach
                end = start + neach
            if xsq is None:
                xsq = x**2.0
            out.append((name, np.sum(xsq[start:end]) / full_energy))
    return out
