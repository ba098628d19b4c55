"""Distribution / unordered statistics kernels.

Each kernel reproduces the semantics of the same-named calculator in the
reference (/root/reference/tsfresh/feature_extraction/feature_calculators.py;
line references per kernel).  All are pure numpy over one series; they are
evaluated inside Arrow-batched pandas UDFs, and the SQL fast path for the
class-A subset lives in tsfresh_spark.functions.sql_features.
"""

from __future__ import annotations

import numpy as np

from tsfresh_spark.kernels.registry import kernel

# ---------------------------------------------------------------- minimal set


@kernel("sum_values", "simple", minimal=True)
def sum_values(x):
    """Sum of values; 0 for an empty series (feature_calculators.py:371-383)."""
    return np.sum(x) if len(x) else 0


@kernel("mean", "simple", minimal=True)
def mean(x):
    """Arithmetic mean (feature_calculators.py:677-686)."""
    return np.mean(x)


@kernel("median", "simple", minimal=True)
def median(x):
    """np.median — linear interpolation for even n (feature_calculators.py:663-672)."""
    return np.median(x)


@kernel("length", "simple", minimal=True)
def length(x):
    """Series length (feature_calculators.py:691-700)."""
    return len(x)


@kernel("minimum", "simple", minimal=True)
def minimum(x):
    """np.min (feature_calculators.py:2031-2040)."""
    return np.min(x)


@kernel("maximum", "simple", minimal=True)
def maximum(x):
    """np.max (feature_calculators.py:2003-2012)."""
    return np.max(x)


@kernel("absolute_maximum", "simple", minimal=True)
def absolute_maximum(x):
    """max(|x|); NaN for empty (feature_calculators.py:2017-2026)."""
    return np.max(np.absolute(x)) if len(x) else np.nan


@kernel("standard_deviation", "simple", minimal=True)
def standard_deviation(x):
    """Population std, ddof=0 (feature_calculators.py:705-714)."""
    return np.std(x)


@kernel("variance", "simple", minimal=True)
def variance(x):
    """Population variance, ddof=0 (feature_calculators.py:735-744)."""
    return np.var(x)


@kernel("root_mean_square", "simple", minimal=True)
def root_mean_square(x):
    """sqrt(mean(x^2)); NaN for empty (feature_calculators.py:783-792)."""
    return np.sqrt(np.mean(np.square(x))) if len(x) else np.nan


# ----------------------------------------------------------- other simple stats


@kernel("abs_energy", "simple")
def abs_energy(x):
    """Dot product x·x (feature_calculators.py:548-563)."""
    x = np.asarray(x)
    return np.dot(x, x)


@kernel("variation_coefficient", "simple")
def variation_coefficient(x):
    """std/mean; NaN when the mean is zero (feature_calculators.py:718-730)."""
    avg = np.mean(x)
    if avg == 0:
        return np.nan
    return np.std(x) / avg


@kernel("variance_larger_than_standard_deviation", "simple")
def variance_larger_than_standard_deviation(x):
    """var > sqrt(var), i.e. var > 1 (feature_calculators.py:239-252)."""
    v = np.var(x)
    return v > np.sqrt(v)


@kernel("skewness", "simple", input="series")
def skewness(x):
    """Adjusted Fisher-Pearson G1 — pandas sample skew with skipna=False
    (feature_calculators.py:749-761).  Closed-form replica of the pandas
    nanskew estimator: n*sqrt(n-1)/(n-2) * m3/m2^1.5 on raw centered-moment
    sums, with the same float-error zeroing and n<3 → NaN rule."""
    v = np.asarray(x, dtype=float)
    n = len(v)
    if n < 3:
        return np.nan
    if np.isnan(v).any():
        return np.nan
    d = v - v.mean()
    m2 = np.sum(d**2)
    m3 = np.sum(d**3)
    m2 = 0.0 if abs(m2) < 1e-14 else m2
    m3 = 0.0 if abs(m3) < 1e-14 else m3
    if m2 == 0:
        return 0.0
    return (n * (n - 1) ** 0.5 / (n - 2)) * (m3 / m2**1.5)


@kernel("kurtosis", "simple", input="series")
def kurtosis(x):
    """Adjusted Fisher-Pearson G2 — pandas sample kurtosis
    (feature_calculators.py:766-778).  Replica of pandas nankurt with its
    default skipna=True (NaNs masked out, n = valid count):
    n(n+1)(n-1)·m4 / ((n-2)(n-3)·m2²) − 3(n-1)²/((n-2)(n-3)), n<4 → NaN.
    Note skewness deliberately differs: the reference passes skipna=False
    there (feature_calculators.py:761)."""
    v = np.asarray(x, dtype=float)
    v = v[~np.isnan(v)]
    n = len(v)
    if n < 4:
        return np.nan
    d = v - v.mean()
    m2 = np.sum(d**2)
    m4 = np.sum(d**4)
    adj = 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    numer = n * (n + 1) * (n - 1) * m4
    denom = (n - 2) * (n - 3) * m2**2
    numer = 0.0 if abs(numer) < 1e-14 else numer
    denom = 0.0 if abs(denom) < 1e-14 else denom
    if denom == 0:
        return 0.0
    return numer / denom - adj


@kernel("ratio_beyond_r_sigma", "simple")
def ratio_beyond_r_sigma(x, r):
    """Fraction of |x - mean| > r·std (feature_calculators.py:256-269)."""
    x = np.asarray(x)
    return np.sum(np.abs(x - np.mean(x)) > r * np.std(x)) / x.size


@kernel("large_standard_deviation", "simple")
def large_standard_deviation(x, r):
    """std > r·(max - min) (feature_calculators.py:273-295)."""
    x = np.asarray(x)
    return np.std(x) > (r * (np.max(x) - np.min(x)))


@kernel("symmetry_looking", "combiner")
def symmetry_looking(x, param):
    """|mean - median| < r·range per r (feature_calculators.py:299-321)."""
    x = np.asarray(x)
    gap = np.abs(np.mean(x) - np.median(x))
    rng = np.max(x) - np.min(x)
    return [(f"r_{cfg['r']}", gap < cfg["r"] * rng) for cfg in param]


@kernel("quantile", "simple")
def quantile(x, q):
    """np.quantile, linear interpolation; NaN empty (feature_calculators.py:1963-1976)."""
    if len(x) == 0:
        return np.nan
    return np.quantile(x, q)


@kernel("count_above", "simple")
def count_above(x, t):
    """Fraction of values >= t (feature_calculators.py:2309-2321)."""
    return np.sum(np.asarray(x) >= t) / len(x)


@kernel("count_below", "simple")
def count_below(x, t):
    """Fraction of values <= t (feature_calculators.py:2325-2337)."""
    return np.sum(np.asarray(x) <= t) / len(x)


@kernel("count_above_mean", "simple")
def count_above_mean(x):
    """Count of values strictly above the mean (feature_calculators.py:843-853)."""
    x = np.asarray(x)
    return int(np.count_nonzero(x > np.mean(x)))


@kernel("count_below_mean", "simple")
def count_below_mean(x):
    """Count of values strictly below the mean (feature_calculators.py:857-867)."""
    x = np.asarray(x)
    return int(np.count_nonzero(x < np.mean(x)))


@kernel("value_count", "simple")
def value_count(x, value):
    """Occurrences of an exact value; NaN-aware (feature_calculators.py:2044-2061)."""
    x = np.asarray(x)
    if np.isnan(value):
        return int(np.isnan(x).sum())
    return int(np.count_nonzero(x == value))


@kernel("range_count", "simple")
def range_count(x, min, max):  # noqa: A002 - parameter names fixed by the grammar
    """Count of values in [min, max) (feature_calculators.py:2065-2078)."""
    x = np.asarray(x)
    return int(np.sum((x >= min) & (x < max)))


@kernel("has_duplicate", "simple")
def has_duplicate(x):
    """Any value occurring at least twice (feature_calculators.py:355-366)."""
    x = np.asarray(x)
    return x.size != np.unique(x).size


@kernel("has_duplicate_max", "simple")
def has_duplicate_max(x):
    """Max occurring at least twice (feature_calculators.py:325-336)."""
    x = np.asarray(x)
    return np.sum(x == np.max(x)) >= 2


@kernel("has_duplicate_min", "simple")
def has_duplicate_min(x):
    """Min occurring at least twice (feature_calculators.py:340-351)."""
    x = np.asarray(x)
    return np.sum(x == np.min(x)) >= 2


@kernel("percentage_of_reoccurring_values_to_all_values", "simple")
def percentage_of_reoccurring_values_to_all_values(x):
    """#(distinct values with count>1) / #distinct (feature_calculators.py:933-956)."""
    if len(x) == 0:
        return np.nan
    _, counts = np.unique(x, return_counts=True)
    if counts.shape[0] == 0:
        return 0.0
    return np.sum(counts > 1) / float(counts.shape[0])


@kernel(
    "percentage_of_reoccurring_datapoints_to_all_datapoints", "simple", input="series"
)
def percentage_of_reoccurring_datapoints_to_all_datapoints(x):
    """#(points whose value reoccurs) / #points (feature_calculators.py:961-988).

    The reference counts via ``pd.Series.value_counts()``, which DROPS
    NaN — so two NaNs are not a reoccurring value (np.unique would
    collapse them to one value with count 2 since numpy 1.21; found by
    the hypothesis crosscheck on ``[nan, nan]``).  The divisor stays the
    FULL length including NaNs, as in the reference."""
    v = np.asarray(x)
    if len(v) == 0:
        return np.nan
    _, counts = np.unique(v[~np.isnan(v)], return_counts=True)
    reoccurring = counts[counts > 1].sum()
    return reoccurring / v.size


@kernel("sum_of_reoccurring_values", "simple")
def sum_of_reoccurring_values(x):
    """Sum of distinct values that occur more than once
    (feature_calculators.py:992-1016).  Uses the reference's exact masked
    formula ``sum(counts * unique)`` rather than a filtered sum: a NaN
    unique value then poisons the result (0·nan = nan), matching the
    reference bit-for-bit on NaN-bearing series."""
    uniq, counts = np.unique(x, return_counts=True)
    counts[counts < 2] = 0
    counts[counts > 1] = 1
    return np.sum(counts * uniq)


@kernel("sum_of_reoccurring_data_points", "simple")
def sum_of_reoccurring_data_points(x):
    """Sum of all points whose value occurs more than once
    (feature_calculators.py:1020-1041).  Same masked formula as the
    reference — NaN uniques propagate (see sum_of_reoccurring_values)."""
    uniq, counts = np.unique(x, return_counts=True)
    counts[counts < 2] = 0
    return np.sum(counts * uniq)


@kernel("ratio_value_number_to_time_series_length", "simple")
def ratio_value_number_to_time_series_length(x):
    """#distinct / #points; NaN empty (feature_calculators.py:1045-1063)."""
    x = np.asarray(x)
    if x.size == 0:
        return np.nan
    return np.unique(x).size / x.size


# ------------------------------------------------- grid-batched fast paths
# (value-identical to the per-parameter scalar kernels; picked up by the
# extraction engine's _BATCHED_SIMPLE table)


def quantile_batch(x, param_list):
    qs = [p["q"] for p in param_list]
    if len(x) == 0:
        vals = [np.nan] * len(qs)
    else:
        vals = np.quantile(x, qs)
    return [(f"q_{q}", v) for q, v in zip(qs, vals)]


def ratio_beyond_r_sigma_batch(x, param_list):
    x = np.asarray(x)
    dev = np.abs(x - np.mean(x))
    sigma = np.std(x)
    return [
        (f"r_{p['r']}", np.sum(dev > p["r"] * sigma) / x.size) for p in param_list
    ]


def large_standard_deviation_batch(x, param_list):
    x = np.asarray(x)
    std = np.std(x)
    rng = np.max(x) - np.min(x)
    return [(f"r_{p['r']}", std > p["r"] * rng) for p in param_list]


def autocorrelation_batch(x, param_list):
    x = np.asarray(x)
    n = len(x)
    x_mean = np.mean(x)
    v = np.var(x)
    centered = x - x_mean
    v_zero = bool(np.isclose(v, 0))  # hoisted: v is lag-independent
    out = []
    for p in param_list:
        lag = p["lag"]
        name = f"lag_{lag}"
        if n < lag or v_zero:
            out.append((name, np.nan))
            continue
        sum_product = np.sum(centered[: n - lag] * centered[lag:])
        out.append((name, sum_product / ((n - lag) * v)))
    return out


@kernel("benford_correlation", "simple")
def benford_correlation(x):
    """Correlation of the first-significant-digit distribution with the
    Newcomb-Benford law (feature_calculators.py:2341-2380).  The reference
    extracts the leading digit via scientific-notation string formatting of
    |nan_to_num(x)|; the first significant digit of a float equals
    floor(v / 10^floor(log10 v)), with v == 0 mapping to digit 0 — same
    mapping, vectorized."""
    v = np.abs(np.nan_to_num(np.asarray(x, dtype=float)))
    digits = np.zeros(len(v), dtype=np.int64)
    pos = v > 0
    if pos.any():
        vp = v[pos]
        exp = np.floor(np.log10(vp))
        # exact-scale quotient: 10**|exp| is an exact double for |exp|<=22,
        # so q is the correctly-rounded ratio and floor(q) lands on the
        # leading digit of the value's shortest decimal representation —
        # the reference's scientific-notation string — for every q in
        # [1, 10).  The boundary buckets (q < 1 or q >= 10, log10/product
        # rounding straddling a power of ten: e.g. np.log10(10000.0) =
        # 3.999…96, or 1e-11 whose exact binary value sits just below the
        # decimal it round-trips to) and extreme magnitudes (|exp| > 22,
        # 10**e no longer exact) defer to the reference's own string
        # formula per element — a blanket clip(…,1,9) here got exact
        # powers of ten WRONG (digit 9 instead of 1; found by the
        # hypothesis crosscheck on [10000.0]).
        e = np.clip(np.abs(exp), 0, 22)
        with np.errstate(over="ignore"):
            q = np.where(exp >= 0, vp / 10.0**e, vp * 10.0**e)
        lead = np.floor(q)
        slow = (lead < 1) | (lead >= 10) | (np.abs(exp) > 22)
        if slow.any():
            lead[slow] = [
                int(str(np.format_float_scientific(val))[:1])
                for val in vp[slow]
            ]
        digits[pos] = lead.astype(np.int64)
    benford = np.log10(1 + 1 / np.arange(1, 10))
    # one bincount pass == nine (digits == d).mean() passes: both
    # numerators are the exact integer count (a 0/1 float sum below 2^53
    # is exact), divided by the same n
    counts = np.bincount(digits, minlength=10)[1:10]
    observed = counts / len(digits)
    return np.corrcoef(benford, observed)[0, 1]
