"""Exclusion-zone boundary A/B for the native matrix profile (VERDICT r4
next-round #6): pin `matrix_profile_stomp` / `_maximum_subsequence_profile`
against an independent brute-force O(n²·m) implementation, with adversarial
cases that plant the single best match at lag exactly ⌈m/4⌉ − 1, ⌈m/4⌉ and
⌈m/4⌉ + 1.

The convention pinned here (and now load-bearing, test-enforced): the
exclusion zone is |i − j| ≤ ⌈m/4⌉, i.e. the SMALLEST admissible lag is
⌈m/4⌉ + 1.  The real ``matrixprofile`` package cannot run in this sandbox
(true for the reference too), so the boundary cannot be checked against it
side-by-side — but it is no longer implicit in one loop bound: an exact
planted match at lag ⌈m/4⌉ must NOT be found and the same match at
lag ⌈m/4⌉ + 1 MUST be, per the brute force and per STOMP independently."""

import numpy as np
import pytest

from tsfresh_spark.kernels.model import (
    _maximum_subsequence_profile,
    matrix_profile_stomp,
)


def _brute_profile(x: np.ndarray, m: int) -> np.ndarray:
    """Independent O(n²·m) z-normalized matrix profile: explicit per-window
    z-normalization and an explicit |i−j| > ⌈m/4⌉ admissibility test —
    shares no code path with the STOMP diagonal recurrence."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    k = n - m + 1
    excl = int(np.ceil(m / 4.0))
    if m < 4 or k < excl + 2:
        return np.array([np.nan])
    w = np.lib.stride_tricks.sliding_window_view(x, m).astype(float)
    mu = w.mean(axis=1)
    sig = w.std(axis=1)
    flat = w.max(axis=1) == w.min(axis=1)
    wz = np.zeros_like(w)
    nz = ~flat
    wz[nz] = (w[nz] - mu[nz, None]) / sig[nz, None]
    prof = np.full(k, np.inf)
    for i in range(k):
        for j in range(k):
            if abs(i - j) <= excl:
                continue
            if flat[i] and flat[j]:
                d = 0.0
            elif flat[i] or flat[j]:
                d = np.sqrt(m)
            else:
                d = float(np.linalg.norm(wz[i] - wz[j]))
            prof[i] = min(prof[i], d)
    prof[np.isinf(prof)] = np.nan
    return prof


def _planted_series(m: int, lag: int, seed: int) -> tuple[np.ndarray, int]:
    """Noise with ONE pair of identical windows at exactly ``lag``: a
    segment of length m+lag periodic with period ``lag`` makes windows
    (i0, i0+lag) equal; every other pair stays noise-distance apart."""
    rng = np.random.RandomState(seed)
    n = 6 * m
    x = rng.randn(n) * 10.0
    i0 = 2 * m
    motif = rng.randn(lag) * 10.0
    for t in range(m + lag):
        x[i0 + t] = motif[t % lag]
    return x, i0


@pytest.mark.parametrize("m", [8, 12, 16, 23])
@pytest.mark.parametrize("seed", [0, 1])
def test_stomp_equals_bruteforce_random(m, seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(8 * m) + 5.0
    got = matrix_profile_stomp(x, m)
    want = _brute_profile(x, m)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("m", [8, 16, 24])
def test_exclusion_zone_boundary(m):
    excl = int(np.ceil(m / 4.0))
    # lag = excl: the planted exact match sits INSIDE the exclusion zone —
    # both implementations must refuse it (profile value stays noise-sized)
    x, i0 = _planted_series(m, excl, seed=7)
    stomp_in = matrix_profile_stomp(x, m)
    brute_in = _brute_profile(x, m)
    np.testing.assert_allclose(stomp_in, brute_in, atol=1e-6)
    assert stomp_in[i0] > 0.5, (
        f"m={m}: match at lag {excl} (== ceil(m/4)) must be excluded"
    )
    # lag = excl + 1: the same construction one step outside the zone —
    # the match must be admissible and drive the profile to ~0
    x, i0 = _planted_series(m, excl + 1, seed=7)
    stomp_out = matrix_profile_stomp(x, m)
    brute_out = _brute_profile(x, m)
    np.testing.assert_allclose(stomp_out, brute_out, atol=1e-6)
    assert stomp_out[i0] < 1e-5, (
        f"m={m}: match at lag {excl + 1} (== ceil(m/4)+1) must be admissible"
    )
    # lag = excl - 1 (deeper inside the zone): still refused
    if excl - 1 >= 2:
        x, i0 = _planted_series(m, excl - 1, seed=7)
        stomp_deep = matrix_profile_stomp(x, m)
        assert stomp_deep[i0] > 0.5


def _brute_maximum_subsequence(x: np.ndarray, threshold: float) -> np.ndarray:
    """The doubling-window search re-stated over the brute-force profile —
    same stopping rule, independent distance engine."""
    n = len(x)
    if n < 16:
        return np.array([np.nan])
    profile = np.array([np.nan])
    m = 8
    while m <= n // 2:
        profile = _brute_profile(x, m)
        if len(profile) == 1 and np.isnan(profile[0]):
            return profile
        finite = profile[np.isfinite(profile)]
        if len(finite) == 0:
            return np.array([np.nan])
        if 1.0 - (finite.min() ** 2) / (2.0 * m) < threshold:
            break
        m *= 2
    return profile


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("threshold", [0.98, 0.9])
def test_maximum_subsequence_matches_bruteforce(seed, threshold):
    rng = np.random.RandomState(seed)
    # periodic + noise: early windows correlate strongly, so the doubling
    # search takes several steps before the best-match correlation decays
    t = np.arange(160)
    x = np.sin(2 * np.pi * t / 16) + 0.3 * rng.randn(160)
    got = _maximum_subsequence_profile(x, threshold)
    want = _brute_maximum_subsequence(x, threshold)
    assert got.shape == want.shape, (
        "doubling search stopped at a different window size"
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
