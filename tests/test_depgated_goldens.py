"""Pinned NUMERIC goldens for the dep-gated kernels — the calculators whose
reference implementation calls scipy/statsmodels/pywt/stumpy (absent in this
sandbox for both repos, so tests/test_reference_crosscheck.py cannot execute
them side-by-side).  Three evidence classes, strongest first:

1. published values vendored from the reference's own test suite
   (/root/reference/tests/units/feature_extraction/test_feature_calculations.py,
   cited per test);
2. closed-form analytic values (Hann-window periodogram identities,
   noiseless-AR exact OLS recovery, published MacKinnon critical values);
3. regression snapshots — pinned outputs of this engine on fixed inputs,
   clearly labelled, guarding bit-stability where no external number exists
   (the reference's own tests say "todo: add unit test for the values" for
   cwt/welch).

friedrich_coefficients / max_langevin_fixed_point graduated OUT of this
file: their reference code is scipy-free, so they are executed side-by-side
in test_reference_crosscheck.py (bit-level proof).
"""

import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.kernels import KERNELS


def k(name):
    return KERNELS[name].func


# ---------------------------------------------------------------- query sim


def test_query_similarity_count_reference_numeric_golden():
    """Reference test_feature_calculations.py:2017-2041 — seeded uniform
    query/series, published counts 0 / 6 / 0 / 91."""
    np.random.seed(42)
    query = np.random.uniform(size=10)
    x = np.random.uniform(size=100)
    qs = k("query_similarity_count")

    def one(cfg):
        return list(qs(x, [cfg]))[0][1]

    assert one({"query": query}) == 0.0
    assert one({"query": query, "threshold": 3.0}) == 6.0
    assert one({"query": query, "normalize": False}) == 0.0
    assert one({"query": query, "threshold": 3.0, "normalize": False}) == 91.0


# --------------------------------------------------------------- friedrich


def test_friedrich_coefficients_reference_snapshot():
    """Reference test_feature_calculations.py:2158-2199 — the published
    30-point snapshot (assertAlmostEqual default 7 places)."""
    x = np.array(
        [-0.53, -0.61, -1.26, -0.88, -0.34, 0.58, 2.86, -0.47, 0.78, -0.45,
         -0.27, 0.43, 1.72, 0.26, 1.02, -0.09, 0.65, 1.49, -0.95, -1.02,
         -0.64, -1.63, -0.71, -0.43, -1.69, 0.05, 1.58, 1.1, 0.55, -1.02]
    )
    param = [{"coeff": c, "m": 2, "r": 30} for c in range(4)]
    res = dict(k("friedrich_coefficients")(x, param))
    assert res["coeff_0__m_2__r_30"] == pytest.approx(-0.24536975738843042, abs=1e-7)
    assert res["coeff_1__m_2__r_30"] == pytest.approx(-0.533309548662685, abs=1e-7)
    assert res["coeff_2__m_2__r_30"] == pytest.approx(0.2759399238199404, abs=1e-7)
    assert np.isnan(res["coeff_3__m_2__r_30"])


# -------------------------------------------------------------------- pacf


def test_partial_autocorrelation_reference_numeric_cases():
    """The four published cases of reference test_feature_calculations.py:
    282-344, at the reference's own tolerances."""
    pa = k("partial_autocorrelation")
    lags = [{"lag": lag} for lag in range(10)]

    # alternating series: lag_0 = 1, lag_1 = -1 (4 places), lag_2 NaN
    res = dict(pa(np.array([1, 2, 1, 2, 1, 2], dtype=float), lags))
    assert res["lag_0"] == pytest.approx(1.0, abs=1e-4)
    assert res["lag_1"] == pytest.approx(-1.0, abs=1e-4)
    assert np.isnan(res["lag_2"])

    # linear signal: lag_1 ~ 1, lag_2 ~ 0 (2 places)
    res = dict(pa(np.linspace(0, 1, 3000), lags))
    assert res["lag_0"] == pytest.approx(1.0, abs=1e-2)
    assert res["lag_1"] == pytest.approx(1.0, abs=1e-2)
    assert res["lag_2"] == pytest.approx(0.0, abs=1e-2)

    # seeded white noise: lag_1 ~ 0, lag_2 ~ 0 (1 place)
    np.random.seed(42)
    res = dict(pa(np.random.normal(size=3000), lags))
    assert res["lag_1"] == pytest.approx(0.0, abs=0.05)
    assert res["lag_2"] == pytest.approx(0.0, abs=0.05)

    # seeded AR(1), phi=0.5: lag_1 ~ 0.5, lag_2 ~ 0 (1 place)
    np.random.seed(42)
    T = 3000
    eps = np.random.randn(T)
    x = np.repeat(1.0, T)
    for t in range(T - 1):
        x[t + 1] = 0.5 * x[t] + 2 + eps[t]
    res = dict(pa(x, lags))
    assert res["lag_1"] == pytest.approx(0.5, abs=0.05)
    assert res["lag_2"] == pytest.approx(0.0, abs=0.05)

    # pathological: zeros → lag_0 = 1, others NaN
    res = dict(pa(np.zeros(100), lags))
    assert res["lag_0"] == 1.0
    assert all(np.isnan(v) for key, v in res.items() if key != "lag_0")


# --------------------------------------------------------------------- ADF


def test_adf_mackinnon_published_critical_values():
    """The MacKinnon (2010) large-N critical values for the constant-only
    ADF regression are published: tau = -3.43 / -2.86 / -2.57 at the
    1% / 5% / 10% levels.  Our MacKinnon p-value re-derivation must return
    (approximately) the nominal level at each published critical value."""
    from tsfresh_spark.kernels.model import _mackinnon_pvalue

    assert _mackinnon_pvalue(-3.43) == pytest.approx(0.01, abs=0.002)
    assert _mackinnon_pvalue(-2.86) == pytest.approx(0.05, abs=0.002)
    assert _mackinnon_pvalue(-2.57) == pytest.approx(0.10, abs=0.002)


def test_adf_teststat_regression_snapshot():
    """Regression pins (engine snapshot; the reference publishes no ADF
    statistic values — its test says 'todo') on the reference's two seeded
    test series: bit-stability of the OLS + AIC lag-selection path."""
    rng = np.random.RandomState(42)
    x = np.cumsum(rng.uniform(size=100))
    param = [{"attr": a} for a in ["teststat", "pvalue", "usedlag"]]
    res = dict(k("augmented_dickey_fuller")(x, param))
    t_drift = res['attr_"teststat"__autolag_"AIC"']
    rng = np.random.RandomState(42)
    e = rng.normal(0.1, 0.1, size=100)
    xs = [0.0] * 50
    xs[0] = 100
    for i in range(1, 50):
        xs[i] = xs[i - 1] * 0.5 + e[i]
    res2 = dict(k("augmented_dickey_fuller")(np.array(xs), param))
    t_ar = res2['attr_"teststat"__autolag_"AIC"']
    # snapshot values recorded 2026-08-16; drift only if the ADF pipeline
    # (OLS, AIC autolag, MacKinnon interpolation) changes behavior.  Both
    # also satisfy the reference's published directional assertions
    # (p > 0.10 for the drift, p <= 0.05 for the AR(1)).  pvalue snapshot
    # updated 2026-08-17 when the MacKinnon tail moved to the portable
    # NR-form erfc (for DuckDB oracle replication, like the selection
    # plane) — a deliberate ≤ 4e-8 shift from the libm-erfc snapshot
    # 0.9614919743810806.
    assert t_drift == pytest.approx(0.037063543418874384, rel=1e-9)
    assert res['attr_"pvalue"__autolag_"AIC"'] == pytest.approx(
        0.961491976633508, rel=1e-9
    )
    assert t_ar == pytest.approx(-595.2595341200183, rel=1e-9)
    assert res2['attr_"pvalue"__autolag_"AIC"'] == 0.0


# ------------------------------------------------------------------- welch


def test_spkt_welch_density_hann_analytic():
    """Closed-form Hann-window periodogram identities (published DSP math,
    not tied to any implementation): for x[n] = A·cos(2πkn/N) with one
    N-sample segment, periodic Hann window w (Σw² = 3N/8) and density
    scaling, the one-sided PSD is A²N/3 at bin k, A²N/12 at bins k±1, and 0
    elsewhere (k not adjacent to DC/Nyquist)."""
    N = 64
    n = np.arange(N)
    welch = k("spkt_welch_density")
    for A in (1.0, 2.5):
        x = A * np.cos(2 * np.pi * 8 * n / N)
        res = dict(welch(x, [{"coeff": c} for c in (2, 7, 8, 9, 14)]))
        assert res["coeff_8"] == pytest.approx(A * A * N / 3, rel=1e-9)
        assert res["coeff_7"] == pytest.approx(A * A * N / 12, rel=1e-9)
        assert res["coeff_9"] == pytest.approx(A * A * N / 12, rel=1e-9)
        assert abs(res["coeff_2"]) < 1e-20
        assert abs(res["coeff_14"]) < 1e-20


def test_spkt_welch_density_out_of_range_nan():
    """Reference test_feature_calculations.py:1045-1053: coeff beyond the
    spectrum length is NaN."""
    res = dict(k("spkt_welch_density")(np.arange(10), [{"coeff": 1}, {"coeff": 10}]))
    assert np.isnan(res["coeff_10"])
    assert np.isfinite(res["coeff_1"])


# --------------------------------------------------------------------- cwt


def test_cwt_coefficients_regression_snapshot():
    """Regression pins (engine snapshot; the reference's own test says
    'todo: add unit test for the values') for the pywt-mexh re-derivation on
    a fixed seeded series — any change to the wavelet integration flags
    here."""
    rng = np.random.RandomState(3)
    x = rng.randn(20)
    param = [
        {"widths": (2, 5, 10), "coeff": c, "w": w} for c in (0, 5) for w in (2, 5)
    ]
    res = dict(k("cwt_coefficients")(x, param))
    assert res["coeff_0__w_2__widths_(2, 5, 10)"] == pytest.approx(
        1.674261362088799, rel=1e-12
    )
    assert res["coeff_0__w_5__widths_(2, 5, 10)"] == pytest.approx(
        0.7643324917407478, rel=1e-12
    )
    assert res["coeff_5__w_2__widths_(2, 5, 10)"] == pytest.approx(
        -0.9442832431483228, rel=1e-12
    )
    assert res["coeff_5__w_5__widths_(2, 5, 10)"] == pytest.approx(
        -1.394972086222831, rel=1e-12
    )


def test_cwt_constant_signal_near_zero_interior():
    """Analytic property: the Mexican-hat wavelet has zero mean, so the
    response to a constant signal vanishes away from the boundary (up to
    the integration-grid error of the pywt algorithm, ~1e-4)."""
    x = np.full(40, 7.3)
    res = dict(
        k("cwt_coefficients")(x, [{"widths": (2,), "coeff": 20, "w": 2}])
    )
    assert abs(res["coeff_20__w_2__widths_(2,)"]) < 0.01


# ---------------------------------------------------------- number_cwt_peaks


def test_number_cwt_peaks_sine_analytic():
    """A clean 4-period sine has exactly 4 maxima — the smoothed ricker
    peak-finder must count them."""
    t = np.linspace(0, 4 * 2 * np.pi, 400)
    assert k("number_cwt_peaks")(np.sin(t), 5) == 4


# ------------------------------------------------------------ ar_coefficient


def test_ar_coefficient_noiseless_exact_recovery():
    """Noiseless AR recursions: the Burg/OLS fit must recover the generating
    coefficients to float precision (exact linear system, no noise) —
    tightened from the reference's 1e-2 published tolerance to 1e-9."""
    x = [1.0] + 9 * [0.0]
    for i in range(1, 10):
        x[i] = 2.5 * x[i - 1] + 1
    res = dict(
        k("ar_coefficient")(np.array(x), [{"k": 1, "coeff": 0}, {"k": 1, "coeff": 1}])
    )
    assert res["coeff_0__k_1"] == pytest.approx(1.0, abs=1e-9)
    assert res["coeff_1__k_1"] == pytest.approx(2.5, abs=1e-9)

    x = [1.0, 1.0] + 5 * [0.0]
    for i in range(2, 7):
        x[i] = (-2) * x[i - 2] + 3.5 * x[i - 1] + 1
    res = dict(k("ar_coefficient")(np.array(x), [{"k": 2, "coeff": c} for c in range(3)]))
    assert res["coeff_0__k_2"] == pytest.approx(1.0, abs=1e-9)
    assert res["coeff_1__k_2"] == pytest.approx(3.5, abs=1e-9)
    assert res["coeff_2__k_2"] == pytest.approx(-2.0, abs=1e-9)


# ------------------------------------------------------------ linear trends


def test_linear_trend_exact_affine():
    """y = 3x + 2 noiseless: every attribute is analytically forced."""
    param = [{"attr": a} for a in ["pvalue", "rvalue", "intercept", "slope", "stderr"]]
    res = dict(k("linear_trend")(3.0 * np.arange(12) + 2.0, param))
    assert res['attr_"slope"'] == pytest.approx(3.0, abs=1e-9)
    assert res['attr_"intercept"'] == pytest.approx(2.0, abs=1e-9)
    assert res['attr_"rvalue"'] == pytest.approx(1.0, abs=1e-9)
    assert res['attr_"pvalue"'] == pytest.approx(0.0, abs=1e-9)
    assert res['attr_"stderr"'] == pytest.approx(0.0, abs=1e-9)


def test_agg_linear_trend_nan_chunk_reference_cases():
    """Reference test_feature_calculations.py:1752-1794: leading-NaN chunks
    poison the whole fit; once complete chunks remain, the flat tail fits
    intercept -3 / slope 0; median f_agg matches the published range(9)
    case (intercept 1, slope 3)."""
    alt = k("agg_linear_trend")
    param = [
        {"attr": a, "chunk_len": 3, "f_agg": f}
        for f in ["max", "min", "mean", "median"]
        for a in ["intercept", "slope"]
    ]
    res = dict(alt(pd.Series([np.nan, np.nan, np.nan, -3.0, -3.0, -3.0]), param))
    assert all(np.isnan(v) for v in res.values())

    res = dict(alt(pd.Series([np.nan, np.nan, -3.0, -3.0, -3.0, -3.0]), param))
    for f in ["max", "min", "mean", "median"]:
        assert res[f'attr_"intercept"__chunk_len_3__f_agg_"{f}"'] == pytest.approx(-3.0)
        assert res[f'attr_"slope"__chunk_len_3__f_agg_"{f}"'] == pytest.approx(0.0)

    res = dict(alt(pd.Series(range(9)), param))
    assert res['attr_"intercept"__chunk_len_3__f_agg_"median"'] == pytest.approx(1.0)
    assert res['attr_"slope"__chunk_len_3__f_agg_"median"'] == pytest.approx(3.0)

    # ndarray + median is an AttributeError in the reference pipeline too
    # (_aggregate_on_chunks dispatches on the chunk's own methods and
    # agg_linear_trend is not marked input="pd.Series")
    with pytest.raises(AttributeError):
        alt(np.arange(9), [{"attr": "slope", "chunk_len": 3, "f_agg": "median"}])


# ------------------------------------------------------------ matrix profile


def test_matrix_profile_stomp_equals_bruteforce():
    """A/B: the STOMP diagonal recurrence must equal the brute-force
    z-normalized nearest-neighbor distance (full windows matrix) on random
    data, including constant windows."""
    from tsfresh_spark.kernels.model import matrix_profile_stomp

    rng = np.random.RandomState(23)
    for trial in range(8):
        n = int(rng.randint(40, 220))
        x = rng.randn(n) * 5
        if trial % 3 == 0:
            x[5:15] = 3.25  # a constant stretch → zero-variance windows
        m = int(rng.choice([4, 8, 13, 16]))
        k = n - m + 1
        excl = int(np.ceil(m / 4.0))
        W = np.lib.stride_tricks.sliding_window_view(x, m).astype(float)
        mu = W.mean(axis=1, keepdims=True)
        sd = W.std(axis=1, keepdims=True)
        flat = (sd[:, 0] == 0)
        Z = (W - mu) / np.where(sd == 0, 1.0, sd)
        D = np.sqrt(
            np.maximum(
                (Z[:, None, :] - Z[None, :, :]) ** 2, 0
            ).sum(-1)
        )
        both = flat[:, None] & flat[None, :]
        one = flat[:, None] ^ flat[None, :]
        D[both] = 0.0
        D[one] = np.sqrt(m)
        ii, jj = np.indices(D.shape)
        D[np.abs(ii - jj) <= excl] = np.inf
        want = D.min(axis=1)
        got = matrix_profile_stomp(x, m)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8), (trial, n, m)


def test_matrix_profile_planted_motif():
    """Two planted copies of the same subsequence → their profile entries
    are ~0 and the kernel's 'min' feature sees them."""
    from tsfresh_spark.kernels.model import matrix_profile_stomp

    rng = np.random.RandomState(7)
    x = rng.randn(300) * 10
    motif = rng.randn(24) * 10
    x[40:64] = motif
    x[200:224] = motif
    prof = matrix_profile_stomp(x, 24)
    assert prof[40] < 1e-5 and prof[200] < 1e-5
    res = dict(
        KERNELS["matrix_profile"].func(
            x, [{"windows": 24, "feature": f} for f in ["min", "max", "median"]]
        )
    )
    assert res['feature_"min"__windows_24'] < 1e-5
    assert res['feature_"max"__windows_24'] > 1.0


def test_matrix_profile_kernel_grid_and_degenerates():
    from tsfresh_spark.kernels.model import matrix_profile_stomp

    info = KERNELS["matrix_profile"]
    assert info.available is True  # native STOMP — no optional package
    rng = np.random.RandomState(3)
    x = rng.randn(200)
    param = [
        {"threshold": 0.98, "feature": f}
        for f in ["min", "max", "mean", "median", "25", "75"]
    ]
    res = dict(info.func(x, param))
    assert len(res) == 6
    vals = np.array(list(res.values()), dtype=float)
    assert np.isfinite(vals).all()
    assert res['feature_"min"__threshold_0.98'] <= res['feature_"25"__threshold_0.98']
    assert res['feature_"25"__threshold_0.98'] <= res['feature_"median"__threshold_0.98']
    assert res['feature_"median"__threshold_0.98'] <= res['feature_"75"__threshold_0.98']
    # degenerate inputs → NaN, mirroring the reference's NoSolutionPossible
    for bad in (np.arange(6.0), np.full(50, np.nan)):
        out = dict(info.func(bad, [{"threshold": 0.98, "feature": "min"}]))
        assert all(np.isnan(v) for v in out.values())
    assert len(matrix_profile_stomp(np.arange(10.0), 8)) == 1


def test_matrix_profile_settings_opt_in():
    """Default comprehensive grid stays 788-per-kind (baseline parity);
    opting in yields the reference-with-extra 794 surface."""
    from tsfresh_spark.settings import comprehensive_settings

    base = comprehensive_settings()
    assert "matrix_profile" not in base
    full = comprehensive_settings(include_matrix_profile=True)
    assert len(full["matrix_profile"]) == 6
    n_base = sum(
        1 if v is None else len(v) for v in base.values() if v is None or v
    )
    # 6 matrix-profile features on top of the default grid
    assert set(full) - set(base) == {"matrix_profile"}


def test_matrix_profile_large_offset_robust():
    """The code-review repro: x ~ 1e9 ± 1e-3.  The cumsum variance/QT
    cancellation used to zero 38% of the sigmas and poison the profile
    with NaN/fake-zero matches; z-norm distances are affine-invariant, so
    the profile must equal the one of the centered series."""
    from tsfresh_spark.kernels.model import matrix_profile_stomp

    rng = np.random.RandomState(5)
    noise = rng.rand(200) * 1e-3
    shifted = 1e9 + noise
    prof_shift = matrix_profile_stomp(shifted, 16)
    prof_base = matrix_profile_stomp(noise, 16)
    assert np.isfinite(prof_shift).all()
    assert (prof_shift > 0).all()  # noise has no exact motifs
    # rtol bounded by the DATA, not the algorithm: float64 1e9+1e-3 only
    # retains ~4 significant digits of the noise itself (ulp(1e9) ≈ 1e-7)
    assert np.allclose(prof_shift, prof_base, rtol=2e-3)
    # and the kernel returns a real value, not a fake perfect match
    res = dict(
        KERNELS["matrix_profile"].func(
            shifted, [{"windows": 16, "feature": "min"}]
        )
    )
    assert res['feature_"min"__windows_16'] > 0.1


# ------------------------------------------------- cwt closed-form (class 2)


def test_cwt_cosine_matches_analytic_ricker_fourier_response():
    """Closed-form evidence class for the cwt VALUES (the snapshot above
    only pins bit-stability): the scipy-normalized Ricker wavelet
    ψ_a(τ) = 2/(√(3a)·π^¼)·(1−τ²/a²)·e^(−τ²/(2a²)) has the published
    Fourier transform

        ψ̂_a(ω) = 2√(2π)/(√3·π^¼) · a^(5/2) · ω² · e^(−a²ω²/2)

    (Gaussian FT + two derivatives — textbook math, independent of any
    implementation).  For x[n] = cos(ωn) the interior "same"-convolution
    response is ψ̂_a(ω)·cos(ω(n−δ)) up to the e^(−12.5) ≈ 4e−6 truncation
    of the 10a-point kernel support; the half-sample phase δ of the
    even-length kernel cancels in the quadrature pair
    √(y[t]² + y[t+Δ]²) with ω·Δ = π/2."""
    n = np.arange(400)
    omega = np.pi / 10  # quadrature offset Δ = 5 samples
    x = np.cos(omega * n)
    for a in (5, 8):
        res = dict(
            k("cwt_coefficients")(
                x,
                [
                    {"widths": (a,), "coeff": 200, "w": a},
                    {"widths": (a,), "coeff": 205, "w": a},
                ],
            )
        )
        amp = np.hypot(
            res[f"coeff_200__w_{a}__widths_({a},)"],
            res[f"coeff_205__w_{a}__widths_({a},)"],
        )
        expected = (
            2.0 * np.sqrt(2.0 * np.pi) / (np.sqrt(3.0) * np.pi**0.25)
            * a**2.5 * omega**2 * np.exp(-(a**2) * omega**2 / 2.0)
        )
        assert amp == pytest.approx(expected, rel=1e-3), (a, amp, expected)


# ------------------------------------------------- ADF closed-form (class 2)


def test_adf_lag0_hand_ols_algebra():
    """A 5-point series forces maxlag = 0 (nobs//2 − 2 = 0), so the ADF
    regression is the textbook two-parameter OLS of Δx_t on [x_{t−1}, 1] —
    hand-computable with scalar Sxx/Sxy sums (no linear algebra library),
    t = β̂/(s/√Sxx).  Independent algebra for the same published statistic;
    any drift in design-matrix construction, dof, or the t formula lands
    here."""
    x = [2.0, 5.0, 3.0, 4.0, 1.0]
    dx = [b - a for a, b in zip(x, x[1:])]
    xl = x[:-1]
    m = len(dx)
    mx, my = sum(xl) / m, sum(dx) / m
    sxx = sum((a - mx) ** 2 for a in xl)
    sxy = sum((a - mx) * (b - my) for a, b in zip(xl, dx))
    beta = sxy / sxx
    alpha = my - beta * mx
    ssr = sum((yv - (alpha + beta * xv)) ** 2 for xv, yv in zip(xl, dx))
    s2 = ssr / (m - 2)
    t_expected = beta / (s2 / sxx) ** 0.5

    res = dict(
        k("augmented_dickey_fuller")(
            np.array(x), [{"attr": a} for a in ("teststat", "usedlag")]
        )
    )
    assert res['attr_"usedlag"__autolag_"AIC"'] == 0
    assert res['attr_"teststat"__autolag_"AIC"'] == pytest.approx(
        t_expected, rel=1e-12
    )


def test_adf_aic_selection_and_final_fit_independent_ols():
    """A/B the whole ADF pipeline on an AR(1) series against a straight
    re-implementation of the published procedure: per-lag lstsq fits on the
    common sample (vs the kernel's shared-Gram prefix solver), the Gaussian
    AIC = −2llf + 2k, and a normal-equations final fit with the textbook
    t-statistic from (XᵀX)⁻¹ — different numeric paths throughout."""
    rng = np.random.RandomState(7)
    e = rng.normal(0, 1, 80)
    x = np.empty(80)
    x[0] = e[0]
    for t in range(1, 80):
        x[t] = 0.6 * x[t - 1] + e[t]

    xdiff = np.diff(x)
    nobs_full = len(x)
    maxlag = min(
        nobs_full // 2 - 2, int(np.ceil(12.0 * (nobs_full / 100.0) ** 0.25))
    )

    def design(lag, start, nobs):
        cols = [x[start : start + nobs]]
        cols += [xdiff[start - j : start - j + nobs] for j in range(1, lag + 1)]
        cols.append(np.ones(nobs))
        return np.column_stack(cols)

    aics = []
    nobs_sel = len(xdiff) - maxlag
    y_sel = xdiff[maxlag:]
    for lag in range(maxlag + 1):
        X = design(lag, maxlag, nobs_sel)
        beta, *_ = np.linalg.lstsq(X, y_sel, rcond=None)
        ssr = float(((y_sel - X @ beta) ** 2).sum())
        llf = -nobs_sel / 2.0 * (
            np.log(2 * np.pi) + np.log(ssr / nobs_sel) + 1.0
        )
        aics.append(-2.0 * llf + 2.0 * (2 + lag))
    lag_star = int(np.argmin(aics))

    nobs = len(xdiff) - lag_star
    y = xdiff[lag_star:]
    X = design(lag_star, lag_star, nobs)
    XtX_inv = np.linalg.inv(X.T @ X)
    beta = XtX_inv @ X.T @ y
    ssr = float(((y - X @ beta) ** 2).sum())
    s2 = ssr / (nobs - X.shape[1])
    t_expected = beta[0] / np.sqrt(s2 * XtX_inv[0, 0])

    res = dict(
        k("augmented_dickey_fuller")(
            x, [{"attr": a} for a in ("teststat", "usedlag")]
        )
    )
    assert res['attr_"usedlag"__autolag_"AIC"'] == lag_star
    assert res['attr_"teststat"__autolag_"AIC"'] == pytest.approx(
        t_expected, rel=1e-9
    )
