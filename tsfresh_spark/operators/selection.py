"""FRESH feature selection (FeatuRe Extraction based on Scalable Hypothesis
tests) — the reference's selection plane
(/root/reference/tsfresh/feature_selection/) re-expressed for Spark:

* per-feature univariate p-value, parallelized as a grouped-map over the
  melted (variable → values) frame (each group is one feature column);
* Benjamini-Hochberg / Benjamini-Yekutieli on the driver (the p-value table
  has one row per feature — tiny);
* projection of the relevant columns.

Test routing mirrors feature_selection/relevance.py:396-411 +
significance_tests.py: constant → irrelevant; binary feature × binary target
→ Fisher exact; binary × real (either way) → Kolmogorov-Smirnov /
Mann-Whitney; real × real → Kendall's τ-b.  The statistics are numpy
re-derivations of the classic asymptotic forms (executors need no scipy);
see each _pvalue_* docstring.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ the statistics


# The portable erfc lives in kernels/helpers (the ADF MacKinnon tail uses
# it too); re-exported here under its historical names — it is plain
# +,-,*,/ and one exp, so the DuckDB correctness oracles (fresh_relevance
# and the ADF plane in __spark_entry__.py) evaluate the IDENTICAL
# expression and p-values match bit-for-bit across engines.  The 1.2e-7
# relative deviation from true erfc is far below any selection decision
# threshold.
from tsfresh_spark.kernels.helpers import (  # noqa: E402,F401
    normal_sf_portable,
    nr_erfc as _nr_erfc,
)


def _rankdata_average(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _pvalue_mannwhitney(x: np.ndarray, y: np.ndarray) -> float:
    """Two-sided Mann-Whitney U, asymptotic normal approximation with tie
    correction and continuity correction (the classic form behind
    scipy.stats.mannwhitneyu used at significance_tests.py:84-132)."""
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        return np.nan
    allv = np.concatenate([x, y])
    ranks = _rankdata_average(allv)
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    n = n1 + n2
    _, counts = np.unique(allv, return_counts=True)
    tie_term = (counts**3 - counts).sum()
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    if var <= 0:
        return 1.0
    z = (abs(u1 - mu) - 0.5) / math.sqrt(var)
    return min(1.0, 2.0 * normal_sf_portable(z))


def _pvalue_ks(x: np.ndarray, y: np.ndarray) -> float:
    """Two-sided two-sample KS, asymptotic Kolmogorov distribution with the
    Stephens small-sample adjustment (behind scipy ks_2samp at
    significance_tests.py:84-167)."""
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        return np.nan
    xs, ys = np.sort(x), np.sort(y)
    grid = np.concatenate([xs, ys])
    c1 = np.searchsorted(xs, grid, side="right") / n1
    c2 = np.searchsorted(ys, grid, side="right") / n2
    d = np.max(np.abs(c1 - c2))
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        total += (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
    return max(0.0, min(1.0, 2.0 * total))


def _pvalue_fisher(feature: np.ndarray, target: np.ndarray) -> float:
    """Two-sided Fisher exact on the 2×2 table (significance_tests.py:43-81),
    via hypergeometric enumeration with lgamma."""
    fv = np.unique(feature)
    tv = np.unique(target)
    if len(fv) != 2 or len(tv) != 2:
        return np.nan
    a = int(((feature == fv[1]) & (target == tv[1])).sum())
    b = int(((feature == fv[1]) & (target == tv[0])).sum())
    c = int(((feature == fv[0]) & (target == tv[1])).sum())
    d = int(((feature == fv[0]) & (target == tv[0])).sum())
    n = a + b + c + d
    row1, col1 = a + b, a + c

    def log_comb(nn, kk):
        return (
            math.lgamma(nn + 1) - math.lgamma(kk + 1) - math.lgamma(nn - kk + 1)
        )

    denom = log_comb(n, col1)

    def pmf(k):
        if k < 0 or k > row1 or col1 - k < 0 or col1 - k > n - row1:
            return 0.0
        return math.exp(
            log_comb(row1, k) + log_comb(n - row1, col1 - k) - denom
        )

    p_obs = pmf(a)
    total = 0.0
    for k in range(0, min(row1, col1) + 1):
        pk = pmf(k)
        if pk <= p_obs * (1 + 1e-7):
            total += pk
    return min(1.0, total)


def _count_inversions(a: np.ndarray) -> tuple[np.ndarray, int]:
    """(sorted copy, #pairs i<j with a[i] > a[j]) — vectorized merge
    counting, O(n log² n), no python-level per-element loop."""
    if len(a) <= 1:
        return a, 0
    mid = len(a) // 2
    left, cl = _count_inversions(a[:mid])
    right, cr = _count_inversions(a[mid:])
    # cross inversions: per right element, how many left elements exceed it
    cross = int((len(left) - np.searchsorted(left, right, side="right")).sum())
    merged = np.concatenate([left, right])
    merged.sort()
    return merged, cl + cr + cross


def _run_pair_count(sorted_keys) -> int:
    """Σ c(c-1)/2 over runs of equal consecutive keys (keys pre-sorted)."""
    if len(sorted_keys) == 0:
        return 0
    if isinstance(sorted_keys, tuple):
        same = np.ones(len(sorted_keys[0]) - 1, dtype=bool)
        for k in sorted_keys:
            same &= k[1:] == k[:-1]
    else:
        same = sorted_keys[1:] == sorted_keys[:-1]
    boundaries = np.flatnonzero(~same)
    starts = np.concatenate([[0], boundaries + 1])
    ends = np.concatenate([boundaries + 1, [len(same) + 1]])
    c = (ends - starts).astype(np.int64)
    return int((c * (c - 1) // 2).sum())


def _kendall_con_minus_dis(x: np.ndarray, y: np.ndarray) -> int:
    """P - Q (concordant minus discordant pairs) in O(n log² n) via the
    Knight (1966) merge-counting identity — EXACT integer counts, so it is
    interchangeable with the O(n²) sign-matrix form (asserted in
    tests/test_impute_selection.py) while surviving selection over millions
    of training series.  con+dis = tot - xtie - ytie + ntie; dis = strict
    inversions of y in (x, y)-sorted order."""
    n = len(x)
    perm = np.lexsort((y, x))
    xs, ys = x[perm], y[perm]
    tot = n * (n - 1) // 2
    xtie = _run_pair_count(xs)
    ytie = _run_pair_count(np.sort(y))
    ntie = _run_pair_count((xs, ys))
    _, dis = _count_inversions(ys)
    return (tot - xtie - ytie + ntie) - 2 * dis


def _pvalue_kendall(x: np.ndarray, y: np.ndarray) -> float:
    """Kendall τ-b two-sided asymptotic p (normal approximation with the full
    tie-adjusted variance) — the method="asymptotic" path the reference pins
    at significance_tests.py:170-188.  P-Q comes from the O(n log² n) merge
    count; NaN-bearing inputs fall back to the sign-matrix form (which
    silently skips NaN pairs, the long-standing behavior)."""
    n = len(x)
    if n < 2:
        return np.nan
    if np.isnan(x).any() or np.isnan(y).any():
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(n, k=1)
        prod = dx[iu] * dy[iu]
        P = int((prod > 0).sum())
        Q = int((prod < 0).sum())
    else:
        d = _kendall_con_minus_dis(x, y)
        P, Q = d, 0  # only P - Q enters the statistic below

    def tie_stats(v):
        _, counts = np.unique(v, return_counts=True)
        t = counts[counts > 1].astype(float)
        return (
            (t * (t - 1) / 2).sum(),
            (t * (t - 1) * (2 * t + 5)).sum(),
            (t * (t - 1) * (t - 2)).sum(),
            (t * (t - 1)).sum(),
        )

    xt_pairs, vt, vt2, xt11 = tie_stats(x)
    yt_pairs, vu, vu2, yt11 = tie_stats(y)
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - xt_pairs) * (n0 - yt_pairs))
    if denom == 0:
        return np.nan
    v0 = n * (n - 1) * (2 * n + 5)
    v1 = xt11 * yt11 / (2.0 * n * (n - 1))
    v2 = (
        vt2 * vu2 / (9.0 * n * (n - 1) * (n - 2)) if n > 2 else 0.0
    )
    var = (v0 - vt - vu) / 18.0 + v1 + v2
    if var <= 0:
        return 1.0
    z = (P - Q) / math.sqrt(var)
    return min(1.0, 2.0 * normal_sf_portable(abs(z)))


# ------------------------------------------------------- multiple testing


def benjamini_hochberg(pvalues: np.ndarray, fdr: float, dependent: bool) -> np.ndarray:
    """BH (independent) / BY (dependent) rejection mask — the reference's
    multipletests call (relevance.py:325-350)."""
    p = np.asarray(pvalues, dtype=float)
    m = len(p)
    if m == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(p)
    ranked = p[order]
    cm = np.sum(1.0 / np.arange(1, m + 1)) if dependent else 1.0
    thresh = fdr * np.arange(1, m + 1) / (m * cm)
    below = ranked <= thresh
    mask = np.zeros(m, dtype=bool)
    if below.any():
        kmax = np.max(np.nonzero(below))
        mask[order[: kmax + 1]] = True
    return mask


# --------------------------------------------------------------- the plane


def _feature_type(values: np.ndarray) -> str:
    distinct = np.unique(values[~np.isnan(values)])
    if len(distinct) <= 1:
        return "constant"
    if len(distinct) == 2:
        return "binary"
    return "real"


def calculate_relevance_table_multiclass(
    features_wide: DataFrame,
    y: pd.Series,
    *,
    id_col: str = "id",
    fdr_level: float = 0.05,
    hypotheses_independent: bool = False,
    n_significant: int = 1,
) -> pd.DataFrame:
    """Multiclass relevance: one-vs-all binary table per class, a feature is
    relevant when it is significant for at least ``n_significant`` classes —
    the reference's multiclass mode (relevance.py:175-187, 257-281,
    377-393).  Adds one ``p_value_<class>``/``relevant_<class>`` column pair
    per class."""
    classes = sorted(pd.unique(y))
    if len(classes) < 3:
        raise ValueError("multiclass mode needs at least 3 classes")
    combined: pd.DataFrame | None = None
    for cls in classes:
        table = calculate_relevance_table(
            features_wide,
            (y == cls).astype(int),
            id_col=id_col,
            ml_task="classification",
            fdr_level=fdr_level,
            hypotheses_independent=hypotheses_independent,
        )
        renamed = table.reset_index(drop=True)[
            ["feature", "type", "p_value", "relevant"]
        ].rename(
            columns={
                "p_value": f"p_value_{cls}",
                "relevant": f"relevant_{cls}",
            }
        )
        combined = (
            renamed
            if combined is None
            else combined.merge(
                renamed.drop(columns="type"), on="feature", how="outer"
            )
        )
    combined["n_significant"] = sum(
        combined[f"relevant_{cls}"].astype(int) for cls in classes
    )
    combined["relevant"] = combined["n_significant"] >= n_significant
    return combined.set_index("feature", drop=False)


def calculate_relevance_table(
    features_wide: DataFrame,
    y: pd.Series,
    *,
    id_col: str = "id",
    ml_task: str = "auto",
    fdr_level: float = 0.05,
    hypotheses_independent: bool = False,
) -> pd.DataFrame:
    """Relevance table (feature, type, p_value, relevant) — the distributed
    analog of relevance.py:31-322.

    The wide matrix is melted and each feature's (values, y) pair is scored
    by a grouped-map UDF; only the tiny per-feature table is collected.
    """
    target = np.asarray(y.values)
    binary_target = len(np.unique(target)) == 2
    if ml_task == "auto":
        ml_task = "classification" if binary_target else "regression"

    spark = features_wide.sparkSession
    feature_cols = [c for c in features_wide.columns if c != id_col]
    melted = features_wide.unpivot(
        ids=[id_col],
        values=feature_cols,
        variableColumnName="variable",
        valueColumnName="value",
    )
    y_df = spark.createDataFrame(
        pd.DataFrame({id_col: y.index.values, "_target": target})
    )
    joined = melted.join(F.broadcast(y_df), id_col)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        values = pdf["value"].values.astype(float)
        t = pdf["_target"].values
        ftype = _feature_type(values)
        if ftype == "constant":
            p = np.nan
        elif ml_task == "classification":
            tv = np.unique(t)
            if ftype == "binary":
                p = _pvalue_fisher(values, t)
            else:
                x0 = values[t == tv[0]]
                x1 = values[t == tv[1]]
                p = _pvalue_mannwhitney(x0, x1)
        else:
            if ftype == "binary":
                fv = np.unique(values[~np.isnan(values)])
                p = _pvalue_ks(
                    t[values == fv[0]].astype(float), t[values == fv[1]].astype(float)
                )
            else:
                p = _pvalue_kendall(values, t.astype(float))
        return pd.DataFrame(
            {"feature": [pdf["variable"].iloc[0]], "type": [ftype], "p_value": [p]}
        )

    from tsfresh_spark.plans.partitioning import pin_group_partitions

    table = (
        pin_group_partitions(joined, "variable")
        .groupBy("variable")
        .applyInPandas(score, "feature string, type string, p_value double")
        .toPandas()
    )
    table = table.set_index("feature", drop=False)
    testable = table[table.type != "constant"].copy()
    mask = benjamini_hochberg(
        np.nan_to_num(testable.p_value.values, nan=1.0),
        fdr_level,
        dependent=not hypotheses_independent,
    )
    table["relevant"] = False
    table.loc[testable.index, "relevant"] = mask
    return table


def select_features(
    features_wide: DataFrame,
    y: pd.Series,
    *,
    id_col: str = "id",
    ml_task: str = "auto",
    fdr_level: float = 0.05,
    hypotheses_independent: bool = False,
    multiclass: bool = False,
    n_significant: int = 1,
) -> tuple[DataFrame, pd.DataFrame]:
    """Project the relevant feature columns (selection.py:17-181); returns
    (projected DataFrame, relevance table).  ``multiclass=True`` uses
    one-vs-all tables with the ``n_significant`` threshold."""
    if multiclass:
        table = calculate_relevance_table_multiclass(
            features_wide,
            y,
            id_col=id_col,
            fdr_level=fdr_level,
            hypotheses_independent=hypotheses_independent,
            n_significant=n_significant,
        )
    else:
        table = calculate_relevance_table(
            features_wide,
            y,
            id_col=id_col,
            ml_task=ml_task,
            fdr_level=fdr_level,
            hypotheses_independent=hypotheses_independent,
        )
    keep = [f for f in table[table.relevant].feature]
    return features_wide.select(id_col, *keep), table
