"""Edge-surface coverage: timestamp-indexed kernels end-to-end, empty
settings, very long series, CLI entry point."""

import datetime as dt
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from tsfresh_spark.extract import extract_features_long, extract_features_tokens
from tsfresh_spark.settings import comprehensive_settings, efficient_settings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_linear_trend_timewise_through_spark(spark):
    """Timestamp sort column → DatetimeIndex reaches the timewise kernels."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(24):
        # exactly +2 per hour → timewise slope must be exactly 2/hour
        rows.append((1, "a", t0 + dt.timedelta(hours=i), 10.0 + 2.0 * i))
    df = spark.createDataFrame(rows, "id long, kind string, time timestamp, value double")
    out = (
        extract_features_long(
            df, {"linear_trend_timewise": [{"attr": "slope"}, {"attr": "rvalue"}]}
        )
        .toPandas()
        .set_index("variable")
    )
    assert out.loc['a__linear_trend_timewise__attr_"slope"', "value"] == pytest.approx(2.0)
    assert out.loc['a__linear_trend_timewise__attr_"rvalue"', "value"] == pytest.approx(1.0)


def test_timewise_skipped_without_timestamps(spark):
    df = spark.createDataFrame(
        [(1, "a", 0, 1.0), (1, "a", 1, 2.0)], "id long, kind string, time long, value double"
    )
    out = extract_features_long(
        df, {"linear_trend_timewise": [{"attr": "slope"}], "mean": None}
    ).toPandas()
    # timewise silently skipped (integer sort), mean still computed
    assert out.variable.tolist() == ["a__mean"]


def test_empty_settings(spark):
    df = spark.createDataFrame(
        [("d1", [1, 2], "web")], "doc_id string, tokens array<int>, source string"
    )
    out = extract_features_tokens(df, {}).toPandas()
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "source", "variable", "value"]


def test_very_long_series_kernels():
    """50k-token series through the efficient family: finite, no blowup
    (dense O(n²) paths are gated; high-cost entropies excluded)."""
    from tsfresh_spark.extract import compute_series_features

    x = np.random.RandomState(1).randint(0, 50257, 50_000).astype(np.int64)
    feats = dict(compute_series_features(x, "web", efficient_settings()))
    assert len(feats) == 777
    finite = sum(1 for v in feats.values() if np.isfinite(v))
    assert finite > 700


def test_cli_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out.parquet")
    spark.createDataFrame(
        [("d1", [1, 2, 3], "web"), ("d2", [9, 9], "code")],
        "doc_id string, tokens array<int>, source string",
    ).write.parquet(src)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_extract.py"),
            "--input", src, "--output", out,
            "--format", "tokens", "--settings", "minimal",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = pd.read_parquet(out)
    assert len(result) == 20  # 2 docs × 10 minimal features
    assert set(result.columns) == {"doc_id", "source", "variable", "value"}
