"""End-to-end test of the CLI runner (scripts/run_extract.py) — the Spark
analog of the reference's command-line entry point
(/root/reference/tsfresh/scripts/run_tsfresh.py:47-140): CSV in → features
CSV out, and parquet tokens in → long features parquet out.

The CLI is driven in-process (``main()`` with patched argv) against the
shared test session: this sandbox must never run two local Spark sessions
concurrently (documented deadlock), so ``build_session`` is monkeypatched
to hand the CLI the live session behind a stop()-absorbing proxy — every
other line of the script (arg parsing, format dispatch, reader/writer,
pivot) runs for real.
"""

import glob
import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "run_extract",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "run_extract.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _NoStop:
    """Session proxy whose stop() is a no-op (the suite owns the session)."""

    def __init__(self, s):
        self._s = s

    def __getattr__(self, name):
        return getattr(self._s, name)

    def stop(self):
        pass


@pytest.fixture()
def cli_session(spark, monkeypatch):
    import tsfresh_spark.session as sess

    monkeypatch.setattr(
        sess, "build_session", lambda *a, **k: _NoStop(spark)
    )
    return spark


def _read_csv_dir(path: str) -> pd.DataFrame:
    parts = sorted(glob.glob(os.path.join(path, "part-*.csv")))
    assert parts, f"no csv parts written under {path}"
    return pd.concat([pd.read_csv(p) for p in parts], ignore_index=True)


def test_cli_long_csv_to_wide_csv(cli_session, sf_dir, tmp_path, monkeypatch):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    long_pdf = pd.DataFrame(
        {
            "id": ev["user_id"],
            "kind": ev["event_type"],
            "time": np.arange(len(ev)),  # csv-safe monotone sort key
            "value": ev["value"],
        }
    )
    in_csv = tmp_path / "long.csv"
    long_pdf.to_csv(in_csv, index=False)
    out_dir = tmp_path / "wide.csv"  # .csv suffix selects the csv writer

    cli = _load_cli()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_extract.py",
            "--input", str(in_csv),
            "--format", "long",
            "--settings", "minimal",
            "--id-col", "id",
            "--kind-col", "kind",
            "--sort-col", "time",
            "--value-col", "value",
            "--pivot",
            "--output", str(out_dir),
        ],
    )
    cli.main()

    wide = _read_csv_dir(str(out_dir)).set_index("id").sort_index()
    n_kinds = long_pdf["kind"].nunique()
    from tsfresh_spark.settings import minimal_settings

    assert len(wide) == long_pdf["id"].nunique()
    assert len(wide.columns) == n_kinds * len(minimal_settings())

    # spot-verify two feature planes against a pandas recomputation
    g = long_pdf.groupby(["id", "kind"])["value"]
    for kind in long_pdf["kind"].unique():
        want_len = g.count().xs(kind, level="kind").reindex(wide.index)
        got_len = wide[f"{kind}__length"]
        pd.testing.assert_series_equal(
            got_len, want_len.astype(float), check_names=False
        )
        want_mean = g.mean().xs(kind, level="kind").reindex(wide.index)
        got_mean = wide[f"{kind}__mean"]
        assert np.allclose(
            got_mean.values, want_mean.values, rtol=1e-12, equal_nan=True
        )


def test_cli_tokens_parquet_roundtrip(cli_session, spark, tmp_path, monkeypatch):
    from tsfresh_spark.sources.synthetic import tokens_corpus

    in_pq = tmp_path / "tokens.parquet"
    tokens_corpus(spark, 40, max_len=128, n_partitions=2).write.mode(
        "overwrite"
    ).parquet(str(in_pq))
    out_pq = tmp_path / "feats.parquet"

    cli = _load_cli()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_extract.py",
            "--input", str(in_pq),
            "--format", "tokens",
            "--settings", "minimal",
            "--output", str(out_pq),
        ],
    )
    cli.main()

    from tsfresh_spark.settings import minimal_settings

    out = pd.read_parquet(out_pq)
    assert set(out.columns) == {"doc_id", "source", "variable", "value"}
    assert len(out) == 40 * len(minimal_settings())
    # every doc got the full minimal family, named kind__feature
    per_doc = out.groupby("doc_id")["variable"].nunique()
    assert (per_doc == len(minimal_settings())).all()
    assert out["variable"].str.contains("__").all()
