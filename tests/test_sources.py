"""Deterministic source generators: reproducibility + shape contracts."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.sources.synthetic import (
    random_walks,
    robot_failures_clone,
    tokens_corpus,
    velocity_series,
)


def test_tokens_corpus_shape_and_determinism(spark):
    a = tokens_corpus(spark, 200).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = tokens_corpus(spark, 200, n_partitions=7).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == 200
    # content independent of partitioning — slice-stable corpus
    assert (a.doc_id == b.doc_id).all()
    assert all(list(x) == list(y) for x, y in zip(a.tokens, b.tokens))
    # invariants
    assert (a.n_tok == a.tokens.apply(len)).all()
    assert a.tokens.apply(lambda t: all(0 <= v < 50257 for v in t)).all()
    assert a.n_tok.between(16, 2048).all()
    # zipf-ish source mix: web dominates
    counts = a.source.value_counts(normalize=True)
    assert counts["web"] > 0.4


def test_tokens_corpus_slicing(spark):
    full = tokens_corpus(spark, 100).toPandas().set_index("doc_id")
    tail = tokens_corpus(spark, 40, start_id=60).toPandas().set_index("doc_id")
    for doc in tail.index:
        assert list(tail.loc[doc, "tokens"]) == list(full.loc[doc, "tokens"])


def test_random_walks(spark):
    df = random_walks(spark, 4, 50).toPandas()
    assert len(df) == 200
    one = df[df.id == 0].sort_values("time").value.values
    # a cumsum walk: increments are unit-normal-ish, not constant
    inc = np.diff(one)
    assert 0.3 < np.std(inc) < 3.0
    # deterministic
    again = random_walks(spark, 4, 50).toPandas()
    assert np.array_equal(
        df.sort_values(["id", "time"]).value.values,
        again.sort_values(["id", "time"]).value.values,
    )


def test_velocity_series(spark):
    df = velocity_series(spark, 3, 100).toPandas()
    assert len(df) == 300
    v = df[df.id == 1].sort_values("time").value.values
    assert np.isfinite(v).all()
    assert np.std(v) > 0


def test_robot_clone_shape(spark):
    df = robot_failures_clone(spark).toPandas()
    assert len(df) == 88 * 15
    assert df.id.between(1, 88).all()
    assert df.time.between(0, 14).all()
    for c in ["F_x", "F_y", "F_z", "T_x", "T_y", "T_z"]:
        assert df[c].between(-20, 20).all()
