"""Text-operator unit tests — pinned goldens on messy whitespace, proving
every operator shares ONE tokenization rule (\\s+ split, empty tokens
dropped; operators/text.py:_words == operators/dedup.py:_words)."""

import pytest

from tsfresh_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
)

DIRTY = "  the  cat\tsat \n on   the mat  "  # 6 words, every whitespace trap


@pytest.fixture(scope="module")
def dirty_df(spark):
    return spark.createDataFrame(
        [(1, DIRTY), (2, "a  b"), (3, "der die und das ist")],
        "doc_id int, text string",
    )


def test_text_stats_doubled_space_golden(spark, dirty_df):
    rows = {r.doc_id: r for r in text_stats(dirty_df).collect()}
    # "a  b": 2 words (NOT 3 — the doubled space yields no empty token)
    assert rows[2].n_words == 2
    assert rows[2].mean_word_len == 1.0
    assert rows[2].n_distinct_words == 2
    assert rows[2].type_token_ratio == 1.0
    assert rows[2].n_spaces == 2  # literal-space count is its own stat
    # full trap string: the|cat|sat|on|the|mat
    assert rows[1].n_words == 6
    assert rows[1].mean_word_len == pytest.approx(17 / 6)
    assert rows[1].n_distinct_words == 5


def test_word_counts_agree_across_operators(spark, dirty_df):
    """n_words must be identical between text_stats, token_count and
    quality_score on whitespace-dirty input — the round-2 inconsistency."""
    ts = {r.doc_id: r.n_words for r in text_stats(dirty_df).collect()}
    tc = {
        r.doc_id: r.n_whitespace_tokens for r in token_count(dirty_df).collect()
    }
    qs = {r.doc_id: r.n_words for r in quality_score(dirty_df).collect()}
    assert ts == tc == qs


def test_token_count_bpe_ish_golden(spark, dirty_df):
    rows = {r.doc_id: r for r in token_count(dirty_df).collect()}
    # the,cat,sat,on,the,mat -> ceil(3/4)*5 + ceil(2/4) = 6
    assert rows[1].n_bpe_ish_tokens == 6
    assert rows[2].n_whitespace_tokens == 2
    assert rows[2].n_bpe_ish_tokens == 2


def test_language_id_ignores_whitespace(spark, dirty_df):
    rows = {r.doc_id: r.predicted_lang for r in language_id(dirty_df).collect()}
    assert rows[1] == "en"
    assert rows[3] == "de"


def test_fingerprint_whitespace_invariant(spark):
    """Fingerprints are over the token sequence, so whitespace style must
    not change them."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a  b c d e\tf g h  i j")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert rows[1] == rows[2]


def test_tfidf_top_terms_golden(spark):
    """Hand-checkable 3-doc corpus: smooth idf = ln((N+1)/(df+1)) + 1."""
    import math

    from tsfresh_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(df, k=2).toPandas()
    rows = {(r.doc_id, r.term): r for _, r in out.iterrows()}
    # apple: tf=2 in doc1, df=1 → idf = ln(4/2)+1
    r = rows[(1, "apple")]
    assert r.tf == 2 and r.df == 1
    assert r.tfidf == round(2 * (math.log(4 / 2) + 1), 6)
    # durian: tf=1 df=1 beats cherry (tf=3, df=2) in doc 3? compare:
    cherry3 = 3 * (math.log(4 / 3) + 1)
    durian = 1 * (math.log(4 / 2) + 1)
    assert rows[(3, "cherry")].tfidf == round(cherry3, 6)
    assert rows[(3, "durian")].tfidf == round(durian, 6)
    # top-2 per doc only
    assert (out.groupby("doc_id").size() <= 2).all()
