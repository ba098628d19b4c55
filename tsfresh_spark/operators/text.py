"""Text-analysis operators: token counting, quality signals, language ID,
document fingerprinting.  All JVM-side expressions (split / transform /
aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# small multilingual stopword sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "für"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "dans", "que", "pour"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "on", "with", "as", "at", "by"]


def _words(text_col: str):
    """Whitespace tokens with empties dropped — the ONE tokenization rule
    shared by every text operator here AND by the dedup shinglers
    (operators/dedup.py imports this function).  Leading/trailing/
    consecutive whitespace never yields '' tokens, so word counts agree
    across the whole text plane."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))


def text_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Basic per-document statistics: characters, whitespace tokens, mean
    word length, distinct words, type-token ratio, space count.

    Tokenization is ``\\s+`` with empty tokens dropped — the SAME rule as
    ``token_count``/``quality_score``/the dedup shinglers, so consecutive
    spaces can never inflate ``n_words`` or deflate ``mean_word_len``
    relative to the other text operators."""
    t = F.col(text_col)
    words = _words(text_col)
    word_lens = F.transform(words, F.length)
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        (
            F.aggregate(word_lens, F.lit(0).cast("long"), lambda a, x: a + x).cast(
                "double"
            )
            / n_words
        ).alias("mean_word_len"),
        n_distinct.cast("long").alias("n_distinct_words"),
        (n_distinct.cast("double") / n_words).alias("type_token_ratio"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast("long").alias(
            "n_spaces"
        ),
    )


def token_count(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens plus a BPE-ish sub-word estimate: word-piece count
    approximated as ceil(word_len / 4) per word (the common ~4-chars/token
    heuristic), all in one expression."""
    words = _words(text_col)
    bpe_ish = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_whitespace_tokens"),
        bpe_ish.alias("n_bpe_ish_tokens"),
    )


def quality_score(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality signals in the Gopher/C4 style: length, mean word
    length band, stopword ratio, alpha ratio, repetition — composed into a
    [0, 1] score.  Pure column algebra."""
    t = F.col(text_col)
    words = _words(text_col)
    n_words = F.size(words)
    mean_wl = (
        F.aggregate(
            F.transform(words, F.length), F.lit(0).cast("long"), lambda a, x: a + x
        ).cast("double")
        / n_words
    )
    stop_ratio = (
        F.size(F.filter(words, lambda w: F.lower(w).isin(_EN_STOPWORDS))).cast("double")
        / n_words
    )
    alpha_ratio = (
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
        / F.greatest(F.length(t), F.lit(1))
    )
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.3, 0.25).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        distinct_ratio.alias("distinct_word_ratio"),
        score.alias("quality_score"),
    )


def language_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language heuristic: score each candidate language by its
    stopword hit count over the doc's words; argmax wins (ties → 'und').
    JVM-only; for production-quality LID swap in a fastText-style model via
    mapInPandas — the plumbing is the same."""
    words = F.transform(_words(text_col), F.lower)
    scores = [
        F.size(F.filter(words, lambda w: w.isin(markers))).alias(f"score_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col, *[f"score_{lang}" for lang in langs], pred.alias("predicted_lang")
    )


def fingerprint(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", window: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: minimum rolling hash over
    ``window``-gram shingles — a compact dedup/citation key."""
    words = _words(text_col)
    grams = F.filter(
        F.transform(
            words,
            lambda w, i: F.when(
                i + window <= F.size(words), F.concat_ws(" ", F.slice(words, i + 1, window))
            ),
        ),
        lambda g: g.isNotNull(),
    )
    return df.select(
        F.col(id_col),
        F.coalesce(
            F.array_min(F.transform(grams, lambda g: F.xxhash64(g))), F.xxhash64(F.col(text_col))
        ).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``(id, term, tf, df, tfidf)``.

    Standard smooth-idf form ``tfidf = tf · (ln((N+1)/(df+1)) + 1)`` over
    whitespace tokens (the shared ``_words`` rule), where ``tf`` is the raw
    in-document term count and ``df`` the number of documents containing
    the term.  Ranking happens on the ROUNDED score with the term string as
    tie-breaker so the selection is reproducible in any engine.

    Scale shape: one explode + two hash aggregations (doc-term counts,
    document frequencies); the df join shuffles on the term key, and the
    final top-k is a per-document window.  The corpus size rides along as a
    broadcast 1-row aggregate (a scalar subquery, not a driver collect), so
    the whole operator is ONE Spark job with no eager work up front.
    """
    words = _words(text_col)
    pairs = df.select(F.col(id_col), F.explode(words).alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count_distinct(id_col).cast("long").alias("df"))
    )
    ndocs = F.broadcast(
        df.agg(F.count_distinct(id_col).cast("double").alias("_n_docs"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(ndocs)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                round_digits,
            ),
        )
        .drop("_n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )
