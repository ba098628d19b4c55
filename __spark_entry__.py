"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the tsfresh_spark engine, and ``oracle_sql()`` carries an equivalent
ANSI-SQL formulation DuckDB runs on the same parquet tables.

Exactness design: the series values are ``CAST(ROUND(value*100) AS BIGINT)``
— integers — so every sum/count-derived feature is exactly representable in
float64 and therefore bit-identical across engines regardless of summation
order.  Where a result is genuinely float-path-dependent (quantile
interpolation, cosine similarity), both sides round to 6 decimals.
Kernel-path NaN surfaces as NULL (Arrow boundary); oracles CASE-NULL the
same conditions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------

_BASE_SQL = (
    "SELECT user_id, event_type, ts, event_id, "
    "CAST(ROUND(value*100) AS BIGINT) AS v FROM events"
)


def _events_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.sources.tables import events_long

    return events_long(spark, sf_dir)


def _events_tokens_longid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokens table keyed by (user_id: long, event_type) — oracle-friendly."""
    ev = _events_long(spark, sf_dir)
    return ev.groupBy("user_id", "event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "v"))),
            lambda s: s["v"],
        ).alias("tokens")
    )


# ---------------------------------------------------------------------------
# q01: kernel path (mapInPandas UDF) — exact integer features, long output
# ---------------------------------------------------------------------------

_EXACT_KERNELS = [
    "length",
    "sum_values",
    "minimum",
    "maximum",
    "absolute_maximum",
    "mean",
    "median",
    "abs_energy",
    "root_mean_square",
]


def q_extract_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    settings = {name: None for name in _EXACT_KERNELS}
    return extract_features_tokens(
        toks, settings, id_col="user_id", kind_col="event_type"
    )


_ORACLE_EXTRACT_KERNELS = f"""
WITH base AS ({_BASE_SQL}),
g AS (
  SELECT user_id, event_type,
         COUNT(*) AS n, SUM(v) AS s, SUM(v*v) AS ss,
         MIN(v) AS mn, MAX(v) AS mx, MEDIAN(v) AS med
  FROM base GROUP BY user_id, event_type
)
SELECT user_id, event_type, event_type || '__length' AS variable, CAST(n AS DOUBLE) AS value FROM g
UNION ALL SELECT user_id, event_type, event_type || '__sum_values', CAST(s AS DOUBLE) FROM g
UNION ALL SELECT user_id, event_type, event_type || '__minimum', CAST(mn AS DOUBLE) FROM g
UNION ALL SELECT user_id, event_type, event_type || '__maximum', CAST(mx AS DOUBLE) FROM g
UNION ALL SELECT user_id, event_type, event_type || '__absolute_maximum', GREATEST(ABS(CAST(mn AS DOUBLE)), ABS(CAST(mx AS DOUBLE))) FROM g
UNION ALL SELECT user_id, event_type, event_type || '__mean', CAST(s AS DOUBLE) / n FROM g
UNION ALL SELECT user_id, event_type, event_type || '__median', med FROM g
UNION ALL SELECT user_id, event_type, event_type || '__abs_energy', CAST(ss AS DOUBLE) FROM g
UNION ALL SELECT user_id, event_type, event_type || '__root_mean_square', SQRT(CAST(ss AS DOUBLE) / n) FROM g
"""


# ---------------------------------------------------------------------------
# q02: SQL fast path — unordered aggregates, JVM-side only
# ---------------------------------------------------------------------------


def q_stats_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.functions.sql_features import agg_feature_exprs

    ev = _events_long(spark, sf_dir)
    exprs = agg_feature_exprs(F.col("v"))
    keep = [
        "length",
        "sum_values",
        "mean",
        "minimum",
        "maximum",
        "absolute_maximum",
        "abs_energy",
        "root_mean_square",
        "variance",
        "standard_deviation",
        "variance_larger_than_standard_deviation",
        "median",
        "has_duplicate",
        "ratio_value_number_to_time_series_length",
    ]
    return ev.groupBy("user_id", "event_type").agg(
        *[exprs[k].alias(k) for k in keep]
    )


_ORACLE_STATS_SQL = f"""
WITH base AS ({_BASE_SQL}),
g AS (
  SELECT user_id, event_type,
         COUNT(*) AS n,
         SUM(CAST(v AS DOUBLE)) AS s,
         SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE)) AS ss,
         MIN(CAST(v AS DOUBLE)) AS mn, MAX(CAST(v AS DOUBLE)) AS mx,
         MEDIAN(v) AS med,
         COUNT(DISTINCT v) AS nd
  FROM base GROUP BY user_id, event_type
)
SELECT user_id, event_type,
  CAST(n AS DOUBLE) AS length,
  s AS sum_values,
  s / n AS mean,
  mn AS minimum,
  mx AS maximum,
  GREATEST(ABS(mn), ABS(mx)) AS absolute_maximum,
  ss AS abs_energy,
  SQRT(ss / n) AS root_mean_square,
  ss / n - (s / n) * (s / n) AS variance,
  SQRT(ss / n - (s / n) * (s / n)) AS standard_deviation,
  CAST(ss / n - (s / n) * (s / n) > 1.0 AS DOUBLE) AS variance_larger_than_standard_deviation,
  med AS median,
  CAST(nd < n AS DOUBLE) AS has_duplicate,
  nd / n AS ratio_value_number_to_time_series_length
FROM g
"""


# ---------------------------------------------------------------------------
# q03: ordered class-B features via higher-order array functions (no UDF)
# ---------------------------------------------------------------------------


def q_array_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.functions.sql_features import array_feature_exprs

    toks = _events_tokens_longid(spark, sf_dir)
    exprs = array_feature_exprs(F.col("tokens"))
    keep = [
        "mean_change",
        "mean_abs_change",
        "absolute_sum_of_changes",
        "mean_second_derivative_central",
        "first_location_of_maximum",
        "last_location_of_maximum",
        "first_location_of_minimum",
        "last_location_of_minimum",
        "count_above_mean",
        "count_below_mean",
        "number_crossing_0",
    ]
    return toks.select(
        "user_id", "event_type", *[exprs[k].alias(k) for k in keep]
    )


_ORACLE_ARRAY_FEATURES = f"""
WITH base AS ({_BASE_SQL}),
w AS (
  SELECT user_id, event_type, v,
         LAG(v) OVER po AS pv,
         ROW_NUMBER() OVER po AS rn,
         COUNT(*) OVER p AS n,
         MAX(v) OVER p AS mx, MIN(v) OVER p AS mn,
         SUM(v) OVER p AS s
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id),
         p AS (PARTITION BY user_id, event_type)
),
g AS (
  SELECT user_id, event_type,
         MAX(n) AS n, MAX(mx) AS mx, MAX(mn) AS mn, MAX(s) AS s,
         SUM(ABS(v - pv)) AS sad,
         MAX(CASE WHEN rn = 1 THEN v END) AS first_v,
         MAX(CASE WHEN rn = n THEN v END) AS last_v,
         MAX(CASE WHEN rn = 2 THEN v END) AS second_v,
         MAX(CASE WHEN rn = n - 1 THEN v END) AS secondlast_v,
         MIN(CASE WHEN v = mx THEN rn END) AS first_max_rn,
         MAX(CASE WHEN v = mx THEN rn END) AS last_max_rn,
         MIN(CASE WHEN v = mn THEN rn END) AS first_min_rn,
         MAX(CASE WHEN v = mn THEN rn END) AS last_min_rn,
         SUM(CASE WHEN pv IS NOT NULL AND ((v > 0) <> (pv > 0)) THEN 1 ELSE 0 END) AS crossings,
         SUM(CASE WHEN v * n > s THEN 1 ELSE 0 END) AS n_above_mean,
         SUM(CASE WHEN v * n < s THEN 1 ELSE 0 END) AS n_below_mean
  FROM w GROUP BY user_id, event_type
)
SELECT user_id, event_type,
  CASE WHEN n > 1 THEN CAST(last_v - first_v AS DOUBLE) / (n - 1) END AS mean_change,
  CASE WHEN n > 1 THEN CAST(sad AS DOUBLE) / (n - 1) END AS mean_abs_change,
  CASE WHEN n > 1 THEN CAST(sad AS DOUBLE) ELSE 0.0 END AS absolute_sum_of_changes,
  CASE WHEN n > 2 THEN CAST(last_v - secondlast_v - second_v + first_v AS DOUBLE) / (2 * (n - 2)) END AS mean_second_derivative_central,
  CAST(first_max_rn - 1 AS DOUBLE) / n AS first_location_of_maximum,
  1.0 - CAST(n - last_max_rn AS DOUBLE) / n AS last_location_of_maximum,
  CAST(first_min_rn - 1 AS DOUBLE) / n AS first_location_of_minimum,
  1.0 - CAST(n - last_min_rn AS DOUBLE) / n AS last_location_of_minimum,
  CAST(n_above_mean AS DOUBLE) AS count_above_mean,
  CAST(n_below_mean AS DOUBLE) AS count_below_mean,
  CAST(crossings AS DOUBLE) AS number_crossing_0
FROM g
"""


# ---------------------------------------------------------------------------
# q04: longest strike above/below mean — kernels vs gaps-and-islands SQL
# ---------------------------------------------------------------------------


def q_longest_strike(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {"longest_strike_above_mean": None, "longest_strike_below_mean": None},
        id_col="user_id",
        kind_col="event_type",
    )
    return (
        long_df.withColumn("variable", F.split("variable", "__").getItem(1))
        .groupBy("user_id", "event_type")
        .pivot("variable", ["longest_strike_above_mean", "longest_strike_below_mean"])
        .agg(F.first("value"))
    )


_ORACLE_LONGEST_STRIKE = f"""
WITH base AS ({_BASE_SQL}),
stats AS (
  SELECT user_id, event_type, SUM(v) AS s, COUNT(*) AS n
  FROM base GROUP BY user_id, event_type
),
flags AS (
  SELECT b.user_id, b.event_type, b.ts, b.event_id,
         b.v * st.n > st.s AS above, b.v * st.n < st.s AS below
  FROM base b JOIN stats st USING (user_id, event_type)
),
runs AS (
  SELECT user_id, event_type, above, below,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type, above ORDER BY ts, event_id) AS grp_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type, below ORDER BY ts, event_id) AS grp_b
  FROM flags
),
lens_a AS (
  SELECT user_id, event_type, above, COUNT(*) AS len
  FROM runs GROUP BY user_id, event_type, above, grp_a
),
lens_b AS (
  SELECT user_id, event_type, below, COUNT(*) AS len
  FROM runs GROUP BY user_id, event_type, below, grp_b
),
agg_a AS (
  SELECT user_id, event_type, MAX(CASE WHEN above THEN len ELSE 0 END) AS la
  FROM lens_a GROUP BY user_id, event_type
),
agg_b AS (
  SELECT user_id, event_type, MAX(CASE WHEN below THEN len ELSE 0 END) AS lb
  FROM lens_b GROUP BY user_id, event_type
)
SELECT a.user_id, a.event_type,
       CAST(a.la AS DOUBLE) AS longest_strike_above_mean,
       CAST(b.lb AS DOUBLE) AS longest_strike_below_mean
FROM agg_a a JOIN agg_b b USING (user_id, event_type)
"""


# ---------------------------------------------------------------------------
# q05: quantiles (rounded — interpolation is float-path-dependent)
# ---------------------------------------------------------------------------

_QS = [0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9]


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_long(spark, sf_dir)
    aggs = [
        F.round(F.percentile(F.col("v").cast("double"), F.lit(q)), 6).alias(
            f"q_{int(q*10)}"
        )
        for q in _QS
    ]
    return ev.groupBy("user_id", "event_type").agg(*aggs)


_ORACLE_QUANTILES = f"""
WITH base AS ({_BASE_SQL})
SELECT user_id, event_type,
  {", ".join(f"ROUND(QUANTILE_CONT(v, {q}), 6) AS q_{int(q*10)}" for q in _QS)}
FROM base GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# q06: tumbling-window rollup (continuous-aggregate primitive)
# ---------------------------------------------------------------------------


def q_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_long(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").cast("double").alias("n_events"),
            F.sum("v").cast("double").alias("sum_v"),
            F.min("v").cast("double").alias("min_v"),
            F.max("v").cast("double").alias("max_v"),
        )
        .select(
            "user_id", F.col("w.start").alias("hour_start"),
            "n_events", "sum_v", "min_v", "max_v",
        )
    )


_ORACLE_WINDOW_ROLLUP = f"""
WITH base AS ({_BASE_SQL})
SELECT user_id, DATE_TRUNC('hour', ts) AS hour_start,
       CAST(COUNT(*) AS DOUBLE) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS sum_v,
       CAST(MIN(v) AS DOUBLE) AS min_v,
       CAST(MAX(v) AS DOUBLE) AS max_v
FROM base GROUP BY user_id, DATE_TRUNC('hour', ts)
"""


# ---------------------------------------------------------------------------
# q07: exact deduplication over documents (hash-groupBy)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.dedup import exact_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_duplicates(docs, text_col="text", id_col="doc_id")


_ORACLE_DEDUP_EXACT = """
SELECT doc_id,
       MD5(text) AS text_hash,
       CAST(COUNT(*) OVER (PARTITION BY MD5(text)) AS BIGINT) AS dup_count,
       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY MD5(text)) AS BIGINT) AS is_duplicate
FROM documents
"""


# ---------------------------------------------------------------------------
# q08: text statistics (token counting / quality signals)
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_stats(docs, text_col="text", id_col="doc_id")


_ORACLE_TEXT_STATS = """
WITH w AS (
  SELECT doc_id, text, STRING_SPLIT(text, ' ') AS words FROM documents
)
SELECT doc_id,
  CAST(LENGTH(text) AS BIGINT) AS n_chars,
  CAST(LEN(words) AS BIGINT) AS n_words,
  CAST(LIST_AGGREGATE(LIST_TRANSFORM(words, w -> LENGTH(w)), 'sum') AS DOUBLE) / LEN(words) AS mean_word_len,
  CAST(LEN(LIST_DISTINCT(words)) AS BIGINT) AS n_distinct_words,
  LEN(LIST_DISTINCT(words)) / LEN(words) AS type_token_ratio,
  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_spaces
FROM w
"""


# ---------------------------------------------------------------------------
# q09: brute-force cosine top-k over embeddings (similarity-search baseline)
# ---------------------------------------------------------------------------


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk_bruteforce(
        emb, queries, id_col="vec_id", vec_col="embedding", k=3
    )


_ORACLE_EMBEDDING_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 8),
pairs AS (
  SELECT q.qid, e.vec_id AS nid,
         ROUND(LIST_DOT_PRODUCT(e.emb, q.qemb)
               / (SQRT(LIST_DOT_PRODUCT(e.emb, e.emb)) * SQRT(LIST_DOT_PRODUCT(q.qemb, q.qemb))), 6) AS sim
  FROM e, q WHERE e.vec_id <> q.qid
)
SELECT qid, nid, sim FROM (
  SELECT qid, nid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
  FROM pairs
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: shuffle-free kernel extraction (minimal set) over the tokens
    table derived from sf0.001 events."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tsfresh_spark.extract import extract_features_tokens
    from tsfresh_spark.settings import minimal_settings

    toks = _events_tokens_longid(spark, "/root/testdata/sf0.001")
    return extract_features_tokens(
        toks, minimal_settings(), id_col="user_id", kind_col="event_type"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_kernels_exact": q_extract_kernels,
        "stats_sql_fastpath": q_stats_sql,
        "array_features_ordered": q_array_features,
        "longest_strike": q_longest_strike,
        "quantiles": q_quantiles,
        "window_rollup_1h": q_window_rollup,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "embedding_cosine_topk": q_embedding_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_kernels_exact": _ORACLE_EXTRACT_KERNELS,
        "stats_sql_fastpath": _ORACLE_STATS_SQL,
        "array_features_ordered": _ORACLE_ARRAY_FEATURES,
        "longest_strike": _ORACLE_LONGEST_STRIKE,
        "quantiles": _ORACLE_QUANTILES,
        "window_rollup_1h": _ORACLE_WINDOW_ROLLUP,
        "dedup_exact": _ORACLE_DEDUP_EXACT,
        "text_stats": _ORACLE_TEXT_STATS,
        "embedding_cosine_topk": _ORACLE_EMBEDDING_TOPK,
    }
