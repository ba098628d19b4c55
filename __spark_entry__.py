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


def _prep(spark: SparkSession) -> None:
    import sys

    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    # timestamp bucketing must agree with the (timezone-naive) DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # executor python workers import tsfresh_spark by name (cloudpickle
    # serializes module functions by reference): ship the package zip so the
    # session works regardless of the driver's working directory
    if not getattr(_prep, "_shipped", None):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_tsfresh_spark_packager", "/root/repo/scripts/package.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        zip_path = mod.main()
        spark.sparkContext.addPyFile(zip_path)
        _prep._shipped = zip_path


def _events_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.sources.tables import events_long

    return events_long(spark, sf_dir)


def _tokens_groupby(ev: DataFrame) -> DataFrame:
    """groupBy(user_id, event_type) → sorted token arrays, with the group
    shuffle PINNED on the keys (round-6 fix): AQE's byte-based partition
    coalescing sees a sub-1MB aggregated frame and collapses the shuffle
    read to ONE partition (measured: the downstream compute-bound
    mapInPandas kernel stage ran as a single task at sf0.1, ~1.5 effective
    cores for ~30 queries).  An explicit keyed repartition is honored by
    AQE, the aggregate reuses its exchange (no extra shuffle), and the
    Arrow stage inherits the pinned width — the exact trap/fix already
    documented for applyInPandas in CLAUDE.md, now applied to the tokens
    builders too."""
    from tsfresh_spark.plans.partitioning import pin_group_partitions

    return pin_group_partitions(ev, "user_id", "event_type").groupBy(
        "user_id", "event_type"
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "v"))),
            lambda s: s["v"],
        ).alias("tokens")
    )


def _events_tokens_longid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokens table keyed by (user_id: long, event_type) — oracle-friendly."""
    _prep(spark)
    return _tokens_groupby(_events_long(spark, sf_dir))


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


def q_extract_long_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own Spark-binding shape (bindings.py:164-265):
    long frame → groupBy(id, kind).applyInPandas with in-UDF sort — the
    grouped/shuffled sibling of the shuffle-free tokens path.  Shares the
    tokens-path oracle because the two physical plans must produce
    IDENTICAL values (same kernels, same per-series order)."""
    _prep(spark)
    from tsfresh_spark.extract import extract_features_long

    ev = _events_long(spark, sf_dir)
    long_df = ev.select(
        F.col("user_id"),
        F.col("event_type"),
        "ts",
        "event_id",
        F.col("v").cast("double").alias("value"),
    )
    settings = {name: None for name in _EXACT_KERNELS}
    # composite sort key (ts, event_id) — the same deterministic in-series
    # order the tokens path bakes into array_sort
    return extract_features_long(
        long_df,
        settings,
        column_id="user_id",
        column_kind="event_type",
        column_sort=["ts", "event_id"],
        column_value="value",
    )


def q_extract_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third physical strategy under the SAME oracle: the Catalyst
    hybrid engine (extract.py:_extract_tokens_hybrid) evaluates the
    SQL-coverable calculator subset as built-in array expressions — zero
    Python for the covered set — and must be bit-identical to the kernel
    path on integer tokens.  Previously only checksum-equal in pytest
    (test_hybrid_engine.py); this entry puts it under the driver's
    DuckDB gate (VERDICT r4 next-round #5)."""
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    settings = {name: None for name in _EXACT_KERNELS}
    return extract_features_tokens(
        toks,
        settings,
        id_col="user_id",
        kind_col="event_type",
        engine="hybrid",
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
    _prep(spark)
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
    _prep(spark)
    from tsfresh_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_stats(docs, text_col="text", id_col="doc_id")


_ORACLE_TEXT_STATS = """
WITH w AS (
  SELECT doc_id, text,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x <> '') AS words
  FROM documents
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
    _prep(spark)
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
# q10: gap-fill — 1-minute grid regularize + forward-fill (window functions)
# ---------------------------------------------------------------------------


def q_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.gapfill import regularize_and_fill

    ev = _events_long(spark, sf_dir)
    filled = regularize_and_fill(
        ev.select("user_id", "event_type", "ts", "v"),
        id_cols=["user_id", "event_type"],
        ts_col="ts",
        value_col="v",
        step="1 hour",
        method="ffill",
    )
    return filled.select("user_id", "event_type", "bucket_ts", "v")


def q_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.gapfill import regularize_and_fill

    ev = _events_long(spark, sf_dir)
    filled = regularize_and_fill(
        ev.select("user_id", "event_type", "ts", "v"),
        id_cols=["user_id", "event_type"],
        ts_col="ts",
        value_col="v",
        step="1 hour",
        method="linear",
    )
    # round(6): interpolation is float-path-dependent in principle; both
    # engines compute the identical expression over exact integers, the
    # round is belt-and-braces
    return filled.select(
        "user_id",
        "event_type",
        "bucket_ts",
        F.round(F.col("v").cast("double"), 6).alias("v"),
    )


_ORACLE_GAPFILL_LINEAR = f"""
WITH base AS ({_BASE_SQL}),
obs AS (
  SELECT user_id, event_type, DATE_TRUNC('hour', ts) AS bucket_ts,
         ARG_MAX(v, ts) AS v
  FROM base GROUP BY user_id, event_type, DATE_TRUNC('hour', ts)
),
bounds AS (
  SELECT user_id, event_type, MIN(bucket_ts) AS a, MAX(bucket_ts) AS b
  FROM obs GROUP BY user_id, event_type
),
grid AS (
  SELECT user_id, event_type,
         UNNEST(GENERATE_SERIES(a, b, INTERVAL 1 HOUR)) AS bucket_ts
  FROM bounds
),
joined AS (
  SELECT g.user_id, g.event_type, g.bucket_ts, o.v
  FROM grid g LEFT JOIN obs o USING (user_id, event_type, bucket_ts)
),
nb AS (
  SELECT *,
    LAST_VALUE(v IGNORE NULLS) OVER w_back AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS)
      OVER w_back AS pt,
    FIRST_VALUE(v IGNORE NULLS) OVER w_fwd AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS)
      OVER w_fwd AS nt
  FROM joined
  WINDOW
    w_back AS (PARTITION BY user_id, event_type ORDER BY bucket_ts
               ROWS UNBOUNDED PRECEDING),
    w_fwd AS (PARTITION BY user_id, event_type ORDER BY bucket_ts
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_type, bucket_ts,
  ROUND(CASE
    WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
    ELSE pv + (nv - pv) * (epoch(bucket_ts) - pt) / (nt - pt)
  END, 6) AS v
FROM nb
"""


_ORACLE_GAPFILL_FFILL = f"""
WITH base AS ({_BASE_SQL}),
obs AS (
  SELECT user_id, event_type, DATE_TRUNC('hour', ts) AS bucket_ts,
         ARG_MAX(v, ts) AS v
  FROM base GROUP BY user_id, event_type, DATE_TRUNC('hour', ts)
),
bounds AS (
  SELECT user_id, event_type, MIN(bucket_ts) AS a, MAX(bucket_ts) AS b
  FROM obs GROUP BY user_id, event_type
),
grid AS (
  SELECT user_id, event_type,
         UNNEST(GENERATE_SERIES(a, b, INTERVAL 1 HOUR)) AS bucket_ts
  FROM bounds
),
joined AS (
  SELECT g.user_id, g.event_type, g.bucket_ts, o.v
  FROM grid g LEFT JOIN obs o USING (user_id, event_type, bucket_ts)
),
grp AS (
  SELECT *, COUNT(v) OVER (PARTITION BY user_id, event_type ORDER BY bucket_ts
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM joined
)
SELECT user_id, event_type, bucket_ts,
       MAX(v) OVER (PARTITION BY user_id, event_type, g) AS v
FROM grp
"""


# ---------------------------------------------------------------------------
# q11: rolling sub-series generation (roll_time_series)
# ---------------------------------------------------------------------------


def q_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.operators.rolling import roll_time_series

    ev = _events_long(spark, sf_dir).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        ),
    )
    rolled = roll_time_series(
        ev.select("user_id", "event_type", "rn", "v"),
        column_id="user_id",
        column_kind="event_type",
        column_sort="rn",
        column_value="v",
        max_timeshift=4,
        min_timeshift=2,
    )
    return rolled.select(
        F.col("id.orig").alias("user_id"),
        F.col("id.shift").alias("window_end_rn"),
        F.col("kind").alias("event_type"),
        F.col("rn"),
        F.col("v"),
    )


_ORACLE_ROLLING_WINDOWS = f"""
WITH base AS ({_BASE_SQL}),
numbered AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
)
SELECT a.user_id, a.rn AS window_end_rn, a.event_type, b.rn, b.v
FROM numbered a
JOIN numbered b
  ON a.user_id = b.user_id AND a.event_type = b.event_type
 AND b.rn BETWEEN a.rn - 4 AND a.rn
WHERE LEAST(a.rn, 5) >= 3  -- min_timeshift=2 → windows of ≥3 points
"""


# ---------------------------------------------------------------------------
# q12: rollup tier — gap-filled base grid → 1h continuous aggregate
# ---------------------------------------------------------------------------

_ROLLUP_FEATURES = ["length", "sum_values", "minimum", "maximum", "mean"]


def q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.rollup import RollupEngine

    ev = _events_long(spark, sf_dir)
    points = ev.select(
        "user_id",
        "event_type",
        # NTZ → TS (session tz pinned UTC) → epoch seconds
        F.col("ts").cast("timestamp").cast("long").alias("ts"),
        F.col("v").cast("double").alias("value"),
    )
    eng = RollupEngine(
        spark,
        "/tmp/tsfresh_spark_unused",
        settings={name: None for name in _ROLLUP_FEATURES},
        id_cols=("user_id", "event_type"),
        base_step_seconds=3600,
        base_impl="compact",
    )
    # compact base (1 shuffle; byte-identical to the window-function path,
    # tests/test_rollup.py::test_compact_base_tier_bitexact) + narrow split
    base = eng.compute_base(points)
    # with_payload=False: this query discards the payload column, so the
    # cascade must not pay the per-window Gorilla re-encode (guide §1.2);
    # features/n_points are identical (tests/test_rollup.py)
    tier = eng.compute_tier(base, 86400, with_payload=False)
    return tier.select(
        "user_id",
        "event_type",
        "window_start",
        F.col("n_points").cast("double").alias("n_points"),
        F.explode("features").alias("variable", "value"),
    )


_ORACLE_ROLLUP_1H = f"""
WITH base AS ({_BASE_SQL}),
obs AS (
  SELECT user_id, event_type,
         CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS bucket,
         ARG_MAX(v, ts) AS v
  FROM base GROUP BY 1, 2, 3
),
bounds AS (
  SELECT user_id, event_type, MIN(bucket) AS a, MAX(bucket) AS b
  FROM obs GROUP BY user_id, event_type
),
grid AS (
  SELECT user_id, event_type, UNNEST(GENERATE_SERIES(a, b, 3600)) AS bucket
  FROM bounds
),
joined AS (
  SELECT g.user_id, g.event_type, g.bucket, o.v
  FROM grid g LEFT JOIN obs o USING (user_id, event_type, bucket)
),
grp AS (
  SELECT *, COUNT(v) OVER (PARTITION BY user_id, event_type ORDER BY bucket
                           ROWS UNBOUNDED PRECEDING) AS gid
  FROM joined
),
filled AS (
  SELECT user_id, event_type, bucket,
         MAX(v) OVER (PARTITION BY user_id, event_type, gid) AS v
  FROM grp
),
daily AS (
  SELECT user_id, event_type, bucket - bucket % 86400 AS window_start,
         COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM filled WHERE v IS NOT NULL
  GROUP BY user_id, event_type, bucket - bucket % 86400
)
SELECT user_id, event_type, window_start, CAST(n AS DOUBLE) AS n_points,
       event_type || '__length' AS variable, CAST(n AS DOUBLE) AS value FROM daily
UNION ALL SELECT user_id, event_type, window_start, CAST(n AS DOUBLE),
       event_type || '__sum_values', CAST(s AS DOUBLE) FROM daily
UNION ALL SELECT user_id, event_type, window_start, CAST(n AS DOUBLE),
       event_type || '__minimum', CAST(mn AS DOUBLE) FROM daily
UNION ALL SELECT user_id, event_type, window_start, CAST(n AS DOUBLE),
       event_type || '__maximum', CAST(mx AS DOUBLE) FROM daily
UNION ALL SELECT user_id, event_type, window_start, CAST(n AS DOUBLE),
       event_type || '__mean', CAST(s AS DOUBLE) / n FROM daily
"""


# ---------------------------------------------------------------------------
# q13-q15: language id, quality score, token count over documents
# ---------------------------------------------------------------------------


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs, text_col="text", id_col="doc_id")


_ORACLE_LANGUAGE_ID = """
WITH w AS (
  SELECT doc_id,
         LIST_TRANSFORM(
           LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x <> ''),
           t -> LOWER(t)) AS words
  FROM documents
),
scored AS (
  SELECT doc_id,
    CAST(LEN(LIST_FILTER(words, t -> t IN ('the','and','of','to','in','is','that','it','for','was'))) AS BIGINT) AS score_en,
    CAST(LEN(LIST_FILTER(words, t -> t IN ('der','die','und','das','ist','nicht','ein','mit','auf','für'))) AS BIGINT) AS score_de,
    CAST(LEN(LIST_FILTER(words, t -> t IN ('el','la','de','que','y','en','los','del','las','por'))) AS BIGINT) AS score_es,
    CAST(LEN(LIST_FILTER(words, t -> t IN ('le','la','de','et','les','des','est','dans','que','pour'))) AS BIGINT) AS score_fr
  FROM w
)
SELECT doc_id, score_en, score_de, score_es, score_fr,
  CASE WHEN GREATEST(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
       WHEN score_en = GREATEST(score_en, score_de, score_es, score_fr) THEN 'en'
       WHEN score_de = GREATEST(score_en, score_de, score_es, score_fr) THEN 'de'
       WHEN score_es = GREATEST(score_en, score_de, score_es, score_fr) THEN 'es'
       ELSE 'fr' END AS predicted_lang
FROM scored
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_score(docs, text_col="text", id_col="doc_id")


_ORACLE_QUALITY_SCORE = """
WITH w AS (
  SELECT doc_id, text,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id, text, words,
    CAST(LEN(words) AS BIGINT) AS n_words,
    CAST(LIST_AGGREGATE(LIST_TRANSFORM(words, t -> LENGTH(t)), 'sum') AS DOUBLE) / LEN(words) AS mean_word_len,
    CAST(LEN(LIST_FILTER(words, t -> LOWER(t) IN
      ('the','and','of','to','in','is','that','it','for','was','a','an','on','with','as','at','by'))) AS DOUBLE)
      / LEN(words) AS stopword_ratio,
    CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      / GREATEST(LENGTH(text), 1) AS alpha_ratio,
    CAST(LEN(LIST_DISTINCT(words)) AS DOUBLE) / LEN(words) AS distinct_word_ratio
  FROM w
)
SELECT doc_id, n_words, mean_word_len, stopword_ratio, alpha_ratio,
       distinct_word_ratio,
       (CASE WHEN n_words BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END
        + CASE WHEN mean_word_len BETWEEN 3 AND 10 THEN 0.25 ELSE 0.0 END
        + CASE WHEN stopword_ratio >= 0.01 THEN 0.25 ELSE 0.0 END
        + CASE WHEN distinct_word_ratio >= 0.3 THEN 0.25 ELSE 0.0 END) AS quality_score
FROM m
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_count(docs, text_col="text", id_col="doc_id")


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.text import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_top_terms(docs, text_col="text", id_col="doc_id", k=3)


_ORACLE_TFIDF = """
WITH w AS (
  SELECT doc_id,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
pairs AS (SELECT doc_id, UNNEST(words) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM pairs GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM pairs GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         ROUND(t.tf * (LN((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


_ORACLE_TOKEN_COUNT = """
WITH w AS (
  SELECT doc_id,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
  CAST(LEN(words) AS BIGINT) AS n_whitespace_tokens,
  CAST(LIST_AGGREGATE(LIST_TRANSFORM(words, t -> CAST(CEIL(LENGTH(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS n_bpe_ish_tokens
FROM w
"""


# ---------------------------------------------------------------------------
# q18: number_peaks — kernel path vs windowed-SQL replica (exact ints)
# ---------------------------------------------------------------------------

_PEAK_NS = [1, 3, 5]


def q_number_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {"number_peaks": [{"n": n} for n in _PEAK_NS]},
        id_col="user_id",
        kind_col="event_type",
    )
    return (
        long_df.withColumn("variable", F.regexp_extract("variable", r"n_(\d+)$", 1))
        .groupBy("user_id", "event_type")
        .pivot("variable", [str(n) for n in _PEAK_NS])
        .agg(F.first("value"))
        .withColumnsRenamed({str(n): f"peaks_n{n}" for n in _PEAK_NS})
    )


_ORACLE_NUMBER_PEAKS = f"""
WITH base AS ({_BASE_SQL}),
w AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER po AS rn, COUNT(*) OVER p AS cnt,
         {", ".join(
             f"MAX(v) OVER (po ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING) AS mb{n}, "
             f"MAX(v) OVER (po ROWS BETWEEN 1 FOLLOWING AND {n} FOLLOWING) AS ma{n}"
             for n in _PEAK_NS
         )}
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id),
         p AS (PARTITION BY user_id, event_type)
)
SELECT user_id, event_type,
  {", ".join(
      f"CAST(SUM(CASE WHEN rn > {n} AND rn <= cnt - {n} AND v > mb{n} AND v > ma{n} "
      f"THEN 1 ELSE 0 END) AS DOUBLE) AS peaks_n{n}"
      for n in _PEAK_NS
  )}
FROM w GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# q19: reoccurring-value statistics — kernel path vs value-counts SQL
# ---------------------------------------------------------------------------

_REOCCURRING = [
    "percentage_of_reoccurring_values_to_all_values",
    "percentage_of_reoccurring_datapoints_to_all_datapoints",
    "sum_of_reoccurring_values",
    "sum_of_reoccurring_data_points",
]


def q_reoccurring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {name: None for name in _REOCCURRING},
        id_col="user_id",
        kind_col="event_type",
    )
    return (
        long_df.withColumn("variable", F.split("variable", "__").getItem(1))
        .groupBy("user_id", "event_type")
        .pivot("variable", _REOCCURRING)
        .agg(F.first("value"))
    )


_ORACLE_REOCCURRING = f"""
WITH base AS ({_BASE_SQL}),
vc AS (
  SELECT user_id, event_type, v, COUNT(*) AS c
  FROM base GROUP BY user_id, event_type, v
),
g AS (
  SELECT user_id, event_type,
         COUNT(*) AS n_distinct,
         SUM(c) AS n_points,
         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_reoccurring_values,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS n_reoccurring_points,
         SUM(CASE WHEN c > 1 THEN v ELSE 0 END) AS sum_reoccurring_values,
         SUM(CASE WHEN c > 1 THEN v * c ELSE 0 END) AS sum_reoccurring_points
  FROM vc GROUP BY user_id, event_type
)
SELECT user_id, event_type,
  CAST(n_reoccurring_values AS DOUBLE) / n_distinct
    AS percentage_of_reoccurring_values_to_all_values,
  CAST(n_reoccurring_points AS DOUBLE) / n_points
    AS percentage_of_reoccurring_datapoints_to_all_datapoints,
  CAST(sum_reoccurring_values AS DOUBLE) AS sum_of_reoccurring_values,
  CAST(sum_reoccurring_points AS DOUBLE) AS sum_of_reoccurring_data_points
FROM g
"""


# ---------------------------------------------------------------------------
# q20: c3 + time-reversal asymmetry — lag-product kernels vs LEAD SQL
# ---------------------------------------------------------------------------

_LAGS = [1, 2, 3]


def q_lag_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {
            "c3": [{"lag": lag} for lag in _LAGS],
            "time_reversal_asymmetry_statistic": [{"lag": lag} for lag in _LAGS],
        },
        id_col="user_id",
        kind_col="event_type",
    )
    short = F.when(
        F.col("variable").contains("time_reversal"), F.lit("trev")
    ).otherwise(F.lit("c3"))
    lag = F.regexp_extract("variable", r"lag_(\d+)$", 1)
    return (
        long_df.withColumn("variable", F.concat(short, F.lit("_lag"), lag))
        .groupBy("user_id", "event_type")
        .pivot("variable", [f"{p}_lag{lag}" for p in ("c3", "trev") for lag in _LAGS])
        .agg(F.first("value"))
    )


_ORACLE_LAG_PRODUCTS = f"""
WITH base AS ({_BASE_SQL}),
w AS (
  SELECT user_id, event_type, v,
         COUNT(*) OVER p AS n,
         {", ".join(
             f"LEAD(v, {lag}) OVER po AS v{lag}, LEAD(v, {2*lag}) OVER po AS v{2*lag}x"
             for lag in _LAGS
         )}
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id),
         p AS (PARTITION BY user_id, event_type)
)
SELECT user_id, event_type,
  {", ".join(
      f"CASE WHEN MAX(n) > {2*lag} THEN CAST(SUM(v{2*lag}x * v{lag} * v) AS DOUBLE)"
      f" / (MAX(n) - {2*lag}) ELSE 0.0 END AS c3_lag{lag}"
      for lag in _LAGS
  )},
  {", ".join(
      f"CASE WHEN MAX(n) > {2*lag} THEN CAST(SUM(v{2*lag}x * v{2*lag}x * v{lag}"
      f" - v{lag} * v * v) AS DOUBLE) / (MAX(n) - {2*lag}) ELSE 0.0 END AS trev_lag{lag}"
      for lag in _LAGS
  )}
FROM w GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# q21: energy_ratio_by_chunks — np.array_split remainder rule in SQL
# ---------------------------------------------------------------------------

_SEGMENTS = 10


def q_energy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {
            "energy_ratio_by_chunks": [
                {"num_segments": _SEGMENTS, "segment_focus": i}
                for i in range(_SEGMENTS)
            ]
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return long_df.select(
        "user_id",
        "event_type",
        F.regexp_extract("variable", r"segment_focus_(\d+)$", 1)
        .cast("long")
        .alias("segment"),
        "value",
    )


_ORACLE_ENERGY_RATIO = f"""
WITH base AS ({_BASE_SQL}),
w AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS i,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
seg AS (
  -- np.array_split: first (n % k) chunks have size n//k + 1
  SELECT user_id, event_type, v, n,
         CASE WHEN i < (n % {_SEGMENTS}) * (n // {_SEGMENTS} + 1)
              THEN i // (n // {_SEGMENTS} + 1)
              ELSE (n % {_SEGMENTS})
                   + (i - (n % {_SEGMENTS}) * (n // {_SEGMENTS} + 1)) // (n // {_SEGMENTS})
         END AS segment
  FROM w
),
per_seg AS (
  SELECT user_id, event_type, segment, SUM(v*v) AS e
  FROM seg GROUP BY user_id, event_type, segment
),
totals AS (
  SELECT user_id, event_type, SUM(e) AS te FROM per_seg
  GROUP BY user_id, event_type
),
grid AS (
  SELECT t.user_id, t.event_type, s.segment, t.te
  FROM totals t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_SEGMENTS - 1})) AS segment) s
)
SELECT g.user_id, g.event_type, CAST(g.segment AS BIGINT) AS segment,
       CASE WHEN g.te = 0 THEN NULL
            ELSE CAST(COALESCE(p.e, 0) AS DOUBLE) / g.te END AS value
FROM grid g LEFT JOIN per_seg p
  ON g.user_id = p.user_id AND g.event_type = p.event_type AND g.segment = p.segment
"""


# ---------------------------------------------------------------------------
# fft plane: fft_coefficient (k ≤ 4, all four attrs) + fft_aggregated moments
# — the single most-used advanced family (400 of the 794 default columns are
# fft_coefficient; reference feature_calculators.py:1067-1231).  The oracle
# replays the spectrum as explicit DFT sums Σ v·cos(2πjk/n) / −Σ v·sin(…).
# ---------------------------------------------------------------------------

_FFT_ATTRS = ("real", "imag", "abs", "angle")
_FFT_MAX_K = 4  # coeff 0..4; series here are 3–24 points so k>n//2 → NULL


def _events_tokens_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokens squeezed to pmod(v, 97): small nonnegative integers keep the
    cross-engine float divergence of DFT/convolution sums ~1e-13, far under
    the round(6) quantum the spectral oracles compare at."""
    ev = _events_long(spark, sf_dir)
    return _tokens_groupby(ev.withColumn("v", F.pmod("v", F.lit(97))))


def q_fft_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.fft.rfft kernel vs explicit-DFT oracle.  Values are squeezed to
    pmod(v, 97) (small nonnegative integers) so the rounded(6) comparison
    has ~1e-13 cross-engine divergence against a 5e-7 quantum; DC and
    Nyquist bins are integer-exact on both sides.  ``+ 0.0`` normalizes
    IEEE −0.0 (DuckDB's −SUM path) to +0.0."""
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    settings = {
        "fft_coefficient": [
            {"coeff": k, "attr": a}
            for k in range(_FFT_MAX_K + 1)
            for a in _FFT_ATTRS
        ],
        "fft_aggregated": [
            {"aggtype": t}
            for t in ("centroid", "variance", "skew", "kurtosis")
        ],
    }
    feats = extract_features_tokens(
        toks, settings, id_col="user_id", kind_col="event_type"
    )
    val = F.round("value", 6) + F.lit(0.0)
    # canonicalize the branch cut: an analytically-zero imag with negative
    # real is ±180° depending on the sign of ~1e-14 residual noise (happens
    # whenever k divides n and the grouped sums coincide, not just at
    # DC/Nyquist) — both sides map −180 → 180
    val = F.when(
        F.col("variable").contains('attr_"angle"') & (val == -180.0),
        F.lit(180.0),
    ).otherwise(val)
    return feats.select(
        "user_id", "event_type", "variable", val.alias("value")
    )


_ORACLE_FFT_PLANE = f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
expanded AS (
  SELECT user_id, event_type, v, j, n, UNNEST(range(0, n//2 + 1)) AS k
  FROM ord
),
spec AS (
  SELECT user_id, event_type, k, ANY_VALUE(n) AS n,
         SUM(v * COS(2*PI()*j*k/n)) AS re_raw,
         -SUM(v * SIN(2*PI()*j*k/n)) AS im_raw
  FROM expanded GROUP BY user_id, event_type, k
),
-- DC and Nyquist imag are analytically zero: numpy's rfft stores exact 0.0
-- there while the naive sin-sum leaves ~1e-13 noise whose SIGN would flip
-- atan2 between ±180 — pin them to 0.0 (re at those bins is an exact ±1
-- integer sum on both sides)
coef AS (
  SELECT user_id, event_type, k, n, re_raw AS re,
         CASE WHEN k = 0 OR 2*k = n THEN 0.0 ELSE im_raw END AS im
  FROM spec
),
series AS (SELECT DISTINCT user_id, event_type FROM base),
grid AS (
  SELECT user_id, event_type, UNNEST(range(0, {_FFT_MAX_K + 1})) AS k
  FROM series
),
fc AS (
  SELECT g.user_id, g.event_type, g.k, c.re, c.im
  FROM grid g LEFT JOIN coef c
    ON g.user_id = c.user_id AND g.event_type = c.event_type AND g.k = c.k
),
mom AS (
  SELECT user_id, event_type,
         NULLIF(SUM(SQRT(re*re + im*im)), 0) AS m0,
         SUM(SQRT(re*re + im*im) * k)       AS s1,
         SUM(SQRT(re*re + im*im) * k*k)     AS s2,
         SUM(SQRT(re*re + im*im) * k*k*k)   AS s3,
         SUM(SQRT(re*re + im*im) * k*k*k*k) AS s4
  FROM coef GROUP BY user_id, event_type
),
agg AS (
  SELECT user_id, event_type,
         s1/m0 AS c, s2/m0 AS m2, s3/m0 AS m3, s4/m0 AS m4,
         (s2/m0) - (s1/m0)*(s1/m0) AS var
  FROM mom
)
SELECT user_id, event_type,
       event_type || '__fft_coefficient__attr_"real"__coeff_' || k AS variable,
       ROUND(re, 6) + 0.0 AS value
FROM fc
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_coefficient__attr_"imag"__coeff_' || k,
       ROUND(im, 6) + 0.0
FROM fc
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_coefficient__attr_"abs"__coeff_' || k,
       ROUND(SQRT(re*re + im*im), 6) + 0.0
FROM fc
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_coefficient__attr_"angle"__coeff_' || k,
       -- branch-cut canonicalization: −180 → 180 (mirrors the Spark side)
       CASE WHEN ROUND(DEGREES(ATAN2(im, re)), 6) + 0.0 = -180.0 THEN 180.0
            ELSE ROUND(DEGREES(ATAN2(im, re)), 6) + 0.0 END
FROM fc
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_aggregated__aggtype_"centroid"',
       ROUND(c, 6) + 0.0
FROM agg
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_aggregated__aggtype_"variance"',
       ROUND(var, 6) + 0.0
FROM agg
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_aggregated__aggtype_"skew"',
       CASE WHEN var < 0.5 THEN NULL
            ELSE ROUND((m3 - 3*c*var - c*c*c) / POWER(var, 1.5), 6) + 0.0 END
FROM agg
UNION ALL
SELECT user_id, event_type,
       event_type || '__fft_aggregated__aggtype_"kurtosis"',
       CASE WHEN var < 0.5 THEN NULL
            ELSE ROUND((m4 - 4*c*m3 + 6*m2*c*c - 3*c) / (var*var), 6) + 0.0 END
FROM agg
"""


# ---------------------------------------------------------------------------
# welch density: single-segment Welch PSD (series ≤ 256 ⇒ nperseg = n, one
# periodic-Hann segment, constant detrend, density scaling, one-sided
# doubling) replayed in DuckDB as an explicit windowed DFT
# (reference feature_calculators.py:1418-1455 via scipy.signal.welch)
# ---------------------------------------------------------------------------


def q_welch_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {"spkt_welch_density": [{"coeff": c} for c in (2, 5, 8)]},
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 5) + F.lit(0.0)).alias("value"),
    )


_ORACLE_WELCH = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n,
         AVG(v)   OVER (PARTITION BY user_id, event_type) AS mean_v
  FROM base
),
-- detrended, periodic-Hann-windowed samples
win AS (
  SELECT user_id, event_type, j, n,
         (v - mean_v) * (0.5 - 0.5*COS(2*PI()*j/n)) AS y,
         POWER(0.5 - 0.5*COS(2*PI()*j/n), 2) AS w2
  FROM ord
),
expanded AS (
  SELECT user_id, event_type, y, j, n, UNNEST(range(0, n//2 + 1)) AS k
  FROM win
),
spec AS (
  SELECT user_id, event_type, k, ANY_VALUE(n) AS n,
         SUM(y * COS(2*PI()*j*k/n)) AS re,
         SUM(y * SIN(2*PI()*j*k/n)) AS im
  FROM expanded GROUP BY user_id, event_type, k
),
scale AS (
  SELECT user_id, event_type, 1.0 / SUM(w2) AS sc
  FROM win GROUP BY user_id, event_type
),
psd AS (
  SELECT s.user_id, s.event_type, s.k,
         (s.re*s.re + s.im*s.im) * c.sc
         * CASE WHEN s.k = 0 THEN 1.0
                WHEN s.n % 2 = 0 AND 2*s.k = s.n THEN 1.0
                ELSE 2.0 END AS p
  FROM spec s JOIN scale c
    ON s.user_id = c.user_id AND s.event_type = c.event_type
),
series AS (SELECT DISTINCT user_id, event_type FROM base),
grid AS (
  SELECT user_id, event_type, UNNEST([2, 5, 8]) AS k FROM series
)
SELECT g.user_id, g.event_type,
       g.event_type || '__spkt_welch_density__coeff_' || g.k AS variable,
       ROUND(p.p, 5) + 0.0 AS value
FROM grid g LEFT JOIN psd p
  ON g.user_id = p.user_id AND g.event_type = p.event_type AND g.k = p.k
"""


# ---------------------------------------------------------------------------
# cwt coefficients: the full default grid (widths (2,5,10,20) × w × coeff
# 0..14) replayed in DuckDB as an explicit Ricker "same"-convolution
# (reference feature_calculators.py:1370-1414 via pywt mexh)
# ---------------------------------------------------------------------------


def q_cwt_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {
            "cwt_coefficients": [
                {"widths": (2, 5, 10, 20), "coeff": c, "w": w}
                for c in range(15)
                for w in (2, 5, 10, 20)
            ]
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


_ORACLE_CWT = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
series AS (SELECT user_id, event_type, ANY_VALUE(n) AS n
           FROM ord GROUP BY user_id, event_type),
-- wavelet samples per (series, width): M = min(10w, n) points,
-- tau_k = k - (M-1)/2, psi = 2/(sqrt(3a)·pi^0.25)·(1-(tau/a)^2)·exp(-tau^2/(2a^2))
kern AS (
  SELECT s.user_id, s.event_type, s.n, wd.a,
         LEAST(10*wd.a, s.n) AS m, kk.k AS k,
         2.0/(SQRT(3.0*wd.a)*POWER(PI(), 0.25))
         * (1.0 - POWER((kk.k - (LEAST(10*wd.a, s.n)-1)/2.0)/wd.a, 2))
         * EXP(-POWER(kk.k - (LEAST(10*wd.a, s.n)-1)/2.0, 2)/(2.0*wd.a*wd.a))
           AS psi
  FROM series s
  CROSS JOIN (SELECT UNNEST([2, 5, 10, 20]) AS a) wd
  CROSS JOIN (SELECT UNNEST(range(0, 240)) AS k) kk
  WHERE kk.k < LEAST(10*wd.a, s.n)
),
-- "same" convolution: out[t] = sum_k psi[k] * x[t + (M-1)//2 - k]
conv AS (
  SELECT kern.user_id, kern.event_type, kern.a,
         o.j - (kern.m - 1)//2 + kern.k AS t,
         SUM(kern.psi * o.v) AS y
  FROM kern JOIN ord o
    ON o.user_id = kern.user_id AND o.event_type = kern.event_type
  GROUP BY kern.user_id, kern.event_type, kern.a,
           o.j - (kern.m - 1)//2 + kern.k
),
grid AS (
  SELECT s.user_id, s.event_type, s.n, wd.a, cc.c
  FROM series s
  CROSS JOIN (SELECT UNNEST([2, 5, 10, 20]) AS a) wd
  CROSS JOIN (SELECT UNNEST(range(0, 15)) AS c) cc
)
SELECT g.user_id, g.event_type,
       g.event_type || '__cwt_coefficients__coeff_' || g.c
         || '__w_' || g.a || '__widths_(2, 5, 10, 20)' AS variable,
       CASE WHEN g.c < g.n THEN ROUND(v.y, 6) + 0.0 END AS value
FROM grid g LEFT JOIN conv v
  ON g.user_id = v.user_id AND g.event_type = v.event_type
 AND g.a = v.a AND g.c = v.t
"""


# ---------------------------------------------------------------------------
# stats sweep — the remaining per-series scalar calculators in one query:
# variance/std/variation_coefficient/skew/kurtosis (two-pass moment
# mirrors), sigma-ratio and range guards, duplicate flags, mean-relative
# counts, crossings, cid_ce, single-lag autocorrelation, Benford
# correlation, index-mass quantiles — raw integral values, two-pass
# moments in SQL so no E[x²]−E[x]² cancellation (reference
# feature_calculators.py: cites in each kernel docstring).
# ---------------------------------------------------------------------------

_STATS_SWEEP_SETTINGS = {
    "variance": None,
    "standard_deviation": None,
    "variation_coefficient": None,
    "skewness": None,
    "kurtosis": None,
    "variance_larger_than_standard_deviation": None,
    "has_duplicate": None,
    "has_duplicate_max": None,
    "has_duplicate_min": None,
    "count_above_mean": None,
    "count_below_mean": None,
    "ratio_value_number_to_time_series_length": None,
    "benford_correlation": None,
    "ratio_beyond_r_sigma": [{"r": 0.5}, {"r": 2}],
    "large_standard_deviation": [{"r": 0.25}],
    "count_above": [{"t": 0}],
    "count_below": [{"t": 0}],
    "number_crossing_m": [{"m": 0}],
    "cid_ce": [{"normalize": True}, {"normalize": False}],
    "autocorrelation": [{"lag": 1}, {"lag": 3}],
    "index_mass_quantile": [{"q": q} for q in (0.2, 0.6, 0.9)],
}


def q_stats_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        _STATS_SWEEP_SETTINGS,
        id_col="user_id",
        kind_col="event_type",
    )
    # unbounded-magnitude arms take the squash-then-round comparator
    # (see the oracle's comment above the variance arm); the endswith
    # suffixes are unambiguous — e.g. "…__variance_larger_than_
    # standard_deviation" ends with NEITHER "__variance" NOR
    # "__standard_deviation"
    unbounded = F.col("variable").endswith("__variance") | \
        F.col("variable").endswith("__standard_deviation") | \
        F.col("variable").endswith("__variation_coefficient") | \
        F.col("variable").endswith("__cid_ce__normalize_False")
    squashed = F.round(F.col("value") / (F.lit(1.0) + F.abs("value")), 9)
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (
            F.when(unbounded, squashed).otherwise(F.round("value", 6))
            + F.lit(0.0)
        ).alias("value"),
    )


# ---------------------------------------------------------------------------
# trend sweep — linear_trend / agg_linear_trend (chunked downsample + line
# fit) / change_quantiles corridors / agg_autocorrelation, on pmod-97
# series restricted to n ≥ 7 (keeps every chunk fit and adjusted-ACF lag
# well-defined on both sides).
# ---------------------------------------------------------------------------

_TREND_ATTRS = ("slope", "intercept", "rvalue", "stderr")
_CQ_COMBOS = [
    (0.2, 0.8, False, "mean"),
    (0.2, 0.8, True, "mean"),
    (0.2, 0.8, True, "var"),
    (0.0, 0.6, True, "mean"),
]


def q_trend_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir).filter(
        F.size("tokens") >= 7
    )
    settings = {
        "linear_trend": [{"attr": a} for a in _TREND_ATTRS],
        "agg_linear_trend": [
            {"attr": a, "chunk_len": 5, "f_agg": f}
            for a in _TREND_ATTRS
            for f in ("mean", "max")
        ],
        "change_quantiles": [
            {"ql": ql, "qh": qh, "isabs": isabs, "f_agg": f}
            for ql, qh, isabs, f in _CQ_COMBOS
        ],
        "agg_autocorrelation": [
            {"f_agg": f, "maxlag": 5} for f in ("mean", "median", "var")
        ],
    }
    feats = extract_features_tokens(
        toks, settings, id_col="user_id", kind_col="event_type"
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


_ORACLE_STATS_SWEEP = f"""
WITH base AS ({_BASE_SQL}),
ordx AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER po - 1 AS j,
         LAG(v) OVER po AS pv,
         LEAD(v, 1) OVER po AS l1,
         LEAD(v, 3) OVER po AS l3,
         SUM(ABS(v)) OVER (po ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_abs
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
m1 AS (
  SELECT user_id, event_type, COUNT(*) AS n, AVG(v) AS m,
         MIN(v) AS mn, MAX(v) AS mx,
         COUNT(DISTINCT v) AS ndist,
         SUM(ABS(v)) AS abs_sum,
         SUM(CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS c_ge0,
         SUM(CASE WHEN v <= 0 THEN 1 ELSE 0 END) AS c_le0
  FROM base GROUP BY user_id, event_type
),
-- two-pass centered moments (numpy's float path, no E[x²]−E[x]² cancellation)
dev AS (
  SELECT o.user_id, o.event_type, ANY_VALUE(m1.n) AS n, ANY_VALUE(m1.m) AS m,
         ANY_VALUE(m1.mn) AS mn, ANY_VALUE(m1.mx) AS mx,
         ANY_VALUE(m1.ndist) AS ndist,
         ANY_VALUE(m1.c_ge0) AS c_ge0, ANY_VALUE(m1.c_le0) AS c_le0,
         SUM(POWER(o.v - m1.m, 2)) AS ss2,
         SUM(POWER(o.v - m1.m, 3)) AS ss3,
         SUM(POWER(o.v - m1.m, 4)) AS ss4,
         SUM(CASE WHEN o.v > m1.m THEN 1 ELSE 0 END) AS c_gt_mean,
         SUM(CASE WHEN o.v < m1.m THEN 1 ELSE 0 END) AS c_lt_mean,
         SUM(CASE WHEN o.v = m1.mx THEN 1 ELSE 0 END) AS c_at_max,
         SUM(CASE WHEN o.v = m1.mn THEN 1 ELSE 0 END) AS c_at_min,
         SUM(CASE WHEN o.pv IS NOT NULL AND (o.pv > 0) <> (o.v > 0)
                  THEN 1 ELSE 0 END) AS crossings,
         SUM(CASE WHEN o.pv IS NOT NULL
                  THEN POWER(o.v - o.pv, 2) ELSE 0 END) AS sum_d2,
         SUM(CASE WHEN o.l1 IS NOT NULL
                  THEN (o.v - m1.m) * (o.l1 - m1.m) END) AS ac1,
         SUM(CASE WHEN o.l3 IS NOT NULL
                  THEN (o.v - m1.m) * (o.l3 - m1.m) END) AS ac3
  FROM ordx o JOIN m1
    ON o.user_id = m1.user_id AND o.event_type = m1.event_type
  GROUP BY o.user_id, o.event_type
),
st AS (
  SELECT *, ss2 / n AS var, SQRT(ss2 / n) AS sd FROM dev
),
sigma AS (
  SELECT o.user_id, o.event_type,
         AVG(CASE WHEN ABS(o.v - s.m) > 0.5 * s.sd THEN 1.0 ELSE 0.0 END) AS rb05,
         AVG(CASE WHEN ABS(o.v - s.m) > 2.0 * s.sd THEN 1.0 ELSE 0.0 END) AS rb2
  FROM ordx o JOIN st s
    ON o.user_id = s.user_id AND o.event_type = s.event_type
  GROUP BY o.user_id, o.event_type
),
imq AS (
  SELECT o.user_id, o.event_type,
         MIN(CASE WHEN o.cum_abs * 1.0 / m1.abs_sum >= 0.2 THEN o.j + 1 END) * 1.0
           / ANY_VALUE(m1.n) AS q02,
         MIN(CASE WHEN o.cum_abs * 1.0 / m1.abs_sum >= 0.6 THEN o.j + 1 END) * 1.0
           / ANY_VALUE(m1.n) AS q06,
         MIN(CASE WHEN o.cum_abs * 1.0 / m1.abs_sum >= 0.9 THEN o.j + 1 END) * 1.0
           / ANY_VALUE(m1.n) AS q09
  FROM ordx o JOIN m1
    ON o.user_id = m1.user_id AND o.event_type = m1.event_type
  WHERE m1.abs_sum > 0
  GROUP BY o.user_id, o.event_type
),
-- Benford: leading digit of |v| via the same float log10/floor path
digits AS (
  SELECT user_id, event_type,
         CASE WHEN ABS(v) = 0 THEN 0
              ELSE LEAST(GREATEST(
                CAST(FLOOR(ABS(v) / POWER(10, FLOOR(LOG10(ABS(v))))) AS BIGINT),
                1), 9) END AS d
  FROM base
),
dgrid AS (
  SELECT m1.user_id, m1.event_type, g.d, m1.n,
         LOG10(1.0 + 1.0/g.d) AS p
  FROM m1 CROSS JOIN (SELECT UNNEST(range(1, 10)) AS d) g
),
dcount AS (
  SELECT user_id, event_type, d, COUNT(*) AS c FROM digits
  WHERE d > 0 GROUP BY user_id, event_type, d
),
benford AS (
  SELECT g.user_id, g.event_type,
         CORR(g.p, COALESCE(c.c, 0) * 1.0 / g.n) AS bc
  FROM dgrid g LEFT JOIN dcount c
    ON g.user_id = c.user_id AND g.event_type = c.event_type AND g.d = c.d
  GROUP BY g.user_id, g.event_type
),
f AS (
  SELECT st.*, sg.rb05, sg.rb2, i.q02, i.q06, i.q09, b.bc
  FROM st
  LEFT JOIN sigma sg ON st.user_id = sg.user_id AND st.event_type = sg.event_type
  LEFT JOIN imq i ON st.user_id = i.user_id AND st.event_type = i.event_type
  LEFT JOIN benford b ON st.user_id = b.user_id AND st.event_type = b.event_type
)
-- the four UNBOUNDED-magnitude arms (raw integral v up to ~1e4 makes
-- variance ~1e8) use the squash-then-round comparator — a fixed absolute
-- quantum cannot hold there (an sf0.1 replay hit a one-quantum straddle
-- on a 6.4e7 variance); bounded arms keep plain round(6).  Mirrored in
-- q_stats_sweep's endswith dispatch.
SELECT user_id, event_type, event_type || '__variance' AS variable,
       ROUND(var / (1 + ABS(var)), 9) + 0.0 AS value FROM f
UNION ALL SELECT user_id, event_type, event_type || '__standard_deviation',
       ROUND(sd / (1 + ABS(sd)), 9) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__variation_coefficient',
       CASE WHEN m = 0 THEN NULL
            ELSE ROUND((sd / m) / (1 + ABS(sd / m)), 9) + 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__skewness',
       CASE WHEN n < 3 THEN NULL WHEN ss2 = 0 THEN 0.0
            ELSE ROUND(n * SQRT(n - 1.0) / (n - 2) * ss3 / POWER(ss2, 1.5), 6) + 0.0
       END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__kurtosis',
       CASE WHEN n < 4 THEN NULL
            WHEN (n-2.0)*(n-3.0)*ss2*ss2 = 0 THEN 0.0
            ELSE ROUND(n*(n+1.0)*(n-1.0)*ss4 / ((n-2.0)*(n-3.0)*ss2*ss2)
                       - 3.0*(n-1.0)*(n-1.0)/((n-2.0)*(n-3.0)), 6) + 0.0
       END FROM f
UNION ALL SELECT user_id, event_type,
       event_type || '__variance_larger_than_standard_deviation',
       CASE WHEN var > SQRT(var) THEN 1.0 ELSE 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__has_duplicate',
       CASE WHEN ndist <> n THEN 1.0 ELSE 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__has_duplicate_max',
       CASE WHEN c_at_max >= 2 THEN 1.0 ELSE 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__has_duplicate_min',
       CASE WHEN c_at_min >= 2 THEN 1.0 ELSE 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__count_above_mean',
       CAST(c_gt_mean AS DOUBLE) FROM f
UNION ALL SELECT user_id, event_type, event_type || '__count_below_mean',
       CAST(c_lt_mean AS DOUBLE) FROM f
UNION ALL SELECT user_id, event_type,
       event_type || '__ratio_value_number_to_time_series_length',
       ROUND(ndist * 1.0 / n, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__benford_correlation',
       ROUND(bc, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__ratio_beyond_r_sigma__r_0.5',
       ROUND(rb05, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__ratio_beyond_r_sigma__r_2',
       ROUND(rb2, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type,
       event_type || '__large_standard_deviation__r_0.25',
       CASE WHEN sd > 0.25 * (mx - mn) THEN 1.0 ELSE 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__count_above__t_0',
       ROUND(c_ge0 * 1.0 / n, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__count_below__t_0',
       ROUND(c_le0 * 1.0 / n, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__number_crossing_m__m_0',
       CAST(crossings AS DOUBLE) FROM f
UNION ALL SELECT user_id, event_type, event_type || '__cid_ce__normalize_False',
       ROUND(SQRT(sum_d2) / (1 + ABS(SQRT(sum_d2))), 9) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__cid_ce__normalize_True',
       CASE WHEN sd = 0 THEN 0.0
            ELSE ROUND(SQRT(sum_d2) / sd, 6) + 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__autocorrelation__lag_1',
       CASE WHEN n <= 1 OR var <= 1e-8 THEN NULL
            ELSE ROUND(ac1 / ((n - 1) * var), 6) + 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__autocorrelation__lag_3',
       CASE WHEN n <= 3 OR var <= 1e-8 THEN NULL
            ELSE ROUND(ac3 / ((n - 3) * var), 6) + 0.0 END FROM f
UNION ALL SELECT user_id, event_type, event_type || '__index_mass_quantile__q_0.2',
       ROUND(q02, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__index_mass_quantile__q_0.6',
       ROUND(q06, 6) + 0.0 FROM f
UNION ALL SELECT user_id, event_type, event_type || '__index_mass_quantile__q_0.9',
       ROUND(q09, 6) + 0.0 FROM f
"""


_ORACLE_TREND_SWEEP = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord0 AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER po - 1 AS j,
         LAG(v) OVER po AS pv,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
ord AS (SELECT * FROM ord0 WHERE n >= 7),
series AS (SELECT user_id, event_type, ANY_VALUE(n) AS n
           FROM ord GROUP BY user_id, event_type),

-- ==================== linear_trend over t = 0..n−1 ========================
lt_m AS (
  SELECT user_id, event_type, AVG(j) AS jm, AVG(v) AS ym, ANY_VALUE(n) AS n
  FROM ord GROUP BY user_id, event_type
),
lt AS (
  SELECT o.user_id, o.event_type, ANY_VALUE(m.n) AS n,
         ANY_VALUE(m.jm) AS jm, ANY_VALUE(m.ym) AS ym,
         AVG(POWER(o.j - m.jm, 2)) AS ssxm,
         AVG(POWER(o.v - m.ym, 2)) AS ssym,
         AVG((o.j - m.jm) * (o.v - m.ym)) AS ssxym
  FROM ord o JOIN lt_m m
    ON o.user_id = m.user_id AND o.event_type = m.event_type
  GROUP BY o.user_id, o.event_type
),
lt_fit AS (
  SELECT *, ssxym / ssxm AS slope, ym - (ssxym / ssxm) * jm AS intercept,
         CASE WHEN ssxm = 0 OR ssym = 0 THEN 0.0
              ELSE GREATEST(-1.0, LEAST(1.0, ssxym / SQRT(ssxm * ssym))) END AS r
  FROM lt
),

-- ============ agg_linear_trend: chunk (len 5) downsample then fit =========
chunks AS (
  SELECT user_id, event_type, j // 5 AS c,
         AVG(v) AS agg_mean, MAX(v) * 1.0 AS agg_max
  FROM ord GROUP BY user_id, event_type, j // 5
),
alt_m AS (
  SELECT user_id, event_type, COUNT(*) AS k, AVG(c) AS cm,
         AVG(agg_mean) AS ym_mean, AVG(agg_max) AS ym_max
  FROM chunks GROUP BY user_id, event_type
),
alt AS (
  SELECT ch.user_id, ch.event_type, ANY_VALUE(m.k) AS k,
         ANY_VALUE(m.cm) AS cm,
         ANY_VALUE(m.ym_mean) AS ym_mean, ANY_VALUE(m.ym_max) AS ym_max,
         AVG(POWER(ch.c - m.cm, 2)) AS ssxm,
         AVG(POWER(ch.agg_mean - m.ym_mean, 2)) AS ssym_mean,
         AVG((ch.c - m.cm) * (ch.agg_mean - m.ym_mean)) AS ssxym_mean,
         AVG(POWER(ch.agg_max - m.ym_max, 2)) AS ssym_max,
         AVG((ch.c - m.cm) * (ch.agg_max - m.ym_max)) AS ssxym_max
  FROM chunks ch JOIN alt_m m
    ON ch.user_id = m.user_id AND ch.event_type = m.event_type
  GROUP BY ch.user_id, ch.event_type
),
alt_fit AS (
  SELECT user_id, event_type, k, cm,
         ssxym_mean / ssxm AS slope_mean,
         ym_mean - (ssxym_mean / ssxm) * cm AS intercept_mean,
         CASE WHEN ssxm = 0 OR ssym_mean = 0 THEN 0.0
              ELSE GREATEST(-1.0, LEAST(1.0,
                   ssxym_mean / SQRT(ssxm * ssym_mean))) END AS r_mean,
         ssym_mean, ssxm,
         ssxym_max / ssxm AS slope_max,
         ym_max - (ssxym_max / ssxm) * cm AS intercept_max,
         CASE WHEN ssxm = 0 OR ssym_max = 0 THEN 0.0
              ELSE GREATEST(-1.0, LEAST(1.0,
                   ssxym_max / SQRT(ssxm * ssym_max))) END AS r_max,
         ssym_max
  FROM alt
),

-- =================== change_quantiles corridors ===========================
qv AS (
  SELECT user_id, event_type,
         QUANTILE_CONT(v, 0.0) AS q00, QUANTILE_CONT(v, 0.2) AS q02,
         QUANTILE_CONT(v, 0.6) AS q06, QUANTILE_CONT(v, 0.8) AS q08
  FROM ord GROUP BY user_id, event_type
),
combos AS (
  SELECT * FROM (VALUES
    (1, 0.2, 0.8, FALSE, 'mean'),
    (2, 0.2, 0.8, TRUE,  'mean'),
    (3, 0.2, 0.8, TRUE,  'var'),
    (4, 0.0, 0.6, TRUE,  'mean')
  ) AS t(cid, ql, qh, isabs, f_agg)
),
cq_sel AS (
  SELECT o.user_id, o.event_type, cb.cid,
         CASE WHEN cb.isabs THEN ABS(o.v - o.pv) * 1.0
              ELSE (o.v - o.pv) * 1.0 END AS d
  FROM ord o
  JOIN qv ON o.user_id = qv.user_id AND o.event_type = qv.event_type
  CROSS JOIN combos cb
  WHERE o.pv IS NOT NULL
    AND (CASE cb.cid WHEN 4 THEN qv.q00 ELSE qv.q02 END)
        <> (CASE cb.cid WHEN 4 THEN qv.q06 ELSE qv.q08 END)
    AND o.v  BETWEEN (CASE cb.cid WHEN 4 THEN qv.q00 ELSE qv.q02 END)
                 AND (CASE cb.cid WHEN 4 THEN qv.q06 ELSE qv.q08 END)
    AND o.pv BETWEEN (CASE cb.cid WHEN 4 THEN qv.q00 ELSE qv.q02 END)
                 AND (CASE cb.cid WHEN 4 THEN qv.q06 ELSE qv.q08 END)
),
cq_mean AS (
  SELECT user_id, event_type, cid, AVG(d) AS md, COUNT(*) AS cnt
  FROM cq_sel GROUP BY user_id, event_type, cid
),
cq AS (
  SELECT s.user_id, s.event_type, s.cid,
         ANY_VALUE(m.md) AS md,
         AVG(POWER(s.d - m.md, 2)) AS vard
  FROM cq_sel s JOIN cq_mean m
    ON s.user_id = m.user_id AND s.event_type = m.event_type
   AND s.cid = m.cid
  GROUP BY s.user_id, s.event_type, s.cid
),

-- ============ agg_autocorrelation (adjusted ACF, maxlag 5) ================
ac_m AS (
  SELECT user_id, event_type, AVG(v) AS m FROM ord
  GROUP BY user_id, event_type
),
ac_pairs AS (
  SELECT a.user_id, a.event_type, b.j - a.j AS k,
         SUM((a.v - m.m) * (b.v - m.m)) AS s,
         ANY_VALUE(a.n) AS n
  FROM ord a
  JOIN ord b ON a.user_id = b.user_id AND a.event_type = b.event_type
            AND b.j - a.j BETWEEN 0 AND 5
  JOIN ac_m m ON a.user_id = m.user_id AND a.event_type = m.event_type
  GROUP BY a.user_id, a.event_type, b.j - a.j
),
rho AS (
  SELECT p.user_id, p.event_type, p.k,
         (p.s / (p.n - p.k)) / (z.s / z.n) AS r
  FROM ac_pairs p
  JOIN ac_pairs z ON p.user_id = z.user_id AND p.event_type = z.event_type
                 AND z.k = 0
  WHERE p.k BETWEEN 1 AND 5
),
aac AS (
  SELECT user_id, event_type,
         AVG(r) AS agg_mean, MEDIAN(r) AS agg_median,
         AVG(r*r) - AVG(r)*AVG(r) AS agg_var
  FROM rho GROUP BY user_id, event_type
)

SELECT s.user_id, s.event_type,
       s.event_type || '__linear_trend__attr_"slope"' AS variable,
       ROUND(f.slope, 6) + 0.0 AS value
FROM series s JOIN lt_fit f USING (user_id, event_type)
UNION ALL SELECT user_id, event_type,
       event_type || '__linear_trend__attr_"intercept"',
       ROUND(intercept, 6) + 0.0 FROM lt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__linear_trend__attr_"rvalue"',
       ROUND(r, 6) + 0.0 FROM lt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__linear_trend__attr_"stderr"',
       ROUND(SQRT((1.0 - r*r) * ssym / ssxm / (n - 2)), 6) + 0.0 FROM lt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"slope"__chunk_len_5__f_agg_"mean"',
       ROUND(slope_mean, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"intercept"__chunk_len_5__f_agg_"mean"',
       ROUND(intercept_mean, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"rvalue"__chunk_len_5__f_agg_"mean"',
       ROUND(r_mean, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"stderr"__chunk_len_5__f_agg_"mean"',
       CASE WHEN k = 2 THEN 0.0
            ELSE ROUND(SQRT((1.0 - r_mean*r_mean) * ssym_mean / ssxm / (k - 2)), 6) + 0.0
       END FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"slope"__chunk_len_5__f_agg_"max"',
       ROUND(slope_max, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"intercept"__chunk_len_5__f_agg_"max"',
       ROUND(intercept_max, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"rvalue"__chunk_len_5__f_agg_"max"',
       ROUND(r_max, 6) + 0.0 FROM alt_fit
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_linear_trend__attr_"stderr"__chunk_len_5__f_agg_"max"',
       CASE WHEN k = 2 THEN 0.0
            ELSE ROUND(SQRT((1.0 - r_max*r_max) * ssym_max / ssxm / (k - 2)), 6) + 0.0
       END FROM alt_fit
UNION ALL SELECT s.user_id, s.event_type,
       s.event_type || '__change_quantiles__f_agg_"mean"__isabs_False__qh_0.8__ql_0.2',
       COALESCE(ROUND((SELECT md FROM cq_mean m WHERE m.user_id = s.user_id
                        AND m.event_type = s.event_type AND m.cid = 1), 6) + 0.0, 0.0)
FROM series s
UNION ALL SELECT s.user_id, s.event_type,
       s.event_type || '__change_quantiles__f_agg_"mean"__isabs_True__qh_0.8__ql_0.2',
       COALESCE(ROUND((SELECT md FROM cq_mean m WHERE m.user_id = s.user_id
                        AND m.event_type = s.event_type AND m.cid = 2), 6) + 0.0, 0.0)
FROM series s
UNION ALL SELECT s.user_id, s.event_type,
       s.event_type || '__change_quantiles__f_agg_"var"__isabs_True__qh_0.8__ql_0.2',
       COALESCE(ROUND((SELECT vard FROM cq c WHERE c.user_id = s.user_id
                        AND c.event_type = s.event_type AND c.cid = 3), 6) + 0.0, 0.0)
FROM series s
UNION ALL SELECT s.user_id, s.event_type,
       s.event_type || '__change_quantiles__f_agg_"mean"__isabs_True__qh_0.6__ql_0.0',
       COALESCE(ROUND((SELECT md FROM cq_mean m WHERE m.user_id = s.user_id
                        AND m.event_type = s.event_type AND m.cid = 4), 6) + 0.0, 0.0)
FROM series s
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_autocorrelation__f_agg_"mean"__maxlag_5',
       ROUND(agg_mean, 6) + 0.0 FROM aac
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_autocorrelation__f_agg_"median"__maxlag_5',
       ROUND(agg_median, 6) + 0.0 FROM aac
UNION ALL SELECT user_id, event_type,
       event_type || '__agg_autocorrelation__f_agg_"var"__maxlag_5',
       ROUND(agg_var, 6) + 0.0 FROM aac
"""


# ---------------------------------------------------------------------------
# query_similarity_count — MASS distance profile vs a fixed 3-point query
# (reference feature_calculators.py:2474-2521 via stumpy.core.mass): each
# window z-normalized (std 0 → divide by 1), Euclidean distance to the
# z-normalized query, count ≤ threshold.  The normalized query values are
# inlined as full-precision literals on both sides.
# ---------------------------------------------------------------------------

_QSC_QUERY = [1.0, 5.0, 2.0]
_QSC_THRESHOLD = 2.0


def q_query_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {
            "query_similarity_count": [
                {
                    "query": _QSC_QUERY,
                    "threshold": _QSC_THRESHOLD,
                    "normalize": True,
                }
            ]
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        F.lit("qsc").alias("variable"),  # param encoding embeds the list —
        # normalize the name so the oracle needn't reproduce it char-exact
        F.col("value"),
    )


def _qsc_oracle_sql() -> str:
    import numpy as np

    q = np.asarray(_QSC_QUERY, dtype=float)
    qs = np.std(q)
    qz = (q - np.mean(q)) / (qs if qs > 0 else 1.0)
    q0, q1, q2 = (repr(float(v)) for v in qz)
    thr = repr(float(_QSC_THRESHOLD))
    return f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v * 1.0 AS v,
         LEAD(v, 1) OVER po * 1.0 AS l1,
         LEAD(v, 2) OVER po * 1.0 AS l2
  FROM base
  WINDOW po AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
win AS (
  SELECT user_id, event_type, v, l1, l2,
         (v + l1 + l2) / 3.0 AS mu,
         SQRT((POWER(v - (v+l1+l2)/3.0, 2)
             + POWER(l1 - (v+l1+l2)/3.0, 2)
             + POWER(l2 - (v+l1+l2)/3.0, 2)) / 3.0) AS sd
  FROM ord WHERE l2 IS NOT NULL
),
dist AS (
  SELECT user_id, event_type,
         SQRT(POWER((v  - mu) / (CASE WHEN sd = 0 THEN 1.0 ELSE sd END) - ({q0}), 2)
            + POWER((l1 - mu) / (CASE WHEN sd = 0 THEN 1.0 ELSE sd END) - ({q1}), 2)
            + POWER((l2 - mu) / (CASE WHEN sd = 0 THEN 1.0 ELSE sd END) - ({q2}), 2)) AS d
  FROM win
),
agg AS (
  SELECT user_id, event_type,
         CAST(SUM(CASE WHEN d <= {thr} THEN 1 ELSE 0 END) AS DOUBLE) AS value
  FROM dist GROUP BY user_id, event_type
),
-- spine keeps series shorter than the query (no windows): the kernel
-- emits NaN for those, so the oracle must emit the row with NULL
spine AS (SELECT DISTINCT user_id, event_type FROM base)
SELECT s.user_id, s.event_type, 'qsc' AS variable, a.value
FROM spine s LEFT JOIN agg a
  ON s.user_id = a.user_id AND s.event_type = a.event_type
"""


# ---------------------------------------------------------------------------
# entropy plane A — Chebyshev-distance family: sample_entropy (m=2,
# r=0.2·std) and the full approximate_entropy default grid (m=2,
# r ∈ 0.1..0.9·std), replayed in DuckDB as explicit window-pair distance
# counts (reference feature_calculators.py:1701-1805).  Distances are
# INTEGER (|v_i−v_j| of mod-97 ints), so the d ≤ tol threshold can only
# flip if tol lands within ~1e-16 of an integer — negligible; the final
# −ln(A/B) / φ sums are rounded(6).
# ---------------------------------------------------------------------------


def q_entropy_cheb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {
            "sample_entropy": None,
            "approximate_entropy": [
                {"m": 2, "r": r} for r in (0.1, 0.3, 0.5, 0.7, 0.9)
            ],
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


_ORACLE_ENTROPY_CHEB = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord0 AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
-- population std, two-pass like np.std: mean first, then mean squared dev
mean_v AS (
  SELECT user_id, event_type, AVG(v) AS mu FROM ord0
  GROUP BY user_id, event_type
),
sdv AS (
  SELECT o.user_id, o.event_type, ANY_VALUE(o.n) AS n,
         SQRT(AVG(POWER(o.v - m.mu, 2))) AS sd
  FROM ord0 o JOIN mean_v m
    ON o.user_id = m.user_id AND o.event_type = m.event_type
  GROUP BY o.user_id, o.event_type
),
-- window head values: window i = (v0[i], v1[i](, v2[i]))
w AS (
  SELECT user_id, event_type, j, n, v AS v0,
         LEAD(v, 1) OVER sw AS v1,
         LEAD(v, 2) OVER sw AS v2
  FROM ord0
  WINDOW sw AS (PARTITION BY user_id, event_type ORDER BY j)
),
-- all ORDERED pairs of width-2 windows (incl. self) with their width-2 and
-- (where defined) width-3 Chebyshev distances
pairs AS (
  SELECT a.user_id, a.event_type, a.j AS i, b.j AS jj,
         GREATEST(ABS(a.v0-b.v0), ABS(a.v1-b.v1)) AS d2,
         CASE WHEN a.v2 IS NOT NULL AND b.v2 IS NOT NULL
              THEN GREATEST(ABS(a.v0-b.v0), ABS(a.v1-b.v1), ABS(a.v2-b.v2))
         END AS d3
  FROM w a JOIN w b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
  WHERE a.v1 IS NOT NULL AND b.v1 IS NOT NULL
),
-- SampEn: B/A = similar ordered pairs (self excluded), tol = 0.2·std
samp AS (
  SELECT p.user_id, p.event_type,
         COUNT(CASE WHEN p.i <> p.jj AND p.d2 <= 0.2*s.sd THEN 1 END) AS B,
         COUNT(CASE WHEN p.i <> p.jj AND p.d3 <= 0.2*s.sd THEN 1 END) AS A
  FROM pairs p JOIN sdv s
    ON p.user_id = s.user_id AND p.event_type = s.event_type
  GROUP BY p.user_id, p.event_type
),
-- ApEn: per-window neighbour counts (self INCLUDED) at each r·std
rg AS (SELECT UNNEST([0.1, 0.3, 0.5, 0.7, 0.9]) AS r),
c2 AS (
  SELECT p.user_id, p.event_type, rg.r, p.i,
         COUNT(CASE WHEN p.d2 <= rg.r*s.sd THEN 1 END) AS c
  FROM pairs p
  JOIN sdv s ON p.user_id = s.user_id AND p.event_type = s.event_type
  CROSS JOIN rg
  GROUP BY p.user_id, p.event_type, rg.r, p.i
),
c3 AS (
  SELECT p.user_id, p.event_type, rg.r, p.i,
         COUNT(CASE WHEN p.d3 <= rg.r*s.sd THEN 1 END) AS c
  FROM pairs p
  JOIN sdv s ON p.user_id = s.user_id AND p.event_type = s.event_type
  CROSS JOIN rg
  WHERE p.d3 IS NOT NULL
  GROUP BY p.user_id, p.event_type, rg.r, p.i
),
phi2 AS (
  SELECT c2.user_id, c2.event_type, c2.r,
         SUM(LN(CAST(c2.c AS DOUBLE)/(s.n-1))) / ANY_VALUE(s.n-1) AS phi2
  FROM c2 JOIN sdv s
    ON c2.user_id = s.user_id AND c2.event_type = s.event_type
  GROUP BY c2.user_id, c2.event_type, c2.r
),
phi3 AS (
  SELECT c3.user_id, c3.event_type, c3.r,
         SUM(LN(CAST(c3.c AS DOUBLE)/(s.n-2))) / ANY_VALUE(s.n-2) AS phi3
  FROM c3 JOIN sdv s
    ON c3.user_id = s.user_id AND c3.event_type = s.event_type
  GROUP BY c3.user_id, c3.event_type, c3.r
),
phi AS (
  SELECT p2.user_id, p2.event_type, p2.r, p2.phi2, p3.phi3
  FROM phi2 p2 LEFT JOIN phi3 p3
    ON p2.user_id = p3.user_id AND p2.event_type = p3.event_type
   AND p2.r = p3.r
),
series AS (SELECT user_id, event_type, ANY_VALUE(n) AS n
           FROM ord0 GROUP BY user_id, event_type)
SELECT s.user_id, s.event_type,
       s.event_type || '__sample_entropy' AS variable,
       CASE WHEN sp.B IS NULL OR sp.B = 0 THEN NULL
            WHEN sp.A = 0 THEN CAST('infinity' AS DOUBLE)
            ELSE ROUND(-LN(CAST(sp.A AS DOUBLE)/sp.B), 6) + 0.0 END AS value
FROM series s LEFT JOIN samp sp
  ON s.user_id = sp.user_id AND s.event_type = sp.event_type
UNION ALL
SELECT s.user_id, s.event_type,
       s.event_type || '__approximate_entropy__m_2__r_' || rg.r,
       CASE WHEN s.n <= 3 THEN 0.0
            ELSE ROUND(ABS(p.phi2 - p.phi3), 6) + 0.0 END
FROM series s
CROSS JOIN rg
LEFT JOIN phi p
  ON p.user_id = s.user_id AND p.event_type = s.event_type AND p.r = rg.r
"""


# ---------------------------------------------------------------------------
# entropy plane B — symbolic family: binned_entropy(10), the full
# permutation_entropy grid (tau=1, dimension 3..7) and the full
# fourier_entropy grid (bins 2/3/5/10/100)
# (reference feature_calculators.py:1666-1694, 1809-1821, 1866-1915).
# Ordinal ranks mirror numpy's double-argsort: stable for ties at d ≤ 16
# (insertion sort), i.e. rank = #{q: x_q < x_p or (x_q = x_p and q < p)}.
# Histogram bins on INTEGER data reduce to exact integer arithmetic
# (floor((v−mn)·b/(mx−mn)) clamped); the normalized-PSD histogram shares
# the welch DFT.
# ---------------------------------------------------------------------------


def q_entropy_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    # position-salt the values (v·100 + index): permutation_entropy's
    # ordinal ranks come from np.argsort, whose tie order is
    # implementation-defined (measured: NOT insertion-stable even at n=4 —
    # descending runs reverse their ties).  The kernel faithfully carries
    # the reference's exact tie behavior, but no SQL mirror can — so the
    # oracle compares on a tie-free series, identical on both sides.
    toks = _events_tokens_mod97(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.transform(
            "tokens", lambda t, i: t * F.lit(100) + i
        ).alias("tokens"),
    )
    feats = extract_features_tokens(
        toks,
        {
            "binned_entropy": [{"max_bins": 10}],
            "permutation_entropy": [
                {"tau": 1, "dimension": d} for d in (3, 4, 5, 6, 7)
            ],
            "fourier_entropy": [{"bins": b} for b in (2, 3, 5, 10, 100)],
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


_ORACLE_ENTROPY_SYMBOLIC = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
-- position-salted (tie-free) series: v·100 + index, mirroring the Spark side
ord AS (
  SELECT user_id, event_type,
         v * 100 + (ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
series AS (SELECT user_id, event_type, ANY_VALUE(n) AS n
           FROM ord GROUP BY user_id, event_type),

-- ======================= binned_entropy (max_bins = 10) ====================
rng AS (
  SELECT user_id, event_type, MIN(v) AS mn, MAX(v) AS mx, ANY_VALUE(n) AS n
  FROM ord GROUP BY user_id, event_type
),
bcount AS (
  SELECT o.user_id, o.event_type,
         CASE WHEN r.mx = r.mn THEN 0
              ELSE LEAST(((o.v - r.mn) * 10) // (r.mx - r.mn), 9) END AS b,
         COUNT(*) AS c, ANY_VALUE(r.n) AS n
  FROM ord o JOIN rng r
    ON o.user_id = r.user_id AND o.event_type = r.event_type
  GROUP BY o.user_id, o.event_type, 3
),
binned AS (
  SELECT user_id, event_type,
         -SUM((CAST(c AS DOUBLE)/n) * LN(CAST(c AS DOUBLE)/n)) AS h
  FROM bcount GROUP BY user_id, event_type
),

-- ============ permutation_entropy (tau = 1, dimension 3..7) ================
dims AS (SELECT UNNEST([3, 4, 5, 6, 7]) AS d),
-- window elements: window w of dimension d holds positions w..w+d-1
elem AS (
  SELECT o.user_id, o.event_type, dims.d, o.j - p.p AS w, p.p, o.v, o.n
  FROM ord o
  CROSS JOIN dims
  JOIN (SELECT UNNEST(range(0, 7)) AS p) p ON p.p < dims.d
  WHERE o.j - p.p >= 0 AND o.j - p.p + dims.d <= o.n
),
-- stable argsort rank of element p within its window
ranked AS (
  SELECT a.user_id, a.event_type, a.d, a.w, a.p,
         COUNT(CASE WHEN b.v < a.v OR (b.v = a.v AND b.p < a.p) THEN 1 END) AS rnk
  FROM elem a JOIN elem b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
   AND a.d = b.d AND a.w = b.w
  GROUP BY a.user_id, a.event_type, a.d, a.w, a.p
),
codes AS (
  SELECT user_id, event_type, d, w,
         SUM(rnk * CAST(POWER(d, p) AS BIGINT)) AS code
  FROM ranked GROUP BY user_id, event_type, d, w
),
ccount AS (
  SELECT user_id, event_type, d, code, COUNT(*) AS c
  FROM codes GROUP BY user_id, event_type, d, code
),
ktot AS (
  SELECT user_id, event_type, d, SUM(c) AS k FROM ccount
  GROUP BY user_id, event_type, d
),
perm AS (
  SELECT c.user_id, c.event_type, c.d,
         -SUM((CAST(c.c AS DOUBLE)/k.k) * LN(CAST(c.c AS DOUBLE)/k.k)) AS h
  FROM ccount c JOIN ktot k
    ON c.user_id = k.user_id AND c.event_type = k.event_type AND c.d = k.d
  GROUP BY c.user_id, c.event_type, c.d
),

-- ============== fourier_entropy (bins 2/3/5/10/100) ========================
-- single-segment Welch PSD (same conventions as the welch_density oracle)
wmean AS (
  SELECT user_id, event_type, AVG(v) AS mu FROM ord
  GROUP BY user_id, event_type
),
win AS (
  SELECT o.user_id, o.event_type, o.j, o.n,
         (o.v - m.mu) * (0.5 - 0.5*COS(2*PI()*o.j/o.n)) AS y,
         POWER(0.5 - 0.5*COS(2*PI()*o.j/o.n), 2) AS w2
  FROM ord o JOIN wmean m
    ON o.user_id = m.user_id AND o.event_type = m.event_type
),
fexp AS (
  SELECT user_id, event_type, y, j, n, UNNEST(range(0, n//2 + 1)) AS k
  FROM win
),
fspec AS (
  SELECT user_id, event_type, k, ANY_VALUE(n) AS n,
         SUM(y * COS(2*PI()*j*k/n)) AS re,
         SUM(y * SIN(2*PI()*j*k/n)) AS im
  FROM fexp GROUP BY user_id, event_type, k
),
fscale AS (
  SELECT user_id, event_type, 1.0 / SUM(w2) AS sc
  FROM win GROUP BY user_id, event_type
),
psd AS MATERIALIZED (
  SELECT s.user_id, s.event_type, s.k,
         (s.re*s.re + s.im*s.im) * c.sc
         * CASE WHEN s.k = 0 THEN 1.0
                WHEN s.n % 2 = 0 AND 2*s.k = s.n THEN 1.0
                ELSE 2.0 END AS p
  FROM fspec s JOIN fscale c
    ON s.user_id = c.user_id AND s.event_type = c.event_type
),
-- MATERIALIZED is load-bearing on psd and norm: DuckDB inlines a CTE into
-- each consumer, and under parallel execution the float SUMs upstream
-- (fspec re/im, fscale sc) re-evaluate with a different summation order
-- per consumer.  psd feeds both norm's row side and its MAX subquery, and
-- norm feeds both frng (qmn/qmx) and fbcount (the FLOOR binning) — ulp
-- disagreement between two evaluations put a q BELOW the other
-- evaluation's qmn, minting a spurious bin -1 whose probabilities sum
-- past 1 (observed at sf0.1: fourier_entropy__bins_2 = 0.849 > ln 2,
-- flipping with SET threads=1).  Materializing pins ONE evaluation.
norm AS MATERIALIZED (
  SELECT p.user_id, p.event_type, p.p / mx.m AS q
  FROM psd p JOIN (
    SELECT user_id, event_type, MAX(p) AS m FROM psd
    GROUP BY user_id, event_type
  ) mx ON p.user_id = mx.user_id AND p.event_type = mx.event_type
),
frng AS (
  SELECT user_id, event_type, MIN(q) AS qmn, MAX(q) AS qmx, COUNT(*) AS nf
  FROM norm GROUP BY user_id, event_type
),
fbins AS (SELECT UNNEST([2, 3, 5, 10, 100]) AS b),
fbcount AS (
  SELECT n.user_id, n.event_type, fb.b,
         CASE WHEN r.qmx = r.qmn THEN 0
              ELSE LEAST(CAST(FLOOR((n.q - r.qmn) * fb.b / (r.qmx - r.qmn)) AS BIGINT),
                         fb.b - 1) END AS bin,
         COUNT(*) AS c, ANY_VALUE(r.nf) AS nf
  FROM norm n
  JOIN frng r ON n.user_id = r.user_id AND n.event_type = r.event_type
  CROSS JOIN fbins fb
  GROUP BY n.user_id, n.event_type, fb.b, 4
),
fourier AS (
  SELECT user_id, event_type, b,
         -SUM((CAST(c AS DOUBLE)/nf) * LN(CAST(c AS DOUBLE)/nf)) AS h
  FROM fbcount GROUP BY user_id, event_type, b
)

SELECT s.user_id, s.event_type,
       s.event_type || '__binned_entropy__max_bins_10' AS variable,
       ROUND(b.h, 6) + 0.0 AS value
FROM series s LEFT JOIN binned b
  ON s.user_id = b.user_id AND s.event_type = b.event_type
UNION ALL
SELECT s.user_id, s.event_type,
       s.event_type || '__permutation_entropy__dimension_' || dims.d || '__tau_1',
       CASE WHEN s.n >= dims.d THEN ROUND(p.h, 6) + 0.0 END
FROM series s
CROSS JOIN dims
LEFT JOIN perm p
  ON p.user_id = s.user_id AND p.event_type = s.event_type AND p.d = dims.d
UNION ALL
SELECT s.user_id, s.event_type,
       s.event_type || '__fourier_entropy__bins_' || fb.b,
       ROUND(f.h, 6) + 0.0
FROM series s
CROSS JOIN fbins fb
LEFT JOIN fourier f
  ON f.user_id = s.user_id AND f.event_type = s.event_type AND f.b = fb.b
"""


# ---------------------------------------------------------------------------
# lempel_ziv_complexity: the LZ phrase parse is inherently sequential
# (reference feature_calculators.py:1825-1862), but the sequential state
# machine itself is expressible as a DuckDB RECURSIVE CTE — each step
# carries (ind, inc, count, seen-phrase string) and membership is a
# delimiter-guarded strpos.  Binning mirrors np.linspace exactly (the last
# edge is pinned to max(x), not mn + b*step — np.linspace sets the endpoint
# explicitly, and an x == max(x) would otherwise bin off-by-one).  count/n
# is a single int/int IEEE division, so the comparison is BIT-EXACT with
# no rounding at all.
# ---------------------------------------------------------------------------


def q_lempel_ziv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {"lempel_ziv_complexity": [{"bins": b} for b in (2, 3, 5, 10, 100)]},
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select("user_id", "event_type", "variable", "value")


_ORACLE_LEMPEL_ZIV = """
WITH RECURSIVE base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n,
         MIN(v) OVER (PARTITION BY user_id, event_type) AS mn,
         MAX(v) OVER (PARTITION BY user_id, event_type) AS mx
  FROM base
),
bins AS (SELECT UNNEST([2, 3, 5, 10, 100]) AS b),
-- np.searchsorted(linspace(mn,mx,b+1)[1:], v, side='left') = count of upper
-- edges strictly below v; linspace pins the LAST edge to mx exactly
tok AS (
  SELECT o.user_id, o.event_type, bi.b, o.j, o.n,
         (SELECT COUNT(*) FROM (SELECT UNNEST(range(1, bi.b + 1)) AS k)
          WHERE (CASE WHEN k = bi.b THEN CAST(o.mx AS DOUBLE)
                      ELSE o.mn + k * ((CAST(o.mx AS DOUBLE) - o.mn) / bi.b)
                 END) < o.v) AS t
  FROM ord o CROSS JOIN bins bi
),
seqs AS (
  SELECT user_id, event_type, b, LIST(t ORDER BY j) AS seq, ANY_VALUE(n) AS n
  FROM tok GROUP BY user_id, event_type, b
),
-- the reference's slice-set parse as a state machine: on a member phrase
-- extend (inc+1), on a miss commit the phrase (count+1, advance ind);
-- the trailing in-progress word is never counted.  'seen' holds committed
-- phrases '|'-delimited with ','-joined tokens, so strpos on
-- '|' || sub || '|' matches whole phrases only.
parse AS (
  SELECT user_id, event_type, b, seq, n,
         0 AS ind, 1 AS inc, 0 AS cnt, '|' AS seen, 0 AS step
  FROM seqs
  UNION ALL
  SELECT user_id, event_type, b, seq, n,
         CASE WHEN hit THEN ind ELSE ind + inc END AS ind,
         CASE WHEN hit THEN inc + 1 ELSE 1 END AS inc,
         CASE WHEN hit THEN cnt ELSE cnt + 1 END AS cnt,
         CASE WHEN hit THEN seen ELSE seen || sub || '|' END AS seen,
         step + 1 AS step
  FROM (
    SELECT *, strpos(seen, '|' || sub || '|') > 0 AS hit
    FROM (
      SELECT *, array_to_string(seq[ind+1 : ind+inc], ',') AS sub
      FROM parse WHERE ind + inc <= n
    )
  )
),
final AS (
  SELECT user_id, event_type, b, MAX_BY(cnt, step) AS cnt, ANY_VALUE(n) AS n
  FROM parse GROUP BY user_id, event_type, b
)
SELECT user_id, event_type,
       event_type || '__lempel_ziv_complexity__bins_' || b AS variable,
       CAST(cnt AS DOUBLE) / n AS value
FROM final
"""


# ---------------------------------------------------------------------------
# friedrich_coefficients: quantile-binned drift polyfit (reference
# feature_calculators.py:131-173, 2082-2130).  The oracle replays the FULL
# pipeline in generated SQL: np.percentile edges with the pandas ×100
# round-trip and numpy's _lerp t>=0.5 branch, qcut bin assignment, exact
# integer-sum bin means, then the degree-3 least squares solved by a
# Cramer-unrolled 4×4 normal-equation system in a CENTERED+SCALED basis
# (u = (x−μ)/s) with polyfit-style column normalization and one iterative-
# refinement step, back-transformed to monomial coefficients algebraically.
# Centering is the load-bearing trick: raw monomial normal equations square
# the Vandermonde condition number and diverge from polyfit's SVD at ~1e-5;
# the centered solve agrees to ≤ 7.6e-9 on every coefficient (measured over
# 1379 series×r cases) — 65× inside the round(6) quantum.
#
# Series are de-tied with an EXACT dyadic salt (v + j/2^20 — v0 needs 7
# integer bits, j/2^20 adds 20 fractional bits, 27 total ≪ the 52-bit
# mantissa, so all sums stay exact in double).  The denominator sits above
# any realistic gate series length (~1M rows), so salted values are unique
# UNCONDITIONALLY — with the old /128 salt, rows j ≥ 128 could collide
# across v0 levels (v0=1,j=0 == v0=0,j=128), which at larger scale factors
# could reintroduce duplicate quantile edges and engage the kernel's
# qcut-ValueError / rank-deficient-SVD NaN paths that this SQL oracle
# deliberately cannot express.  Distinct values + the n >= r+2
# filter guarantee unique quantile edges and all r bins occupied, which
# keeps the kernel off its two non-SQL-expressible paths (the qcut
# ValueError → NaN path and polyfit's rank-deficient min-norm SVD path).
# ---------------------------------------------------------------------------

_FRIEDRICH_RS = (5, 8)  # n >= r+2 ⇒ every bin occupied; r=30 needs n >= 32
_FRIEDRICH_MIN_N = max(_FRIEDRICH_RS) + 2

# Population cap for the tolerance-family gates whose comparison rounds a
# genuinely divergent float path (friedrich/langevin Cardano, ADF erfc):
# every extra series is another dice roll on a round(5|6) boundary straddle
# (P ~ divergence/quantum per value).  sf0.01 has user_id 0..149, so the
# cap is a no-op at the driver's gate SF and keeps the population — and the
# validated straddle probability — CONSTANT at any larger SF (an sf0.1
# replay without the cap hit exactly one one-quantum straddle in each of
# max_langevin and adf_autolag; with it, both are green at sf0.1).
_GATE_USER_CAP = 150


def q_friedrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the LONG grouped path, not the tokens path: the tokens engine coerces
    # token arrays to int64 (the table contract), which would truncate the
    # dyadic de-tie salt — the long path feeds the value column through as
    # float64 (and this doubles as combiner coverage for that engine)
    from tsfresh_spark.extract import extract_features_long

    ev = (
        _events_long(spark, sf_dir)
        .filter(F.col("user_id") < _GATE_USER_CAP)
        .withColumn("v0", F.pmod("v", F.lit(97)).cast("double"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    salted = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.col("v0") + (F.row_number().over(w) - 1) / F.lit(1048576.0)).alias(
            "value"
        ),
        F.count("*")
        .over(Window.partitionBy("user_id", "event_type"))
        .alias("_n"),
    ).filter(F.col("_n") >= _FRIEDRICH_MIN_N)
    feats = extract_features_long(
        salted,
        {
            "friedrich_coefficients": [
                {"m": 3, "r": r, "coeff": c}
                for r in _FRIEDRICH_RS
                for c in range(4)
            ]
        },
        column_id="user_id",
        column_kind="event_type",
        column_sort=["ts", "event_id"],
        column_value="value",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


def _cramer_det_sql(mat) -> str:
    """4×4 determinant as an explicit 24-term SQL expression."""
    import itertools

    terms = []
    for perm in itertools.permutations(range(4)):
        inv = sum(
            1 for i in range(4) for j in range(i + 1, 4) if perm[i] > perm[j]
        )
        sign = "-" if inv % 2 else "+"
        terms.append(f"{sign}{'*'.join(mat[i][perm[i]] for i in range(4))}")
    return "(" + "".join(terms) + ")"


def _friedrich_cte_prefix() -> str:
    def per_r(r: int) -> str:
        return f"""
ed{r} AS (
  SELECT s.user_id, s.event_type, s.k,
    CASE WHEN t < 0.5 THEN a + (b - a) * t ELSE b - (b - a) * (1 - t) END AS edge
  FROM (
    SELECT user_id, event_type, k,
      ssig[CAST(FLOOR(h) AS BIGINT) + 1] AS a,
      ssig[LEAST(CAST(FLOOR(h) AS BIGINT) + 2, ns)] AS b,
      h - FLOOR(h) AS t
    FROM (
      SELECT user_id, event_type, ssig, ns, k.k,
        ((CASE WHEN k.k = {r} THEN 1.0 ELSE k.k * (1.0/{r}) END * 100) / 100) * (ns - 1) AS h
      FROM sigs, (SELECT UNNEST(range(0, {r}+1)) AS k) k
    )
  ) s
),
uq{r} AS (
  SELECT user_id, event_type, LIST(edge ORDER BY k) AS edges
  FROM ed{r} GROUP BY user_id, event_type
),
bn{r} AS (
  SELECT p.user_id, p.event_type,
    LEAST(GREATEST(len(list_filter(u.edges, e -> e < p.sv)) - 1, 0), {r}-1) AS b,
    p.sv, p.dv
  FROM pts p JOIN uq{r} u ON p.user_id = u.user_id AND p.event_type = u.event_type
),
gm{r} AS (
  SELECT user_id, event_type, b, SUM(sv)/COUNT(*) AS xm, SUM(dv)/COUNT(*) AS ym
  FROM bn{r} GROUP BY user_id, event_type, b
),
cs{r} AS (
  SELECT user_id, event_type, AVG(xm) AS mu FROM gm{r} GROUP BY user_id, event_type
),
cs2{r} AS (
  SELECT g.user_id, g.event_type, c.mu,
         GREATEST(MAX(ABS(g.xm - c.mu)), 1e-300) AS sc
  FROM gm{r} g JOIN cs{r} c ON g.user_id = c.user_id AND g.event_type = c.event_type
  GROUP BY g.user_id, g.event_type, c.mu
),
uu{r} AS (
  SELECT g.user_id, g.event_type, c.mu, c.sc,
         (g.xm - c.mu) / c.sc AS um, g.ym
  FROM gm{r} g JOIN cs2{r} c ON g.user_id = c.user_id AND g.event_type = c.event_type
),
ps{r} AS (
  SELECT user_id, event_type, ANY_VALUE(mu) AS mu, ANY_VALUE(sc) AS sc,
    {', '.join(f'SUM(POWER(um, {p})) AS s{p}' for p in range(0, 7))},
    {', '.join(f'SUM(POWER(um, {p}) * ym) AS t{p}' for p in range(0, 4))}
  FROM uu{r} GROUP BY user_id, event_type
)"""

    def solve_r(r: int) -> str:
        nrm = [f"n{a}" for a in range(4)]
        A = [
            [f"(s{(3 - i) + (3 - j)}/({nrm[i]}*{nrm[j]}))" for j in range(4)]
            for i in range(4)
        ]
        bvec = [f"(t{3 - i}/{nrm[i]})" for i in range(4)]
        d = _cramer_det_sql(A)
        sols = []
        for c in range(4):
            Ac = [
                [bvec[i] if j == c else A[i][j] for j in range(4)]
                for i in range(4)
            ]
            sols.append(f"({_cramer_det_sql(Ac)}) / dd AS z{c}")
        res = [
            f"({bvec[i]} - ({'+'.join(f'{A[i][j]}*z{j}' for j in range(4))}))"
            for i in range(4)
        ]
        dzs = []
        for c in range(4):
            Ac = [
                [f"r{i}" if j == c else A[i][j] for j in range(4)]
                for i in range(4)
            ]
            dzs.append(f"({_cramer_det_sql(Ac)}) / dd AS dz{c}")
        return f"""
nr{r} AS (
  SELECT *, SQRT(s6) AS n0, SQRT(s4) AS n1, SQRT(s2) AS n2, SQRT(s0) AS n3 FROM ps{r}
),
dd{r} AS (
  SELECT *, {d} AS dd FROM nr{r}
),
z{r} AS (
  SELECT *, {', '.join(sols)} FROM dd{r}
),
rs{r} AS (
  SELECT *, {', '.join(f'{res[i]} AS r{i}' for i in range(4))} FROM z{r}
),
dz{r} AS (
  SELECT *, {', '.join(dzs)} FROM rs{r}
),
cc{r} AS (
  SELECT user_id, event_type, mu, sc,
    (z0+dz0)/n0 AS a3, (z1+dz1)/n1 AS a2, (z2+dz2)/n2 AS a1, (z3+dz3)/n3 AS a0
  FROM dz{r}
),
sol{r} AS (
  SELECT user_id, event_type,
    a3/(sc*sc*sc) AS c0,
    -3*a3*mu/(sc*sc*sc) + a2/(sc*sc) AS c1,
    3*a3*mu*mu/(sc*sc*sc) - 2*a2*mu/(sc*sc) + a1/sc AS c2,
    -a3*mu*mu*mu/(sc*sc*sc) + a2*mu*mu/(sc*sc) - a1*mu/sc + a0 AS c3
  FROM cc{r}
)"""

    return f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v0
  FROM events
  WHERE user_id < {_GATE_USER_CAP}
),
ord0 AS (
  SELECT user_id, event_type,
         v0 + (ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1) / 1048576.0 AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
keepser AS (SELECT user_id, event_type FROM ord0 WHERE j = 0 AND n >= {_FRIEDRICH_MIN_N}),
pts AS (
  SELECT a.user_id, a.event_type, CAST(a.v AS DOUBLE) AS sv,
         CAST(b.v - a.v AS DOUBLE) AS dv
  FROM ord0 a
  JOIN keepser k ON a.user_id = k.user_id AND a.event_type = k.event_type
  JOIN ord0 b
    ON a.user_id = b.user_id AND a.event_type = b.event_type AND b.j = a.j + 1
),
sigs AS (
  SELECT user_id, event_type, LIST(sv ORDER BY sv) AS ssig, COUNT(*) AS ns
  FROM pts GROUP BY user_id, event_type
),
{','.join(per_r(r) + ',' + solve_r(r) for r in _FRIEDRICH_RS)}"""


def _friedrich_oracle_sql() -> str:
    unions = []
    for r in _FRIEDRICH_RS:
        for c in range(4):
            unions.append(
                f"SELECT user_id, event_type, event_type || "
                f"'__friedrich_coefficients__coeff_{c}__m_3__r_{r}' AS variable, "
                f"ROUND(c{c}, 6) + 0.0 AS value FROM sol{r}"
            )
    return _friedrich_cte_prefix() + "\n" + "\nUNION ALL\n".join(unions)


def _max_langevin_oracle_sql() -> str:
    """max_langevin_fixed_point = max over roots of Re(root) of the fitted
    drift cubic (reference feature_calculators.py:2134-2167 takes
    np.real() of ALL np.roots, so a complex pair contributes its real
    part).  Cardano's closed form in SQL doubles: for one real root the
    candidates are t1 and −t1/2 (the pair's shared real part); for three
    real roots the trigonometric form.  Agrees with numpy's
    companion-matrix eigenvalues to ≤ 9.9e-11 over all 1379 gate cases —
    5000× inside the round(6) quantum (simple, well-separated roots on
    this data; a near-multiple root would degrade Cardano to ~sqrt(eps),
    which the deterministic gate data never produces)."""
    langs = []
    for r in _FRIEDRICH_RS:
        langs.append(f"""
lg{r} AS (
  SELECT user_id, event_type,
    c1/(3*c0) AS sh,
    (3*c0*c2 - c1*c1)/(3*c0*c0) AS p,
    (2*c1*c1*c1 - 9*c0*c1*c2 + 27*c0*c0*c3)/(27*c0*c0*c0) AS q
  FROM sol{r}
),
lg2{r} AS (
  SELECT *, (q/2)*(q/2) + (p/3)*(p/3)*(p/3) AS disc FROM lg{r}
),
lg3{r} AS (
  SELECT *,
    CASE WHEN disc > 0
         THEN cbrt(-q/2 + sqrt(disc)) + cbrt(-q/2 - sqrt(disc)) END AS t1,
    CASE WHEN disc <= 0 AND p < 0
         THEN acos(LEAST(GREATEST(-q/(2*sqrt(-p*p*p/27)), -1.0), 1.0)) END AS phi,
    CASE WHEN disc <= 0 AND p < 0 THEN 2*sqrt(-p/3) END AS m2
  FROM lg2{r}
),
lv{r} AS (
  SELECT user_id, event_type,
    CASE WHEN disc > 0 THEN GREATEST(t1, -t1/2) - sh
         WHEN p < 0 THEN
           m2 * GREATEST(cos(phi/3), cos((phi + 2*pi())/3),
                         cos((phi + 4*pi())/3)) - sh
         ELSE -sh END AS value
  FROM lg3{r}
)""")
    unions = [
        f"SELECT user_id, event_type, event_type || "
        f"'__max_langevin_fixed_point__m_3__r_{r}' AS variable, "
        # squash-then-round comparator: the fixed point is UNBOUNDED (a
        # near-degenerate cubic puts it at ~1e5), so a fixed absolute
        # quantum can't hold — v/(1+|v|) turns round(9) into a relative
        # comparison (measured at sf0.1: max cross-engine squash diff
        # 5.9e-12 vs the 5e-10 quantum, 84x margin; raw absolute diff
        # reached 1.8e-6 on a 7e4-magnitude root, 2 quanta of round(6))
        f"ROUND(value / (1 + ABS(value)), 9) + 0.0 AS value FROM lv{r}"
        for r in _FRIEDRICH_RS
    ]
    return (
        _friedrich_cte_prefix()
        + ","
        + ",".join(langs)
        + "\n"
        + "\nUNION ALL\n".join(unions)
    )


def q_max_langevin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same salted long-path setup as q_friedrich (see there for why the
    # tokens path cannot carry the dyadic salt)
    from tsfresh_spark.extract import extract_features_long

    ev = (
        _events_long(spark, sf_dir)
        .filter(F.col("user_id") < _GATE_USER_CAP)
        .withColumn("v0", F.pmod("v", F.lit(97)).cast("double"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    salted = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.col("v0") + (F.row_number().over(w) - 1) / F.lit(1048576.0)).alias(
            "value"
        ),
        F.count("*")
        .over(Window.partitionBy("user_id", "event_type"))
        .alias("_n"),
    ).filter(F.col("_n") >= _FRIEDRICH_MIN_N)
    feats = extract_features_long(
        salted,
        {
            "max_langevin_fixed_point": [
                {"m": 3, "r": r} for r in _FRIEDRICH_RS
            ]
        },
        column_id="user_id",
        column_kind="event_type",
        column_sort=["ts", "event_id"],
        column_value="value",
    )
    # squash-then-round: mirrors the oracle's relative-style comparator
    # (see _max_langevin_oracle unions for the measured margins)
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (
            F.round(F.col("value") / (F.lit(1.0) + F.abs("value")), 9)
            + F.lit(0.0)
        ).alias("value"),
    )






# ---------------------------------------------------------------------------
# number_cwt_peaks — the LAST calculator: scipy-style CWT peak finding
# (reference feature_calculators.py:1319-1339) oracled end-to-end.  The
# Ricker CWT matrix and per-row relative maxima are generated SQL (maxima
# positions matched numpy on every gate row: zero exact neighbor ties,
# min nonzero margin 6.9e-4 — ten orders above the ~1e-13 cross-engine
# convolution noise, so the discrete decisions cannot flip); the
# inherently sequential ridge-line identification (greedy nearest-line
# attachment with stale-batch lookup, gap counters, retirement) runs as a
# RECURSIVE CTE carrying the active-line state as a LIST<STRUCT> column —
# the same state-machine-in-SQL trick as the Lempel-Ziv oracle; the
# filter replays the kernel's bounded/edge-clipped sliding-percentile
# noise floor (numpy lerp branch) and SNR >= 1 test.  Counts matched the
# kernel 750/750 at sf0.01 during development; integer counts compare
# bit-exactly.
# ---------------------------------------------------------------------------


def _cwt_peaks_oracle_sql() -> str:
    import math

    PI4 = repr(math.pi ** 0.25)

    def mat_cols(max_w=5):
        cols = []
        for W in range(1, max_w + 1):
            npn = f"LEAST({10*W}, n)"
            wav = (f"[ (2.0/(SQRT(3.0*{W})*{PI4})) * "
                   f"(1.0 - POWER((k - ({npn}-1)/2.0), 2)/POWER({W}.0,2)) * "
                   f"EXP(-POWER((k - ({npn}-1)/2.0), 2)/(2.0*POWER({W}.0,2))) "
                   f"for k in range(0, {npn}) ]")
            cols.append(f"""
        [ list_sum([ CASE WHEN k + ({npn}-1)//2 - j + 1 BETWEEN 1 AND {npn}
                     THEN xs[j+1] * ({wav})[k + ({npn}-1)//2 - j + 1] ELSE 0.0 END
                     for j in range(0, n) ])
          for k in range(0, n) ] AS m{W}""")
        return ",".join(cols)

    def rmax_cols(max_w=5):
        # 0-based maxima col indices per row; edge clamp makes edges never maxima
        cols = []
        for W in range(1, max_w + 1):
            cols.append(f"""
        [ i - 1 for i in range(1, n + 1)
          if i > 1 AND i < n AND m{W}[i] > m{W}[i-1] AND m{W}[i] > m{W}[i+1] ] AS r{W}""")
        return ",".join(cols)


    ST = "STRUCT(lc BIGINT, gap BIGINT, mr BIGINT, fc BIGINT, ln BIGINT)"

    def sx(e, f):
        return f"struct_extract({e}, '{f}')"

    def _build():
        mk = lambda lc, gap, mr, fc, ln: f"struct_pack(lc := {lc}, gap := {gap}, mr := {mr}, fc := {fc}, ln := {ln})"
        diffs = "[abs(tc[i] - p) for p in prev]"
        matches = (
            f"[ struct_pack(c := tc[i], li := CASE WHEN len(prev) > 0 AND "
            f"list_min({diffs}) <= (r+1)/4.0 THEN "
            f"list_position({diffs}, list_min({diffs})) END) "
            f"for i in range(1, len(tc)+1) ]"
        )
        ac = f"[{sx('m','c')} for m in matches if {sx('m','li')} = j]"
        updated = (
            f"[ CASE WHEN len({ac}) > 0 THEN "
            + mk(f"({ac})[-1]", "0", "r", f"({ac})[1]", f"{sx('lines1[j]','ln')} + len({ac})")
            + f" ELSE lines1[j] END for j in range(1, len(lines1)+1) ]"
        )
        spawned = f"[ {mk(sx('m','c'), '0', 'r', sx('m','c'), '1')} for m in matches if {sx('m','li')} IS NULL ]"
        # sliding percentile noise at 0-based col c over absm1 (length n)
        def noise(col):
            # pure expression (lambda-safe): sorted window percentile with
            # numpy's lerp branch, all pieces inlined
            win = (f"(CASE WHEN {col} < half THEN absm1[1 : {col} + half + odd] "
                   f"WHEN {col} + half + odd > n THEN absm1[{col} - half + 1 : n] "
                   f"ELSE absm1[{col} - half + 1 : {col} + half + odd] END)")
            sw = f"list_sort({win})"
            mw = f"len({win})"
            h = f"(0.1*({mw} - 1))"
            lo = f"CAST(FLOOR({h}) AS BIGINT)"
            t = f"({h} - FLOOR({h}))"
            a = f"{sw}[{lo} + 1]"
            b = f"{sw}[LEAST({lo} + 2, {mw})]"
            return (f"(CASE WHEN {t} < 0.5 THEN {a} + ({b} - {a})*{t} "
                    f"ELSE {b} - ({b} - {a})*(1 - {t}) END)")
        sig5 = ("CASE " + " ".join(
            f"WHEN {sx('l','mr')} = {i} THEN m{i+1}[{sx('l','fc')}+1]" for i in range(5)) + " END")
        return f"""
    WITH RECURSIVE s0 AS (
      SELECT user_id, event_type, xs, len(xs) AS n FROM series_in
    ),
    mat AS (SELECT *, {mat_cols()} FROM s0),
    rm AS (SELECT *, {rmax_cols()} FROM mat),
    seeds AS (
      SELECT *, [r1, r2, r3, r4, r5] AS rml,
        CASE WHEN len(r5) > 0 THEN 4 WHEN len(r4) > 0 THEN 3 WHEN len(r3) > 0 THEN 2
             WHEN len(r2) > 0 THEN 1 WHEN len(r1) > 0 THEN 0 END AS srow,
        [ABS(v) for v in m1] AS absm1,
        CAST(CEIL(n/20.0) AS BIGINT)//2 AS half,
        CAST(CEIL(n/20.0) AS BIGINT)%2 AS odd
      FROM rm
    ),
    seeds2 AS (
      SELECT *, [ {noise('c')} for c in range(0, n) ] AS noisev FROM seeds
    ),
    rec AS (
      SELECT user_id, event_type, rml, srow, CAST(srow - 1 AS BIGINT) AS r,
        [ {mk('c','0','srow','c','1')} for c in rml[srow+1] ] AS lines,
        []::{ST}[] AS fin
      FROM seeds2 WHERE srow IS NOT NULL
      UNION ALL
      SELECT user_id, event_type, rml, srow, r - 1,
        [l for l in (updated || spawned) if {sx('l','gap')} <= 1.0] AS lines,
        fin || [l for l in (updated || spawned) if {sx('l','gap')} > 1.0] AS fin
      FROM (
        SELECT user_id, event_type, rml, srow, r, fin,
               {updated.replace('lines1', 'LINES1X').replace('matches', 'MATCHESX')} AS updated,
               {spawned.replace('matches', 'MATCHESX')} AS spawned
        FROM (
          SELECT *, {matches.replace('prev', 'PREVX')} AS MATCHESX
          FROM (
            SELECT *, [{sx('l','lc')} for l in LINES1X] AS PREVX, rml[r+1] AS tc
            FROM (
              SELECT *, [ {mk(sx('l','lc'), sx('l','gap') + ' + 1', sx('l','mr'), sx('l','fc'), sx('l','ln'))} for l in lines ] AS LINES1X
              FROM rec WHERE r >= 0
            )
          )
        )
      )
    ),
    done AS (
      SELECT user_id, event_type, fin || lines AS alll FROM rec WHERE r = -1
    ),
    counted AS (
      SELECT d.user_id, d.event_type,
        len([l for l in alll if {sx('l','ln')} >= 2
             AND (noisev[{sx('l','fc')}+1] = 0 OR ABS(({sig5}) / noisev[{sx('l','fc')}+1]) >= 1.0)]) AS c5
      FROM done d JOIN seeds2 USING (user_id, event_type)
    ),
    c1t AS (
      SELECT user_id, event_type,
        len([c for c in r1 if noisev[c+1] = 0 OR ABS(m1[c+1] / noisev[c+1]) >= 1.0]) AS c1
      FROM seeds2
    )
    SELECT s.user_id, s.event_type,
           COALESCE(c1t.c1, 0) AS n1, COALESCE(counted.c5, 0) AS n5
    FROM s0 s
    LEFT JOIN c1t USING (user_id, event_type)
    LEFT JOIN counted USING (user_id, event_type)
    """

    sql = _build()
    sql = (
        sql.replace("LINES1X", "lines1")
        .replace("MATCHESX", "matches")
        .replace("PREVX", "prev")
    )
    series_in = """(
 SELECT user_id, event_type, LIST(CAST(v AS DOUBLE) ORDER BY ts, event_id) AS xs FROM (
   SELECT user_id, event_type, ts, event_id,
          ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v FROM events)
 GROUP BY 1, 2)"""
    sql = sql.replace("FROM series_in", "FROM " + series_in)
    final = """
SELECT user_id, event_type,
       event_type || '__number_cwt_peaks__n_1' AS variable,
       CAST(n1 AS DOUBLE) AS value
FROM ({body})
UNION ALL
SELECT user_id, event_type,
       event_type || '__number_cwt_peaks__n_5', CAST(n5 AS DOUBLE)
FROM ({body})
"""
    return final.replace("{body}", sql)


def q_cwt_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {"number_cwt_peaks": [{"n": 1}, {"n": 5}]},
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select("user_id", "event_type", "variable", "value")


# ---------------------------------------------------------------------------
# augmented_dickey_fuller, FULL AIC-autolag path: the ADF regression family
# (reference feature_calculators.py:499-544 wrapping statsmodels adfuller
# with autolag="AIC") oracled end-to-end in generated SQL.  The key
# identity that makes lag selection SQL-expressible: with the design
# reordered [level, const, xd_1..xd_k], the Cholesky factor of each
# candidate's Gram matrix is a PREFIX of the full factor, and
# ssr_k = y'y − Σ_{i<2+k} w_i² with w = L⁻¹b — so the whole AIC search
# is ONE Cholesky plus cumulative sums.  The final fit at the chosen lag
# (its own, longer sample) is a second Cholesky solve with one iterative-
# refinement step; t = p₀/se₀ with (G⁻¹)₀₀ = ‖L⁻¹e₀‖²; MacKinnon's tau-c
# polynomials feed the PORTABLE NR-erfc normal tail (the same expression
# the kernel evaluates — see kernels/model.py:_norm_cdf).  Every
# expression layer is its own MATERIALIZED CTE: DuckDB expands lateral
# aliases by substitution, and the Cholesky recursion in one SELECT blows
# up exponentially (measured >600 s; layered form runs in ~4 s).
# Measured vs the kernel on all 750 gate series: usedlag exact (min AIC
# margin 4.7e-3), |Δteststat| ≤ 2.6e-7 (19× inside round(5)),
# |Δpvalue| ≲ 1e-7 under the shared erfc.  Series are capped at n ≤ 24 on
# both sides so the static unroll (MAXL = 9) covers every row; n = 3
# series exercise the too-short → NaN path.
# ---------------------------------------------------------------------------


def _adf_oracle_sql() -> str:
    MAXL = 9
    K = MAXL + 2
    SQRT2 = "1.4142135623730951"
    LOG2PI = "1.8378770664093453"
    ERFC_POLY = (
        "tt * EXP(-ax*ax - 1.26551223 + tt*(1.00002368 + tt*(0.37409196 + "
        "tt*(0.09678418 + tt*(-0.18628806 + tt*(0.27886807 + tt*(-1.13520398 + "
        "tt*(1.48851587 + tt*(-0.82215223 + tt*0.17087277)))))))))"
    )

    def g(tag, i, j):
        i, j = min(i, j), max(i, j)
        return f"g{tag}_{i}_{j}"

    class Chain:
        def __init__(self, first):
            self.parts = []
            self.prev = first
            self.n = 0
        def layer(self, cols):
            """cols: dict name->expr; expressions may reference any column of
            self.prev (all prior layers' columns carried via SELECT *)."""
            self.n += 1
            name = f"c{self.n}"
            sel = ", ".join(f"{e} AS {k}" for k, e in cols.items())
            self.parts.append(f",\n{name} AS MATERIALIZED (SELECT *, {sel} FROM {self.prev})")
            self.prev = name

    def gram_cols(tag, start, ml, nb):
        z0 = f"xs[{start}+1 : {start}+{nb}]"
        y = f"xd[{start}+1 : {start}+{nb}]"
        def za(a): return f"xd[{start}-{a}+1 : {start}-{a}+{nb}]"
        def dot(u, v): return f"list_dot_product({u}, {v})"
        cols = {
            f"g{tag}_0_0": dot(z0, z0),
            f"g{tag}_0_1": f"list_sum({z0})",
            f"g{tag}_1_1": f"CAST({nb} AS DOUBLE)",
            f"b{tag}_0": dot(z0, y),
            f"b{tag}_1": f"list_sum({y})",
            f"yty{tag}": dot(y, y),
        }
        for c in range(2, K):
            a = c - 1
            cols[f"g{tag}_0_{c}"] = f"CASE WHEN {a} <= {ml} THEN {dot(z0, za(a))} ELSE 0.0 END"
            cols[f"g{tag}_1_{c}"] = f"CASE WHEN {a} <= {ml} THEN list_sum({za(a)}) ELSE 0.0 END"
            cols[f"b{tag}_{c}"] = f"CASE WHEN {a} <= {ml} THEN {dot(za(a), y)} ELSE 0.0 END"
            for d in range(c, K):
                b = d - 1
                if c == d:
                    cols[f"g{tag}_{c}_{d}"] = f"CASE WHEN {a} <= {ml} THEN {dot(za(a), za(a))} ELSE 1.0 END"
                else:
                    cols[f"g{tag}_{c}_{d}"] = f"CASE WHEN {b} <= {ml} THEN {dot(za(a), za(b))} ELSE 0.0 END"
        return cols

    def chol_layers(ch, tag):
        for j in range(K):
            s = " - ".join([g(tag, j, j)] + [f"l{tag}_{j}_{k}*l{tag}_{j}_{k}" for k in range(j)])
            ch.layer({f"l{tag}_{j}_{j}": f"SQRT({s})"})
            if j < K - 1:
                cols = {}
                for i in range(j + 1, K):
                    s = " - ".join([g(tag, i, j)] + [f"l{tag}_{i}_{k}*l{tag}_{j}_{k}" for k in range(j)])
                    cols[f"l{tag}_{i}_{j}"] = f"({s}) / l{tag}_{j}_{j}"
                ch.layer(cols)

    def fwd_layers(ch, tag, out, rhs):
        for i in range(K):
            s = " - ".join([f"({rhs(i)})"] + [f"l{tag}_{i}_{k}*{out}_{k}" for k in range(i)])
            ch.layer({f"{out}_{i}": f"({s}) / l{tag}_{i}_{i}"})

    def bwd_layers(ch, tag, out, rhs):
        for i in reversed(range(K)):
            s = " - ".join([f"({rhs(i)})"] + [f"l{tag}_{k}_{i}*{out}_{k}" for k in range(i + 1, K)])
            ch.layer({f"{out}_{i}": f"({s}) / l{tag}_{i}_{i}"})

    def matvec(tag, vec, i):
        return " + ".join(f"{g(tag, i, j)}*{vec}_{j}" for j in range(K))

    def build():
        head = f"""
    WITH base AS (
      SELECT user_id, event_type, ts, event_id,
             ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
      FROM events
      WHERE user_id < {_GATE_USER_CAP}
    ),
    ser AS MATERIALIZED (
      SELECT user_id, event_type,
             LIST(CAST(v AS DOUBLE) ORDER BY ts, event_id) AS xs,
             COUNT(*) AS n
      FROM base GROUP BY user_id, event_type
      HAVING COUNT(*) <= 24
    ),
    serv AS MATERIALIZED (
      SELECT user_id, event_type, xs, n,
             LEAST(n//2 - 2, CAST(CEIL(12*POWER(n/100.0, 0.25)) AS BIGINT)) AS ml,
             [xs[i+1] - xs[i] for i in range(1, n)] AS xd,
             n - 1 - LEAST(n//2 - 2, CAST(CEIL(12*POWER(n/100.0, 0.25)) AS BIGINT)) AS nb
      FROM ser WHERE n >= 4
    )"""
        ch = Chain("serv")
        ch.layer(gram_cols("s", "ml", "ml", "nb"))
        chol_layers(ch, "s")
        fwd_layers(ch, "s", "w", lambda i: f"bs_{i}")
        aics = []
        for k in range(2, K + 1):
            cum = " + ".join(f"w_{i}*w_{i}" for i in range(k))
            ssr = f"GREATEST(ytys - ({cum}), 1e-300)"
            llf = f"(-(CAST(nb AS DOUBLE))/2.0) * ({LOG2PI} + LN({ssr}/nb) + 1.0)"
            aics.append(
                f"CASE WHEN {k - 2} <= ml THEN (-2.0*({llf}) + 2.0*{k}) ELSE 'infinity'::DOUBLE END"
            )
        ch.layer({"aics": f"[{', '.join(aics)}]"})
        ch.layer({"ul": "list_position(aics, list_min(aics)) - 1"})
        ch.layer({"nb2": "n - 1 - ul"})
        ch.layer(gram_cols("f", "ul", "ul", "nb2"))
        chol_layers(ch, "f")
        fwd_layers(ch, "f", "wf", lambda i: f"bf_{i}")
        bwd_layers(ch, "f", "p", lambda i: f"wf_{i}")
        # one refinement step on p (measured: brings |dt| vs the kernel to
        # ~2.6e-7 on gate data -> round(5) with 19x margin)
        ch.layer({f"rp_{i}": f"bf_{i} - ({matvec('f', 'p', i)})" for i in range(K)})
        fwd_layers(ch, "f", "rfw", lambda i: f"rp_{i}")
        bwd_layers(ch, "f", "dp", lambda i: f"rfw_{i}")
        ch.layer({f"p1_{i}": f"p_{i} + dp_{i}" for i in range(K)})
        # u = G^-1 e0 (unrefined, matches the measured margin)
        fwd_layers(ch, "f", "v", lambda i: "1.0" if i == 0 else "0.0")
        bwd_layers(ch, "f", "u", lambda i: f"v_{i}")
        lagterms = " + ".join(
            f"CASE WHEN {a} <= ul THEN p1_{a + 1}*xd[ul-{a}+t] ELSE 0.0 END"
            for a in range(1, MAXL + 1)
        )
        resid = f"xd[ul+t] - p1_0*xs[ul+t] - p1_1 - ({lagterms})"
        ch.layer({"ssrf": f"list_sum([POWER({resid}, 2) for t in range(1, nb2 + 1)])",
                  "dff": "nb2 - (2 + ul)"})
        ch.layer({"sigma2": "CASE WHEN dff > 0 THEN ssrf / dff END"})
        ch.layer({"se0": "SQRT(GREATEST(sigma2 * u_0, 0.0))"})
        ch.layer({"t0": "CASE WHEN se0 > 0 THEN p1_0 / se0 END"})
        ch.layer({"poly": (
            "CASE WHEN t0 <= -1.61 THEN 2.1659 + 1.4412*t0 + 0.038269*POWER(t0, 2) "
            "ELSE 1.7339 + 0.93202*t0 + -0.12745*POWER(t0, 2) + -0.010368*POWER(t0, 3) END")})
        ch.layer({"ax": f"ABS(poly/{SQRT2})", "tt": f"1.0/(1.0 + 0.5*ABS(poly/{SQRT2}))"})
        ch.layer({"pval": (
            f"CASE WHEN t0 IS NULL OR isnan(t0) THEN NULL "
            f"WHEN t0 > 2.74 THEN 1.0 WHEN t0 < -18.83 THEN 0.0 "
            f"ELSE 1.0 - 0.5*(CASE WHEN poly/{SQRT2} >= 0 THEN {ERFC_POLY} "
            f"ELSE 2.0 - {ERFC_POLY} END) END")})
        tail = f""",
    res AS MATERIALIZED (
      SELECT user_id, event_type, t0, pval, CAST(ul AS DOUBLE) AS ulv FROM {ch.prev}
    )
    SELECT s.user_id, s.event_type,
           s.event_type || '__augmented_dickey_fuller__attr_"teststat"__autolag_"AIC"' AS variable,
           ROUND(CASE WHEN isnan(t0) THEN NULL ELSE t0 END, 5) + 0.0 AS value
    FROM ser s LEFT JOIN res r ON s.user_id = r.user_id AND s.event_type = r.event_type
    UNION ALL
    SELECT s.user_id, s.event_type,
           s.event_type || '__augmented_dickey_fuller__attr_"pvalue"__autolag_"AIC"',
           ROUND(pval, 5) + 0.0
    FROM ser s LEFT JOIN res r ON s.user_id = r.user_id AND s.event_type = r.event_type
    UNION ALL
    SELECT s.user_id, s.event_type,
           s.event_type || '__augmented_dickey_fuller__attr_"usedlag"__autolag_"AIC"',
           ROUND(ulv, 5) + 0.0
    FROM ser s LEFT JOIN res r ON s.user_id = r.user_id AND s.event_type = r.event_type
    """
        return head + "".join(ch.parts) + tail
    return build()


def q_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir).filter(
        (F.size("tokens") <= 24) & (F.col("user_id") < _GATE_USER_CAP)
    )
    feats = extract_features_tokens(
        toks,
        {
            "augmented_dickey_fuller": [
                {"attr": a, "autolag": "AIC"}
                for a in ("teststat", "pvalue", "usedlag")
            ]
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 5) + F.lit(0.0)).alias("value"),
    )


# ---------------------------------------------------------------------------
# ar_coefficient at k=1: the AutoReg OLS path (intercept + lag-1
# coefficient) has a textbook closed form — regress x_t on [1, x_{t−1}]
# (reference feature_calculators.py:1459-1507).  The default k=10 grid is
# a dense 11×11 solve (not SQL-expressible); k=1 gives the same code path
# external verification.
# ---------------------------------------------------------------------------


def q_ar_k1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    # well-posed fits only — mirrors the oracle's HAVING (see _ORACLE_AR_K1)
    toks = _events_tokens_mod97(spark, sf_dir).filter(
        (F.size("tokens") >= 3)
        & (
            F.size(
                F.array_distinct(F.slice("tokens", 1, F.size("tokens") - 1))
            )
            > 1
        )
    )
    feats = extract_features_tokens(
        toks,
        {"ar_coefficient": [{"coeff": c, "k": 1} for c in (0, 1)]},
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


_ORACLE_AR_K1 = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         LAG(v) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS vl
  FROM base
),
fit AS (
  SELECT user_id, event_type,
         (AVG(v*vl) - AVG(v)*AVG(vl)) / (AVG(vl*vl) - AVG(vl)*AVG(vl)) AS phi,
         AVG(v) AS my, AVG(vl) AS mx
  FROM ord WHERE vl IS NOT NULL
  GROUP BY user_id, event_type
  -- well-posed fits only (>= 2 lag pairs, non-constant regressor): on a
  -- rank-deficient design the kernel returns np.linalg.lstsq's min-norm
  -- solution (the reference's statsmodels-pinv behavior), which this
  -- closed form cannot express — mirrored by the Spark-side filter
  HAVING COUNT(*) >= 2 AND COUNT(DISTINCT vl) > 1
)
SELECT user_id, event_type,
       event_type || '__ar_coefficient__coeff_0__k_1' AS variable,
       ROUND(my - phi*mx, 6) + 0.0 AS value FROM fit
UNION ALL
SELECT user_id, event_type,
       event_type || '__ar_coefficient__coeff_1__k_1',
       ROUND(phi, 6) + 0.0 FROM fit
"""


# ---------------------------------------------------------------------------
# pacf: partial autocorrelation via Levinson-Durbin on the adjusted
# autocovariance (reference feature_calculators.py:440-495 →
# statsmodels pacf(method="ld")).  The recursion is sequential in the lag,
# so the oracle UNROLLS all 9 levels into generated SQL — each level adds
# the new reflection coefficient phi_k_k and updates the carried phi row.
# ---------------------------------------------------------------------------

_PACF_MAX_LAG = 9
_PACF_DIGITS = 6


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_mod97(spark, sf_dir)
    feats = extract_features_tokens(
        toks,
        {
            "partial_autocorrelation": [
                {"lag": k} for k in range(_PACF_MAX_LAG + 1)
            ]
        },
        id_col="user_id",
        kind_col="event_type",
    )
    return feats.select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", _PACF_DIGITS) + F.lit(0.0)).alias("value"),
    )


def _pacf_oracle_sql() -> str:
    """Generate the unrolled Levinson-Durbin SQL.  Level k computes
    phi_k_k = (c_k − Σ_{j<k} phi_j·c_{k−j}) / sig and the updated row
    phi_j ← phi_j − phi_k_k·phi_{k−j}; pacf[k] = phi_k_k.  The per-series
    lag cap mirrors the kernel: max_lag = n//2 − 1 when the demanded lag 9
    ≥ n//2, lags beyond it NaN; n//2 − 1 ≤ 0 → all NaN; a constant series
    (c0 = 0) pins lag_0 = 1 and NaNs the rest."""
    L = _PACF_MAX_LAG
    acov_cols = ", ".join(
        f"MAX(CASE WHEN k = {k} THEN c END) AS c{k}" for k in range(L + 1)
    )
    ctes = [
        f"""base AS (
  SELECT user_id, event_type, ts, event_id,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type,
         v - AVG(v) OVER (PARTITION BY user_id, event_type) AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) - 1 AS j,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
acov AS (
  SELECT a.user_id, a.event_type, b.j - a.j AS k, ANY_VALUE(a.n) AS n,
         SUM(a.s * b.s) / (ANY_VALUE(a.n) - (b.j - a.j)) AS c
  FROM ord a JOIN ord b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
   AND b.j - a.j BETWEEN 0 AND {L}
  GROUP BY a.user_id, a.event_type, b.j - a.j
),
piv AS (
  SELECT user_id, event_type, ANY_VALUE(n) AS n,
         CASE WHEN {L} >= ANY_VALUE(n)//2
              THEN ANY_VALUE(n)//2 - 1 ELSE {L} END AS maxlag,
         {acov_cols}
  FROM acov GROUP BY user_id, event_type
),
p1 AS (
  SELECT *, c1/c0 AS phi_1, c0 - (c1/c0)*c1 AS sig
  FROM piv
)"""
    ]
    for k in range(2, L + 1):
        prev = f"p{k - 1}"
        dot_num = " + ".join(f"phi_{j}*c{k - j}" for j in range(1, k))
        new_kk = f"(c{k} - ({dot_num})) / sig"
        updates = ", ".join(
            f"phi_{j} - pk*phi_{k - j} AS phi_{j}" for j in range(1, k)
        )
        ctes.append(
            f"""p{k} AS (
  SELECT user_id, event_type, n, maxlag,
         {", ".join(f"c{i}" for i in range(L + 1))},
         {updates}, pk AS phi_{k},
         sig * (1.0 - pk*pk) AS sig
  FROM (SELECT *, {new_kk} AS pk FROM {prev})
)"""
        )
    picks = []
    for k in range(L + 1):
        if k == 0:
            val = "CASE WHEN maxlag <= 0 THEN NULL ELSE 1.0 END"
        else:
            val = (
                f"CASE WHEN maxlag <= 0 OR c0 = 0 OR {k} > maxlag THEN NULL "
                f"ELSE ROUND(lvl_{k}, {_PACF_DIGITS}) + 0.0 END"
            )
        picks.append(
            f"SELECT user_id, event_type, "
            f"event_type || '__partial_autocorrelation__lag_{k}' AS variable, "
            f"{val} AS value FROM final"
        )
    # lvl_k = the reflection coefficient phi_k_k captured at level k: at the
    # last CTE phi_k has been updated by later levels, so re-expose each
    # level's own phi_k as lvl_k via a chain of carried columns
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
final AS (
  SELECT p{L}.user_id, p{L}.event_type, p{L}.maxlag, p{L}.c0,
         {", ".join(f"p{k}.phi_{k} AS lvl_{k}" for k in range(1, L + 1))}
  FROM p{L}
  {" ".join(
      f"JOIN p{k} ON p{k}.user_id = p{L}.user_id "
      f"AND p{k}.event_type = p{L}.event_type"
      for k in range(1, L)
  )}
)
"""
        + "\nUNION ALL ".join(picks)
    )


# ---------------------------------------------------------------------------
# matrix-profile grid: the opt-in 794-feature surface
# (comprehensive_settings(include_matrix_profile=True); reference grid
# settings.py:282-293, calculator feature_calculators.py:2385-2471).  The
# oracle recomputes the m=8 STOMP profile brute-force (z-normalized
# Euclidean distance over all |i−j| ≥ 3 window pairs) and asserts the
# 794-per-series column count.
# ---------------------------------------------------------------------------


def _settings_grid_width(settings: dict) -> int:
    """Features emitted per series for a settings grid — the tsfresh column
    count (794 for the comprehensive+matrix_profile grid).  One row per
    configured (calculator, params) is emitted for EVERY series (NaN
    features surface as NULL rows, never dropped), so the width is a
    property of the settings alone; evaluate the compiled plan once on a
    20-point probe with a datetime index (so timewise calculators engage,
    as they do for a timestamp sort column)."""
    import numpy as np
    import pandas as pd

    from tsfresh_spark.extract import compute_series_features

    probe = np.arange(20, dtype=float)
    idx = pd.DatetimeIndex(
        pd.date_range("2020-01-01", periods=20, freq="h")
    )
    return sum(
        1 for _ in compute_series_features(probe, "p", settings, timestamps=idx)
    )


def q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full comprehensive+matrix_profile extraction over the long path with
    a single timestamp sort column (timewise kernels engage → the complete
    794 grid per series).  Series here are 3–24 points, so the reference's
    maximum-subsequence window search always resolves to the single m=8
    profile (16 ≤ n < 32 ⇒ the doubling loop runs exactly once) and n < 16
    series are NaN — both mirrored in the oracle.  Output: the six
    matrix_profile features (rounded 6) plus a per-series ``_n_features``
    count row."""
    _prep(spark)
    from tsfresh_spark.extract import extract_features_long
    from tsfresh_spark.settings import comprehensive_settings

    ev = _events_long(spark, sf_dir)
    long_df = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.pmod("v", F.lit(97)).cast("double").alias("value"),
    )
    # Round-6 optimization (guide §1.2 — don't compute what you throw
    # away): this query's output keeps ONLY the matrix_profile features and
    # the per-series grid-width row, yet it used to evaluate the full
    # 794-calculator grid and discard 788 of them.  The grid width is a
    # data-independent property of the settings grid — every series emits
    # one row per configured (calculator, params) regardless of its values
    # (the oracle itself compares the count against the literal 794.0) — so
    # it is derived once on the driver from the SAME settings object by
    # evaluating the compiled plan on a 20-point probe
    # (tests/test_entry_oracle.py pins probe width == per-series row count
    # across lengths/NaN regimes), and only matrix_profile is extracted
    # distributed.  Before/after results are row-identical.
    full = comprehensive_settings(include_matrix_profile=True)
    n_features = _settings_grid_width(full)
    feats = extract_features_long(
        long_df,
        {"matrix_profile": full["matrix_profile"]},
        column_id="user_id",
        column_kind="event_type",
        column_sort="ts",
        column_value="value",
    )
    counts = (
        long_df.select("user_id", "event_type")
        .distinct()
        .select(
            "user_id",
            "event_type",
            F.lit("_n_features").alias("variable"),
            F.lit(float(n_features)).alias("value"),
        )
    )
    mp = feats.filter(F.col("variable").contains("__matrix_profile__")).select(
        "user_id",
        "event_type",
        "variable",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )
    return mp.unionByName(counts)


_ORACLE_MATRIX_PROFILE = """
WITH base AS (
  SELECT user_id, event_type, ts,
         ((CAST(ROUND(value*100) AS BIGINT) % 97) + 97) % 97 AS v
  FROM events
),
ord AS (
  SELECT user_id, event_type, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts) - 1 AS i,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM base
),
-- per-window (m=8) mean / population std / constant mask
wstat AS (
  SELECT user_id, event_type, i AS w,
         AVG(v)        OVER win8 AS mu,
         STDDEV_POP(v) OVER win8 AS sig,
         MAX(v) OVER win8 = MIN(v) OVER win8 AS flat,
         COUNT(*) OVER win8 AS cnt
  FROM ord
  WINDOW win8 AS (PARTITION BY user_id, event_type ORDER BY i
                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
),
-- sliding dot products along each diagonal d ≥ excl+1 = 3
diag AS (
  SELECT a.user_id, a.event_type, b.i - a.i AS d, a.i AS pos,
         CAST(a.v * b.v AS DOUBLE) AS p
  FROM ord a JOIN ord b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
   AND b.i - a.i >= 3
),
qt AS (
  SELECT user_id, event_type, d, pos AS i,
         SUM(p)     OVER dwin AS qt,
         COUNT(*)   OVER dwin AS cnt
  FROM diag
  WINDOW dwin AS (PARTITION BY user_id, event_type, d ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
),
dist AS (
  SELECT q.user_id, q.event_type, q.i, q.i + q.d AS j,
         CASE WHEN wi.flat AND wj.flat THEN 0.0
              WHEN wi.flat OR  wj.flat THEN SQRT(8.0)
              ELSE SQRT(GREATEST(
                2.0*8*(1.0 - (q.qt - 8*wi.mu*wj.mu) / (8*wi.sig*wj.sig)),
                0.0))
         END AS dist
  FROM qt q
  JOIN wstat wi ON wi.user_id = q.user_id AND wi.event_type = q.event_type
               AND wi.w = q.i AND wi.cnt = 8
  JOIN wstat wj ON wj.user_id = q.user_id AND wj.event_type = q.event_type
               AND wj.w = q.i + q.d AND wj.cnt = 8
  WHERE q.cnt = 8
),
prof AS (
  SELECT user_id, event_type, w, MIN(dist) AS mp FROM (
    SELECT user_id, event_type, i AS w, dist FROM dist
    UNION ALL
    SELECT user_id, event_type, j AS w, dist FROM dist
  ) GROUP BY user_id, event_type, w
),
stats AS (
  SELECT user_id, event_type,
         MIN(mp) AS f_min, MAX(mp) AS f_max, AVG(mp) AS f_mean,
         QUANTILE_CONT(mp, 0.5)  AS f_median,
         QUANTILE_CONT(mp, 0.25) AS f_25,
         QUANTILE_CONT(mp, 0.75) AS f_75
  FROM prof GROUP BY user_id, event_type
),
series AS (SELECT user_id, event_type, ANY_VALUE(n) AS n
           FROM ord GROUP BY user_id, event_type),
-- the reference's maximum-subsequence path returns NaN below 16 points;
-- our series never reach 32, so the doubling search is exactly the m=8
-- profile for every eligible series
joined AS (
  SELECT s.user_id, s.event_type,
         CASE WHEN s.n >= 16 THEN st.f_min    END AS f_min,
         CASE WHEN s.n >= 16 THEN st.f_max    END AS f_max,
         CASE WHEN s.n >= 16 THEN st.f_mean   END AS f_mean,
         CASE WHEN s.n >= 16 THEN st.f_median END AS f_median,
         CASE WHEN s.n >= 16 THEN st.f_25     END AS f_25,
         CASE WHEN s.n >= 16 THEN st.f_75     END AS f_75
  FROM series s LEFT JOIN stats st
    ON s.user_id = st.user_id AND s.event_type = st.event_type
)
SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"min"__threshold_0.98' AS variable,
       ROUND(f_min, 6) + 0.0 AS value FROM joined
UNION ALL SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"max"__threshold_0.98',
       ROUND(f_max, 6) + 0.0 FROM joined
UNION ALL SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"mean"__threshold_0.98',
       ROUND(f_mean, 6) + 0.0 FROM joined
UNION ALL SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"median"__threshold_0.98',
       ROUND(f_median, 6) + 0.0 FROM joined
UNION ALL SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"25"__threshold_0.98',
       ROUND(f_25, 6) + 0.0 FROM joined
UNION ALL SELECT user_id, event_type,
       event_type || '__matrix_profile__feature_"75"__threshold_0.98',
       ROUND(f_75, 6) + 0.0 FROM joined
UNION ALL SELECT user_id, event_type, '_n_features', 794.0 FROM joined
"""


# ---------------------------------------------------------------------------
# q22: as-of join — for each click, the user's latest prior purchase value
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.asof import asof_join

    ev = _events_long(spark, sf_dir)
    # microsecond precision: second-level truncation would alias distinct
    # events into ties and make the as-of match ambiguous
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_ts"),
        F.col("v").alias("purchase_v"),
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="click_ts",
        right_time="purchase_ts",
        value_cols=["purchase_v"],
        suffix="",
    )


_ORACLE_ASOF_JOIN = f"""
WITH base AS ({_BASE_SQL}),
clicks AS (
  SELECT user_id, EPOCH_US(ts) AS click_ts
  FROM base WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, EPOCH_US(ts) AS purchase_ts, v AS purchase_v
  FROM base WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_ts, CAST(p.purchase_v AS BIGINT) AS purchase_v
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.click_ts >= p.purchase_ts
"""


# ---------------------------------------------------------------------------
# q23: distribution checks — symmetry_looking / mean_n_absolute_max /
# value_count / range_count through the kernel path (all exact)
# ---------------------------------------------------------------------------


def q_distribution_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsfresh_spark.extract import extract_features_tokens

    toks = _events_tokens_longid(spark, sf_dir)
    long_df = extract_features_tokens(
        toks,
        {
            "symmetry_looking": [{"r": 0.05}, {"r": 0.2}],
            "mean_n_absolute_max": [{"number_of_maxima": 7}],
            "value_count": [{"value": 10000}],
            "range_count": [{"min": 5000, "max": 15000}],
        },
        id_col="user_id",
        kind_col="event_type",
    )
    short = (
        F.when(F.col("variable").contains("r_0.05"), F.lit("sym_005"))
        .when(F.col("variable").contains("r_0.2"), F.lit("sym_02"))
        .when(F.col("variable").contains("mean_n_absolute_max"), F.lit("m7max"))
        .when(F.col("variable").contains("value_count"), F.lit("vc10000"))
        .otherwise(F.lit("rc"))
    )
    return (
        long_df.withColumn("variable", short)
        .groupBy("user_id", "event_type")
        .pivot("variable", ["sym_005", "sym_02", "m7max", "vc10000", "rc"])
        .agg(F.first("value"))
    )


_ORACLE_DISTRIBUTION_CHECKS = f"""
WITH base AS ({_BASE_SQL}),
g AS (
  SELECT user_id, event_type,
         COUNT(*) AS n, SUM(v) AS s, MEDIAN(v) AS med,
         MIN(v) AS mn, MAX(v) AS mx,
         SUM(CASE WHEN v = 10000 THEN 1 ELSE 0 END) AS vc,
         SUM(CASE WHEN v >= 5000 AND v < 15000 THEN 1 ELSE 0 END) AS rc
  FROM base GROUP BY user_id, event_type
),
topk AS (
  SELECT user_id, event_type, SUM(av) AS top_sum, COUNT(*) AS top_n
  FROM (
    SELECT user_id, event_type, ABS(v) AS av,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ABS(v) DESC) AS rk,
           COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
    FROM base
  ) WHERE rk <= 7 AND n > 7
  GROUP BY user_id, event_type
)
SELECT g.user_id, g.event_type,
  CAST(ABS(CAST(g.s AS DOUBLE) / g.n - g.med) < 0.05 * (g.mx - g.mn) AS DOUBLE) AS sym_005,
  CAST(ABS(CAST(g.s AS DOUBLE) / g.n - g.med) < 0.2 * (g.mx - g.mn) AS DOUBLE) AS sym_02,
  CAST(t.top_sum AS DOUBLE) / 7 AS m7max,
  CAST(g.vc AS DOUBLE) AS vc10000,
  CAST(g.rc AS DOUBLE) AS rc
FROM g LEFT JOIN topk t USING (user_id, event_type)
"""


# ---------------------------------------------------------------------------
# q26: linear_trend_timewise through the real extraction path — hourly
# rollup per series, then the DatetimeIndex (hours-elapsed) regression.
# Hour-aligned buckets make the time axis integral, so slope/intercept/r
# replicate in SQL; round(6) absorbs sum-order float noise.
# ---------------------------------------------------------------------------


def q_timewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.extract import extract_features_long

    ev = _events_long(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("v").alias("hv"))
    long_df = hourly.select(
        F.col("user_id").alias("id"),
        F.col("event_type").alias("kind"),
        F.col("h").alias("time"),
        F.col("hv").cast("double").alias("value"),
    )
    feats = extract_features_long(
        long_df,
        {
            "linear_trend_timewise": [
                {"attr": "slope"},
                {"attr": "intercept"},
                {"attr": "rvalue"},
            ]
        },
    )
    # round(5): slope/intercept/r are genuinely float-path-dependent
    # (numpy two-pass means vs DuckDB single-pass COVAR/VAR); measured
    # cross-engine divergence is <=3.6e-12 at sf0.01, so 5 decimals puts
    # every value ~7 orders of magnitude away from a rounding boundary
    return feats.select(
        F.col("id").cast("long").alias("user_id"),
        F.col("kind").alias("event_type"),
        "variable",
        F.round("value", 5).alias("value"),
    )


_ORACLE_TIMEWISE_TREND = f"""
WITH base AS ({_BASE_SQL}),
hourly AS (
  SELECT user_id, event_type, date_trunc('hour', ts) AS h, SUM(v) AS hv
  FROM base GROUP BY user_id, event_type, h
),
t AS (
  SELECT user_id, event_type,
    CAST(epoch(h) - MIN(epoch(h)) OVER (PARTITION BY user_id, event_type)
         AS DOUBLE) / 3600 AS th,
    CAST(hv AS DOUBLE) AS v
  FROM hourly
),
g AS (
  SELECT user_id, event_type, COUNT(*) AS n,
    AVG(th) AS mt, AVG(v) AS mv,
    COVAR_POP(th, v) AS sxy, VAR_POP(th) AS sxx, VAR_POP(v) AS syy,
    CORR(th, v) AS r
  FROM t GROUP BY user_id, event_type
)
SELECT user_id, event_type,
  event_type || '__linear_trend_timewise__attr_"slope"' AS variable,
  CASE WHEN n >= 2 AND sxx <> 0 THEN ROUND(sxy / sxx, 5) END AS value
FROM g
UNION ALL
SELECT user_id, event_type,
  event_type || '__linear_trend_timewise__attr_"intercept"',
  CASE WHEN n >= 2 AND sxx <> 0 THEN ROUND(mv - (sxy / sxx) * mt, 5) END
FROM g
UNION ALL
SELECT user_id, event_type,
  event_type || '__linear_trend_timewise__attr_"rvalue"',
  CASE WHEN n < 2 OR sxx = 0 THEN NULL
       WHEN syy = 0 THEN 0.0
       ELSE ROUND(LEAST(1.0, GREATEST(-1.0, r)), 5) END
FROM g
"""


# ---------------------------------------------------------------------------
# q26: FRESH selection plane — relevance table with a full DuckDB replica of
# all four significance tests (Fisher exact, Mann-Whitney, Kendall τ-b, KS)
# and the Benjamini-Yekutieli mask.  Reference surface: relevance.py:31-322,
# significance_tests.py:43-188.  Exactness: integral feature values → ranks,
# tie terms and contingency counts are exact on both sides; every float
# formula (variances, z-scores, the shared portable erfc from
# operators/selection.py:_nr_erfc, lgamma hypergeometric sums, the KS
# series) is mirrored operation-for-operation; p-values round(6).
# ---------------------------------------------------------------------------


def q_fresh_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    import pandas as pd

    from tsfresh_spark.operators.selection import calculate_relevance_table

    ev = _events_long(spark, sf_dir)
    # deterministic per-user feature matrix: 4 real + 1 binary + 1 constant,
    # all integral-valued doubles (exact ranks/ties/counts in any engine)
    feats = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("f_count"),
        F.sum("v").cast("double").alias("f_sum"),
        F.max("v").cast("double").alias("f_max"),
        F.min("v").cast("double").alias("f_min"),
        (F.count("*") % 2).cast("double").alias("f_parity"),
        F.lit(1.0).alias("f_const"),
    )
    # two deterministic targets: binary (classification routes real→MW,
    # binary→Fisher) and real (regression routes real→Kendall, binary→KS).
    # y is a tiny driver-side Series — the selection API contract, like the
    # reference's calculate_relevance_table(X, y).
    targets = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_id") % 2 == 0, F.col("v")).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("y_reg")
        )
        .withColumn("y_class", (F.col("user_id") % 2).cast("int"))
        .toPandas()
        .set_index("user_id")
    )
    rows = []
    for task, y in (
        ("classification", targets["y_class"]),
        ("regression", targets["y_reg"]),
    ):
        tbl = calculate_relevance_table(feats, y, id_col="user_id", ml_task=task)
        for r in tbl[["feature", "type", "p_value", "relevant"]].itertuples(
            index=False
        ):
            p = None if pd.isna(r.p_value) else float(r.p_value)
            rows.append((task, r.feature, r.type, p, int(bool(r.relevant))))
    out = spark.createDataFrame(
        rows,
        "task string, feature string, type string, p_value double, relevant int",
    )
    return out.select(
        "task",
        "feature",
        "type",
        F.round("p_value", 6).alias("p_value"),
        "relevant",
    )


# The NR-form erfc polynomial — textually identical constants and
# association order as operators/selection.py:_nr_erfc
_ERFC_POLY = (
    "tt * EXP(-ax*ax - 1.26551223 + tt*(1.00002368 + tt*(0.37409196 + "
    "tt*(0.09678418 + tt*(-0.18628806 + tt*(0.27886807 + tt*(-1.13520398 + "
    "tt*(1.48851587 + tt*(-0.82215223 + tt*0.17087277)))))))))"
)

_ORACLE_FRESH_RELEVANCE = f"""
WITH base AS ({_BASE_SQL}),
feat AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS f_count,
         CAST(SUM(v) AS DOUBLE) AS f_sum,
         CAST(MAX(v) AS DOUBLE) AS f_max,
         CAST(MIN(v) AS DOUBLE) AS f_min,
         CAST(COUNT(*) % 2 AS DOUBLE) AS f_parity,
         CAST(1.0 AS DOUBLE) AS f_const,
         CAST(user_id % 2 AS INT) AS y_class,
         CAST(SUM(CASE WHEN event_id % 2 = 0 THEN v ELSE 0 END) AS DOUBLE) AS y_reg
  FROM base GROUP BY user_id
),
melted AS (
  SELECT user_id, y_class, y_reg, 'f_count' AS feature, f_count AS value FROM feat
  UNION ALL SELECT user_id, y_class, y_reg, 'f_sum', f_sum FROM feat
  UNION ALL SELECT user_id, y_class, y_reg, 'f_max', f_max FROM feat
  UNION ALL SELECT user_id, y_class, y_reg, 'f_min', f_min FROM feat
  UNION ALL SELECT user_id, y_class, y_reg, 'f_parity', f_parity FROM feat
  UNION ALL SELECT user_id, y_class, y_reg, 'f_const', f_const FROM feat
),
typed AS (
  SELECT feature, COUNT(DISTINCT value) AS nd, COUNT(*) AS n,
         MIN(value) AS mnv, MAX(value) AS mxv
  FROM melted GROUP BY feature
),
types AS (
  SELECT feature, CASE WHEN nd <= 1 THEN 'constant'
                       WHEN nd = 2 THEN 'binary' ELSE 'real' END AS type
  FROM typed
),
-- ====== classification / real -> Mann-Whitney (asymptotic, tie+cc) ======
mw_rows AS (
  SELECT m.feature, m.value, m.y_class,
         RANK() OVER (PARTITION BY m.feature ORDER BY m.value) AS minr,
         COUNT(*) OVER (PARTITION BY m.feature, m.value) AS cnt
  FROM melted m JOIN typed t USING (feature) WHERE t.nd >= 3
),
mw_tie AS (
  SELECT feature, CAST(SUM(c*c*c - c) AS DOUBLE) AS tie_term
  FROM (SELECT m.feature, m.value, COUNT(*) AS c
        FROM melted m JOIN typed t USING (feature) WHERE t.nd >= 3
        GROUP BY m.feature, m.value)
  GROUP BY feature
),
mw_agg AS (
  SELECT feature,
         SUM(CASE WHEN y_class = 0 THEN CAST(minr AS DOUBLE) + (cnt - 1)/2.0 ELSE 0.0 END) AS r1,
         COUNT(*) FILTER (WHERE y_class = 0) AS n1,
         COUNT(*) FILTER (WHERE y_class = 1) AS n2
  FROM mw_rows GROUP BY feature
),
mw_var AS (
  SELECT a.feature, r1, n1, n2,
         (n1*n2)/12.0 * (((n1 + n2) + 1) - tie_term / CAST((n1 + n2)*((n1 + n2) - 1) AS DOUBLE)) AS var
  FROM mw_agg a JOIN mw_tie USING (feature)
),
mw_res AS (
  SELECT feature,
         CASE WHEN var <= 0 THEN 1.0 END AS p_fixed,
         CASE WHEN var > 0 THEN
           (ABS((r1 - (n1*(n1 + 1))/2.0) - (n1*n2)/2.0) - 0.5) / SQRT(var)
         END AS z
  FROM mw_var
),
-- ====== regression / real -> Kendall tau-b (asymptotic, tie-adjusted) ======
kreal AS (
  SELECT m.feature, m.user_id, m.value, m.y_reg
  FROM melted m JOIN typed t USING (feature) WHERE t.nd >= 3
),
kpq AS (
  SELECT a.feature,
         COUNT(*) FILTER (WHERE (a.value - b.value)*(a.y_reg - b.y_reg) > 0) AS cp,
         COUNT(*) FILTER (WHERE (a.value - b.value)*(a.y_reg - b.y_reg) < 0) AS cq
  FROM kreal a JOIN kreal b ON a.feature = b.feature AND a.user_id < b.user_id
  GROUP BY a.feature
),
ktx AS (
  SELECT feature,
         SUM(cd*(cd - 1)/2) AS xt_pairs,
         SUM(cd*(cd - 1)*(2*cd + 5)) AS vt,
         SUM(cd*(cd - 1)*(cd - 2)) AS vt2,
         SUM(cd*(cd - 1)) AS xt11
  FROM (SELECT feature, value, CAST(COUNT(*) AS DOUBLE) AS cd
        FROM kreal GROUP BY feature, value)
  GROUP BY feature
),
kty AS (
  SELECT feature,
         SUM(cd*(cd - 1)/2) AS yt_pairs,
         SUM(cd*(cd - 1)*(2*cd + 5)) AS vu,
         SUM(cd*(cd - 1)*(cd - 2)) AS vu2,
         SUM(cd*(cd - 1)) AS yt11
  FROM (SELECT feature, y_reg, CAST(COUNT(*) AS DOUBLE) AS cd
        FROM kreal GROUP BY feature, y_reg)
  GROUP BY feature
),
kvar AS (
  SELECT k.feature, cp, cq,
         SQRT(((t.n*(t.n - 1))/2.0 - xt_pairs) * ((t.n*(t.n - 1))/2.0 - yt_pairs)) AS denom,
         ((((t.n*(t.n - 1)*(2*t.n + 5)) - vt) - vu)/18.0
           + (xt11*yt11)/((2.0*t.n)*(t.n - 1)))
           + CASE WHEN t.n > 2 THEN (vt2*vu2)/(((9.0*t.n)*(t.n - 1))*(t.n - 2)) ELSE 0.0 END AS var
  FROM kpq k JOIN ktx USING (feature) JOIN kty USING (feature)
       JOIN typed t USING (feature)
),
kd_res AS (
  SELECT feature,
         CASE WHEN denom = 0 THEN CAST(NULL AS DOUBLE)
              WHEN var <= 0 THEN 1.0 END AS p_fixed,
         CASE WHEN denom <> 0 AND var > 0 THEN
           ABS(CAST(cp - cq AS DOUBLE) / SQRT(var))
         END AS z
  FROM kvar
),
-- ====== shared normal tail: p = min(1, erfc_nr(z / sqrt(2))) ======
normals AS (
  SELECT 'classification' AS task, feature, p_fixed, z FROM mw_res
  UNION ALL SELECT 'regression', feature, p_fixed, z FROM kd_res
),
norm_p AS (
  -- branch on z, not on COALESCE over the erfc: DuckDB's LEAST ignores
  -- NULLs, so LEAST(1.0, NULL) would turn a denom=0 Kendall (engine NaN →
  -- NULL) into 1.0 instead of propagating the NULL
  SELECT task, feature,
         CASE WHEN x IS NOT NULL THEN
           LEAST(1.0, CASE WHEN x >= 0 THEN {_ERFC_POLY}
                           ELSE 2.0 - {_ERFC_POLY} END)
         ELSE p_fixed END AS p_raw
  FROM (
    SELECT task, feature, p_fixed, x, ABS(x) AS ax, 1.0/(1.0 + 0.5*ABS(x)) AS tt
    FROM (SELECT task, feature, p_fixed, z / SQRT(2.0) AS x FROM normals)
  )
),
-- ====== classification / binary -> Fisher exact (lgamma hypergeometric) ======
fis AS (
  SELECT m.feature,
         COUNT(*) FILTER (WHERE m.value = t.mxv AND m.y_class = 1) AS a,
         COUNT(*) FILTER (WHERE m.value = t.mxv AND m.y_class = 0) AS b,
         COUNT(*) FILTER (WHERE m.value = t.mnv AND m.y_class = 1) AS c,
         COUNT(*) FILTER (WHERE m.value = t.mnv AND m.y_class = 0) AS d
  FROM melted m JOIN typed t USING (feature) WHERE t.nd = 2
  GROUP BY m.feature
),
fis2 AS (
  SELECT feature, a, a + b + c + d AS n, a + b AS row1, a + c AS col1 FROM fis
),
fis3 AS (
  SELECT feature, n, row1, col1,
         EXP((((LGAMMA(row1 + 1.0) - LGAMMA(a + 1.0)) - LGAMMA(row1 - a + 1.0))
            + ((LGAMMA(n - row1 + 1.0) - LGAMMA(col1 - a + 1.0)) - LGAMMA(n - row1 - (col1 - a) + 1.0)))
            - ((LGAMMA(n + 1.0) - LGAMMA(col1 + 1.0)) - LGAMMA(n - col1 + 1.0))) AS p_obs
  FROM fis2
),
fisher_p AS (
  SELECT feature,
         LEAST(1.0, LIST_SUM(LIST_FILTER(LIST_TRANSFORM(
           RANGE(0, LEAST(row1, col1) + 1),
           k -> CASE WHEN col1 - k > n - row1 THEN 0.0
                ELSE EXP((((LGAMMA(row1 + 1.0) - LGAMMA(k + 1.0)) - LGAMMA(row1 - k + 1.0))
                        + ((LGAMMA(n - row1 + 1.0) - LGAMMA(col1 - k + 1.0)) - LGAMMA(n - row1 - (col1 - k) + 1.0)))
                        - ((LGAMMA(n + 1.0) - LGAMMA(col1 + 1.0)) - LGAMMA(n - col1 + 1.0))) END),
           pk -> pk <= p_obs * (1 + 1e-7)))) AS p_raw
  FROM fis3
),
-- ====== regression / binary -> two-sample KS (asymptotic Kolmogorov) ======
ksrows AS (
  SELECT m.feature, m.y_reg AS tval,
         CASE WHEN m.value = t.mnv THEN 0 ELSE 1 END AS grp
  FROM melted m JOIN typed t USING (feature) WHERE t.nd = 2
),
ks_n AS (
  SELECT feature,
         COUNT(*) FILTER (WHERE grp = 0) AS n1,
         COUNT(*) FILTER (WHERE grp = 1) AS n2
  FROM ksrows GROUP BY feature
),
ks_d AS (
  SELECT feature, MAX(ABS(c1 - c2)) AS d FROM (
    SELECT r.feature,
      SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) OVER w / g.n1 AS c1,
      SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) OVER w / g.n2 AS c2
    FROM ksrows r JOIN ks_n g USING (feature)
    WINDOW w AS (PARTITION BY r.feature ORDER BY r.tval
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) GROUP BY feature
),
ks_lam AS (
  SELECT d.feature, n1, n2,
         ((SQRT((n1*n2) / (n1 + n2)) + 0.12) + 0.11/SQRT((n1*n2) / (n1 + n2))) * d AS lam
  FROM ks_d d JOIN ks_n USING (feature)
),
ks_p AS (
  SELECT feature,
         CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)
              WHEN lam <= 0 THEN 1.0
              ELSE GREATEST(0.0, LEAST(1.0, 2.0 * LIST_SUM(LIST_TRANSFORM(
                RANGE(1, 101),
                j -> (CASE WHEN j % 2 = 1 THEN 1.0 ELSE -1.0 END)
                     * EXP(-2.0*j*j*lam*lam)))))
         END AS p_raw
  FROM ks_lam
),
-- ====== Benjamini-Yekutieli over the per-task testable features ======
pvals AS (
  SELECT task, feature, p_raw FROM norm_p
  UNION ALL SELECT 'classification', feature, p_raw FROM fisher_p
  UNION ALL SELECT 'regression', feature, p_raw FROM ks_p
),
ranked AS (
  SELECT p.task, p.feature, ty.type, p.p_raw,
         ROW_NUMBER() OVER (PARTITION BY p.task ORDER BY COALESCE(p.p_raw, 1.0)) AS k,
         COUNT(*) OVER (PARTITION BY p.task) AS m,
         COALESCE(p.p_raw, 1.0) AS p_bh
  FROM pvals p JOIN types ty USING (feature)
),
cms AS (
  SELECT DISTINCT task, m,
         LIST_SUM(LIST_TRANSFORM(RANGE(1, m + 1), i -> 1.0/i)) AS cm
  FROM ranked
),
kmax AS (
  SELECT r.task, MAX(CASE WHEN r.p_bh <= (0.05 * r.k) / (r.m * c.cm) THEN r.k END) AS km
  FROM ranked r JOIN cms c USING (task) GROUP BY r.task
)
SELECT r.task, r.feature, r.type, ROUND(r.p_raw, 6) AS p_value,
       CAST(CASE WHEN r.k <= COALESCE(x.km, 0) THEN 1 ELSE 0 END AS INT) AS relevant
FROM ranked r LEFT JOIN kmax x USING (task)
UNION ALL
SELECT t.task, ty.feature, ty.type, CAST(NULL AS DOUBLE), 0
FROM (SELECT 'classification' AS task UNION ALL SELECT 'regression') t
CROSS JOIN types ty WHERE ty.type = 'constant'
"""


# ---------------------------------------------------------------------------
# q27: embedding-cosine near-dup — the semantic dedup flavor.  The
# hyperplane family is a deterministic hash mix whose exact float64 values
# embed as literals on BOTH sides, so the full pipeline (multi-table
# sign-LSH buckets, hot-bucket cap, candidate join, the round-5
# signature-hamming pre-filter, cosine verify) replays in DuckDB.  The
# hamming cutoff is an integer computed ONCE in Python
# (signature_hamming_cutoff) and embedded as a literal in both engines.
# ---------------------------------------------------------------------------

_EMB_DIM = 64
_EMB_PLANES = 3
_EMB_TABLES = 8
_EMB_CAP = 64
_EMB_THRESHOLD = 0.35
_EMB_SIG_BITS = 126  # 2 × 63-bit words — bit 63 never set on either engine


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.dedup import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_duplicates(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        dim=_EMB_DIM,
        threshold=_EMB_THRESHOLD,
        num_planes=_EMB_PLANES,
        num_tables=_EMB_TABLES,
        max_bucket_size=_EMB_CAP,
        signature_bits=_EMB_SIG_BITS,
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("cosine").cast("double"),
    )


def _embedding_neardup_oracle_sql() -> str:
    from tsfresh_spark.operators.dedup import (
        _SIG_BITS_PER_WORD,
        _SIG_PLANE_BASE,
        signature_hamming_cutoff,
    )
    from tsfresh_spark.operators.similarity import _hyperplane

    tables = []
    for t in range(_EMB_TABLES):
        bits = " + ".join(
            f"(CASE WHEN LIST_DOT_PRODUCT(emb, "
            f"{_hyperplane(_EMB_DIM, t * _EMB_PLANES + p)!r}::DOUBLE[]) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(_EMB_PLANES)
        )
        tables.append(f"SELECT id, {t} AS tbl, {bits} AS bkt FROM e")
    keys_sql = "\nUNION ALL ".join(tables)
    # signature words: same 63-bit packing as _signature_words, dedicated
    # plane family at _SIG_PLANE_BASE
    word_exprs = []
    for wi, w in enumerate(range(0, _EMB_SIG_BITS, _SIG_BITS_PER_WORD)):
        bits = " + ".join(
            f"(CASE WHEN LIST_DOT_PRODUCT(emb, "
            f"{_hyperplane(_EMB_DIM, _SIG_PLANE_BASE + p)!r}::DOUBLE[]) > 0 "
            f"THEN {1 << (p - w)} ELSE 0 END)"
            for p in range(w, min(w + _SIG_BITS_PER_WORD, _EMB_SIG_BITS))
        )
        word_exprs.append(f"({bits})::BIGINT AS s{wi}")
    n_words = len(word_exprs)
    hamming = " + ".join(
        f"bit_count(xor(sa.s{i}, sb.s{i}))" for i in range(n_words)
    )
    h_max = signature_hamming_cutoff(_EMB_THRESHOLD, _EMB_SIG_BITS, 5.0)
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb FROM embeddings),
sigs AS (SELECT id, {', '.join(word_exprs)} FROM e),
keys AS (
{keys_sql}
),
capped AS (
  SELECT id, tbl, bkt FROM (
    SELECT id, tbl, bkt,
           ROW_NUMBER() OVER (PARTITION BY tbl, bkt ORDER BY id) AS rn
    FROM keys
  ) WHERE rn <= {_EMB_CAP}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM capped a JOIN capped b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id < b.id
),
surv AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sigs sa ON sa.id = c.id_a JOIN sigs sb ON sb.id = c.id_b
  WHERE {hamming} <= {h_max}
),
pairs AS (
  SELECT c.id_a, c.id_b,
         ROUND(LIST_DOT_PRODUCT(ea.emb, eb.emb)
               / (SQRT(LIST_DOT_PRODUCT(ea.emb, ea.emb))
                  * SQRT(LIST_DOT_PRODUCT(eb.emb, eb.emb))), 6) AS cosine
  FROM surv c JOIN e ea ON ea.id = c.id_a JOIN e eb ON eb.id = c.id_b
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {_EMB_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# q24-q25: near-duplicate pipelines.  The "portable" hash family replicates
# verbatim in DuckDB SQL, so both pipelines are compared bit-for-bit
# including the LSH banding and hot-bucket caps.
# ---------------------------------------------------------------------------

_MINHASH_CAP = 64  # hot-bucket guard for the minhash band join
_SIMHASH_CAP = 256  # hot-chunk guard for the simhash join
_MINHASH_THRESHOLD = 0.5
_SIMHASH_MAX_HAMMING = 10


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = minhash_near_duplicates(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_n=3,
        threshold=_MINHASH_THRESHOLD,
        max_bucket_size=_MINHASH_CAP,
        hash_family="portable",
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("jaccard").cast("double"),
    )


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from tsfresh_spark.operators.dedup import simhash_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = simhash_near_duplicates(
        docs,
        text_col="text",
        id_col="doc_id",
        max_hamming=_SIMHASH_MAX_HAMMING,
        max_bucket_size=_SIMHASH_CAP,
        hash_family="portable",
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("long"),
    )


def _minhash_oracle_sql() -> str:
    """DuckDB replica of the portable minhash-LSH pipeline (same constants,
    same banding, same cap, same exact-Jaccard verify)."""
    import sys

    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    from tsfresh_spark.operators.dedup import minhash_coefficients

    A, B = minhash_coefficients(64)
    a_sql = "[" + ",".join(str(v) for v in A) + "]"
    b_sql = "[" + ",".join(str(v) for v in B) + "]"
    bucket = "concat_ws(',', sg[4*i-3], sg[4*i-2], sg[4*i-1], sg[4*i])"
    return f"""
WITH consts AS (SELECT {a_sql} AS ca, {b_sql} AS cb),
w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) AS shingles
  FROM w
),
bs AS (
  SELECT doc_id, shingles,
    [CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 for s in shingles] AS bases
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id,
    [list_min([(ca[i] * b + cb[i]) % 2147483647 for b in bases]) for i in range(1, 65)] AS sg
  FROM bs, consts
),
bands AS (
  SELECT doc_id, i - 1 AS band, {bucket} AS bucket
  FROM sig, (SELECT unnest(range(1, 17)) AS i)
),
keep AS (
  SELECT band, bucket FROM bands GROUP BY band, bucket
  HAVING count(*) BETWEEN 2 AND {_MINHASH_CAP}
),
kept AS (SELECT b.* FROM bands b JOIN keep USING (band, bucket)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM kept l JOIN kept r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b,
  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
FROM cand c
JOIN sh a ON c.id_a = a.doc_id
JOIN sh b ON c.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
    >= {_MINHASH_THRESHOLD}
"""


_ORACLE_SIMHASH = f"""
WITH w AS (
  SELECT doc_id,
    list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS ws
  FROM documents
),
b AS (
  SELECT doc_id,
    [CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) for x in ws] AS hs
  FROM w WHERE len(ws) > 0
),
fp AS (
  SELECT doc_id, CAST(list_sum([
      CASE WHEN list_sum([CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END for h in hs]) > 0
           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
    for j in range(0, 60)]) AS BIGINT) AS simhash
  FROM b
),
chunks AS (
  SELECT doc_id, simhash, i AS chunk_idx, (simhash >> (15*i)) & 32767 AS chunk
  FROM fp, (SELECT unnest(range(0, 4)) AS i)
),
keep AS (
  SELECT chunk_idx, chunk FROM chunks GROUP BY chunk_idx, chunk
  HAVING count(*) BETWEEN 2 AND {_SIMHASH_CAP}
),
kept AS (SELECT c.* FROM chunks c JOIN keep USING (chunk_idx, chunk)),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
  FROM kept l JOIN kept r
    ON l.chunk_idx = r.chunk_idx AND l.chunk = r.chunk AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {_SIMHASH_MAX_HAMMING}
"""


_NGRAM_MAX_DF = 64  # inverted-index hot-shingle guard


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone EXACT n-gram Jaccard dedup (inverted index + df pruning) —
    the non-hashed flavor, distinct from the minhash approximation."""
    _prep(spark)
    from tsfresh_spark.operators.dedup import ngram_jaccard_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard_duplicates(
        docs,
        text_col="text",
        id_col="doc_id",
        shingle_n=3,
        threshold=_MINHASH_THRESHOLD,
        max_df=_NGRAM_MAX_DF,
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("jaccard").cast("double"),
    )


# DuckDB replica of the full inverted-index pipeline: same shingling, same
# df-pruning window, same length-ratio prune, same integer-arithmetic
# Jaccard — bit-exact (division of two exact ints is one IEEE op).
_ORACLE_NGRAM_JACCARD = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) AS shingles
  FROM w
),
sh2 AS (
  SELECT doc_id, shingles, len(shingles) AS sz FROM sh WHERE len(shingles) > 0
),
inv AS (SELECT doc_id, sz, unnest(shingles) AS shingle FROM sh2),
keepsh AS (
  SELECT shingle FROM inv GROUP BY shingle
  HAVING count(*) BETWEEN 2 AND {_NGRAM_MAX_DF}
),
kept AS (SELECT i.* FROM inv i JOIN keepsh USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND least(a.sz, b.sz) >= {_MINHASH_THRESHOLD} * greatest(a.sz, b.sz)
)
SELECT c.id_a, c.id_b,
  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
FROM cand c
JOIN sh2 a ON c.id_a = a.doc_id
JOIN sh2 b ON c.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
    >= {_MINHASH_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# streaming plane under the driver gate (VERDICT r4 next-round #7): the
# events table replayed as a bounded file-source stream through
# windowed_feature_stream, parquet sink, one availableNow trigger — then the
# sink read back as a batch frame for the DuckDB comparison.  Append-mode
# event-time semantics pin which windows exist: a window emits iff the final
# watermark (max event ts, 0s delay) has passed its END, so the oracle keeps
# exactly the windows with window_start + 1h <= max(ts).  Features are the
# order-insensitive exact-integer kernel set, so collect_list order inside a
# window cannot matter and the match is bit-exact.
# ---------------------------------------------------------------------------


def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    _prep(spark)
    from tsfresh_spark.streaming.stream_extract import windowed_feature_stream

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source needs a DIRECTORY basePath; the testdata table
    # is a single read-only file, so stage a symlink dir (no data copy)
    src_dir = tempfile.mkdtemp(prefix="tsf_stream_src_")
    import atexit
    import os as _os
    import shutil as _shutil

    atexit.register(_shutil.rmtree, src_dir, ignore_errors=True)
    _os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(src_dir)
        .select(
            "user_id",
            "event_type",
            # the table stores TIMESTAMP_NTZ; watermarks require TIMESTAMP —
            # with the session pinned to UTC (see _prep) the cast is exact
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100)
            .cast("bigint")
            .cast("double")
            .alias("value"),
        )
    )
    feats = windowed_feature_stream(
        stream,
        {name: None for name in _EXACT_KERNELS},
        id_cols=["user_id", "event_type"],
        window="1 hour",
        watermark="0 seconds",
    )
    long_form = feats.select(
        "user_id",
        "event_type",
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.explode("features").alias("variable", "value"),
    )
    sink = tempfile.mkdtemp(prefix="tsf_stream_gate_")
    # the sink must outlive this function (the returned frame is read
    # lazily by the caller) — clean it up at interpreter exit instead
    atexit.register(_shutil.rmtree, sink, ignore_errors=True)
    q = (
        long_form.writeStream.format("parquet")
        .option("path", f"{sink}/data")
        .option("checkpointLocation", f"{sink}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # a silent timeout would hand the caller a partially-written sink and a
    # confusing diff — fail loudly instead (ADVICE r5 #1)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "bounded streaming replay did not finish within 300 s"
        )
    return spark.read.parquet(f"{sink}/data")


_ORACLE_STREAM_WINDOWED = f"""
WITH base AS ({_BASE_SQL}),
mx AS (SELECT MAX(ts) AS mt FROM base),
g AS (
  SELECT user_id, event_type, DATE_TRUNC('hour', ts) AS window_start,
         COUNT(*) AS n, SUM(v) AS s, SUM(v*v) AS ss,
         MIN(v) AS mn, MAX(v) AS mx2, MEDIAN(v) AS med
  FROM base GROUP BY user_id, event_type, DATE_TRUNC('hour', ts)
),
closed AS (
  SELECT g.* FROM g, mx WHERE g.window_start + INTERVAL 1 HOUR <= mx.mt
)
SELECT user_id, event_type, window_start, event_type || '__length' AS variable, CAST(n AS DOUBLE) AS value FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__sum_values', CAST(s AS DOUBLE) FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__minimum', CAST(mn AS DOUBLE) FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__maximum', CAST(mx2 AS DOUBLE) FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__absolute_maximum', GREATEST(ABS(CAST(mn AS DOUBLE)), ABS(CAST(mx2 AS DOUBLE))) FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__mean', CAST(s AS DOUBLE) / n FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__median', med FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__abs_energy', CAST(ss AS DOUBLE) FROM closed
UNION ALL SELECT user_id, event_type, window_start, event_type || '__root_mean_square', SQRT(CAST(ss AS DOUBLE) / n) FROM closed
"""


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
        "extract_long_grouped": q_extract_long_grouped,
        "extract_hybrid": q_extract_hybrid,
        "stats_sql_fastpath": q_stats_sql,
        "array_features_ordered": q_array_features,
        "longest_strike": q_longest_strike,
        "quantiles": q_quantiles,
        "window_rollup_1h": q_window_rollup,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "embedding_cosine_topk": q_embedding_topk,
        "gapfill_ffill_1m": q_gapfill_ffill,
        "gapfill_linear_1h": q_gapfill_linear,
        "rolling_windows": q_rolling_windows,
        "rollup_tier_1h": q_rollup_1h,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "tfidf_top_terms": q_tfidf_top_terms,
        "number_peaks": q_number_peaks,
        "reoccurring_stats": q_reoccurring,
        "c3_time_reversal": q_lag_products,
        "energy_ratio_chunks": q_energy_ratio,
        "fft_coefficients": q_fft_plane,
        "welch_density": q_welch_density,
        "cwt_coefficients": q_cwt_coefficients,
        "pacf": q_pacf,
        "entropy_chebyshev": q_entropy_cheb,
        "entropy_symbolic": q_entropy_symbolic,
        "lempel_ziv": q_lempel_ziv,
        "friedrich_coefficients": q_friedrich,
        "max_langevin": q_max_langevin,
        "adf_autolag": q_adf,
        "cwt_peaks": q_cwt_peaks,
        "ar_coefficient_k1": q_ar_k1,
        "stats_sweep": q_stats_sweep,
        "trend_sweep": q_trend_sweep,
        "query_similarity": q_query_similarity,
        "matrix_profile_grid": q_matrix_profile,
        "asof_join": q_asof_join,
        "distribution_checks": q_distribution_checks,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "ngram_jaccard_dups": q_ngram_jaccard_dups,
        "timewise_trend_hourly": q_timewise_trend,
        "fresh_relevance": q_fresh_relevance,
        "embedding_near_dups": q_embedding_near_dups,
        "stream_windowed_features": q_stream_windowed,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_kernels_exact": _ORACLE_EXTRACT_KERNELS,
        "extract_long_grouped": _ORACLE_EXTRACT_KERNELS,
        "extract_hybrid": _ORACLE_EXTRACT_KERNELS,
        "stats_sql_fastpath": _ORACLE_STATS_SQL,
        "array_features_ordered": _ORACLE_ARRAY_FEATURES,
        "longest_strike": _ORACLE_LONGEST_STRIKE,
        "quantiles": _ORACLE_QUANTILES,
        "window_rollup_1h": _ORACLE_WINDOW_ROLLUP,
        "dedup_exact": _ORACLE_DEDUP_EXACT,
        "text_stats": _ORACLE_TEXT_STATS,
        "embedding_cosine_topk": _ORACLE_EMBEDDING_TOPK,
        "gapfill_ffill_1m": _ORACLE_GAPFILL_FFILL,
        "gapfill_linear_1h": _ORACLE_GAPFILL_LINEAR,
        "rolling_windows": _ORACLE_ROLLING_WINDOWS,
        "rollup_tier_1h": _ORACLE_ROLLUP_1H,
        "language_id": _ORACLE_LANGUAGE_ID,
        "quality_score": _ORACLE_QUALITY_SCORE,
        "token_count": _ORACLE_TOKEN_COUNT,
        "tfidf_top_terms": _ORACLE_TFIDF,
        "number_peaks": _ORACLE_NUMBER_PEAKS,
        "reoccurring_stats": _ORACLE_REOCCURRING,
        "c3_time_reversal": _ORACLE_LAG_PRODUCTS,
        "energy_ratio_chunks": _ORACLE_ENERGY_RATIO,
        "fft_coefficients": _ORACLE_FFT_PLANE,
        "welch_density": _ORACLE_WELCH,
        "cwt_coefficients": _ORACLE_CWT,
        "pacf": _pacf_oracle_sql(),
        "entropy_chebyshev": _ORACLE_ENTROPY_CHEB,
        "entropy_symbolic": _ORACLE_ENTROPY_SYMBOLIC,
        "lempel_ziv": _ORACLE_LEMPEL_ZIV,
        "friedrich_coefficients": _friedrich_oracle_sql(),
        "max_langevin": _max_langevin_oracle_sql(),
        "adf_autolag": _adf_oracle_sql(),
        "cwt_peaks": _cwt_peaks_oracle_sql(),
        "ar_coefficient_k1": _ORACLE_AR_K1,
        "stats_sweep": _ORACLE_STATS_SWEEP,
        "trend_sweep": _ORACLE_TREND_SWEEP,
        "query_similarity": _qsc_oracle_sql(),
        "matrix_profile_grid": _ORACLE_MATRIX_PROFILE,
        "asof_join": _ORACLE_ASOF_JOIN,
        "distribution_checks": _ORACLE_DISTRIBUTION_CHECKS,
        "minhash_near_dups": _minhash_oracle_sql(),
        "simhash_near_dups": _ORACLE_SIMHASH,
        "ngram_jaccard_dups": _ORACLE_NGRAM_JACCARD,
        "timewise_trend_hourly": _ORACLE_TIMEWISE_TREND,
        "fresh_relevance": _ORACLE_FRESH_RELEVANCE,
        "embedding_near_dups": _embedding_neardup_oracle_sql(),
        "stream_windowed_features": _ORACLE_STREAM_WINDOWED,
    }
