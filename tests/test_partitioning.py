"""Skew tooling: salted two-phase aggregation must equal the direct
aggregation while spreading a hot key over many tasks."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.plans.partitioning import (
    salt_column,
    salted_group_apply,
    skew_report,
    spread_by_keys,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: 'web' holds ~80% of rows
    rows = []
    for i in range(4000):
        src = "web" if i % 5 != 0 else ("code" if i % 10 else "wiki")
        rows.append((f"doc{i}", src, float(i % 97)))
    return spark.createDataFrame(rows, "doc_id string, source string, v double")


def test_skew_report(spark, skewed):
    report = skew_report(skewed, "source")
    assert report[0][0] == "web"
    assert report[0][1] > 0.7 * 4000


def test_salted_agg_equals_direct(spark, skewed):
    direct = (
        skewed.groupBy("source")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    salted, keys = salted_group_apply(skewed, ["source"], "doc_id", buckets=8)
    partial = salted.groupBy(*keys).agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    merged = (
        partial.groupBy("source")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    assert (merged.n == direct.n).all()
    assert merged.s.values == pytest.approx(direct.s.values)


def test_salt_is_deterministic_and_bounded(spark, skewed):
    a = skewed.withColumn("salt", salt_column("doc_id", 8)).toPandas()
    b = skewed.withColumn("salt", salt_column("doc_id", 8)).toPandas()
    assert (a.sort_values("doc_id").salt.values == b.sort_values("doc_id").salt.values).all()
    assert a.salt.between(0, 7).all()
    # the hot key's rows spread over all buckets
    web = a[a.source == "web"]
    assert web.salt.nunique() == 8
    counts = web.groupby("salt").size()
    assert counts.max() < 2.5 * counts.min()  # roughly balanced


def test_spread_by_keys_partitioning(spark, skewed):
    spread = spread_by_keys(skewed, "doc_id", "source", partitions=16)
    sizes = (
        spread.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    assert len(sizes) == 16
    assert sizes["count"].max() < 3 * sizes["count"].min()


def test_aqe_splits_skewed_join(spark):
    """The session's AQE config actually splits a skewed join at runtime:
    the final adaptive plan marks the join skew=true and reads the hot
    partition through a skew-aware AQEShuffleRead (north-rule requirement:
    'AQE skew-join handling')."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # thresholds scaled down so the test corpus triggers the optimizer
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(400000).select(
            F.when(F.col("id") < 380000, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(20000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 380000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot key was split, not serialized
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
