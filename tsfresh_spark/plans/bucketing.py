"""Bucketed-table plumbing: co-located joins and aggregations.

At 100 TB the dominant cost of a repeated join (features ⋈ labels,
candidates ⋈ corpus, tier ⋈ tier) is the shuffle of the big side.  Writing
both sides bucketed on the join key with the same bucket count lets Spark
prove the required hash distribution from table metadata and plan the join
with **zero Exchange** — the classic pay-the-shuffle-once pattern.  This
module wraps the write/read ceremony and is contract-tested by asserting
the physical plan of a bucketed join contains no Exchange
(tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a parquet table bucketed (and optionally sorted) on
    ``bucket_cols``.  ``path`` pins the storage location (external table);
    bucket metadata lives in the session catalog."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog, so
    plain ``spark.table`` preserves the distribution guarantee)."""
    return spark.table(table)


def bucketed_join_is_shuffle_free(
    left: DataFrame, right: DataFrame, on: list[str]
) -> bool:
    """True when the physical plan of ``left ⋈ right`` contains no shuffle
    Exchange — the observable guarantee bucketing exists to provide.
    (BroadcastExchange doesn't count: broadcasting a small side is not a
    data shuffle, and the planner may still prefer it for tiny tables.)"""
    plan = (
        left.join(right, on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return not any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
