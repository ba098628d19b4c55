"""Streaming dedup == batch dedup on a bounded replay: the watermarked
exact dedup keeps one row per digest, the stateful marker agrees with the
batch operator's duplicate counts, and the banded SimHash pair stream
reproduces the batch near-dup pair set exactly."""

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)

TEXTS = [
    ("d00", "the quick brown fox jumps over the lazy dog again and again"),
    ("d01", "pack my box with five dozen liquor jugs for the long winter"),
    ("d02", "the quick brown fox jumps over the lazy dog again and again"),
    ("d03", "sphinx of black quartz judge my vow said the old archivist"),
    ("d04", "pack my box with five dozen liquor jugs for the long winter"),
    ("d05", "the quick brown fox jumps over the lazy dog again and once"),
    ("d06", "completely unrelated text about spark structured streaming"),
    ("d07", "the quick brown fox jumps over the lazy dog again and again"),
]


@pytest.fixture(scope="module")
def doc_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_stream_src"))
    rows = [
        (doc, text, T0 + dt.timedelta(seconds=i * 60))
        for i, (doc, text) in enumerate(TEXTS)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    spark.createDataFrame(pdf).repartition(2).write.mode("overwrite").parquet(
        path
    )
    return path


def _run(spark, stream_df, name, mode, expect_rows, timeout=120):
    """Start, wait for ≥ expect_rows in the memory sink plus a 3s stable
    tail, then stop.  A stateful query with ProcessingTimeTimeout neither
    self-terminates under availableNow nor drains for
    processAllAvailable() (it stays up to service state timeouts), so
    termination has to be driven from outside."""
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + timeout
    stable, prev = 0, -1
    while time.time() < deadline:
        try:
            n = spark.sql(f"select count(*) from {name}").collect()[0][0]
        except Exception:
            n = -1
        stable = stable + 1 if (n == prev and n >= expect_rows) else 0
        prev = n
        if stable >= 3:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)


def test_streaming_exact_dedup_keeps_one_per_digest(spark, doc_files):
    from tsfresh_spark.streaming.stream_dedup import streaming_exact_dedup

    schema = "doc_id string, text string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(doc_files)
    out = streaming_exact_dedup(stream, watermark="10 minutes")
    _run(spark, out, "exact_dedup_stream", "append", expect_rows=5)
    got = spark.sql("select * from exact_dedup_stream").toPandas()
    n_distinct = len({t for _, t in TEXTS})
    assert len(got) == n_distinct
    assert got["text_hash"].nunique() == n_distinct


def test_streaming_duplicate_marks_match_batch(spark, doc_files):
    from tsfresh_spark.operators.dedup import exact_duplicates
    from tsfresh_spark.streaming.stream_dedup import streaming_duplicate_marks

    schema = "doc_id string, text string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(doc_files)
    out = streaming_duplicate_marks(stream)
    _run(spark, out, "dup_marks_stream", "update", expect_rows=len(TEXTS))
    got = spark.sql("select * from dup_marks_stream").toPandas()

    batch = exact_duplicates(
        spark.read.parquet(doc_files), text_col="text", id_col="doc_id"
    ).toPandas()
    assert len(got) == len(TEXTS)
    # same total duplicate mass and same per-digest group sizes; the
    # canonical row may differ (first ARRIVAL vs min-id) by design
    assert got["is_duplicate"].sum() == batch["is_duplicate"].sum()
    assert (
        got.groupby("text_hash").size().sort_index()
        == batch.groupby("text_hash").size().sort_index()
    ).all()


def test_streaming_simhash_pairs_equal_batch(spark, doc_files):
    from tsfresh_spark.operators.dedup import simhash_near_duplicates
    from tsfresh_spark.streaming.stream_dedup import streaming_simhash_pairs

    schema = "doc_id string, text string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(doc_files)
    out = streaming_simhash_pairs(stream, max_hamming=3)
    _run(spark, out, "simhash_pair_stream", "update", expect_rows=4)
    got = spark.sql("select * from simhash_pair_stream").toPandas()

    batch = simhash_near_duplicates(
        spark.read.parquet(doc_files),
        text_col="text",
        id_col="doc_id",
        max_hamming=3,
        persist=False,
    ).toPandas()
    # at-least-once across shared chunks → compare distinct pair sets, and
    # every streamed hamming must equal the batch hamming for that pair
    got_pairs = {
        (a, b): h
        for a, b, h in got[["id_a", "id_b", "hamming"]].itertuples(index=False)
    }
    batch_pairs = {
        (a, b): h
        for a, b, h in batch[["id_a", "id_b", "hamming"]].itertuples(
            index=False
        )
    }
    assert got_pairs == batch_pairs
    assert len(batch_pairs) >= 4  # the fixture plants 3 exact + 1 near dup
