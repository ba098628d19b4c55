"""Structured Streaming deduplication — the streaming analog of
operators/dedup.py for continuously-ingested training corpora.

The reference engine is batch-only; these operators re-express its dedup
semantics (and this engine's near-dup extensions) over unbounded streams:

* :func:`streaming_exact_dedup` — keep the first arrival of each exact
  content digest; duplicate arrivals inside the watermark are dropped.
  Pure JVM path (`dropDuplicatesWithinWatermark`), state bounded by the
  watermark — the scale-safe form of streaming `dropDuplicates`, whose
  default keeps every key forever.
* :func:`streaming_duplicate_marks` — mark instead of drop: every row is
  emitted with ``is_duplicate`` (first-seen arrival of a digest = 0).
  Stateful (`applyInPandasWithState`), one counter per digest; idle
  digests expire after ``timeout_ms``.  Streaming contract: the CANONICAL
  row is the first *arrival* (the batch operator uses min-id — on an
  ordered replay the two agree).
* :func:`streaming_simhash_pairs` — near-duplicate pair stream: the
  SimHash fingerprint is computed JVM-side (same single-pass fold as the
  batch operator), banded into 4 pigeonhole chunks, and each
  (chunk_idx, chunk) bucket keeps a bounded member list in state; a new
  arrival emits (id_a, id_b, hamming ≤ max_hamming) pairs against the
  bucket members it joins.  Pair emission is at-least-once across buckets
  (a pair sharing k chunks surfaces up to k times — run the output
  through a downstream distinct or watermark dedup if exactly-once pairs
  matter); within one bucket each pair emits once.  The
  ``max_bucket_size`` cap bounds both state and fan-out per bucket — the
  same hot-bucket guard as the batch band join.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup on the content digest, with state
    bounded by ``watermark`` (duplicates arriving later than the watermark
    interval after the original are NOT suppressed — the documented
    trade-off of watermarked dedup at unbounded scale)."""
    hashed = stream.withColumn(
        "text_hash", F.md5(F.col(text_col).cast("string"))
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def streaming_duplicate_marks(
    stream: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_ms: int = 24 * 3_600_000,
) -> DataFrame:
    """(id, text_hash, is_duplicate) stream — every input row emitted, the
    first arrival of each digest marked 0.  Update-mode sink."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream.select(
        F.col(id_col).cast("string").alias(id_col),
        F.md5(F.col(text_col).cast("string")).alias("text_hash"),
    )
    out_schema = f"{id_col} string, text_hash string, is_duplicate long"
    state_schema = "seen long"

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            for doc in pdf[id_col]:
                rows.append((doc, key[0], 1 if seen else 0))
                seen += 1
        state.update((seen,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            rows, columns=[id_col, "text_hash", "is_duplicate"]
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_simhash_pairs(
    stream: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 1024,
    timeout_ms: int = 24 * 3_600_000,
) -> DataFrame:
    """(id_a, id_b, hamming) near-duplicate pair stream via banded SimHash.

    Fingerprints and chunk keys are computed with the SAME JVM expressions
    as the batch operator (operators/dedup.simhash — one aggregate fold per
    row, no shuffle before the keyed state), so a bounded replay of a
    static corpus yields exactly the batch pair set (modulo the documented
    per-shared-chunk multiplicity).  State per (chunk_idx, chunk): up to
    ``max_bucket_size`` (id, fingerprint) members; arrivals beyond the cap
    emit pairs against the stored members but are not added (hot-bucket
    guard — boilerplate buckets cannot grow state or fan-out unboundedly).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from tsfresh_spark.operators.dedup import simhash

    chunk_bits = 16
    chunk_mask = (1 << chunk_bits) - 1
    fp = simhash(stream, text_col=text_col, id_col=id_col)
    chunks = fp.select(
        F.col(id_col).cast("string").alias(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", chunk_bits * i)
                    .bitwiseAND(F.lit(chunk_mask).cast("long"))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    out_schema = "id_a string, id_b string, hamming long"
    state_schema = "ids array<string>, fps array<long>"

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, fps = state.get
            ids, fps = list(ids), list(fps)
        else:
            ids, fps = [], []
        rows = []
        for pdf in pdfs:
            for doc, f in zip(pdf[id_col], pdf["simhash"]):
                f = int(f)
                for other_id, other_fp in zip(ids, fps):
                    if other_id == doc:
                        continue
                    h = bin((f ^ other_fp) & ((1 << 64) - 1)).count("1")
                    if h <= max_hamming:
                        a, b = sorted((doc, other_id))
                        rows.append((a, b, h))
                if len(ids) < max_bucket_size:
                    ids.append(doc)
                    fps.append(f)
        state.update((ids, fps))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    return chunks.groupBy("chunk_idx", "chunk").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
