#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "tokens_per_sec": ..., "queries": {name: sec, ...}, ...}

The line is hard-capped under 1900 chars because the driver's artifact of
record keeps only the last 2000 chars of stdout — BENCH_r03/BENCH_r04 both
carry `parsed: null` from payload lines that overflowed that window.  The
full payload (per-pass history, ANN quality, near-dup scale telemetry) is
written to BENCH_HISTORY.json next to this script.

Variance control: this host swings up to ±2x run-to-run (shared
frequency/cache/membw), so every query runs in N_PASSES interleaved passes
over the whole suite (pass 1 all queries, pass 2 all queries — the
bench_scaling.py pattern, so a slow host phase hits every query equally,
not one unlucky query).  The reported per-query number is the MIN across
passes — the stable engine-speed signal — and the full per-pass history is
embedded in the JSON so any cross-round comparison can check the spread
instead of chasing single-shot noise.

Every query is materialized through a full-column checksum sink
(sum of xxhash64 over all columns) so Catalyst cannot prune the work.
ANN quality (recall@3 of the IVF and LSH paths vs the brute-force scorer
over the embeddings table) is measured alongside the timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

N_PASSES = 2


def materialize(df) -> int:
    from pyspark.sql.types import MapType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, MapType):
            cols.append(f"map_entries(`{f.name}`)")  # maps are not hashable
        else:
            cols.append(f"`{f.name}`")
    sink = df.select(
        F.expr("bit_xor(xxhash64(" + ", ".join(cols) + ")) as checksum")
    )
    row = sink.collect()[0]
    return row["checksum"] or 0


def ann_quality(spark, sf_dir: str) -> dict:
    """recall@3 of the approximate similarity paths vs the exact scorer,
    plus their wall times (single pass; the recall numbers are exact and
    deterministic, only the timing is environmental)."""
    from tsfresh_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 32)

    def pairs(df):
        return {(r.qid, r.nid) for r in df.collect()}

    # the synthetic embeddings are near-random (top-1 cosine ~0.37, no
    # cluster structure) — the WORST case for ANN, so ≥0.9 recall needs
    # generous probing: IVF scans n_probe/n_lists = 50% of cells, LSH uses
    # 16 OR-amplified tables of 3 planes.  On real clustered embeddings the
    # same recall comes far cheaper.
    out = {}
    t0 = time.perf_counter()
    exact = pairs(cosine_topk_bruteforce(emb, queries, k=3))
    out["cosine_topk_bruteforce_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ivf = pairs(cosine_topk_ivf(emb, queries, k=3, n_lists=32, n_probe=16))
    out["cosine_topk_ivf_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    lsh = pairs(
        cosine_topk_lsh(
            emb, queries, k=3, dim=dim, num_planes=3, num_tables=16
        )
    )
    out["cosine_topk_lsh_sec"] = round(time.perf_counter() - t0, 3)
    # the auto front door: below the 100k-row threshold it must route to
    # brute force, so auto ≈ brute + a bounded probe — the crossover
    # evidence VERDICT r4 #3 asked the bench to carry
    t0 = time.perf_counter()
    auto = pairs(cosine_topk(emb, queries, k=3, strategy="auto"))
    out["cosine_topk_auto_sec"] = round(time.perf_counter() - t0, 3)
    # guard: an sf dir with no vec_id < 32 yields an empty exact set —
    # emit null recalls rather than killing the run after all timings
    if exact:
        out["ivf_recall_at_3"] = round(len(exact & ivf) / len(exact), 4)
        out["lsh_recall_at_3"] = round(len(exact & lsh) / len(exact), 4)
        out["auto_recall_at_3"] = round(len(exact & auto) / len(exact), 4)
    else:
        out["ivf_recall_at_3"] = None
        out["lsh_recall_at_3"] = None
        out["auto_recall_at_3"] = None
    spark.catalog.clearCache()
    return out


def near_dup_scale(spark, sf: float) -> dict | None:
    """Subquadratic evidence for the near-dup plane: run the three banded
    pipelines once on a deterministic ≥200k-doc corpus (40× the sf0.1
    documents table) and record candidate-pair counts, capped-bucket counts
    and wall times.  The claim a 100-TB reviewer needs numbers for: the
    banded joins keep candidate pairs ≪ n(n−1)/2 while still recovering
    the injected near-duplicate population.

    Runs only at sf ≥ 0.1 (the per-round driver bench) unless
    SPARK_GRAFT_NEARDUP_DOCS overrides the doc count; set it to 0 to skip.
    """
    env = os.environ.get("SPARK_GRAFT_NEARDUP_DOCS")
    n_docs = int(env) if env is not None else (200_000 if sf >= 0.1 else 0)
    if n_docs <= 0:
        return None
    from pyspark import StorageLevel

    from tsfresh_spark.operators.dedup import (
        embedding_near_duplicates,
        jaccard_verify,
        lsh_bucket_report,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_duplicates,
        simhash_near_duplicates,
    )
    from tsfresh_spark.sources.synthetic import embeddings_corpus, text_corpus

    cpus = spark.sparkContext.defaultParallelism
    out = {
        "n_docs": n_docs,
        "possible_pairs": n_docs * (n_docs - 1) // 2,
        "max_bucket_size": 1024,
    }
    docs = text_corpus(spark, n_docs, n_partitions=cpus * 4).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    docs.count()

    # minhash+LSH: signatures once, then capped-bucket report, banded
    # candidates, and exact-Jaccard scores over the candidates only
    t0 = time.perf_counter()
    sigs = minhash_signatures(docs, text_col="text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    capped = lsh_bucket_report(sigs, max_bucket_size=1024).count()
    cands = lsh_candidate_pairs(sigs, max_bucket_size=1024)
    row = (
        jaccard_verify(docs, cands, text_col="text", threshold=0.0)
        .agg(
            F.count("*").alias("c"),
            F.count_if(F.col("jaccard") >= 0.8).alias("v"),
        )
        .collect()[0]
    )
    out["minhash"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "candidate_pairs": row["c"],
        "verified_pairs": row["v"],
        "capped_buckets": capped,
        "candidate_frac_of_n2": round(row["c"] / out["possible_pairs"], 8),
    }
    sigs.unpersist()

    # simhash: max_hamming=64 keeps every banded candidate in the output so
    # one aggregate yields candidate AND verified (≤3) counts
    t0 = time.perf_counter()
    row = (
        simhash_near_duplicates(
            docs, text_col="text", max_hamming=64, max_bucket_size=1024
        )
        .agg(
            F.count("*").alias("c"),
            F.count_if(F.col("hamming") <= 3).alias("v"),
        )
        .collect()[0]
    )
    out["simhash"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "candidate_pairs": row["c"],
        "verified_pairs": row["v"],
        "candidate_frac_of_n2": round(row["c"] / out["possible_pairs"], 8),
    }

    # exact n-gram Jaccard via inverted index: threshold 0 keeps every
    # df-pruned candidate, so one aggregate yields candidate AND verified
    # (jaccard ≥ 0.8) counts; max_df is the hot-shingle guard
    t0 = time.perf_counter()
    row = (
        ngram_jaccard_duplicates(
            docs, text_col="text", threshold=0.0, max_df=1024
        )
        .agg(
            F.count("*").alias("c"),
            F.count_if(F.col("jaccard") >= 0.8).alias("v"),
        )
        .collect()[0]
    )
    out["ngram_jaccard"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "candidate_pairs": row["c"],
        "verified_pairs": row["v"],
        "candidate_frac_of_n2": round(row["c"] / out["possible_pairs"], 8),
    }
    docs.unpersist()

    # embedding sign-LSH: one production-shaped candidate job, aggregated
    # on BOTH sides of the round-5 signature-hamming pre-filter — bucket
    # pairs (round-4's "candidates"), hamming survivors (what now reaches
    # exact cosine), and verified pairs (cosine ≥ 0.9 among survivors).
    # num_planes comes from derive_num_planes(n) — the production default.
    from tsfresh_spark.operators.dedup import (
        DEFAULT_SIGNATURE_BITS,
        derive_num_planes,
        embedding_candidate_pairs,
        signature_hamming_cutoff,
    )
    from tsfresh_spark.operators.similarity import _cosine

    emb = embeddings_corpus(spark, n_docs, dim=32, n_partitions=cpus * 4).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    emb.count()
    planes = derive_num_planes(n_docs)
    # cutoff MUST be derived for the same bit width the operator defaults
    # to — a narrower-width cutoff silently shrinks the 5σ margin
    h_max = signature_hamming_cutoff(0.9, DEFAULT_SIGNATURE_BITS)
    t0 = time.perf_counter()
    surv = F.col("hamming") <= F.lit(h_max)
    cand = embedding_candidate_pairs(
        emb,
        dim=32,
        num_planes=planes,
        num_tables=4,
        max_bucket_size=1024,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    row = cand.agg(
        F.count("*").alias("bucket_pairs"),
        F.count_if(surv).alias("survivors"),
    ).collect()[0]
    # exact-cosine verify on the survivors only, vectors joined back by id
    # — the production shape (candidates are narrow; see dedup docstring)
    ea = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("emb_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("emb_b"),
    )
    verified = (
        cand.filter(surv)
        .select("id_a", "id_b")
        .join(ea, "id_a")
        .join(eb, "id_b")
        .filter(_cosine(F.col("emb_a"), F.col("emb_b")) >= 0.9)
        .count()
    )
    out["embedding"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "num_planes": planes,
        "hamming_cutoff": h_max,
        "signature_bits": DEFAULT_SIGNATURE_BITS,
        "bucket_pairs": row["bucket_pairs"],
        "candidate_pairs": row["survivors"],
        "verified_pairs": verified,
        "candidate_frac_of_n2": round(
            row["survivors"] / out["possible_pairs"], 10
        ),
        "bucket_frac_of_n2": round(
            row["bucket_pairs"] / out["possible_pairs"], 10
        ),
    }
    cand.unpersist()
    emb.unpersist()
    spark.catalog.clearCache()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from tsfresh_spark.session import build_session

    spark = build_session(
        "tsfresh_spark-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from tsfresh_spark.extract import extract_features_tokens
    from tsfresh_spark.settings import efficient_settings, minimal_settings

    # untimed warmup: spawn the python workers and read the parquet footers
    # once, so the first timed query isn't charged session fixed costs
    warm = em._events_tokens_longid(spark, sf_dir).limit(64)
    materialize(
        extract_features_tokens(
            warm, minimal_settings(), id_col="user_id", kind_col="event_type"
        )
    )

    history: dict[str, list[float]] = {}
    timings: dict[str, float] = {}

    def repeat(name: str, n: int, fn):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        history[name] = runs
        timings[name] = min(runs)
        return min(runs)

    # The extraction workloads run FIRST, before the query-suite passes:
    # this shared host throttles progressively under sustained load
    # (measured: the same corpus workload is up to 1.6x slower after two
    # full suite passes than at session start), and tokens/sec on the
    # corpus shape is the headline metric — measure it in the
    # least-contaminated host state.

    # events-derived tokens (short series — per-series overhead regime)
    toks = em._events_tokens_longid(spark, sf_dir).cache()
    ev_tokens = toks.select(F.sum(F.size("tokens"))).collect()[0][0]
    dt = repeat("extract_efficient_kernels", 2, lambda: materialize(
        extract_features_tokens(
            toks, efficient_settings(), id_col="user_id", kind_col="event_type"
        )
    ))
    events_tokens_per_sec = round(ev_tokens / dt, 1)

    # the flagship rollup workload: the north-star corpus shape
    # (doc_id, tokens[16..2048], n_tok, source), efficient kernel family —
    # tokens/sec here is the headline metric, so it gets 3 repeats
    from tsfresh_spark.sources.synthetic import tokens_corpus

    n_docs = int(2000 * max(sf / 0.01, 1.0)) if sf > 0 else 2000
    corpus = tokens_corpus(spark, n_docs, n_partitions=cpus * 8).cache()
    total_tokens = corpus.select(F.sum("n_tok")).collect()[0][0]
    dt = repeat("extract_corpus_efficient", 3, lambda: materialize(
        extract_features_tokens(corpus, efficient_settings(), output="map")
    ))
    tokens_per_sec = round(total_tokens / dt, 1)

    # the full ComprehensiveFCParameters family (788 features/kind incl. the
    # O(n²) entropies) on a fixed 1500-doc slice — per-round evidence that
    # the complete calculator family runs, with its own tokens/sec
    from tsfresh_spark.settings import comprehensive_settings

    comp = tokens_corpus(spark, 1500, n_partitions=cpus * 8).cache()
    comp_tokens = comp.select(F.sum("n_tok")).collect()[0][0]
    dt = repeat("extract_comprehensive_1500docs", 2, lambda: materialize(
        extract_features_tokens(comp, comprehensive_settings(), output="map")
    ))
    comprehensive_tokens_per_sec = round(comp_tokens / dt, 1)
    spark.catalog.clearCache()

    # the full query suite, in N_PASSES interleaved passes.  The opt-in
    # O(n²) matrix-profile grid runs LAST within each pass: it is the
    # single hottest query (~14 s of sustained full-core STOMP) and
    # running it mid-suite heats the host for every query after it
    # (VERDICT r4 #2).
    qfns = dict(em.queries())
    for heavy in ("matrix_profile_grid",):
        if heavy in qfns:
            qfns[heavy] = qfns.pop(heavy)
    for _pass in range(N_PASSES):
        for name, fn in qfns.items():
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            history.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            # operators may persist() internal frames (dedup staging); drop
            # them so later workloads measure on a clean storage slate
            spark.catalog.clearCache()
    for name in qfns:
        timings[name] = min(history[name])

    ann = ann_quality(spark, sf_dir)

    near_dup = near_dup_scale(spark, sf)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "tokens_per_sec": tokens_per_sec,
        "ms_per_series": round(1000.0 * total_tokens / tokens_per_sec / n_docs, 3),
        "total_tokens": int(total_tokens),
        "events_tokens_per_sec": events_tokens_per_sec,
        "comprehensive_tokens_per_sec": comprehensive_tokens_per_sec,
        "queries": timings,
        "passes": N_PASSES,
        "ann": ann,
        "near_dup_scale": near_dup,
        "cpus": cpus,
        "method": (
            f"min over {N_PASSES} interleaved full-suite passes "
            "(host swings ±2x; min is the engine-speed signal, "
            "BENCH_HISTORY.json carries the spread)"
        ),
    }
    hist_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.json"
    )
    with open(hist_path, "w") as fh:
        json.dump({"history": history, **payload}, fh, indent=1)
    # The driver records only the LAST 2000 chars of stdout (BENCH_r03/r04
    # both carry `parsed: null` because the full payload line overflowed
    # that window and lost its head — the real round-4 "headline
    # regression").  stdout therefore gets exactly ONE compact JSON line,
    # hard-capped under the window, so the artifact of record always
    # parses; the full payload (ann, near-dup telemetry, method, history)
    # lives in BENCH_HISTORY.json.
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "tokens_per_sec": tokens_per_sec,
        "ms_per_series": payload["ms_per_series"],
        "events_tokens_per_sec": events_tokens_per_sec,
        "comprehensive_tokens_per_sec": comprehensive_tokens_per_sec,
        "passes": N_PASSES,
        "cpus": cpus,
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces as the suite grows
        compact["queries"] = {
            k: round(v, 1) for k, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:40]
        }
        compact["queries_truncated_see"] = "BENCH_HISTORY.json"
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
