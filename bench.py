#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "history": {name: [sec, ...]}, ...}

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
    out["ivf_recall_at_3"] = round(len(exact & ivf) / len(exact), 4)
    out["lsh_recall_at_3"] = round(len(exact & lsh) / len(exact), 4)
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

    # the full query suite, in N_PASSES interleaved passes
    qfns = em.queries()
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

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "history": history,
                "passes": N_PASSES,
                "sf": sf,
                "tokens_per_sec": tokens_per_sec,
                "total_tokens": int(total_tokens),
                "events_tokens_per_sec": events_tokens_per_sec,
                "comprehensive_tokens_per_sec": comprehensive_tokens_per_sec,
                "ann": ann,
                "cpus": cpus,
                "method": (
                    f"min over {N_PASSES} interleaved full-suite passes "
                    "(host swings ±2x; min is the engine-speed signal, "
                    "history carries the spread)"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
