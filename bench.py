#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "tokens_per_sec": ...}

Every query is materialized through a full-column checksum sink
(sum of xxhash64 over all columns) so Catalyst cannot prune the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


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
    from tsfresh_spark.settings import efficient_settings

    # untimed warmup: spawn the python workers and read the parquet footers
    # once, so the first timed query isn't charged session fixed costs
    from tsfresh_spark.settings import minimal_settings

    warm = em._events_tokens_longid(spark, sf_dir).limit(64)
    materialize(
        extract_features_tokens(
            warm, minimal_settings(), id_col="user_id", kind_col="event_type"
        )
    )

    timings: dict[str, float] = {}
    for name, fn in em.queries().items():
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators may persist() internal frames (dedup staging); drop them
        # so later workloads measure on a clean executor-storage slate
        spark.catalog.clearCache()

    def best_of(n: int, fn):
        """min over n runs — this host swings ±2x run-to-run (frequency/
        cache sharing), so the min is the stable engine-speed signal"""
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # events-derived tokens (short series — per-series overhead regime)
    toks = em._events_tokens_longid(spark, sf_dir).cache()
    ev_tokens = toks.select(F.sum(F.size("tokens"))).collect()[0][0]
    dt = best_of(2, lambda: materialize(
        extract_features_tokens(
            toks, efficient_settings(), id_col="user_id", kind_col="event_type"
        )
    ))
    timings["extract_efficient_kernels"] = round(dt, 3)
    events_tokens_per_sec = round(ev_tokens / dt, 1)

    # the flagship rollup workload: the north-star corpus shape
    # (doc_id, tokens[16..2048], n_tok, source), efficient kernel family —
    # tokens/sec here is the headline metric
    from tsfresh_spark.sources.synthetic import tokens_corpus

    n_docs = int(2000 * max(sf / 0.01, 1.0)) if sf > 0 else 2000
    corpus = tokens_corpus(spark, n_docs, n_partitions=cpus * 8).cache()
    total_tokens = corpus.select(F.sum("n_tok")).collect()[0][0]
    dt = best_of(2, lambda: materialize(
        extract_features_tokens(corpus, efficient_settings(), output="map")
    ))
    timings["extract_corpus_efficient"] = round(dt, 3)
    tokens_per_sec = round(total_tokens / dt, 1)

    # the full ComprehensiveFCParameters family (788 features/kind incl. the
    # O(n²) entropies) on a fixed 1500-doc slice — per-round evidence that
    # the complete calculator family runs, with its own tokens/sec
    from tsfresh_spark.settings import comprehensive_settings

    comp = tokens_corpus(spark, 1500, n_partitions=cpus * 8).cache()
    comp_tokens = comp.select(F.sum("n_tok")).collect()[0][0]
    dt = best_of(2, lambda: materialize(
        extract_features_tokens(comp, comprehensive_settings(), output="map")
    ))
    timings["extract_comprehensive_1500docs"] = round(dt, 3)
    comprehensive_tokens_per_sec = round(comp_tokens / dt, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tokens_per_sec": tokens_per_sec,
                "total_tokens": int(total_tokens),
                "events_tokens_per_sec": events_tokens_per_sec,
                "comprehensive_tokens_per_sec": comprehensive_tokens_per_sec,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
