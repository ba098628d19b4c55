#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the same rollup/extraction
job at two parallelism levels (local[8] vs local[32] — the sandbox proxy for
N vs 4N executors), reporting tokens/sec at both and the scaling efficiency
throughput(4N) / (4 × throughput(N)).

Run:  python scripts/bench_scaling.py            # both levels + summary
      python scripts/bench_scaling.py --cpus 8   # one measurement (child)

Each measurement runs in its own process (fresh JVM).  Results append to
BENCH_SCALING.json and are summarized in BASELINE.md's measured section.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "2000"))


def measure(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from tsfresh_spark.extract import extract_features_tokens
    from tsfresh_spark.session import build_session
    from tsfresh_spark.settings import efficient_settings
    from tsfresh_spark.sources.synthetic import tokens_corpus

    spark = build_session(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 8 partitions per core: bounds the straggler tail of the last wave
    toks = tokens_corpus(spark, N_DOCS, n_partitions=cpus * 8).cache()
    total_tokens = toks.select(F.sum("n_tok")).collect()[0][0]
    # warm the cache AND the python UDF workers (fork + imports) so the
    # measurement is steady-state extraction throughput, not process spawn
    toks.count()
    warm = tokens_corpus(spark, cpus * 8, n_partitions=cpus * 8)
    extract_features_tokens(warm, {"mean": None}, output="map").count()
    t0 = time.perf_counter()
    out = extract_features_tokens(toks, efficient_settings(), output="map")
    n_rows = out.select(
        F.expr("bit_xor(xxhash64(doc_id, source, map_keys(features)))")
    ).collect()[0][0]
    dt = time.perf_counter() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": N_DOCS,
        "total_tokens": int(total_tokens),
        "seconds": round(dt, 2),
        "tokens_per_sec": round(total_tokens / dt, 1),
        "checksum": n_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    if args.cpus:
        print(json.dumps(measure(args.cpus)))
        return

    results = []
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line)
    r8, r32 = results
    efficiency = r32["tokens_per_sec"] / (4 * r8["tokens_per_sec"])
    summary = {
        "metric": "rollup throughput scaling, local[8] vs local[32]",
        "n_docs": N_DOCS,
        "total_tokens": r8["total_tokens"],
        "throughput_8": r8["tokens_per_sec"],
        "throughput_32": r32["tokens_per_sec"],
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "identical_output_checksum": r8["checksum"] == r32["checksum"],
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
