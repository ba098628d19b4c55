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
    sink = df.select(
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + ")) as checksum"
        )
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

    timings: dict[str, float] = {}
    for name, fn in em.queries().items():
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # the flagship rollup workload: full efficient kernel family over the
    # derived tokens table — reported as tokens/sec (the north-star metric)
    toks = em._events_tokens_longid(spark, sf_dir).cache()
    total_tokens = toks.select(F.sum(F.size("tokens"))).collect()[0][0]
    t0 = time.perf_counter()
    materialize(
        extract_features_tokens(
            toks, efficient_settings(), id_col="user_id", kind_col="event_type"
        )
    )
    dt = time.perf_counter() - t0
    timings["extract_efficient_kernels"] = round(dt, 3)
    tokens_per_sec = round(total_tokens / dt, 1)

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
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
