#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN — this file carries the
extra measurements the optimization round needs; cite numbers in
OPTIMIZATION_r06.md).

Modes:
  python bench_extra.py time  [passes] [query ...]   — interleaved per-query
      timings using bench.py's own checksum materialization (min + all runs)
  python bench_extra.py plan  <outdir> [query ...]   — dump
      .explain("formatted") per query to <outdir>/<query>.txt
  python bench_extra.py noop  [passes] [query ...]   — same timing but with
      the guide §1.4 noop sink instead of the checksum collect

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from tsfresh_spark.session import build_session

    spark = build_session(
        "tsfresh_spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from bench import materialize

    qfns = em.queries()

    if mode == "plan":
        outdir = sys.argv[2]
        names = sys.argv[3:] or list(qfns)
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qfns[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            print(f"wrote {name} ({plan.count('Exchange')} Exchange refs)")
        spark.stop()
        return

    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or list(qfns)

    def sink(df):
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            materialize(df)

    # untimed warmup on the first query (python workers + parquet footers)
    sink(qfns[names[0]](spark, sf_dir).limit(32))
    spark.catalog.clearCache()

    history: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            sink(qfns[name](spark, sf_dir))
            history[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "mode": mode,
        "queries_min": {n: min(r) for n, r in history.items()},
        "history": history,
        "total_min": round(sum(min(r) for r in history.values()), 3),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
