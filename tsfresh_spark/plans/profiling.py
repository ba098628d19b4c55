"""Stage-level job profiling from Spark's application status store.

The reference ships a function-level profiler for its python workers
(utilities/profiling.py:1-60 — cProfile start/end around extraction); on
Spark the equivalent observability unit is the *stage*: executor CPU time,
shuffle bytes, spill, and input/output volume tell you whether a pipeline
is compute-bound, shuffle-bound, or spilling — exactly the signals the
100-TB tuning loop needs (partition sizing, salting decisions, AQE
verification).

:class:`StageProfiler` snapshots the status store around a code section and
reports only the stages that ran inside it.  It reads the same data the
Spark UI renders, so it works with ``spark.ui.enabled=false`` (this sandbox)
and on any cluster without extra listeners.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from pyspark.sql import SparkSession


@dataclass
class StageMetrics:
    stage_id: int
    name: str
    status: str
    num_tasks: int
    executor_run_time_ms: int
    executor_cpu_time_ms: int
    input_bytes: int
    output_bytes: int
    shuffle_read_bytes: int
    shuffle_write_bytes: int
    memory_spilled_bytes: int
    disk_spilled_bytes: int

    def as_dict(self) -> dict:
        return asdict(self)


def _stage_list(spark: SparkSession):
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in range(2, 6)]
    return store.stageList(empty, *defaults)


def snapshot_stages(spark: SparkSession) -> list[StageMetrics]:
    """All stages currently known to the app status store."""
    out = []
    sl = _stage_list(spark)
    for i in range(sl.size()):
        s = sl.apply(i)
        out.append(
            StageMetrics(
                stage_id=int(s.stageId()),
                name=str(s.name()),
                status=str(s.status().toString()),
                num_tasks=int(s.numTasks()),
                executor_run_time_ms=int(s.executorRunTime()),
                executor_cpu_time_ms=int(s.executorCpuTime()) // 1_000_000,
                input_bytes=int(s.inputBytes()),
                output_bytes=int(s.outputBytes()),
                shuffle_read_bytes=int(s.shuffleReadBytes()),
                shuffle_write_bytes=int(s.shuffleWriteBytes()),
                memory_spilled_bytes=int(s.memoryBytesSpilled()),
                disk_spilled_bytes=int(s.diskBytesSpilled()),
            )
        )
    return out


class StageProfiler:
    """``with StageProfiler(spark) as prof: <run jobs>`` → ``prof.stages``
    holds the stages executed inside the block, ``prof.summary()`` the
    aggregate totals."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.stages: list[StageMetrics] = []
        self._before: set[int] = set()

    def __enter__(self) -> "StageProfiler":
        self._before = {m.stage_id for m in snapshot_stages(self.spark)}
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.stages = [
            m
            for m in snapshot_stages(self.spark)
            if m.stage_id not in self._before
        ]

    def summary(self) -> dict:
        keys = (
            "executor_run_time_ms",
            "executor_cpu_time_ms",
            "input_bytes",
            "output_bytes",
            "shuffle_read_bytes",
            "shuffle_write_bytes",
            "memory_spilled_bytes",
            "disk_spilled_bytes",
        )
        agg = {k: sum(getattr(m, k) for m in self.stages) for k in keys}
        agg["num_stages"] = len(self.stages)
        agg["num_tasks"] = sum(m.num_tasks for m in self.stages)
        return agg

    def report(self) -> list[dict]:
        return [m.as_dict() for m in self.stages]
