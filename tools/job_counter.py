"""Count Spark JOBS submitted while building+running registered queries.

Usage: python tools/job_counter.py <sf_dir> <query> [<query>...]

Prints one line per query: `<name> jobs=<n> runs=<k>` for two
invocations (so persist/memo warm-up effects are visible: run 1 pays
derived-state builds, run 2 shows the steady-state job count).

Why (r13 verdict item 7): job-STRUCTURE optimizations — fewer
convergence-check jobs in connected components, concurrent verify
during the store build — are invisible in returned-frame plan dumps
(the relation behind a localCheckpoint prints as `Scan ExistingRDD`),
so the only before/after evidence used to be interleaved stopwatch
numbers.  The DAGScheduler's `nextJobId` counter (monotone, reflects
every submitted job including checkpoint materializations and
`collect`s) makes the count a first-class measurement.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def jobs_submitted(spark) -> int:
    """Total jobs submitted to this session's DAGScheduler so far.
    `nextJobId` is the scheduler's own AtomicInteger (Scala
    private[scheduler] compiles to a public accessor, so py4j reaches
    it); deltas of this counter around a block of work count the jobs
    that block submitted."""
    nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    # py4j returns the AtomicInteger's value directly as int on some
    # Spark builds, the AtomicInteger object on others
    return nid if isinstance(nid, int) else nid.get()


def count_query_jobs(spark, sf_dir: str, name: str, runs: int = 2) -> list[int]:
    """Jobs submitted per invocation of registered query ``name`` —
    build + noop-sink execution, the bench's own timed action."""
    from duckdb_extension_kafquack_spark.suite import REGISTRY

    q = REGISTRY[name]
    counts = []
    for _ in range(runs):
        before = jobs_submitted(spark)
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        counts.append(jobs_submitted(spark) - before)
    return counts


def main() -> None:
    import duckdb_extension_kafquack_spark.functions.udf  # noqa: F401
    import duckdb_extension_kafquack_spark.operators  # noqa: F401
    import duckdb_extension_kafquack_spark.streaming  # noqa: F401
    import duckdb_extension_kafquack_spark.tpch  # noqa: F401
    from duckdb_extension_kafquack_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("job-counter")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    for name in names:
        counts = count_query_jobs(spark, sf_dir, name)
        print(f"{name} jobs={counts} (run1, run2)")


if __name__ == "__main__":
    main()
