"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters reach
the parquet scan, dimensions broadcast instead of shuffling facts,
top-k is limited before the exchange, and bucketed joins don't shuffle
at all.  A query that silently regresses to a full-width scan or an
extra Exchange fails CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of every file scan in the plan — what actually gets
    deserialized from parquet (column pruning evidence)."""
    return [
        line.split("ReadSchema:")[1].strip().rstrip(",")
        for line in executed_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every scan (predicate pushdown evidence)."""
    out = []
    for line in executed_plan(df).splitlines():
        if "PushedFilters:" in line:
            out.append(line.split("PushedFilters:")[1].split("]", 1)[0].strip() + "]")
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters of every scan — partition-PRUNING evidence (a
    filter on a partitionBy column skips whole directories before any
    byte is read; distinct from PushedFilters, which prune row groups
    inside the files that survive)."""
    out = []
    for line in executed_plan(df).splitlines():
        if "PartitionFilters:" in line:
            out.append(
                line.split("PartitionFilters:")[1].split("]", 1)[0].strip() + "]"
            )
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges — the quantity to minimize at scale."""
    plan = executed_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reused" not in line.lower()
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def analyzed_plan(df: DataFrame) -> str:
    """The analyzed LOGICAL plan — works on streaming DataFrames too
    (no physical planning required), which is what makes it the right
    surface for asserting broadcast-HINT hygiene on readStream plans."""
    return df._jdf.queryExecution().analyzed().toString()


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit ``F.broadcast``/hint("broadcast") nodes in the
    logical plan.  Zero means no join ships a relation through the
    DRIVER by fiat — the contract for joins whose small side grows with
    corpus size or dup density (a forced broadcast passes every
    small-SF test and OOMs the driver at 100 TB; see the
    containment-pairs lesson, operators/dedup.py).  SHUFFLE_HASH hints
    are deliberately NOT counted: they pick an executor-side strategy
    (per-partition build, no driver transit, no sort) and are
    scale-safe on density-scaled relations."""
    plan = analyzed_plan(df)
    n = plan.count("ResolvedHint (strategy=broadcast)")
    for name in ("BROADCAST", "BROADCASTJOIN", "MAPJOIN"):
        n += plan.count(f"UnresolvedHint {name}")
    return n


def final_executed_plan(df: DataFrame) -> str:
    """Execute the frame (bounded-output frames only!) and return the
    FINAL adaptive plan — after AQE's runtime re-optimization, which is
    where an unhinted join over a genuinely-small relation shows up as
    BroadcastHashJoin even though the static plan says sort-merge."""
    df.collect()
    return executed_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (partial+final hash agg)."""
    plan = executed_plan(df)
    return "partial_" in plan or "Partial" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages (rendered as ``*(n)`` in the
    executed plan, or as WholeStageCodegen nodes in formatted mode)."""
    plan = executed_plan(df)
    stages = {
        line.split("*(")[1].split(")")[0]
        for line in plan.splitlines()
        if "*(" in line
    }
    return len(stages) or plan.count("WholeStageCodegen")
