"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one dominant customer, one viral
document) turn a single reducer into the job's critical path.  AQE's
skew-join splitting handles *joins* automatically (enabled in
session.py); for *aggregations* the standard fix is salting — spread a
hot key over N sub-keys, partially aggregate, then combine:

    phase 1: groupBy(key, salt)  — N-way parallel partials per hot key
    phase 2: groupBy(key)        — combines N tiny partials

Decomposable aggregates only (sum/count/min/max; avg = sum/count).
The transformation is semantics-preserving — proved by the oracle-
checked suite entry and the equivalence test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from ..suite import query

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    counts: bool = True,
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase salted aggregation over possibly-skewed ``keys``.

    Returns one row per key group with ``sum_<col>`` for every column in
    ``sums`` and ``n`` when ``counts``.  The salt is random-free
    (pmod of a hash of the full row via monotonically varying spark
    partition id would be non-deterministic; we hash the row's own sum
    inputs) so the result is reproducible.
    """
    sums = sums or []
    # deterministic salt: hash the value columns so identical rows spread
    salt_src = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in (sums or keys)])
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))

    phase1_aggs: list[Column] = [F.sum(c).alias(f"__s_{c}") for c in sums]
    if counts:
        phase1_aggs.append(F.count(F.lit(1)).alias("__n"))
    p1 = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)

    phase2_aggs: list[Column] = [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        phase2_aggs.append(F.sum("__n").alias("n"))
    return p1.groupBy(*keys).agg(*phase2_aggs)


@query(
    "skew_salted_agg",
    """
SELECT l_suppkey,
       ROUND(SUM(l_extendedprice), 2) AS revenue,
       SUM(l_quantity) AS qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_suppkey
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation produces byte-identical results to the direct
    groupBy (the oracle IS the direct form) — integer quantities sum
    exactly; money is rounded after the final combine."""
    li = load_tables(spark, sf_dir)["lineitem"]
    out = salted_agg(li, ["l_suppkey"], sums=["l_extendedprice", "l_quantity"])
    return out.select(
        "l_suppkey",
        F.round("sum_l_extendedprice", 2).alias("revenue"),
        F.col("sum_l_quantity").alias("qty"),
        "n",
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Manual skew join for when AQE can't see the skew (e.g. the skewed
    side is mid-plan): salt the skewed side, explode the small side
    ``salt_buckets``× so every (key, salt) partition finds its match.
    Use only when the small side really is small — the explode is a
    deliberate salt_buckets× duplication.

    The salt here derives from ``monotonically_increasing_id()``, which
    depends on the physical partitioning: a task RETRY or a different
    upstream partitioning assigns different salts.  The JOIN RESULT is
    unaffected (every salt value finds its exploded match — salting only
    routes rows), but plans that additionally branch on ``__salt`` or
    persist it would not be retry-stable; keep the salt internal."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(exploded, [key, "__salt"]).drop("__salt")
