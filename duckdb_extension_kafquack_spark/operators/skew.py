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


# ---------------------------------------------------------------------------
# Key-skew diagnostics (the audit you run BEFORE choosing a mitigation)
# ---------------------------------------------------------------------------


def key_skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-key-space skew metrics for candidate shuffle keys: key count,
    row count, the hottest key's row count, its share of all rows
    (``top_share``), and ``imbalance`` = max·n_keys/n_rows (1.0 when
    perfectly uniform; ≫1 when one key dominates).  This is the report a
    pipeline reads BEFORE picking a strategy — imbalance ≈ 1 → plain
    groupBy; moderate → AQE skew join; extreme → salting
    (:func:`salted_agg`).

    Physical shape per column: one map-side-combined count aggregation
    (shuffle carries one row per distinct key per map task) and a 1-row
    rollup — two stages, no corpus re-shuffle, nothing driver-side.
    ``top_share`` is a single int/int IEEE division; ``imbalance``
    promotes to DOUBLE before the multiply on BOTH engines (identical
    op order → bit-exact, and no BIGINT wrap at extreme scale)."""
    out = None
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        stats = counts.agg(
            F.lit(c).alias("key_column"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("n").cast("bigint").alias("max_key_rows"),
        ).select(
            "key_column",
            "n_keys",
            "n_rows",
            "max_key_rows",
            (F.col("max_key_rows") / F.col("n_rows")).alias("top_share"),
            # cast to DOUBLE before the multiply, mirroring the oracle's
            # MAX(n)::DOUBLE * COUNT(*): a BIGINT*BIGINT product can wrap
            # past 2^63 (and rounds differently past 2^53) at extreme
            # key-cardinality × row-count scale
            (
                F.col("max_key_rows").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
            ).alias("imbalance"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def _duck_skew_report_sql() -> str:
    parts = []
    for table, col in (
        ("events", "user_id"),
        ("events", "event_type"),
        ("documents", "lang"),
        ("documents", "source"),
    ):
        parts.append(f"""
SELECT '{col}' AS key_column,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       MAX(n)::DOUBLE / SUM(n) AS top_share,
       MAX(n)::DOUBLE * COUNT(*) / SUM(n) AS imbalance
FROM (SELECT CAST({col} AS VARCHAR) AS k, COUNT(*) AS n FROM {table} GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


@query("skew_key_report", _duck_skew_report_sql())
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit of the fixture's four natural shuffle keys (two
    event-side, two document-side) — the decision input for
    :func:`salted_agg` vs AQE vs plain groupBy."""
    t = load_tables(spark, sf_dir)
    ev = key_skew_report(t["events"], ["user_id", "event_type"])
    dc = key_skew_report(t["documents"], ["lang", "source"])
    return ev.unionByName(dc)
