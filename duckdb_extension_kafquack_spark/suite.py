"""Query suite: every operator from SURVEY.md §2 as a (Spark, oracle-SQL) pair.

Each entry registers
  * a Spark callable ``(spark, sf_dir) -> DataFrame`` — declarative
    DataFrame API so Catalyst plans it (broadcast joins, pushdown,
    whole-stage codegen), and
  * an equivalent DuckDB SQL string the driver runs as the correctness
    oracle (column names aliased identically on both sides; float
    aggregates rounded identically on both sides).

The reference implements only the Kafka source (SURVEY §2.1); its users
get the relational surface from host DuckDB (SURVEY §2.2).  This suite
therefore *is* the user-visible capability match: source projection +
filters, joins (equi/semi/anti/range/as-of), aggregation (hash,
rollup/cube/grouping sets, distinct), windows, sort/top-k, set ops,
scalar string/date/JSON functions — plus the north-star training-data
operators (dedup, similarity, text, multimodal) registered by
:mod:`.operators`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .session import load_tables
from .sources.synthetic import kafka_messages_from_events


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


# ---------------------------------------------------------------------------
# 1. Source projection (the reference's one real operator)
# ---------------------------------------------------------------------------

_KAFKA_ORACLE = """
SELECT 'events' AS topic,
       CAST(user_id % 4 AS INTEGER) AS "partition",
       CAST(event_id AS BIGINT) AS "offset",
       CASE WHEN event_id % 97 = 0 THEN NULL ELSE ts END AS "timestamp",
       CASE WHEN event_id % 10 = 0 THEN NULL ELSE CAST(user_id AS VARCHAR) END AS "key",
       CASE WHEN event_id % 101 = 0 THEN NULL ELSE props END AS "value",
       CASE WHEN event_id % 101 = 0
            THEN 'Local: Broker transport failure (event ' || CAST(event_id AS VARCHAR) || ')'
            ELSE NULL END AS error
FROM events
"""


@query("kafka_messages_batch", _KAFKA_ORACLE)
def kafka_messages_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 7-column scan shape (kafquack_extension.cpp:101-110)
    over the broker-free harness; exercises null-timestamp / null-key /
    error-row semantics (cpp:166-197)."""
    return kafka_messages_from_events(spark, sf_dir)


@query("kafka_datasource_batch", _KAFKA_ORACLE)
def kafka_datasource_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SQL entry point as a LIVE scan:
    ``spark.read.format("kafquack")`` via the Spark Python Data Source API
    (kafquack_extension.cpp:223-229 registration; README.md:12-14 usage).
    Same 7-column schema and row semantics as ``kafka_messages_batch`` but
    planned as a DataSource-v2 relation — partitioned splits, Arrow-batch
    transfer, no driver materialization (sources/datasource.py)."""
    from .session import ensure_session_conf
    from .sources.datasource import read_kafquack

    ensure_session_conf(spark)
    return read_kafquack(
        spark, "localhost:9092", "events", "graft-group", fixture_dir=sf_dir
    )


@query(
    "kafka_datasource_agg",
    f"""
SELECT "partition",
       COUNT(*) AS messages,
       MAX("offset") AS max_offset,
       COUNT(*) FILTER (WHERE error IS NOT NULL) AS error_rows
FROM ({_KAFKA_ORACLE}) km
GROUP BY "partition"
""",
)
def kafka_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational composition over the v2 scan — proves the format
    participates in normal Catalyst planning (partial agg over the
    Python source's Arrow batches), the reference's host-DuckDB idiom
    ``SELECT ... FROM kafka_consumer(...) GROUP BY ...``."""
    km = kafka_datasource_batch(spark, sf_dir)
    return km.groupBy("partition").agg(
        F.count(F.lit(1)).alias("messages"),
        F.max("offset").alias("max_offset"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("error_rows"),
    )


@query(
    "kafka_value_counts",
    f"""
SELECT value, COUNT(*) AS cnt
FROM ({_KAFKA_ORACLE}) km
GROUP BY value
""",
)
def kafka_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.2 step 1's end-to-end slice: GROUP BY over the source."""
    km = kafka_messages_from_events(spark, sf_dir)
    return km.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "kafka_error_invariant",
    f"""
SELECT COUNT(*) AS total,
       COUNT(*) FILTER (WHERE (value IS NULL) <> (error IS NOT NULL)) AS violations,
       COUNT(*) FILTER (WHERE error IS NOT NULL) AS error_rows,
       COUNT(*) FILTER (WHERE key IS NULL) AS keyless_rows,
       COUNT(*) FILTER (WHERE timestamp IS NULL) AS ts_null_rows
FROM ({_KAFKA_ORACLE}) km
""",
)
def kafka_error_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors-are-data invariant: (value IS NULL) == (error IS NOT NULL)
    (kafquack_extension.cpp:189-197)."""
    km = kafka_messages_from_events(spark, sf_dir)
    return km.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("value").isNull() != F.col("error").isNotNull(), 1)).alias(
            "violations"
        ),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("error_rows"),
        F.count(F.when(F.col("key").isNull(), 1)).alias("keyless_rows"),
        F.count(F.when(F.col("timestamp").isNull(), 1)).alias("ts_null_rows"),
    )


# ---------------------------------------------------------------------------
# 2. Aggregation: hash agg with partial/final, rounding pinned cross-engine
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter(pushed to parquet)→partial agg→final agg.
    One shuffle on a 6-value key; map-side combine does ~all the work."""
    li = _t(spark, sf_dir)["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → deterministic
    top-k (ties broken by key).  customer side broadcasts after its
    filter; lineitem never shuffles more than once."""
    t = _t(spark, sf_dir)
    cut = F.lit("1997-06-01").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    ords = t["orders"].filter(F.col("o_orderdate") < cut)
    li = t["lineitem"].filter(F.col("l_shipdate") > cut)
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier",
    """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join.  region/nation/supplier/customer are
    dimensions → broadcast them; the two fact tables (orders, lineitem)
    meet in the only real shuffle."""
    t = _t(spark, sf_dir)
    dim = (
        t["region"].filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
    )
    li_sup = t["lineitem"].join(
        F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
    )
    return (
        li_sup.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(dim),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Projection / filter pushdown
# ---------------------------------------------------------------------------

@query(
    "filter_project",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicates + projection reach the parquet scan (PushedFilters /
    4-column ReadSchema in `.explain`) — no full-width materialization."""
    li = _t(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# 4. Join family
# ---------------------------------------------------------------------------

@query(
    "semi_join",
    """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
""",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 150000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "anti_join",
    """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "range_join",
    """
SELECT r_name AS band,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS band_total
FROM orders
JOIN region ON o_totalprice >= r_regionkey * 100000.0
           AND o_totalprice <  (r_regionkey + 1) * 100000.0
GROUP BY r_name
""",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: tiny band table broadcast → nested-loop
    against the fact side; no shuffle of orders."""
    t = _t(spark, sf_dir)
    bands = t["region"].select(
        F.col("r_name"),
        (F.col("r_regionkey") * 100000.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 100000.0).alias("hi"),
    )
    return (
        t["orders"]
        .join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy(F.col("r_name").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("band_total"),
        )
    )


@query(
    "asof_join",
    """
SELECT event_id, user_id, ts, last_signup_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
  FROM events
) WHERE event_type = 'purchase'
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a running `last(...) ignorenulls` window —
    single shuffle on user_id, no pandas round-trip, watermark-friendly
    shape at scale (backward as-of: latest signup at-or-before each
    purchase)."""
    ev = _t(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_signup_ts", sig)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_signup_ts")
    )


@query(
    "deterministic_sample",
    f"""
SELECT COUNT(*) AS n_sampled,
       MIN(doc_id) AS first_doc,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
""",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample that is REPRODUCIBLE across engines and runs
    (hash of the key, not an RNG) — the sampling you actually want in a
    training pipeline, where `TABLESAMPLE` gives unstable membership."""
    from .functions.hashing import spark_hash64

    docs = _t(spark, sf_dir)["documents"]
    sampled = docs.filter(
        spark_hash64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100 < 10
    )
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("first_doc"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
    )


@query(
    "stratified_sample",
    """
SELECT source,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS first_doc
FROM documents
WHERE ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
      < (CASE WHEN source = 'src0' THEN 50 ELSE 10 END)
GROUP BY source
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates (e.g. upsample a scarce source) with
    hash-based reproducible membership — the data-mixing primitive for
    corpus construction."""
    from .functions.hashing import spark_hash64

    docs = _t(spark, sf_dir)["documents"]
    rate = F.when(F.col("source") == "src0", 50).otherwise(10)
    h = spark_hash64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    return (
        docs.filter(h % 100 < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "outer_joins",
    """
SELECT n_name,
       COUNT(c_custkey) AS n_customers,
       COUNT(s_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM nation
LEFT JOIN customer ON c_nationkey = n_nationkey
FULL JOIN supplier ON s_nationkey = n_nationkey AND c_custkey IS NOT NULL
GROUP BY n_name
""",
)
def outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT + FULL OUTER joins with NULL-preserving counts."""
    t = _t(spark, sf_dir)
    j = t["nation"].join(
        t["customer"], F.col("c_nationkey") == F.col("n_nationkey"), "left"
    ).join(
        t["supplier"],
        (F.col("s_nationkey") == F.col("n_nationkey")) & F.col("c_custkey").isNotNull(),
        "full",
    )
    return j.groupBy("n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        F.count("s_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "unpivot_melt",
    """
SELECT l_linenumber, metric, ROUND(SUM(val), 2) AS total
FROM (
  SELECT l_linenumber, 'quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_linenumber, 'discount' AS metric, l_discount AS val FROM lineitem
  UNION ALL
  SELECT l_linenumber, 'tax' AS metric, l_tax AS val FROM lineitem
)
GROUP BY l_linenumber, metric
""",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) then re-aggregate; Spark's native
    ``unpivot`` — the oracle spells out the equivalent UNION ALL."""
    li = _t(spark, sf_dir)["lineitem"]
    long = li.unpivot(
        ids=["l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax"),
    )
    return long.groupBy("l_linenumber", "metric").agg(
        F.round(F.sum("val"), 2).alias("total")
    )


@query(
    "window_ranking_extras",
    """
SELECT o_orderkey,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_ranking_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/first_value/nth_value — pct_rank and
    cume are exact rationals (rank/count), identical doubles cross-engine."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_cheapest"),
    )


# ---------------------------------------------------------------------------
# 5. Window functions / top-k
# ---------------------------------------------------------------------------

@query(
    "window_funcs",
    """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       CAST(RANK() OVER w AS INTEGER) AS rnk,
       ROUND(LAG(o_totalprice) OVER w, 2)  AS prev_price,
       ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic + frame windows; one shuffle on o_custkey shared
    by the two window specs with the same partitioning."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.avg("o_totalprice").over(wd.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
        F.round(
            F.sum("o_totalprice").over(wd.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


@query(
    "topk_per_group",
    """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group = row_number + filter; Spark plans a partial top-k
    (WindowGroupLimit) before the shuffle, so only k rows per group per
    mapper move."""
    t = _t(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# 6. Grouping sets / rollup / cube, distinct
# ---------------------------------------------------------------------------

@query(
    "rollup_agg",
    """
SELECT r_name, n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_bal")
    )


@query(
    "cube_agg",
    """
SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
""",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    joined = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.cube("c_mktsegment", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@query(
    "grouping_sets",
    """
SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "distinct_agg",
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n"),
    )


APPROX_RSD = 0.01


@query(
    "approx_distinct",
    f"""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n,
       TRUE AS within_error
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches differ between engines, so the estimate itself can't
    hash-match; instead the oracle checks a BOUNDED-ERROR invariant:
    |approx − exact| ≤ 5·rsd·exact, emitted as a boolean column that the
    driver's value hash covers (oracle side is literal TRUE — any group
    out of bound hash-mismatches and fails the gate)."""
    li = _t(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", APPROX_RSD).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag",
        "exact_parts",
        "n",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 5 * APPROX_RSD * F.col("exact_parts")
        ).alias("within_error"),
    )


# ---------------------------------------------------------------------------
# 7. Set operations
# ---------------------------------------------------------------------------

@query(
    "set_ops",
    """
WITH cust_nations AS (SELECT c_nationkey AS nationkey FROM customer),
     supp_nations AS (SELECT s_nationkey AS nationkey FROM supplier)
SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cust_nations UNION SELECT nationkey FROM supp_nations)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
UNION ALL
SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    cust = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    supp = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    union = cust.union(supp).distinct().select(F.lit("union").alias("op"), "nationkey")
    inter = cust.intersect(supp).select(F.lit("intersect").alias("op"), "nationkey")
    exc = cust.distinct().exceptAll(supp.distinct()).select(
        F.lit("except").alias("op"), "nationkey"
    )
    return union.unionAll(inter).unionAll(exc)


@query(
    "set_ops_all",
    """
WITH c AS (SELECT c_nationkey AS k FROM customer),
     s AS (SELECT s_nationkey AS k FROM supplier)
SELECT 'intersect_all' AS op, k, COUNT(*) AS n
FROM (SELECT k FROM c INTERSECT ALL SELECT k FROM s) GROUP BY k
UNION ALL
SELECT 'except_all' AS op, k, COUNT(*) AS n
FROM (SELECT k FROM c EXCEPT ALL SELECT k FROM s) GROUP BY k
""",
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — multiplicity
    preserved, checked via per-key counts."""
    t = _t(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    ia = (
        c.intersectAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionAll(ea)


@query(
    "sort_merge_join",
    """
SELECT o_orderpriority, COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS total_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def sort_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join forced to sort-merge (merge hint): the
    strategy for two fact tables too big to broadcast — both sides
    shuffle once on the join key, then streaming merge.  (Bucketing both
    sides on l_orderkey removes even that shuffle — tests/test_plans.py.)
    """
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .hint("merge")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "map_funcs",
    """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchases,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signups,
       COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate (map_from_entries of per-type counts →
    element_at lookups) with scalar outputs so the oracle — which has no
    equivalent map literal — checks values, not representation."""
    ev = _t(spark, sf_dir)["events"]
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias("purchases"),
        F.coalesce(F.element_at("type_counts", "signup"), F.lit(0)).alias("signups"),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# 8. Scalar functions: JSON, string, date
# ---------------------------------------------------------------------------

@query(
    "json_scalar",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
""",
)
def json_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "stats_agg",
    """
SELECT o_orderstatus,
       ROUND(STDDEV_SAMP(o_totalprice), 4) AS std_price,
       ROUND(VAR_SAMP(o_totalprice), 2) AS var_price,
       ROUND(CORR(o_totalprice, o_custkey), 6) AS corr_price_cust,
       ROUND(COVAR_SAMP(o_totalprice, o_custkey), 2) AS covar_price_cust,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders
GROUP BY o_orderstatus
""",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated percentiles —
    single partial+final pass; percentile is the only holistic one
    (sorts within group)."""
    o = _t(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covar_price_cust"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )


@query(
    "minmax_by",
    """
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice + o_orderkey / 1e9) AS biggest_order,
       arg_min(o_orderkey, o_totalprice + o_orderkey / 1e9) AS smallest_order,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(MIN(o_totalprice), 2) AS min_price
FROM orders
GROUP BY o_orderstatus
""",
)
def minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) — the ordering value is made unique with an
    orderkey epsilon so both engines pick the same row on price ties."""
    o = _t(spark, sf_dir)["orders"]
    tie_safe = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", tie_safe).alias("biggest_order"),
        F.min_by("o_orderkey", tie_safe).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


@query(
    "regexp_funcs",
    """
SELECT regexp_extract(c_name, '[0-9]+', 0) AS cust_num,
       regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled,
       COUNT(*) AS n
FROM customer
WHERE regexp_matches(c_name, 'Customer#0*[0-9]*[02468]$')
GROUP BY 1, 2
""",
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace/match — patterns restricted to the syntax
    subset where Java regex and RE2 agree."""
    c = _t(spark, sf_dir)["customer"]
    return (
        c.filter(F.col("c_name").rlike("Customer#0*[0-9]*[02468]$"))
        .groupBy(
            F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_num"),
            F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devoweled"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "null_funcs",
    f"""
SELECT COALESCE("key", '<keyless>') AS key_or_default,
       COUNT(*) AS n,
       COUNT("timestamp") AS n_with_ts,
       COUNT(*) - COUNT("value") AS n_errors,
       CAST(SUM(CASE WHEN NULLIF("key", '13') IS NULL AND "key" IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_user13
FROM ({_KAFKA_ORACLE}) km
GROUP BY 1
""",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL machinery (coalesce/nullif/conditional counting) over the
    kafka projection — the reference's NULL semantics are load-bearing
    (timestamp/key/value, cpp:166-197)."""
    km = kafka_messages_from_events(spark, sf_dir)
    return km.groupBy(
        F.coalesce(F.col("key"), F.lit("<keyless>")).alias("key_or_default")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("timestamp").alias("n_with_ts"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_errors"),
        F.sum(
            F.when(
                F.nullif(F.col("key"), F.lit("13")).isNull() & F.col("key").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_user13"),
    )


@query(
    "scalar_subquery",
    """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (RewriteCorrelatedScalarSubquery); written in SQL to
    exercise exactly that path."""
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
        FROM orders o
        WHERE o_totalprice > 1.5 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "math_funcs",
    """
SELECT l_linenumber,
       ROUND(SUM(sqrt(l_extendedprice)), 4) AS sum_sqrt,
       ROUND(SUM(ln(l_extendedprice)), 6) AS sum_ln,
       ROUND(SUM(abs(l_discount - 0.05)), 6) AS sum_absdev,
       CAST(SUM(CAST(ceil(l_quantity / 10.0) AS BIGINT)) AS BIGINT) AS sum_ceil_buckets,
       CAST(SUM(CAST(floor(l_tax * 100) AS BIGINT)) AS BIGINT) AS sum_floor_tax,
       CAST(SUM(CAST(l_orderkey % 7 AS BIGINT)) AS BIGINT) AS sum_mod7
FROM lineitem
GROUP BY l_linenumber
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir)["lineitem"]
    return li.groupBy("l_linenumber").agg(
        F.round(F.sum(F.sqrt("l_extendedprice")), 4).alias("sum_sqrt"),
        F.round(F.sum(F.log("l_extendedprice")), 6).alias("sum_ln"),
        F.round(F.sum(F.abs(F.col("l_discount") - 0.05)), 6).alias("sum_absdev"),
        F.sum(F.ceil(F.col("l_quantity") / 10.0).cast("long")).alias("sum_ceil_buckets"),
        F.sum(F.floor(F.col("l_tax") * 100).cast("long")).alias("sum_floor_tax"),
        F.sum((F.col("l_orderkey") % 7).cast("long")).alias("sum_mod7"),
    )


@query(
    "array_funcs",
    """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_toks,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       list_sort(list_distinct(toks))[1] AS first_token,
       list_sort(list_distinct(toks))[-1] AS last_token,
       CAST(list_contains(toks, 'spark') AS BOOLEAN) AS has_spark,
       array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), ',') AS first3
FROM t
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions: filter/distinct/sort/slice/contains —
    all JVM expression-level."""
    docs = _t(spark, sf_dir)["documents"]
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    uniq = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(uniq).alias("n_distinct"),
        F.element_at(uniq, 1).alias("first_token"),
        F.element_at(uniq, -1).alias("last_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(uniq, 1, 3), ",").alias("first3"),
    )


@query(
    "pivot_agg",
    """
SELECT c_mktsegment,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
       ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() — Spark plans it as the same conditional-sum
    single pass the oracle spells out."""
    t = _t(spark, sf_dir)
    joined = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0))), 2))
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("total_f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("total_o"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("total_p"),
    )


@query(
    "sort_limit_offset",
    """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit/offset with deterministic tie-break; Spark
    plans TakeOrderedAndProject (top-(k+offset) per partition, no full
    sort)."""
    o = _t(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .offset(10)
        .limit(20)
    )


@query(
    "string_date_funcs",
    """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
       date_trunc('month', o_orderdate) AS month_start,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 4) AS avg_price,
       MIN(upper(substr(o_orderpriority, 1, 1))) AS min_prio_initial,
       CAST(MAX(length(o_orderstatus)) AS INTEGER) AS max_status_len
FROM orders
GROUP BY 1, 2, 3
""",
)
def string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir)["orders"]
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.min(F.upper(F.substring("o_orderpriority", 1, 1))).alias("min_prio_initial"),
        F.max(F.length("o_orderstatus")).alias("max_status_len"),
    )
