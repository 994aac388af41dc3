"""TPC-H-shaped relational breadth over the fixture star schema.

The reference gets its whole relational surface from host DuckDB
(SURVEY §2.2) — a user can run any TPC-H-class query against the
``kafka_consumer`` scan or any file scan.  :mod:`.suite` covers each
operator once; this module adds the classic *composed* decision-support
shapes (Q1/Q3/Q5 live in suite.py) so the capability match is
demonstrated on whole queries, not just operator slices.

The fixture schema is trimmed TPC-H (no partsupp; no
commitdate/receiptdate/shipmode/phone columns), so queries whose
predicates need those columns are adapted to equivalents that keep the
PLAN SHAPE identical: Q4's EXISTS becomes exists-a-returned-line, Q12
classifies by priority over linestatus, Q21's waiting-supplier
anti-join keys on returnflag instead of receipt>commit, Q22 derives its
country code from c_nationkey instead of c_phone.

Scale notes (100 TB):
* every dimension that is small at scale (nation, region, supplier,
  filtered part) is broadcast — no shuffle for the probe side;
* fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE handles skew;
* all aggregates are partial+final (map-side combine);
* cross-engine float rule: round ONLY order-dependent float sums/avgs
  (never exact int sums or single-division quotients), and make every
  LIMIT deterministic with a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .suite import query, _t


# ---------------------------------------------------------------------------
# Q4: priority count with EXISTS semi-join (commitdate<receiptdate →
# exists-a-returned-line; same decorrelated-semi-join plan)
# ---------------------------------------------------------------------------

@query(
    "q4_priority_exists",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        orders.join(
            returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue — pure scan-side predicate + single global agg
# ---------------------------------------------------------------------------

@query(
    "q6_forecast_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate reaches the parquet scan (PushedFilters); the agg
    is one partial+final SUM — the cheapest possible distributed plan."""
    li = _t(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (double dim join, year rollup)
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier (1:100k of lineitem) and both nation legs broadcast; the
    only large shuffle is orders⋈lineitem on the order key."""
    t = _t(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8: market share — conditional aggregation over a 6-table join
# ---------------------------------------------------------------------------

@query(
    "q8_market_share",
    """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END), 2) AS nation_volume,
       ROUND(SUM(volume), 2) AS total_volume,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered part (1/6 of parts) broadcast prunes lineitem EARLY; the
    customer-side region filter rides broadcast nation/region dims."""
    t = _t(spark, sf_dir)
    part = t["part"].filter(F.col("p_type") == "PROMO")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    joined = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))),
                2,
            ).alias("nation_volume"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                4,
            ).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
# ---------------------------------------------------------------------------

@query(
    "q10_returned_items",
    """
SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TakeOrderedAndProject after the group-by: only 20 rows cross the
    final collect, each shuffle partition ships its local top 20.
    ORDER BY the *rounded* revenue with c_custkey tie-break so the
    LIMIT frontier is deterministic cross-engine."""
    t = _t(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 (adapted): priority classification — join + conditional counts
# ---------------------------------------------------------------------------

@query(
    "q12_priority_class",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_returnflag <> 'R'
GROUP BY l_linestatus
""",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_returnflag") != "R")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join + double aggregation
# ---------------------------------------------------------------------------

@query(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level agg: the first groups 10 orders/customer, the second is
    ~tens of distinct counts — partial combine collapses it map-side."""
    t = _t(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14: promo revenue — conditional share over a fact⋈dim join
# ---------------------------------------------------------------------------

@query(
    "q14_promo_revenue",
    """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
         AS promo_part,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_part,
       ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo), 2).alias("promo_part"),
            F.round(F.sum(rev), 2).alias("total_part"),
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — per-part average threshold
# ---------------------------------------------------------------------------

@query(
    "q17_small_qty_revenue",
    """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated AVG decorrelates into a per-part aggregate joined
    back — Catalyst's own strategy for this shape, written explicitly.
    l_quantity is integral → the AVG is an exact int-sum/count division,
    bit-identical cross-engine (no rounding needed on the threshold)."""
    t = _t(spark, sf_dir)
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    li = t["lineitem"]
    # restrict BOTH sides to the brand's parts before any aggregation:
    # the avg must cover all lineitems of those parts (not other brands)
    brand_li = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey")
    thresholds = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING subquery + top-N
# ---------------------------------------------------------------------------

@query(
    "q18_large_volume",
    """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 260
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING-subquery is a self-semi-join of lineitem against its
    own per-order rollup; quantities are integral so SUM is exact and
    the >260 frontier cannot straddle engines."""
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 260)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(big_orders),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive predicates — OR-of-ANDs pushed into one broadcast join
# ---------------------------------------------------------------------------

@query(
    "q19_disjunctive_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One equi-join + a residual OR filter: Catalyst keeps p_partkey =
    l_partkey as the join key and evaluates the disjunction post-join
    (no union-of-three-joins blowup)."""
    t = _t(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q21 (adapted): sole-blamed supplier — EXISTS + NOT EXISTS on the same fact
# ---------------------------------------------------------------------------

@query(
    "q21_sole_blame_supplier",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's shape on available columns: the supplier solely responsible
    for a returned line on a multi-supplier finalized order.  Both
    correlated EXISTS become self-joins of lineitem keyed on l_orderkey
    with a suppkey-inequality residual — one shuffle each, AQE-skew
    safe (order keys are uniform)."""
    t = _t(spark, sf_dir)
    l1 = t["lineitem"].filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = t["lineitem"].select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22 (adapted): global sales opportunity — scalar subquery + anti join
# ---------------------------------------------------------------------------

@query(
    "q22_sales_opportunity",
    """
SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
    AND c_acctbal > (
      -- exact cents-integer average: bit-identical across engines
      -- (a raw AVG(double) is order-dependent and could flip boundary rows)
      SELECT SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) / (100.0 * COUNT(*))
      FROM customer c2 WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 10 IN (1, 2, 3, 4, 5)
    )
) pos
-- every fixture customer has SOME order, so the classic "no orders"
-- anti-join is vacuous here; "never placed a priority order" keeps the
-- anti-join non-trivial (28 survivors at sf0.01)
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = pos.c_custkey
                    AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
GROUP BY cntrycode
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold + anti-join against the fact table.
    The average is computed over exact cent integers so the comparison
    frontier is bit-identical in both engines; the anti-join shuffles
    orders once on o_custkey."""
    t = _t(spark, sf_dir)
    code = (F.col("c_nationkey") % 10).cast("int")
    cust = t["customer"].filter(code.isin(1, 2, 3, 4, 5))
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            / (100.0 * F.count(F.lit(1)))
        ).alias("thr")
    )
    prio_orders = t["orders"].filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(prio_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select(code.alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 (adapted): min-cost supplier per part.  The fixture has no partsupp,
# so the part↔supplier catalog is DERIVED from lineitem (distinct
# (l_partkey, l_suppkey), cost = MIN unit price) — same shape as Q2's
# correlated-min: multi-dim join + per-part min + top-N.
# ---------------------------------------------------------------------------

@query(
    "q2_min_cost_supplier",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT ps.l_partkey, ps.cost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON s_suppkey = ps.l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
), ranked AS (
  SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost FROM eu
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
FROM ranked JOIN part ON p_partkey = l_partkey
WHERE p_size = 15 AND p_type = 'LARGE' AND cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2's correlated MIN subquery as a window-min over the derived
    catalog.  MIN is order-independent and each unit price is one IEEE
    division, so cost = min_cost is bit-identical cross-engine (no
    rounding needed).  supplier/nation/region and the filtered part are
    all broadcast; the only shuffle is the catalog groupBy."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu = ps.join(F.broadcast(eu_supp), F.col("s_suppkey") == F.col("l_suppkey"))
    ranked = eu.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
    )
    parts = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    return (
        ranked.filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 (adapted): product-type profit by nation and year.  No ps_supplycost,
# so cost is proxied by 10% of p_retailprice per unit — identical 6-table
# join + expression + two-key rollup shape.
# ---------------------------------------------------------------------------

@query(
    "q9_product_profit",
    """
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark, sf_dir):
    """part is filtered FIRST (LIKE '%red%' prunes ~80%) then broadcast,
    so lineitem rows for other parts never reach the orders shuffle —
    the selective dim drives the probe order, as Q9's plan should."""
    t = _t(spark, sf_dir)
    parts = t["part"].filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    joined = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 (adapted): important inventory — per-part value vs a global-fraction
# threshold (scalar subquery).  Value sums run on exact cent integers so
# the HAVING frontier cannot straddle engines.
# ---------------------------------------------------------------------------

@query(
    "q11_important_inventory",
    """
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, ROUND(cents / 100.0, 2) AS part_value
FROM val
WHERE cents > (SELECT SUM(cents) * 0.001 FROM val)
ORDER BY part_value DESC, p_partkey
""",
)
def q11_important_inventory(spark, sf_dir):
    """Q11's HAVING-vs-scalar-subquery: the per-part rollup is computed
    ONCE and reused for both the threshold and the output (Spark reuses
    the exchange; the cents sums are exact BIGINTs so > is exact)."""
    t = _t(spark, sf_dir)
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            ).alias("cents")
        )
    )
    thr = val.agg((F.sum("cents") * 0.001).alias("thr"))
    return (
        val.join(F.broadcast(thr))
        .filter(F.col("cents") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — revenue view + MAX scalar subquery, exact-cents sums
# ---------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(cents / 100.0, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE cents = (SELECT MAX(cents) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark, sf_dir):
    """The revenue rollup feeds both the MAX threshold and the output
    (classic Q15 view reuse); equality on exact cent integers, never on
    an order-dependent float sum."""
    t = _t(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            ).alias("cents")
        )
    )
    mx = rev.agg(F.max("cents").alias("mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("cents") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted): supplier-part relationship counts — distinct catalog pairs,
# NOT IN supplier exclusion (negative balance replaces the complaint LIKE),
# COUNT(DISTINCT) rollup.
# ---------------------------------------------------------------------------

@query(
    "q16_supplier_part_counts",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) psl
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """The distinct catalog is one shuffle on (partkey, suppkey); the
    NOT IN becomes a broadcast anti-join (supplier is tiny); the
    COUNT(DISTINCT suppkey) reuses the same key prefix."""
    t = _t(spark, sf_dir)
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    psl = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    return (
        psl.join(
            F.broadcast(bad_supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
        )
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 (adapted): promotion-candidate suppliers — nested IN subqueries:
# suppliers in two nations who shipped >50% of some red part's 1996 volume.
# ---------------------------------------------------------------------------

@query(
    "q20_promotion_suppliers",
    """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, qty, SUM(qty) OVER (PARTITION BY l_partkey) AS total_qty
    FROM shipped
  ) x WHERE qty > 0.5 * total_qty
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_2', 'NATION_11')
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
""",
)
def q20_promotion_suppliers(spark, sf_dir):
    """Q20's nested-IN chain: part filter pushed into the fact scan via
    broadcast semi-join BEFORE the rollup; the >half-of-total test is a
    window sum over the (small) per-part rollup; quantities are integral
    doubles so both sums and 0.5× are exact."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi"
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name").isin("NATION_2", "NATION_11"))
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
