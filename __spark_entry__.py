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


def _latest_driver_verdicts() -> dict[str, dict]:
    """Latest per-query verdict across every committed CORRECTNESS_r*.json.

    The driver gate caps at 50 queries/round; ordering the driver-facing
    dicts by verdict freshness means every registered query gets a
    verdict across rounds instead of the same 50 being re-checked."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                latest.update(json.load(f))
        except Exception:  # noqa: BLE001 — a malformed file must not break the gate
            continue
    return latest


def _driver_order() -> list[str]:
    """Three tiers from the committed driver verdicts:

    0. never driver-sampled (no verdict in any CORRECTNESS file);
    1. latest verdict red (err, or any *_match false) — re-check fixes;
    2. latest verdict green — re-verify last, only if budget remains.
    """
    verdicts = _latest_driver_verdicts()
    names = list(suite.REGISTRY)

    def tier(n: str) -> int:
        v = verdicts.get(n)
        if v is None:
            return 0
        green = v.get("err") is None and all(
            v.get(k) is not False for k in ("rows_match", "schema_match", "hash_match")
        )
        return 2 if green else 1

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
