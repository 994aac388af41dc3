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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in suite.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {name: q.oracle for name, q in suite.REGISTRY.items() if q.oracle is not None}
