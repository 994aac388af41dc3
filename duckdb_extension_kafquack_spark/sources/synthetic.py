"""Broker-free kafka_messages harness (FIXTURES.md §1).

The reference cannot be tested without a broker either (its CI asserts
only binder errors, test/sql/kafquack.test).  We go further: replay the
``events`` fixture through the exact 7-column projection so every
semantic of the reference scan — null timestamp (cpp:177-178), null key
(cpp:185-186), the ``(value IS NULL) = (error IS NOT NULL)`` invariant
(cpp:189-197) — is exercised deterministically, both as a static
DataFrame (batch parity) and as a file-backed stream (unbounded parity).

All derivations are pure column expressions (JVM-side, codegen-friendly)
and deterministic functions of ``event_id`` so the same rows appear at
any scale factor and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import normalize_event_ts, read_table
from .kafka import KAFKA_MESSAGE_SCHEMA


def _normalize_ts(events: DataFrame) -> DataFrame:
    """ns-long or TIMESTAMP_NTZ → TIMESTAMP (see session.normalize_event_ts)."""
    return normalize_event_ts(events)


def _project(events: DataFrame, topic: str) -> DataFrame:
    # deterministic pseudo-noise: pmod(event_id, N) selects the edge rows
    eid = F.col("event_id")
    is_err = F.pmod(eid, F.lit(101)) == F.lit(0)  # ~1% transport errors
    no_key = F.pmod(eid, F.lit(10)) == F.lit(0)  # ~10% keyless
    no_ts = F.pmod(eid, F.lit(97)) == F.lit(0)  # ~1% broker sent no timestamp
    return events.select(
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("partition"),
        eid.cast("long").alias("offset"),
        F.when(no_ts, F.lit(None)).otherwise(F.col("ts")).cast("timestamp").alias("timestamp"),
        F.when(no_key, F.lit(None)).otherwise(F.col("user_id").cast("string")).alias("key"),
        F.when(is_err, F.lit(None)).otherwise(F.col("props")).alias("value"),
        F.when(is_err, F.concat(F.lit("Local: Broker transport failure (event "), eid, F.lit(")")))
        .otherwise(F.lit(None))
        .cast("string")
        .alias("error"),
    )


def kafka_messages_from_events(
    spark: SparkSession, sf_dir: str, topic: str = "events"
) -> DataFrame:
    """Static (batch) kafka_messages table derived from the events fixture."""
    return _project(read_table(spark, sf_dir, "events"), topic)


def synthetic_kafka_stream(
    spark: SparkSession, sf_dir: str, topic: str = "events"
) -> DataFrame:
    """Unbounded variant: the same projection over a file stream.

    ``readStream`` on the fixture directory gives a real streaming
    DataFrame (micro-batched, watermark-capable) with identical rows —
    used by the streaming tests with ``trigger(availableNow=True)``,
    the Spark idiom for the reference's "drain what's there" read.
    """
    from ..session import ensure_session_conf

    ensure_session_conf(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    events = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _project(_normalize_ts(events), topic)


__all__ = ["kafka_messages_from_events", "synthetic_kafka_stream", "KAFKA_MESSAGE_SCHEMA"]
