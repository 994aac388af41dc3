"""End-to-end Kafka integration (SURVEY §5.2.5) — skippable, like the
reference's own CI which never talks to a broker (test/sql/kafquack.test
asserts binder errors only).

Run against a real broker with:

    KAFQUACK_TEST_BROKERS=localhost:9092 KAFQUACK_TEST_TOPIC=t \\
        python -m pytest tests/test_kafka_integration.py

Also requires the spark-sql-kafka connector on the classpath
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``),
which this container does not ship.
"""

import os

import pytest

BROKERS = os.environ.get("KAFQUACK_TEST_BROKERS")
TOPIC = os.environ.get("KAFQUACK_TEST_TOPIC", "kafquack-test")

needs_broker = pytest.mark.skipif(
    not BROKERS, reason="set KAFQUACK_TEST_BROKERS to run Kafka integration tests"
)


def test_sql_registration_succeeds_without_broker(spark):
    """register() itself (UDTF under both names, the reference's naming
    quirk — cpp:223 vs README.md:13) must work broker-free."""
    from duckdb_extension_kafquack_spark.sources.kafka import register

    register(spark)  # raises on failure


@needs_broker
def test_batch_consume_round_trip(spark):
    from duckdb_extension_kafquack_spark.sources.kafka import kafka_consumer

    df = kafka_consumer(spark, BROKERS, TOPIC, "kafquack-it", mode="batch")
    assert [f.name for f in df.schema.fields] == [
        "topic", "partition", "offset", "timestamp", "key", "value", "error",
    ]
    df.limit(10).collect()  # actually talks to the broker


@needs_broker
def test_stream_drain_available_now(spark, tmp_path):
    from duckdb_extension_kafquack_spark.sources.kafka import kafka_consumer
    from duckdb_extension_kafquack_spark.streaming.windows import run_stream_to_table

    stream = kafka_consumer(spark, BROKERS, TOPIC, "kafquack-it-stream")
    run_stream_to_table(stream, "kafka_it_drain", "append")
    assert spark.table("kafka_it_drain").count() >= 0


@needs_broker
def test_produce_consume_sql_produce_round_trip(spark):
    """The reference's whole deployment, end to end against a live
    broker (integration/README.md): produce 100 JSON messages →
    kafka_consumer().load() → SQL over register_topic_view → produce the
    aggregate to a second topic → re-consume and verify.  Counts use >=
    because topics accumulate across reruns (append-only log)."""
    from pyspark.sql import functions as F

    from duckdb_extension_kafquack_spark.sources.kafka import (
        kafka_consumer,
        kafka_producer,
        register_topic_view,
    )

    topic_in, topic_out = "kafquack-it-rt-in", "kafquack-it-rt-out"

    src = spark.range(100).selectExpr(
        "CAST(id AS STRING) AS key",
        "to_json(named_struct('k', id % 7)) AS value",
    )
    kafka_producer(src, BROKERS, topic_in).save()

    register_topic_view(spark, "rt_msgs", BROKERS, topic_in, "kafquack-it-rt", mode="batch")
    agg = spark.sql(
        """SELECT get_json_object(value, '$.k') AS k, COUNT(*) AS n
           FROM rt_msgs WHERE error IS NULL GROUP BY 1"""
    )
    counts = {int(r.k): r.n for r in agg.collect()}
    assert set(counts) == set(range(7))
    assert sum(counts.values()) >= 100

    kafka_producer(
        agg.select(F.col("k").alias("key"), F.col("n").cast("string").alias("value")),
        BROKERS,
        topic_out,
    ).save()
    back = kafka_consumer(spark, BROKERS, topic_out, "kafquack-it-rt2", mode="batch")
    got = {int(r.key) for r in back.select("key").collect()}
    assert got >= set(range(7))


@needs_broker
def test_error_column_null_on_healthy_broker(spark):
    """Errors-are-data contract on the live path: Spark's Kafka source
    has no per-row transport-error surface (a failed fetch fails the
    task), so on a healthy broker every fetched row must have
    error IS NULL and value IS NOT NULL (cpp:189-197 parity)."""
    from pyspark.sql import functions as F

    from duckdb_extension_kafquack_spark.sources.kafka import kafka_consumer

    df = kafka_consumer(spark, BROKERS, TOPIC, "kafquack-it-err", mode="batch")
    bad = df.filter(F.col("error").isNotNull() | F.col("value").isNull())
    assert bad.count() == 0
