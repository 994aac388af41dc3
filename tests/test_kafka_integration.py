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
