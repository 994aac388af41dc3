"""Compatibility alias: the reference's README calls the extension
``kafquack`` (README.md:13) while the code registers ``kafka_consumer``
(src/kafquack_extension.cpp:223).  We honor both spellings at the
module level too — ``import kafquack`` re-exports the engine's public
API, so reference users can keep their habits:

    import kafquack
    df = kafquack.kafka_consumer(spark, "broker:9092", "topic", "group")
    kafquack.register(spark)   # SQL names: kafka_consumer + kafquack
"""

from duckdb_extension_kafquack_spark import (  # noqa: F401
    get_spark,
    kafka_consumer,
    kafquack_version,
    load_tables,
    register,
)
from duckdb_extension_kafquack_spark.sources.datasource import (  # noqa: F401
    create_sql_view,
    read_kafquack,
    register_datasource,
)
from duckdb_extension_kafquack_spark.sources.kafka import (  # noqa: F401
    KAFKA_MESSAGE_SCHEMA,
    register_topic_view,
    with_decode_policy,
)
from duckdb_extension_kafquack_spark.sources.synthetic import (  # noqa: F401
    kafka_messages_from_events,
    synthetic_kafka_stream,
)

__all__ = [
    "get_spark",
    "kafquack_version",
    "load_tables",
    "kafka_consumer",
    "register",
    "register_topic_view",
    "register_datasource",
    "read_kafquack",
    "create_sql_view",
    "KAFKA_MESSAGE_SCHEMA",
    "with_decode_policy",
    "kafka_messages_from_events",
    "synthetic_kafka_stream",
]
