from .kafka import KAFKA_MESSAGE_SCHEMA, kafka_consumer, register, register_topic_view
from .synthetic import kafka_messages_from_events, synthetic_kafka_stream

__all__ = [
    "KAFKA_MESSAGE_SCHEMA",
    "kafka_consumer",
    "register_topic_view",
    "register",
    "kafka_messages_from_events",
    "synthetic_kafka_stream",
]
