"""PySpark-native analytics engine with the capabilities of
quackscience/duckdb-extension-kafquack.

The reference (/root/reference, snapshot 2025-01-03) is a DuckDB loadable
extension exposing ONE streaming table function, ``kafka_consumer(...)``
(src/kafquack_extension.cpp:223-229), whose output is queried by the host
DuckDB engine.  This package re-expresses that deployment Spark-first:

* :mod:`.sources.kafka` — the faithful Kafka source wrapper (schema,
  option validation, error-column semantics of
  src/kafquack_extension.cpp:68-205), batch + structured-streaming.
* :mod:`.operators` — the downstream relational surface the reference
  gets "for free" from DuckDB, plus the large-scale training-data
  operators (dedup, similarity search, text analysis, multimodal).
* :mod:`.streaming` — watermarks, event-time windows, stateful dedup.
* :mod:`.functions` — portable deterministic hashing / vector kernels.

Everything is declarative DataFrame / Spark SQL so Catalyst + Tungsten
pick the physical plan; Python UDFs appear only where built-ins cannot
express the semantics (and then as Arrow-batched pandas UDFs).
"""

from .session import get_spark, load_tables
from .sources.kafka import kafka_consumer, register, register_topic_view

__all__ = [
    "get_spark",
    "load_tables",
    "kafka_consumer",
    "register",
    "register_topic_view",
    "kafquack_version",
]

__version__ = "0.1.0"


def kafquack_version() -> str:
    """Reference-parity extension version (kafquack_extension.cpp:236-242):
    the KAFQUACK_VERSION build define wins, else the hard-coded "0.0.1".
    We mirror the define as an environment variable — same override
    semantics, no compile step."""
    import os

    return os.environ.get("KAFQUACK_VERSION", "0.0.1")
