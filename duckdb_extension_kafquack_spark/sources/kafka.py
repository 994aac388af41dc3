"""Kafka consumer source — reference-parity wrapper over Spark's Kafka source.

Reproduces the single table function of the reference extension,
``kafka_consumer(brokers, topic, group_id, security_protocol :=,
sasl_mechanism :=, username :=, password :=)``
(/root/reference/src/kafquack_extension.cpp:68-132 bind, 139-205 scan,
223-229 registration), as an idiomatic Spark source:

* same fixed 7-column output schema (cpp:101-110),
* same option whitelist + error-message texts (cpp:80-99),
* key/value decoded to STRING like the reference's reinterpret_cast to
  VARCHAR (cpp:182-192); ``value_raw`` BINARY optionally kept,
* per-row ``error`` column (errors are data, not exceptions —
  cpp:189-197),
* both bounded (``spark.read``) and unbounded (``spark.readStream``)
  modes; the reference's non-terminating scan maps to Structured
  Streaming, its "read what's there now" idiom to
  ``trigger(availableNow=True)`` or batch ``endingOffsets=latest``.

Deliberate divergences (documented in SURVEY.md §7.4): offsets are
tracked in the checkpoint log (at-least-once) instead of the reference's
unsafe per-message synchronous commit (its own throughput ceiling,
cpp:116,199-204); parallelism is one Spark task per topic-partition
instead of the reference's hard-coded single thread (cpp:63-65).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The reference's fixed bind-time schema (kafquack_extension.cpp:101-110).
KAFKA_MESSAGE_SCHEMA = StructType(
    [
        StructField("topic", StringType(), False),
        StructField("partition", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("timestamp", TimestampType(), True),  # NULL if broker sent none (cpp:177-178)
        StructField("key", StringType(), True),  # NULL for keyless messages (cpp:185-186)
        StructField("value", StringType(), True),  # NULL iff error is set (cpp:195)
        StructField("error", StringType(), True),  # NULL on success (cpp:193)
    ]
)

_VALID_SECURITY_PROTOCOLS = ("SASL_SSL", "SASL_PLAINTEXT")
_VALID_SASL_MECHANISMS = ("SCRAM-SHA-256", "PLAIN")
_KNOWN_NAMED_PARAMS = frozenset(
    {"security_protocol", "sasl_mechanism", "username", "password"}
)


def _validate_options(
    security_protocol: str | None,
    sasl_mechanism: str | None,
    username: str | None,
    password: str | None,
    extra: dict[str, Any],
) -> dict[str, str]:
    """Bind-time validation with the reference's exact error texts
    (kafquack_extension.cpp:80-99, 92-94)."""
    for name in extra:
        if name not in _KNOWN_NAMED_PARAMS:
            raise ValueError(f"Unknown named parameter: {name}")
    if security_protocol is not None and security_protocol not in _VALID_SECURITY_PROTOCOLS:
        raise ValueError("security_protocol must be either SASL_SSL or SASL_PLAINTEXT")
    if sasl_mechanism is not None and sasl_mechanism not in _VALID_SASL_MECHANISMS:
        raise ValueError("sasl_mechanism must be either SCRAM-SHA-256 or PLAIN")

    opts: dict[str, str] = {}
    if security_protocol is not None:
        if not username or not password:
            raise ValueError("username and password are required when security_protocol is set")
        # reference defaults the mechanism to PLAIN when a protocol is set (cpp:120)
        mech = sasl_mechanism or "PLAIN"
        module = (
            "org.apache.kafka.common.security.plain.PlainLoginModule"
            if mech == "PLAIN"
            else "org.apache.kafka.common.security.scram.ScramLoginModule"
        )
        opts["kafka.security.protocol"] = security_protocol
        opts["kafka.sasl.mechanism"] = mech
        # JAAS config is a quoted string: escape backslashes and double
        # quotes so a credential containing either cannot break out of
        # the quoting or inject extra options (the reference passes
        # sasl.username/sasl.password as discrete librdkafka keys and
        # never hits this, cpp:121-124)
        u = username.replace("\\", "\\\\").replace('"', '\\"')
        p = password.replace("\\", "\\\\").replace('"', '\\"')
        opts["kafka.sasl.jaas.config"] = (
            f'{module} required username="{u}" password="{p}";'
        )
    return opts


def _project_reference_schema(raw: DataFrame, *, keep_raw: bool) -> DataFrame:
    """Spark's native Kafka columns → the reference's 7-column shape.

    Spark exposes key/value as BINARY; the reference reinterpret-casts the
    payload bytes to VARCHAR (cpp:182-192), so we CAST to STRING.  Spark's
    Kafka source has no per-row transport-error surface (a failed fetch
    fails the task and is retried), so ``error`` is NULL in the happy path;
    the column exists so downstream queries written against the reference
    schema run unchanged, and the synthetic harness populates it.
    """
    cols: list[Column] = [
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("timestamp"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.lit(None).cast("string").alias("error"),
    ]
    if keep_raw:
        cols.append(F.col("value").alias("value_raw"))
    return raw.select(*cols)


def _offset_bound_options(
    mode: str,
    starting_offsets: str,
    ending_offsets: str,
    starting_timestamp: int | None,
    ending_timestamp: int | None,
) -> dict[str, str]:
    """Offset/timestamp read bounds.  startingOffsets and
    startingTimestamp are mutually exclusive Kafka-source options — a
    timestamp bound becomes a broker-side index seek (the pushdown the
    reference refuses, cpp:227)."""
    opts: dict[str, str] = {}
    if starting_timestamp is not None:
        opts["startingTimestamp"] = str(starting_timestamp)
    else:
        opts["startingOffsets"] = starting_offsets
    if mode == "batch":
        if ending_timestamp is not None:
            opts["endingTimestamp"] = str(ending_timestamp)
        else:
            opts["endingOffsets"] = ending_offsets
    return opts


def _parse_broker_list(brokers: str) -> list[tuple[str, int]]:
    """``"host1:9092,host2:9093"`` → ``[("host1", 9092), ("host2", 9093)]``.
    Port defaults to 9092 (librdkafka's metadata.broker.list default).

    IPv6-safe (ADVICE r4): ``[::1]:9093`` → ("::1", 9093); a bare
    ``::1`` is a host (the last colon is split off only when the suffix
    is a valid port AND the host part has no unbracketed colon); a
    trailing colon (``h1:``) is stripped instead of kept in the host.
    """
    out: list[tuple[str, int]] = []
    for entry in brokers.split(","):
        entry = entry.strip()
        if not entry:
            continue
        if entry.startswith("["):  # bracketed IPv6: [addr] or [addr]:port
            addr, _, rest = entry[1:].partition("]")
            if rest.startswith(":") and rest[1:].isdigit() and int(rest[1:]) <= 65535:
                out.append((addr, int(rest[1:])))
            else:
                out.append((addr, 9092))
            continue
        host, sep, port = entry.rpartition(":")
        if sep and port.isdigit() and int(port) <= 65535 and ":" not in host:
            out.append((host, int(port)))
        elif entry.endswith(":") and ":" not in entry[:-1]:
            out.append((entry[:-1], 9092))  # "h1:" — dangling separator
        else:
            out.append((entry, 9092))  # plain host or bare IPv6
    if not out:
        raise ValueError("Failed to create Kafka consumer: no brokers specified")
    return out


def validate_broker_connection(
    brokers: str, *, timeout: float = 5.0, connect=None
) -> None:
    """Bind-time broker reachability check — parity with the reference's
    eager consumer construction (kafquack_extension.cpp:112-129): there,
    an unreachable broker is a *plan-time* InvalidInputException
    ("Failed to create Kafka consumer: %s", cpp:128), not a deferred
    task failure.  Spark's Kafka source is lazy (nothing touches the
    broker until ``.load()`` plans offsets), so ``kafka_consumer(...,
    validate_connection=True)`` opts into the reference's fail-at-bind
    behavior.

    ``connect`` is injectable (defaults to ``socket.create_connection``)
    so the error path tests without a broker.  One reachable broker is
    enough — librdkafka also bootstraps from any live entry.
    """
    import socket

    if connect is None:
        connect = socket.create_connection
    errors: list[str] = []
    for host, port in _parse_broker_list(brokers):
        try:
            conn = connect((host, port), timeout)
        except OSError as e:
            errors.append(f"{host}:{port}: {e}")
            continue
        try:
            conn.close()
        except Exception:  # noqa: BLE001 — reachability already proven
            pass
        return
    raise ConnectionError(
        "Failed to create Kafka consumer: " + "; ".join(errors)
    )


class KafkaPollError(RuntimeError):
    """Reference-parity wrapper for a failure while fetching messages
    ('Error polling Kafka: %s', kafquack_extension.cpp:155)."""


class KafkaCommitError(RuntimeError):
    """Reference-parity wrapper for a failure while recording progress
    ('Error committing message: %s', kafquack_extension.cpp:202).  Under
    Spark, 'commit' is the checkpoint offset-log write, not a broker
    commit — same user-visible contract, different mechanism (the
    documented SURVEY §3.4 divergence)."""


def wrap_stream_error(exc: BaseException, *, phase: str) -> RuntimeError:
    """Map a streaming failure onto the reference's verbatim error texts.

    The reference surfaces exactly two runtime error shapes from its scan
    loop: poll failures (cpp:148-156) and commit failures (cpp:199-204).
    Spark raises ``StreamingQueryException`` for both; a caller that
    wants reference-identical messages routes the exception through here
    with ``phase='poll'`` (fetch/micro-batch planning) or
    ``phase='commit'`` (offset-log/checkpoint write).  Pure function —
    unit-testable without a broker.
    """
    cause = getattr(exc, "cause", None) or exc
    detail = str(cause)
    if phase == "poll":
        return KafkaPollError(f"Error polling Kafka: {detail}")
    if phase == "commit":
        return KafkaCommitError(f"Error committing message: {detail}")
    raise ValueError("phase must be either poll or commit")


def _subscribe_option(topic, is_pattern: bool) -> tuple[str, str]:
    """Superset of the reference's single-topic subscribe (cpp:126): a
    list subscribes to several topics, ``is_pattern`` to a regex."""
    if isinstance(topic, (list, tuple)):
        return "subscribe", ",".join(topic)
    if is_pattern:
        return "subscribePattern", topic
    return "subscribe", topic


def kafka_consumer(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    *,
    mode: str = "stream",
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    starting_timestamp: int | None = None,
    ending_timestamp: int | None = None,
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool | None = None,
    keep_raw: bool = False,
    validate_connection: bool = False,
    **named_params: Any,
) -> DataFrame:
    """The reference's table function as a DataFrame constructor.

    ``mode="stream"`` → unbounded ``readStream`` (the reference's
    non-terminating scan, cpp:145-157); ``mode="batch"`` → bounded
    ``spark.read`` between ``starting_offsets``/``ending_offsets``.
    ``starting_timestamp``/``ending_timestamp`` (epoch ms) push a
    time-range predicate down to the broker's offset index — the
    SURVEY §4.2 nice-to-have the reference refuses (its
    filter_pushdown=false, cpp:227): a ``timestamp >= X`` filter
    becomes a seek instead of a scan-and-discard.

    At scale: one Spark task per topic-partition (``min_partitions``
    oversplits hot partitions), offsets in the checkpoint WAL, no
    driver-side materialization.
    """
    security_protocol = named_params.pop("security_protocol", None)
    sasl_mechanism = named_params.pop("sasl_mechanism", None)
    username = named_params.pop("username", None)
    password = named_params.pop("password", None)
    topic_is_pattern = bool(named_params.pop("topic_is_pattern", False))
    sec_opts = _validate_options(
        security_protocol, sasl_mechanism, username, password, named_params
    )
    if mode not in ("stream", "batch"):
        raise ValueError("mode must be either stream or batch")
    if validate_connection:
        # reference parity: fail at bind, not at first poll (cpp:112-129)
        validate_broker_connection(brokers)

    opts = _reader_options(
        brokers=brokers,
        topic=topic,
        group_id=group_id,
        mode=mode,
        starting_offsets=starting_offsets,
        ending_offsets=ending_offsets,
        starting_timestamp=starting_timestamp,
        ending_timestamp=ending_timestamp,
        max_offsets_per_trigger=max_offsets_per_trigger,
        min_partitions=min_partitions,
        fail_on_data_loss=fail_on_data_loss,
        topic_is_pattern=topic_is_pattern,
        sec_opts=sec_opts,
    )
    reader = spark.readStream if mode == "stream" else spark.read
    reader = reader.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return _project_reference_schema(reader.load(), keep_raw=keep_raw)


def _reader_options(
    *,
    brokers: str,
    topic,
    group_id: str,
    mode: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    starting_timestamp: int | None = None,
    ending_timestamp: int | None = None,
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool | None = None,
    topic_is_pattern: bool = False,
    sec_opts: dict[str, str] | None = None,
) -> dict[str, str]:
    """The complete Kafka-source option dict — pure, broker-free,
    unit-testable (CLAUDE.md rule: keep broker-dependent config logic
    out of code paths that need a live ``.load()``)."""
    subscribe_opt, subscribe_val = _subscribe_option(topic, topic_is_pattern)
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": brokers,
        subscribe_opt: subscribe_val,
        "kafka.group.id": group_id,
    }
    opts.update(
        _offset_bound_options(
            mode, starting_offsets, ending_offsets, starting_timestamp, ending_timestamp
        )
    )
    if max_offsets_per_trigger is not None and mode == "stream":
        # production knob #1: bound micro-batch size so a backlogged topic
        # can't produce an unboundedly large first batch
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    if fail_on_data_loss is not None:
        # production knob #2: aged-out offsets (retention) — fail loudly
        # (True, Spark's default) or log-and-continue (False); the
        # reference inherits librdkafka's silent auto.offset.reset instead
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    opts.update(sec_opts or {})
    return opts


def with_decode_policy(raw: DataFrame, value_col: str = "value_raw") -> DataFrame:
    """UTF-8 decode policy for binary payloads (SURVEY §1.2 item 1).

    The reference reinterpret-casts raw bytes to VARCHAR with no charset
    validation (kafquack_extension.cpp:182-192), which can yield invalid
    VARCHARs in DuckDB.  We make the policy explicit: decode with
    replacement, and *flag* rows whose payload was not valid UTF-8 in
    the ``error`` column (errors-are-data, like the reference's
    transport errors).  Validity is detected JVM-side by re-encoding the
    decoded string — equal bytes ⇔ the payload was valid UTF-8; no UDF.
    """
    # CAST(binary AS STRING) passes raw bytes through (the reference's
    # reinterpret_cast); is_valid_utf8/make_valid_utf8 (Spark 4) detect
    # and repair — decode() would throw under ANSI on malformed input.
    valid = F.expr(f"is_valid_utf8(CAST({value_col} AS STRING))")
    return raw.withColumn("value", F.expr(f"make_valid_utf8(CAST({value_col} AS STRING))")).withColumn(
        "error",
        F.when(
            F.col(value_col).isNotNull() & ~valid,
            F.lit("Decode: payload is not valid UTF-8 (replacement applied)"),
        ).otherwise(F.col("error")),
    )


def kafka_producer(
    df: DataFrame,
    brokers: str,
    topic: str,
    *,
    key_col: str | None = "key",
    value_col: str = "value",
    checkpoint: str | None = None,
    **named_params: Any,
) -> "DataStreamWriter | DataFrameWriter":  # noqa: F821
    """The write path the reference lacks entirely (SURVEY §2.2 "sinks:
    none") — produce a DataFrame back to Kafka with the same option
    validation as :func:`kafka_consumer`.

    Returns the CONFIGURED writer (caller invokes ``.start()`` /
    ``.save()``) so tests can verify the full configuration without a
    broker.  Streaming input → ``writeStream`` (exactly-once with the
    checkpoint); batch input → ``df.write``.
    """
    security_protocol = named_params.pop("security_protocol", None)
    sasl_mechanism = named_params.pop("sasl_mechanism", None)
    username = named_params.pop("username", None)
    password = named_params.pop("password", None)
    sec_opts = _validate_options(
        security_protocol, sasl_mechanism, username, password, named_params
    )

    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    payload = df.select(*cols)

    writer = payload.writeStream if df.isStreaming else payload.write
    writer = (
        writer.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
    if df.isStreaming and checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in sec_opts.items():
        writer = writer.option(k, v)
    return writer


def register_topic_view(
    spark: SparkSession,
    view_name: str,
    brokers: str,
    topic: str,
    group_id: str,
    **kafka_params: Any,
) -> None:
    """SQL access path: bind a topic to a temp view, driver-side.

    ``register_topic_view(spark, "t", ...)`` then ``SELECT * FROM t`` is
    the Spark idiom for the reference's ``SELECT * FROM
    kafka_consumer(...)`` (kafquack_extension.cpp:223-229).  The view is
    LAZY — each SQL query against it plans a distributed Kafka scan with
    pushdown/pruning; nothing funnels through the driver (unlike a
    Python UDTF, which runs in an executor worker where no JVM session
    exists and could only ever stream rows through a single process).
    Accepts every :func:`kafka_consumer` keyword (mode, offsets,
    security, ...).
    """
    kafka_consumer(spark, brokers, topic, group_id, **kafka_params).createOrReplaceTempView(
        view_name
    )


def register(spark: SparkSession) -> None:
    """Expose SQL-callable names, mirroring extension load
    (kafquack_extension.cpp:207-243).

    The reference registers ``kafka_consumer`` but its README calls it
    ``kafquack`` (README.md:13 vs cpp:223) — we register BOTH, canonical
    first.  The SQL names are *dispatch shims*: a Python UDTF executes
    in an executor worker with no JVM-backed SparkSession, so it cannot
    launch the distributed Kafka read itself (it would also funnel every
    row through one Python process).  Calling them raises immediately
    with the supported route — :func:`register_topic_view`, which binds
    the same argument list to a lazily-planned temp view.
    """
    try:
        from pyspark.sql.functions import udtf  # Spark 3.5+/4.x
    except ImportError:  # pragma: no cover - older Spark
        return

    @udtf(returnType=KAFKA_MESSAGE_SCHEMA)
    class KafkaConsumerUDTF:
        def eval(self, brokers: str, topic: str, group_id: str):
            raise NotImplementedError(
                "kafka_consumer(...) cannot run as a SQL table function: a "
                "Python UDTF executes on an executor without a SparkSession "
                "and would serialize the whole topic through one process. "
                "Bind the topic to a view instead: "
                "register_topic_view(spark, 'msgs', brokers, topic, group_id) "
                "then SELECT * FROM msgs."
            )
            yield  # pragma: no cover — makes eval a generator, never reached

    spark.udtf.register("kafka_consumer", KafkaConsumerUDTF)
    spark.udtf.register("kafquack", KafkaConsumerUDTF)
