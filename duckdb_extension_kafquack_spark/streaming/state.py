"""Custom stateful streaming operators (applyInPandasWithState).

Spark's arbitrary-stateful API is the extension point the reference
cannot offer at all (DuckDB table functions are stateless per-scan; the
reference's only state is the Kafka group offset,
kafquack_extension.cpp:199-204).  Implemented here:

* :func:`stateful_user_stats` — per-user running aggregate with explicit
  GroupState (count / sum / first / last event-time), the canonical
  custom-state shape (fraud counters, sessionizers, rate trackers).
* :func:`dedup_within_watermark` — bounded-state streaming dedup keyed
  on the Kafka identity (partition, offset): replays of the same message
  inside the watermark are dropped — upgrade of the reference's
  at-most-once delivery to effectively-once within the horizon.

State lives in the state store (RocksDB-able via
``spark.sql.streaming.stateStore.providerClass``), partitioned by key —
scales horizontally with executors; the watermark bounds its size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..suite import query
from .windows import _events_stream, run_stream_to_table

USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("first_ts", TimestampType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), True),
        StructField("first_ts", TimestampType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, first_ts, last_ts = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, total, first_ts, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def stateful_user_stats(events_stream: DataFrame) -> DataFrame:
    """Running per-user stats with explicit GroupState — survives across
    micro-batches, emits the updated row per key per batch."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query(
    "streaming_stateful_user_stats",
    """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
""",
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState over the event stream, drained availableNow
    (single source file → single micro-batch → final state rows); oracle
    is the equivalent batch aggregate."""
    out = stateful_user_stats(_events_stream(spark, sf_dir))
    run_stream_to_table(out, "stateful_user_stats", "update")
    return spark.table("stateful_user_stats")


@query(
    "streaming_kafka_topic_stats",
    """
SELECT CAST(user_id % 4 AS INTEGER) AS "partition",
       time_bucket(INTERVAL '6 hours', ts) AS window_start,
       COUNT(*) AS n_messages,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(event_id) AS max_offset
FROM events
WHERE event_id % 101 <> 0 AND event_id % 97 <> 0
GROUP BY 1, 2
""",
)
def streaming_kafka_topic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole deployment, streaming-native: kafka-shaped
    source → error-row filter → JSON payload decode → event-time windowed
    aggregation per partition — `SELECT ... FROM kafka_consumer(...)`
    upgraded to an unbounded windowed query.  Null-timestamp rows (the
    reference's broker-sent-no-timestamp case) are excluded by the
    event-time window itself — the oracle mirrors that."""
    from ..sources.synthetic import synthetic_kafka_stream

    km = synthetic_kafka_stream(spark, sf_dir)
    parsed = (
        km.filter(F.col("error").isNull() & F.col("timestamp").isNotNull())
        .withColumn("k", F.get_json_object("value", "$.k").cast("int"))
        .withWatermark("timestamp", "1 day")
    )
    agg = parsed.groupBy(
        F.col("partition"), F.window("timestamp", "6 hours").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("offset").alias("max_offset"),
    )
    out = agg.select(
        "partition",
        F.col("w.start").alias("window_start"),
        "n_messages",
        "sum_k",
        "max_offset",
    )
    run_stream_to_table(out, "kafka_topic_stats", "complete")
    return spark.table("kafka_topic_stats")


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("funnel_stage", LongType(), False),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType(), False),
        StructField("last_ts", TimestampType(), True),
    ]
)


def _update_funnel(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from ..operators.events import FUNNEL_STEPS

    (user_id,) = key
    stage, last_ts = state.get if state.exists else (0, None)
    pdf = pd.concat(list(batches), ignore_index=True)
    # (ts, event_type) order matches the batch fold's sorted struct array,
    # so tie handling is identical; the strictly-greater guard makes the
    # walk insensitive to events replayed across micro-batches
    pdf = pdf.sort_values(["ts", "event_type"], ignore_index=True)
    for ts, etype in zip(pdf["ts"], pdf["event_type"]):
        if stage < len(FUNNEL_STEPS) and etype == FUNNEL_STEPS[stage] and (
            stage == 0 or ts > last_ts
        ):
            stage += 1
            last_ts = ts
    state.update((stage, last_ts))
    yield pd.DataFrame({"user_id": [user_id], "funnel_stage": [stage]})


def streaming_funnel_stages(events_stream: DataFrame) -> DataFrame:
    """Incremental funnel tracking: per-user GroupState carries (stage
    reached, its event time) across micro-batches — the streaming twin
    of :func:`..operators.events.funnel_stages`.  State is 2 fields per
    user regardless of event volume; keys partition across executors."""
    from ..operators.events import FUNNEL_STEPS

    return (
        events_stream.filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _streaming_funnel_oracle() -> str:
    from ..operators.events import _DUCK_FUNNEL_SQL

    return _DUCK_FUNNEL_SQL


@query("streaming_funnel", _streaming_funnel_oracle())
def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stages computed by the stateful stream, then rolled up —
    hash-checked against the same sequential-min SQL oracle as the batch
    funnel (identical semantics, incremental execution)."""
    from ..operators.events import FUNNEL_WINDOW

    ev = _events_stream(spark, sf_dir).filter(
        (F.col("ts") >= F.lit(FUNNEL_WINDOW[0]).cast("timestamp"))
        & (F.col("ts") < F.lit(FUNNEL_WINDOW[1]).cast("timestamp"))
    )
    out = streaming_funnel_stages(ev)
    run_stream_to_table(out, "streaming_funnel_stages", "update")
    return (
        spark.table("streaming_funnel_stages")
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def dedup_within_watermark(kafka_stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Effectively-once within the watermark horizon: drop replays of the
    same (topic, partition, offset) — bounded state, unlike a global
    dropDuplicates."""
    return kafka_stream.withWatermark("timestamp", delay).dropDuplicatesWithinWatermark(
        ["topic", "partition", "offset"]
    )


@query(
    "streaming_dedup_within_watermark",
    """
SELECT CAST(user_id % 4 AS INTEGER) AS "partition", COUNT(*) AS n
FROM events
WHERE event_id % 101 <> 0
GROUP BY 1
""",
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-identity streaming dedup on the synthetic stream (which has
    no true dups → output = non-error message counts, batch-checkable;
    null-event-time rows pass through the dedup state unexpired)."""
    from ..sources.synthetic import synthetic_kafka_stream

    km = synthetic_kafka_stream(spark, sf_dir)
    deduped = dedup_within_watermark(km.filter(F.col("error").isNull()))
    agg = deduped.groupBy("partition").agg(F.count(F.lit(1)).alias("n"))
    run_stream_to_table(agg, "dedup_within_wm", "complete")
    return spark.table("dedup_within_wm")


# ---------------------------------------------------------------------------
# streaming KMV: the bottom-k sketch as explicit per-source GroupState
# ---------------------------------------------------------------------------

_KMV_OUT_SCHEMA = "source string, sk array<bigint>"
_KMV_STATE_SCHEMA = "sk array<bigint>"


def _update_kmv(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge each micro-batch's key hashes into the per-source bottom-k —
    state is ≤ k BIGINTs per source FOREVER (the sketch point: the exact
    distinct set grows with the vocabulary, the sketch does not).  The
    merge is the same set algebra as the batch sketch: union → distinct
    → k smallest, associative and duplicate-idempotent, so replays and
    batch boundaries cannot change the converged sketch."""
    import numpy as np

    from ..operators.sketch import KMV_K

    (source,) = key
    cur = np.asarray(state.get[0] if state.exists else [], dtype=np.int64)
    for pdf in batches:
        cur = np.unique(
            np.concatenate([cur, pdf["h"].to_numpy(dtype=np.int64)])
        )[:KMV_K]
    state.update((cur.tolist(),))
    yield pd.DataFrame({"source": [source], "sk": [cur.tolist()]})


def _duck_streaming_kmv_sql() -> str:
    from ..operators.sketch import _duck_kmv_sql

    return _duck_kmv_sql()


@query("streaming_kmv_distinct", _duck_streaming_kmv_sql())
def streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV bottom-k sketch built INCREMENTALLY over the live document
    stream via ``applyInPandasWithState`` — bottom-k is not a monotone
    built-in aggregate (unlike HLL's max-per-register), so the sketch is
    explicit GroupState: ≤ k hashes per source no matter how long the
    stream runs.  Drained per-source sketches are then merged to the
    global ``__all__`` row IN BATCH (pure set algebra off ~|sources|
    rows), and every emitted update row is merge-folded per source —
    sound because merging any earlier partial sketch into the final one
    is a no-op (an earlier bottom-k member smaller than the final kth
    hash is necessarily IN the final sketch), so multi-batch update-mode
    output converges to exactly the batch sketch.  Value-equal to the
    fully-batch :func:`..operators.sketch.kmv_distinct_by_source`
    oracle, global row included."""
    from ..functions.hashing import spark_hash64
    from ..operators.dedup import _SPARK_SHINGLES
    from ..operators.sketch import KMV_K, _kmv_stats
    from .windows import _docs_stream

    stream_keys = (
        _docs_stream(spark, sf_dir)
        .select(
            "source", F.filter(F.split("text", " "), lambda t: t != "").alias("toks")
        )
        .select("source", F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"))
        .select("source", spark_hash64(F.col("tok")).alias("h"))
    )
    sketches = stream_keys.groupBy("source").applyInPandasWithState(
        _update_kmv,
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_stream_to_table(sketches, "stream_kmv_sketches", "update")
    drained = spark.table("stream_kmv_sketches")

    merge = f"slice(array_sort(array_distinct(flatten(collect_list(sk)))), 1, {KMV_K})"
    per_src = drained.groupBy("source").agg(F.expr(merge).alias("sk"))
    merged = (
        per_src.select("sk")
        .agg(F.expr(merge).alias("sk"))
        .select(F.lit("__all__").alias("source"), "sk")
    )
    return _kmv_stats(per_src.unionByName(merged))


# ---------------------------------------------------------------------------
# streaming doc transitions: cross-batch journey stitching as GroupState
# ---------------------------------------------------------------------------

_TRANS_OUT_SCHEMA = "doc_from bigint, doc_to bigint, n bigint"
_TRANS_STATE_SCHEMA = "ts_us bigint, event_id bigint, doc_id bigint"


def _update_doc_transitions(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit this batch's new doc→doc transitions for one user and carry
    the LAST engaged event as state, so the pair spanning a micro-batch
    boundary is stitched instead of lost — state is ONE (ts, event_id,
    doc) row per user forever.  Events are sorted (ts_us, event_id)
    within the batch — the same total order as the batch operator's
    window — and each transition is emitted in exactly the batch that
    contains its LATER event, so summing all update-mode emissions
    equals the batch count.  Per-user event-time-ordered arrival across
    batches (which the availableNow and prefix-split harnesses provide)
    is a PRECONDITION, and it is enforced: a batch whose earliest
    (ts_us, event_id) precedes the carried state raises instead of
    silently producing wrong counts."""
    rows = [pdf for pdf in batches if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows).sort_values(["ts_us", "event_id"], kind="mergesort")
    seq = list(
        zip(
            pdf["ts_us"].astype("int64"),
            pdf["event_id"].astype("int64"),
            pdf["doc_id"].astype("int64"),
        )
    )
    if state.exists:
        carried = tuple(int(x) for x in state.get)
        # The stitch is only sound if the carried event really is the
        # earliest: an arriving event OLDER than the carried state means
        # the harness/fixture violated per-user event-time-ordered
        # delivery, and silently prepending would corrupt the counts
        # (the boundary transition was attributed to the wrong pair).
        # Fail loudly instead — update-mode emissions cannot retract.
        if seq and seq[0][:2] < carried[:2]:
            raise ValueError(
                "streaming_doc_transitions: out-of-order arrival for "
                f"user {key[0]!r}: batch min (ts_us, event_id)="
                f"{seq[0][:2]} precedes carried state {carried[:2]}; "
                "per-user event-time-ordered delivery is a precondition "
                "of the cross-batch stitch"
            )
        seq = [carried] + seq
    counts: dict[tuple[int, int], int] = {}
    for (_, _, d1), (_, _, d2) in zip(seq, seq[1:]):
        if d1 != d2:
            counts[(d1, d2)] = counts.get((d1, d2), 0) + 1
    state.update(tuple(int(x) for x in seq[-1]))
    if counts:
        ks = sorted(counts)
        yield pd.DataFrame(
            {
                "doc_from": pd.Series([a for a, _ in ks], dtype="int64"),
                "doc_to": pd.Series([b for _, b in ks], dtype="int64"),
                "n": pd.Series([counts[k] for k in ks], dtype="int64"),
            }
        )


def _duck_streaming_transitions_sql() -> str:
    from ..operators.events import _DUCK_DOC_TRANSITIONS_SQL

    return _DUCK_DOC_TRANSITIONS_SQL


@query("streaming_doc_transitions", _duck_streaming_transitions_sql())
def streaming_doc_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc→doc transition miner over the LIVE event stream: journeys
    are stitched ACROSS micro-batches by carrying each user's last
    engaged event as explicit GroupState (a window's ``lead`` cannot
    reach into the previous batch — this is what custom stateful
    processing is for).  State is one row per user regardless of stream
    length; each batch emits only its new transitions, so the drained
    update-mode rows SUM to the batch counts, and the shared ranking
    tail (:func:`..operators.events._rank_transitions`) makes the live
    result value-equal to the fully-batch oracle."""
    from ..operators.events import _rank_transitions

    ref = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("doc_id"),
        )
        .filter(F.col("doc_id").isNotNull())
    )
    trans = ref.groupBy("user_id").applyInPandasWithState(
        _update_doc_transitions,
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_stream_to_table(trans, "stream_doc_transitions", "update")
    pairs = (
        spark.table("stream_doc_transitions")
        .groupBy("doc_from", "doc_to")
        .agg(F.sum("n").cast("bigint").alias("n_transitions"))
    )
    return _rank_transitions(pairs)
