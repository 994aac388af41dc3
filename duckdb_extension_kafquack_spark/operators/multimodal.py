"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride Spark as ``BinaryType`` columns with a typed
metadata struct alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so payload bytes never leave the executor
(and never hit the driver).  The actual codec step is STUBBED — the
image/audio libraries are not in this container — behind
``decode_stub=True`` (deterministic fake features) or a clearly-marked
``NotImplementedError``; everything Spark-side (schema, batching,
partitioning, UDF signature) is real and tested.

At 100 TB: payloads dominate storage → the metadata projection must
prune them (parquet column pruning does, verified in tests), and the
decode stage is a map-only ``mapInPandas`` with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import load_tables
from ..suite import query

#: payload + typed metadata — the multimodal column convention.
BLOB_SCHEMA = StructType(
    [
        StructField("blob_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("blob_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("first_byte", IntegerType(), True),
    ]
)


def blobs_from_documents(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Materialize a multimodal blob table from the documents fixture:
    payload = UTF-8 bytes of the text (a stand-in for image bytes)."""
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.lit(mime).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
    )


def decode_features(blobs: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched decode / feature-extract over payload bytes.

    With ``decode_stub=True`` emits deterministic fake image dims derived
    from payload length (so tests and oracles are stable); with
    ``decode_stub=False`` raises ``NotImplementedError`` where a real
    codec (PIL/ffmpeg) would run — the Spark plumbing around it is
    identical either way.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; run with decode_stub=True"
                )
            n = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "first_byte": pdf["payload"].map(
                        lambda b: int(b[0]) if b else None
                    ).astype("int32"),
                }
            )

    return blobs.mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("blob_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("blob_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_hash", StringType(), False),
    ]
)


def resize_images(
    blobs: DataFrame, target_w: int = 224, target_h: int = 224, *, decode_stub: bool = True
) -> DataFrame:
    """Image resize as an Arrow-batched map stage (1 row in → 1 row out,
    payload transformed executor-side).  The codec is STUBBED (no image
    libs in this container): the fake 'resize' deterministically truncates
    the payload proportionally — the Spark plumbing (binary in/out
    schema, batching, no shuffle) is the real part.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires codec libraries not present "
                    "in this environment; run with decode_stub=True"
                )
            out_len = (target_w * target_h) // 512  # fake byte budget
            payload = pdf["payload"].map(
                lambda b: bytes(b[:out_len]) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "payload": payload,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": payload.map(lambda b: len(b) if b else 0).astype("int64"),
                }
            )

    return blobs.mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(
    blobs: DataFrame, every_ms: int = 1000, max_frames: int = 8, *, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: 1 blob row in → N frame rows out (the fan-out
    shape `mapInPandas` supports natively).  Frame extraction is STUBBED
    deterministically (slices of the payload stand in for decoded frames);
    schema/batching/ordering are real.
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires video codecs not present "
                    "in this environment; run with decode_stub=True"
                )
            rows = {k: [] for k in ("blob_id", "frame_no", "frame_ts_ms", "frame_payload", "frame_hash")}
            for blob_id, payload in zip(pdf["blob_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(data) // 64))
                step = max(1, len(data) // n) if data else 1
                for i in range(n):
                    frame = data[i * step : i * step + 64]
                    rows["blob_id"].append(blob_id)
                    rows["frame_no"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_payload"].append(frame)
                    rows["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    """
WITH blobs AS (
  SELECT doc_id AS blob_id, encode(text) AS payload FROM documents
)
SELECT blob_id, COUNT(*) AS n_frames, MAX(frame_ts_ms) AS last_ts_ms
FROM (
  SELECT blob_id,
         LEAST(8, GREATEST(1, octet_length(payload) // 64)) AS n
  FROM blobs
), LATERAL (SELECT unnest(range(0, n)) AS frame_no, unnest(range(0, n)) * 1000 AS frame_ts_ms)
GROUP BY blob_id
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out summarized per blob (count + last ts) so
    the deterministic stub is oracle-checkable."""
    docs = load_tables(spark, sf_dir)["documents"]
    frames = sample_frames(blobs_from_documents(docs))
    return frames.groupBy("blob_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ts_ms").alias("last_ts_ms"),
    )


@query(
    "multimodal_meta",
    """
SELECT doc_id AS blob_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash,
       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata + stub-decoded features, joined back — exercises the
    full multimodal path (binary encode → mapInPandas → metadata join)
    while staying oracle-checkable (features are deterministic)."""
    docs = load_tables(spark, sf_dir)["documents"]
    blobs = blobs_from_documents(docs)
    feats = decode_features(blobs).select("blob_id", "width", "height", "first_byte")
    meta = blobs.select("blob_id", "mime", "n_bytes", "content_hash")
    return meta.join(feats, "blob_id")
