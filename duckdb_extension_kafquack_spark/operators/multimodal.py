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
