"""End-to-end corpus curation: the composed training-data pipeline.

quality-filter → near-dup removal (keep cluster canonical) → per-source
token accounting — the standard pre-training data flow, expressed as one
declarative plan so Catalyst fuses the stages (the quality features and
the dedup shingles both come off a single documents scan; nothing
materializes between stages unless explicitly persisted).

Scale: each stage is individually linear (expression-only features,
LSH-banded dedup); composing them adds no new shuffle beyond their own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from ..suite import query
from .dedup import _duck_minhash_sql, minhash_near_duplicates
from .text import _DUCK_QUALITY, quality_scores, token_counts

QUALITY_CUTOFF = 0.55


def curate(docs: DataFrame, quality_cutoff: float = QUALITY_CUTOFF) -> DataFrame:
    """documents → curated per-source accounting.

    Keeps docs with quality ≥ cutoff that are not a non-canonical member
    of a near-dup pair (doc2 side of any MinHash pair is dropped — doc1
    < doc2, so the smallest id of every cluster survives)."""
    q = quality_scores(docs).filter(F.col("quality_score") >= quality_cutoff)
    dupes = minhash_near_duplicates(docs).select(F.col("doc2").alias("doc_id")).distinct()
    kept = q.select("doc_id").join(dupes, "doc_id", "left_anti")
    toks = token_counts(docs)
    return (
        kept.join(toks, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("total_tokens"),
            F.sum("bpe_pieces").cast("long").alias("total_pieces"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


_DUCK_CURATE = f"""
WITH quality AS (
{_DUCK_QUALITY}
), dup_pairs AS (
{_duck_minhash_sql()}
), dropped AS (
  SELECT DISTINCT doc2 AS doc_id FROM dup_pairs
), kept AS (
  SELECT q.doc_id FROM quality q
  WHERE q.quality_score >= {QUALITY_CUTOFF}
    AND q.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(d.text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens,
       CAST(SUM(len(regexp_extract_all(d.text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS total_pieces,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars
FROM kept k JOIN documents d ON d.doc_id = k.doc_id
GROUP BY d.source
"""


@query("corpus_curation", _DUCK_CURATE)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate(load_tables(spark, sf_dir)["documents"])
