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


def _duck_ensemble_sql() -> str:
    from .similarity import _DUCK_COS_AC, NEAR_DUP_COSINE

    return f"""
WITH text_pairs AS (
  SELECT doc1 AS id1, doc2 AS id2 FROM ({_duck_minhash_sql()})
), emb_pairs AS (
  SELECT a.vec_id AS id1, c.vec_id AS id2
  FROM embeddings a JOIN embeddings c ON a.vec_id < c.vec_id
  WHERE {_DUCK_COS_AC} >= {NEAR_DUP_COSINE}
), unioned AS (
  SELECT id1, id2, 1 AS from_text, 0 AS from_embedding FROM text_pairs
  UNION ALL
  SELECT id1, id2, 0 AS from_text, 1 AS from_embedding FROM emb_pairs
)
SELECT id1, id2,
       CAST(MAX(from_text) AS INTEGER) AS from_text,
       CAST(MAX(from_embedding) AS INTEGER) AS from_embedding
FROM unioned GROUP BY id1, id2
"""


@query("dedup_ensemble", _duck_ensemble_sql())
def dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup candidates: the union of the lexical signal
    (MinHash-LSH over shingles) and the semantic signal (embedding
    cosine), tagged per source — the production pattern where neither
    signal alone has full recall.  Both branches reuse their operators
    unchanged; one groupBy merges the verdicts."""
    from pyspark.sql import functions as F

    from .similarity import embedding_near_duplicates

    t = load_tables(spark, sf_dir)
    text_pairs = minhash_near_duplicates(t["documents"]).select(
        F.col("doc1").alias("id1"),
        F.col("doc2").alias("id2"),
        F.lit(1).alias("from_text"),
        F.lit(0).alias("from_embedding"),
    )
    emb_pairs = embedding_near_duplicates(t["embeddings"]).select(
        "id1", "id2", F.lit(0).alias("from_text"), F.lit(1).alias("from_embedding")
    )
    return (
        text_pairs.unionByName(emb_pairs)
        .groupBy("id1", "id2")
        .agg(
            F.max("from_text").cast("int").alias("from_text"),
            F.max("from_embedding").cast("int").alias("from_embedding"),
        )
    )
