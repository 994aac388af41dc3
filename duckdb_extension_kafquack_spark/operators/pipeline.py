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
from .dedup import _duck_minhash_sql, _persisted_verified_pairs
from .text import _DUCK_QUALITY, quality_scores, token_counts

QUALITY_CUTOFF = 0.55


def curate(docs: DataFrame, quality_cutoff: float = QUALITY_CUTOFF) -> DataFrame:
    """documents → curated per-source accounting.

    Keeps docs with quality ≥ cutoff that are not a non-canonical member
    of a near-dup pair (doc2 side of any MinHash pair is dropped — doc1
    < doc2, so the smallest id of every cluster survives)."""
    q = quality_scores(docs).filter(F.col("quality_score") >= quality_cutoff)
    dupes = (
        _persisted_verified_pairs(docs).select(F.col("doc2").alias("doc_id")).distinct()
    )
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
    text_pairs = _persisted_verified_pairs(t["documents"]).select(
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


# ---------------------------------------------------------------------------
# dataset-card summary: the one-row corpus report
# ---------------------------------------------------------------------------


def _duck_summary_sql() -> str:
    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT)
           AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents
), q AS (
  SELECT CAST(COUNT(*) FILTER (WHERE quality_score >= {QUALITY_CUTOFF}) AS BIGINT)
           AS n_quality_pass,
         ROUND(SUM(quality_score) / COUNT(*), 6) AS mean_quality_r
  FROM ({_DUCK_QUALITY})
), p AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs,
         CAST(COUNT(DISTINCT doc2) AS BIGINT) AS n_droppable_docs
  FROM ({_duck_minhash_sql()})
)
SELECT base.n_docs, base.n_langs, base.n_sources, base.n_tokens, base.n_chars,
       q.n_quality_pass, q.mean_quality_r,
       p.n_near_dup_pairs, p.n_droppable_docs
FROM base CROSS JOIN q CROSS JOIN p
"""


@query("corpus_summary_card", _duck_summary_sql())
def corpus_summary_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card's numbers in ONE row: corpus dimensions (docs /
    tokens / chars / languages / sources), quality-gate pass count and
    mean score, and the near-dup footprint (verified pairs, droppable
    docs) — what a pipeline run publishes next to the shards.

    Three independent 1-row aggregates (corpus scan, quality scan, LSH
    pair relation) cross-joined as broadcasts — the exact in-plan
    scalar-total shape the repo mandates (no driver-side counts).  The
    mean quality is the one order-dependent float sum (rounded@6); all
    other outputs are exact integers."""
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    q = quality_scores(docs).agg(
        F.count(F.when(F.col("quality_score") >= QUALITY_CUTOFF, 1)).alias(
            "n_quality_pass"
        ),
        F.round(F.sum("quality_score") / F.count(F.lit(1)), 6).alias("mean_quality_r"),
    )
    pairs = _persisted_verified_pairs(docs)
    p = pairs.agg(
        F.count(F.lit(1)).alias("n_near_dup_pairs"),
        F.countDistinct("doc2").alias("n_droppable_docs"),
    )
    return base.crossJoin(F.broadcast(q)).crossJoin(F.broadcast(p))
