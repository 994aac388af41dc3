"""Count-min sketch: sublinear frequency estimation, Spark-first.

The classic streaming sketch as a distributed aggregation: d hash rows ×
w buckets of counters built in ONE groupBy over the exploded token
stream (the sketch is a tiny (d·w)-row table regardless of corpus
size — THE point at 100 TB: frequency queries against d·w counters, not
a billion-row group-by).  Estimates are the min over the d counters a
key hashes to; overestimation-only by construction.

Hashes are the cross-engine md5 family (functions/hashing.py), so the
DuckDB oracle reproduces the sketch — and therefore every estimate —
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duck_hash64, spark_hash64
from ..session import load_tables
from ..suite import query

CMS_DEPTH = 4
CMS_WIDTH = 256


def _token_stream(docs: DataFrame) -> DataFrame:
    """(tok) with repetition — the multiset the sketch summarizes."""
    return docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok")
    )


def cms_build(items: DataFrame, col: str = "tok", depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """The sketch: (row, bucket, counter) with depth·width rows total.
    One explode (d per item) + one groupBy — partial aggregation does
    ~everything map-side since the key space is d·w."""
    rows = [
        F.struct(
            F.lit(d).alias("row"),
            (spark_hash64(F.col(col), 1000 + d) % width).cast("int").alias("bucket"),
        )
        for d in range(depth)
    ]
    return (
        items.select(F.explode(F.array(*rows)).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str = "tok",
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point estimates: min over the d counters each key hashes into.
    The keys side is small (a query set) → broadcast join against the
    tiny sketch."""
    rows = [
        F.struct(
            F.lit(d).alias("row"),
            (spark_hash64(F.col(col), 1000 + d) % width).cast("int").alias("bucket"),
        )
        for d in range(depth)
    ]
    key_buckets = keys.select(
        col, F.explode(F.array(*rows)).alias("rb")
    ).select(col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        key_buckets.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("counter").alias("cms_estimate"))
    )


def _duck_cms_sql() -> str:
    hash_rows = "\nUNION ALL\n".join(
        f"SELECT tok, {d} AS row, CAST({duck_hash64('tok', 1000 + d)} % {CMS_WIDTH} AS INTEGER) AS bucket FROM toks"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
), hashed AS (
{hash_rows}
), sketch AS (
  SELECT row, bucket, COUNT(*) AS counter FROM hashed GROUP BY row, bucket
), exact AS (
  SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok
), key_buckets AS (
  SELECT DISTINCT tok, row, bucket FROM hashed
), est AS (
  SELECT kb.tok, MIN(s.counter) AS cms_estimate
  FROM key_buckets kb JOIN sketch s USING (row, bucket)
  GROUP BY kb.tok
)
SELECT e.tok, x.exact_count, e.cms_estimate,
       CAST(e.cms_estimate - x.exact_count AS BIGINT) AS overestimate
FROM est e JOIN exact x USING (tok)
"""


HH_PHI_PCT = 1  # heavy hitter ⇔ frequency ≥ 1% of the stream


def _duck_heavy_hitters_sql() -> str:
    hash_rows = "\nUNION ALL\n".join(
        f"SELECT tok, {d} AS row, CAST({duck_hash64('tok', 1000 + d)} % {CMS_WIDTH} AS INTEGER) AS bucket FROM toks"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
), total AS (
  SELECT COUNT(*) AS n FROM toks
), hashed AS (
{hash_rows}
), sketch AS (
  SELECT row, bucket, COUNT(*) AS counter FROM hashed GROUP BY row, bucket
), est AS (
  SELECT kb.tok, MIN(s.counter) AS cms_estimate
  FROM (SELECT DISTINCT tok, row, bucket FROM hashed) kb
  JOIN sketch s USING (row, bucket)
  GROUP BY kb.tok
), candidates AS (
  -- integer-only threshold: 100·est ≥ n  ⇔  est ≥ 1% of stream
  SELECT e.tok, e.cms_estimate, t.n FROM est e, total t
  WHERE 100 * e.cms_estimate >= {HH_PHI_PCT} * t.n
), verified AS (
  SELECT c.tok, x.exact_count, c.cms_estimate, c.n
  FROM candidates c
  JOIN (SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok) x USING (tok)
)
SELECT tok, exact_count, CAST(cms_estimate AS BIGINT) AS cms_estimate,
       (100 * exact_count >= {HH_PHI_PCT} * n) AS is_true_hh
FROM verified
"""


def heavy_hitters_from_sketch(sketch: DataFrame, stream: DataFrame) -> DataFrame:
    """The CMS-prune → exact-verify tail, shared by the batch and
    streaming heavy-hitter queries (one threshold, one output shape —
    the two queries share one oracle and must never drift).  The
    threshold compares 100·count ≥ φ·N in pure integers — no float
    frontier cross-engine."""
    total = stream.agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, stream.distinct())
    candidates = est.join(F.broadcast(total)).filter(
        100 * F.col("cms_estimate") >= HH_PHI_PCT * F.col("n")
    )
    exact = (
        stream.join(F.broadcast(candidates.select("tok")), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return candidates.join(exact, "tok").select(
        "tok",
        "exact_count",
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (100 * F.col("exact_count") >= HH_PHI_PCT * F.col("n")).alias("is_true_hh"),
    )


@query("heavy_hitters", _duck_heavy_hitters_sql())
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters (≥1% of the token stream) by sketch-prune →
    exact-verify.  At 100 TB the exact global top-k over billions of
    distinct keys is a full-stream shuffle; here the CMS (d·w counters,
    overestimate-only → NO false negatives) prunes the verify set to the
    few candidate keys first, so the exact pass counts only candidates."""
    docs = load_tables(spark, sf_dir)["documents"]
    stream = _token_stream(docs)
    return heavy_hitters_from_sketch(cms_build(stream), stream)


@query("cms_frequency_estimates", _duck_cms_sql())
def cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch every token's frequency and compare to the exact count —
    overestimate ≥ 0 always (CMS guarantee), exact for heavy hitters at
    this width."""
    docs = load_tables(spark, sf_dir)["documents"]
    stream = _token_stream(docs)
    sketch = cms_build(stream)
    keys = stream.distinct()
    est = cms_estimate(sketch, keys)
    exact = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    return exact.join(est, "tok").select(
        "tok",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).cast("long").alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: constant-size membership sketch + false-positive audit
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 4     # hash functions
BLOOM_SEED = 2000
BLOOM_MEMBER_SOURCE = "src0"  # the member set: shingles of one source


def _shingle_stream(docs: DataFrame) -> DataFrame:
    """Word-3-gram shingles WITH repetition (callers .distinct() as
    needed) — the key space the filter summarizes (unigrams are too few
    on this vocabulary to exercise false positives)."""
    from .dedup import _SPARK_SHINGLES

    return (
        docs.select(F.filter(F.split("text", " "), lambda t: t != "").alias("toks"))
        .select(F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"))
    )


def bloom_bits(col: str = "tok", m: int = BLOOM_M, k: int = BLOOM_K) -> F.Column:
    """The k bit positions of a key as an array column — the ONE place
    the (seed, m, k) hash family lives; build, probe, and the streaming
    gate all derive their bits from here so they can never diverge."""
    return F.array(*[
        (spark_hash64(F.col(col), BLOOM_SEED + i) % m).cast("int")
        for i in range(k)
    ])


def bloom_build(keys: DataFrame, col: str = "tok",
                m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """The filter as a relation: one row per SET bit (≤ m rows total,
    regardless of corpus size — the whole point at 100 TB: membership
    state is ~m bits, built with one map-side-combined groupBy)."""
    return keys.select(F.explode(bloom_bits(col, m, k)).alias("bit")).distinct()


def bloom_bitmap_words(keys: DataFrame, col: str = "tok",
                       m: int = BLOOM_M, k: int = BLOOM_K) -> list[int]:
    """The filter as ceil(m/64) packed BIGINT words, collected driver-side.

    The in-plan reduce is a map-side-combined ``groupBy(word index)`` +
    ``BIT_OR`` of the shifted bit, so ≤ m/64 rows reach the driver no
    matter how large the member corpus is — bounded by the DESIGN
    CONSTANT m, never by data (the bounded-collect invariant holds by
    construction).  The word list then embeds in the probe plan as a
    literal array: see :func:`bloom_probe_bitmap`."""
    bits = keys.select(F.explode(bloom_bits(col, m, k)).alias("bit"))
    rows = (
        bits.groupBy((F.col("bit") / F.lit(64)).cast("int").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, bit % 64))").alias("word"))
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_probe_bitmap(words: list[int], keys: DataFrame, col: str = "tok",
                       m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Map-side Bloom probe: the packed filter rides the plan as a
    ceil(m/64)-element BIGINT array literal and each key tests its k bit
    positions with pure expression work (``element_at`` the word,
    ``shiftright``, mask) — NO join, NO shuffle on the probe side at
    all.  This is the right physical shape whenever the filter fits a
    broadcast (it always does — m bits is the sketch's whole point):
    the relational probe (:func:`bloom_probe`) still paid an explode ×k,
    a per-key count aggregation, and a join-back.  ``shiftright()``
    (not ``>>``, which does not parse inside HOF lambdas).  Emits the
    input columns + ``bloom_positive``."""
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    return (
        keys.withColumn("_bits", bloom_bits(col, m, k))
        .withColumn(
            "bloom_positive",
            F.expr(
                f"forall(_bits, b -> (shiftright(element_at({arr_sql},"
                f" CAST(b DIV 64 AS INT) + 1), CAST(b % 64 AS INT)) & 1L) = 1L)"
            ),
        )
        .drop("_bits")
    )


def bloom_probe(filter_bits: DataFrame, keys: DataFrame, col: str = "tok",
                m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Probe: a key is bloom-positive iff ALL k of its bits are set.
    The filter is ≤ m rows → broadcast; the probe side streams."""
    probed = keys.select(col, F.explode(bloom_bits(col, m, k)).alias("bit"))
    hits = (
        probed.join(F.broadcast(filter_bits), "bit", "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("bits_set"))
    )
    return (
        keys.join(hits, col, "left")
        .select(col, (F.coalesce(F.col("bits_set"), F.lit(0)) == k).alias("bloom_positive"))
    )


def _duck_bloom_sql() -> str:
    from .dedup import _DUCK_SHINGLES

    bit_rows = "\nUNION ALL\n".join(
        f"SELECT tok, CAST({duck_hash64('tok', BLOOM_SEED + i)} % {BLOOM_M} AS INTEGER) AS bit FROM member_keys"
        for i in range(BLOOM_K)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT tok, CAST({duck_hash64('tok', BLOOM_SEED + i)} % {BLOOM_M} AS INTEGER) AS bit FROM probe_keys"
        for i in range(BLOOM_K)
    )
    return f"""
WITH shingled AS (
  SELECT source, s.tok
  FROM (SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents) tokd,
       unnest({_DUCK_SHINGLES}) AS s(tok)
), member_keys AS (
  SELECT DISTINCT tok FROM shingled WHERE source = '{BLOOM_MEMBER_SOURCE}'
), probe_keys AS (
  SELECT DISTINCT tok FROM shingled
), filter_bits AS (
  SELECT DISTINCT bit FROM ({bit_rows}) b
), probed AS (
  SELECT p.tok,
         COUNT(*) FILTER (WHERE f.bit IS NOT NULL) AS bits_set
  FROM ({probe_rows}) p LEFT JOIN filter_bits f USING (bit)
  GROUP BY p.tok
), verdicts AS (
  SELECT p.tok,
         (pr.bits_set = {BLOOM_K}) AS bloom_positive,
         (m.tok IS NOT NULL) AS is_member
  FROM probe_keys p
  JOIN probed pr USING (tok)
  LEFT JOIN member_keys m USING (tok)
)
SELECT is_member, bloom_positive, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM verdicts GROUP BY is_member, bloom_positive
"""


@query("bloom_membership", _duck_bloom_sql())
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build an m-bit/k-hash filter over
    one source's shingle set, probe the whole corpus's shingles, and
    report the 2×2 (is_member × bloom_positive) contingency — the
    false-positive row is the sketch's measured FPR and the
    (member, negative) row MUST be absent (no false negatives, the Bloom
    guarantee; the oracle enforces it by hash equality).

    Scale: the filter is m BITS however large the member corpus is —
    packed to ceil(m/64) BIGINT words in-plan (:func:`bloom_bitmap_words`)
    and embedded in the probe plan as a literal, so membership tests
    against 100 TB of history cost pure map-side expression work: ONE
    token-scale shuffle total (the distinct-key aggregate, which also
    carries ``is_member`` as a ``max(source = member)`` so no join-back
    is needed), vs the relational probe's explode ×k + per-key count +
    two joins.  The classic production use is URL / doc-hash "seen
    before?" gating on ingest."""
    from .dedup import _SPARK_SHINGLES, _repartition_if_narrow

    docs = _repartition_if_narrow(load_tables(spark, sf_dir)["documents"])
    shingled = (
        docs.select("source", F.filter(F.split("text", " "), lambda t: t != "").alias("toks"))
        .select("source", F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"))
    )
    from pyspark import StorageLevel

    # ONE tokenize + distinct-key aggregate feeds BOTH jobs: the bitmap
    # build (member rows filtered from it) materializes the persisted
    # relation, and the probe re-reads it from cache — the corpus is
    # never tokenized twice.
    probe = (
        shingled.groupBy("tok")
        .agg(F.max(F.col("source") == BLOOM_MEMBER_SOURCE).alias("is_member"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    words = bloom_bitmap_words(probe.filter("is_member").select("tok"))
    verdicts = bloom_probe_bitmap(words, probe)
    return verdicts.groupBy("is_member", "bloom_positive").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )



# ---------------------------------------------------------------------------
# KMV (bottom-k) sketch: engine-exact distinct counts + mergeable samples
# ---------------------------------------------------------------------------

KMV_K = 64
# (k−1)·2^60 precomputed in Python and inlined as the SAME double
# literal in both engines (63·2^60 overflows BIGINT, but 63 has 6
# significant bits so the double is EXACT); the estimate is then
# literal / h_(k) with h_(k) an exact integer — one IEEE division,
# bit-identical cross-engine (the _HLL_ALPHA_NUM pattern).
_KMV_NUM = float((KMV_K - 1) << 60)


def _kmv_partials_fn(it):
    """Per-Arrow-batch partial bottom-k per source — bounded state
    (≤ k hashes per source per batch) regardless of corpus size."""
    import numpy as np

    for pdf in it:
        if len(pdf) == 0:
            continue
        yield (
            pdf.groupby("source")["h"]
            .apply(lambda s: np.unique(s.to_numpy())[:KMV_K].tolist())
            .reset_index(name="hs")
        )


def kmv_bottomk(keyed: DataFrame, k: int = KMV_K) -> DataFrame:
    """(source, sk) — the k smallest distinct 60-bit key hashes per
    source: the KMV / bottom-k sketch (Bar-Yossef et al., RANDOM 2002;
    estimator form per Beyer et al., SIGMOD 2007 — public knowledge).

    Unlike HLL it is simultaneously a distinct-count estimator AND a
    deterministic uniform sample of the key space (the sketch IS the k
    hash-smallest keys), and its merge is pure set algebra: union →
    distinct → bottom-k, associative and duplicate-idempotent, so
    per-partition partials lose nothing (any global bottom-k member is
    necessarily in its own partition's bottom-k — pigeonhole).

    Scale shape: partial bottom-k per Arrow batch via ``mapInPandas``
    (bounded state k·|sources| per batch — the built-in aggregates
    cannot express "k smallest" without collecting a group's whole key
    set, and a per-source Window would sort each source's entire
    vocabulary in ONE task), then a two-level merge tree —
    (source, salt) → source — so no single aggregation ever sees more
    than ~(partitions/32)·k, then 32·k, hash values per group.  The
    merge expression is the same everywhere:
    ``slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, k)``.

    Input: ``keyed`` must have columns (source string, h bigint) — the
    caller hashes with the cross-engine md5 family so the oracle
    reproduces the sketch exactly, duplicates welcome."""
    merge = f"slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, {k})"
    partials = keyed.mapInPandas(_kmv_partials_fn, "source string, hs array<bigint>")
    level1 = (
        partials.groupBy("source", F.expr("pmod(element_at(hs, 1), 32)").alias("salt"))
        .agg(F.expr(merge).alias("hs"))
    )
    return level1.groupBy("source").agg(F.expr(merge).alias("sk"))


def _kmv_stats(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """(source, n_sketch, kth_hash, kmv_estimate) from sketch arrays.
    Below k distinct keys the sketch IS the key set (exact count);
    at k the estimate is (k−1)·2^60 / h_(k)."""
    return sketches.select(
        "source",
        F.expr("CAST(size(sk) AS BIGINT)").alias("n_sketch"),
        F.expr("IF(size(sk) = 0, NULL, element_at(sk, size(sk)))").alias("kth_hash"),
        F.expr(
            f"CASE WHEN size(sk) < {k} THEN CAST(size(sk) AS DOUBLE) "
            f"ELSE {_KMV_NUM!r} / element_at(sk, size(sk)) END"
        ).alias("kmv_estimate"),
    )


def _duck_kmv_sql(k: int = KMV_K) -> str:
    from .dedup import _DUCK_SHINGLES

    est = (
        f"CASE WHEN len(sk) < {k} THEN len(sk)::DOUBLE "
        f"ELSE {_KMV_NUM!r} / sk[len(sk)] END"
    )
    return f"""
WITH tokd AS (
  SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents
), occ AS (
  SELECT source, {duck_hash64('s.tok')} AS h
  FROM tokd, unnest({_DUCK_SHINGLES}) AS s(tok)
), dh AS (
  SELECT DISTINCT source, h FROM occ
), per_src AS (
  SELECT source, list_sort(list(h))[1:{k}] AS sk FROM dh GROUP BY source
), gl AS (
  SELECT '__all__' AS source, list_sort(list(DISTINCT h))[1:{k}] AS sk FROM occ
), united AS (
  SELECT * FROM per_src UNION ALL SELECT * FROM gl
)
SELECT source, len(sk)::BIGINT AS n_sketch, sk[len(sk)] AS kth_hash,
       {est} AS kmv_estimate
FROM united
"""


@query("kmv_distinct_by_source", _duck_kmv_sql())
def kmv_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV sketches over the 3-gram shingle space, plus the
    GLOBAL sketch computed by MERGING the per-source sketches (never
    rescanning the corpus) — the oracle computes the global row from
    the raw key stream, so the hash match verifies the merge algebra
    by value, the same standard :func:`hll_merge_by_source` is held
    to."""
    from .dedup import _repartition_if_narrow

    docs = _repartition_if_narrow(load_tables(spark, sf_dir)["documents"])
    # the shared persisted sketch relation (one tokenize+hash definition,
    # column-reordered projection — see _persisted_kmv_sketches); ~|sources|
    # rows, so the merged-global branch re-reads the sketches instead of
    # re-scanning the corpus
    per_src = _persisted_kmv_sketches(docs).select("source", "sk")
    merged = (
        per_src.select(F.col("sk").alias("hs"))
        .agg(
            F.expr(
                f"slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, {KMV_K})"
            ).alias("sk")
        )
        .select(F.lit("__all__").alias("source"), "sk")
    )
    return _kmv_stats(per_src.unionByName(merged))


# ---------------------------------------------------------------------------
# KMV pairwise Jaccard: sketch-based source overlap (no shingle self-join)
# ---------------------------------------------------------------------------


def _kmv_keyed(docs: DataFrame) -> DataFrame:
    """(source, h) — the 60-bit-hashed 3-gram shingle stream, ONE
    definition shared by every KMV consumer so the sketches (and
    therefore the oracles) can never diverge on tokenization."""
    from .dedup import _SPARK_SHINGLES

    return (
        docs.select(
            "source", F.filter(F.split("text", " "), lambda t: t != "").alias("toks")
        )
        .select("source", F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"))
        .select("source", spark_hash64(F.col("tok")).alias("h"))
    )


def _persisted_kmv_sketches(docs: DataFrame) -> DataFrame:
    """Persisted column-REORDERED projection (sk, source) of the
    per-source bottom-k relation — reordered so CacheManager cannot
    substitute this cache into the unpersisted ``kmv_bottomk`` builder
    inside :func:`kmv_distinct_by_source` (the `_persisted_sig_sets`
    pattern).  The pairwise query self-joins the sketches, so without
    the persist each join side would re-run the corpus scan."""
    from pyspark import StorageLevel

    return (
        kmv_bottomk(_kmv_keyed(docs))
        .select("sk", "source")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def kmv_pairwise_jaccard(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise source-overlap estimates from the KMV sketches alone —
    the 100 TB complement to the EXACT ``source_overlap_matrix``: that
    operator self-joins the per-source distinct-shingle relation
    (corpus-sized), this one self-joins |sources| rows of ≤ k hashes.

    Estimator (Beyer et al., SIGMOD 2007, §4 — public knowledge): for a
    source pair, merge the two sketches and take ρ = the K_u-th smallest
    hash of the union sketch (K_u = min(k, |union|)).  Every common hash
    ≤ ρ is a uniform sample point of D(A)∪D(B) that landed in D(A)∩D(B),
    so Ĵ = |{h ∈ sk_A ∩ sk_B : h ≤ ρ}| / K_u and the intersection size
    estimate is Ĵ · |D(A)∪D(B)|^ with the union size from the standard
    KMV estimate (k−1)·2^60/ρ (exact count when K_u < k: both sketches
    were exhaustive, pigeonhole).

    Everything up to the final divisions is integer set algebra —
    deterministic and oracle-exact; `jaccard_est` is a single int/int
    IEEE division, `union_est` a single literal/int division, and
    `overlap_est` their product in the same operand order both engines
    — bit-identical cross-engine, never rounded.

    Scale shape: ONE corpus scan builds the persisted sketch relation
    (bounded k·|sources| rows); the pair join and all the array algebra
    run over |sources|² tiny rows — at 1000 sources that is ~500k rows
    of ≤64-element arrays, a single-task-sized relation, vs the exact
    matrix's shingle-inverted-index join that grows with the corpus."""
    sk_rel = _persisted_kmv_sketches(docs).select("source", "sk")
    pairs = (
        sk_rel.alias("a")
        .join(sk_rel.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.sk").alias("ska"),
            F.col("b.sk").alias("skb"),
        )
    )
    merged = pairs.select(
        "source_a",
        "source_b",
        F.expr(f"slice(array_sort(array_distinct(concat(ska, skb))), 1, {k})").alias("usk"),
        F.expr("array_intersect(ska, skb)").alias("isk"),
    ).select(
        "source_a",
        "source_b",
        F.expr("CAST(size(usk) AS BIGINT)").alias("k_union"),
        F.expr("element_at(usk, size(usk))").alias("rho"),
        F.expr(
            "CAST(size(filter(isk, h -> h <= element_at(usk, size(usk)))) AS BIGINT)"
        ).alias("common_in_union"),
    )
    est = merged.select(
        "*",
        (F.col("common_in_union") / F.col("k_union")).alias("jaccard_est"),
        F.expr(
            f"CASE WHEN k_union < {k} THEN CAST(k_union AS DOUBLE) "
            f"ELSE {_KMV_NUM!r} / rho END"
        ).alias("union_est"),
    )
    return est.select(
        "*", (F.col("jaccard_est") * F.col("union_est")).alias("overlap_est")
    )


def _duck_kmv_pairwise_sql(k: int = KMV_K) -> str:
    from .dedup import _DUCK_SHINGLES

    return f"""
WITH tokd AS (
  SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents
), occ AS (
  SELECT source, {duck_hash64('s.tok')} AS h
  FROM tokd, unnest({_DUCK_SHINGLES}) AS s(tok)
), dh AS (
  SELECT DISTINCT source, h FROM occ
), per_src AS (
  SELECT source, list_sort(list(h))[1:{k}] AS sk FROM dh GROUP BY source
), pr AS (
  SELECT a.source AS source_a, b.source AS source_b, a.sk AS ska, b.sk AS skb
  FROM per_src a JOIN per_src b ON a.source < b.source
), m AS (
  SELECT source_a, source_b,
         list_sort(list_distinct(list_concat(ska, skb)))[1:{k}] AS usk,
         list_intersect(ska, skb) AS isk
  FROM pr
), s AS (
  SELECT source_a, source_b,
         CAST(len(usk) AS BIGINT) AS k_union,
         usk[len(usk)] AS rho,
         CAST(len(list_filter(isk, h -> h <= usk[len(usk)])) AS BIGINT) AS common_in_union
  FROM m
), e AS (
  SELECT *, common_in_union / k_union AS jaccard_est,
         CASE WHEN k_union < {k} THEN k_union::DOUBLE ELSE {_KMV_NUM!r} / rho END AS union_est
  FROM s
)
SELECT source_a, source_b, k_union, rho, common_in_union,
       jaccard_est, union_est, jaccard_est * union_est AS overlap_est
FROM e
"""


@query("kmv_pairwise_jaccard", _duck_kmv_pairwise_sql())
def kmv_pairwise_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _repartition_if_narrow

    docs = _repartition_if_narrow(load_tables(spark, sf_dir)["documents"])
    return kmv_pairwise_jaccard(docs)


# ---------------------------------------------------------------------------
# HyperLogLog: engine-exact distinct-count sketch
# ---------------------------------------------------------------------------

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_REM_BITS = 60 - HLL_P      # low 52 bits feed the rank
_HLL_POW52 = 1 << HLL_REM_BITS
_HLL_POW53 = 1 << (HLL_REM_BITS + 1)
# alpha_256 · m² · 2^53 precomputed in Python and inlined as the SAME
# literal in both engines — the estimate is then literal / S with S an
# exact integer, so the double is bit-identical cross-engine
_HLL_ALPHA_NUM = 4.2399330249068963e+20
_HLL_LC_BOUND = 2.5 * HLL_M    # below this (and with empty registers): linear counting


def hll_distinct(keys: DataFrame, col: str = "tok") -> DataFrame:
    """Engine-exact HyperLogLog over a key column: registers are derived
    from the cross-engine 60-bit md5 hash (top 8 bits → register index,
    rank = leading-zero count of the low 52 bits via a string-bits trick
    both engines evaluate identically), so — unlike the engines' own
    HLL implementations, which never match each other — the ENTIRE
    sketch, its harmonic sum, and the final estimate reproduce
    bit-for-bit in DuckDB.  The harmonic mean is kept in integers:
    Σ 2^(−M_j) is scaled by 2^53 so it is an exact BIGINT, and the
    estimate is one double division (+ the standard linear-counting
    branch for small cardinalities, rounded@4 to absorb the two libm
    ln() implementations).

    Scale: registers build in ONE map-side-combined groupBy with a
    256-row result, DIRECTLY over the raw occurrence stream — no
    vocabulary-scale distinct anywhere, because max(rho) per bucket is
    duplicate-idempotent (that is the sketch's whole point: the only
    shuffle is ≤256 rows per map task).  The mergeable distinct-count
    state for 100 TB (union sketches = max per register; contrast the
    exact distinct's full-vocabulary shuffle).  Spark's own
    approx_count_distinct is the production shortcut; this one exists
    because it can be ORACLED."""
    return _hll_estimate_from_regs(_hll_registers(keys, col)).select(
        F.lit(HLL_M).alias("n_registers"),
        "n_present",
        "harmonic_s",
        "hll_estimate",
    )


def _duck_hll_sql() -> str:
    from .dedup import _DUCK_SHINGLES

    return f"""
WITH tokd AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents
), keys AS (
  SELECT DISTINCT s.tok FROM tokd, unnest({_DUCK_SHINGLES}) AS s(tok)
), hashed AS (
  SELECT {duck_hash64('tok')} AS h FROM keys
), ranked AS (
  SELECT h // {_HLL_POW52} AS bucket,
         {HLL_REM_BITS + 1} - length(trim(LEADING '0' FROM lpad(bin(h % {_HLL_POW52}), {HLL_REM_BITS}, '0'))) AS rho
  FROM hashed
), regs AS (
  SELECT bucket, MAX(rho) AS mrho FROM ranked GROUP BY bucket
), stats AS (
  SELECT COUNT(*) AS n_present,
         CAST(SUM((1::BIGINT << ({HLL_REM_BITS + 1} - mrho))) AS BIGINT) AS present_sum
  FROM regs
), final AS (
  SELECT n_present,
         CAST(present_sum + ({HLL_M} - n_present) * {_HLL_POW53} AS BIGINT) AS harmonic_s
  FROM stats
)
SELECT {HLL_M} AS n_registers,
       CAST(n_present AS BIGINT) AS n_present,
       harmonic_s,
       CASE WHEN ({_HLL_ALPHA_NUM} / harmonic_s) <= {_HLL_LC_BOUND} AND ({HLL_M} - n_present) > 0
            THEN ROUND({float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_present)), 4)
            ELSE ROUND({_HLL_ALPHA_NUM} / harmonic_s, 4) END AS hll_estimate
FROM final
"""


@query("hll_distinct", _duck_hll_sql())
def hll_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _repartition_if_narrow

    docs = _repartition_if_narrow(load_tables(spark, sf_dir)["documents"])
    # NO .distinct(): registers are max-per-bucket, so duplicate keys
    # are idempotent — sketching the raw occurrence stream gives the
    # bit-identical result without the vocabulary-scale shuffle.
    return hll_distinct(_shingle_stream(docs))


def _hll_registers(keys: DataFrame, col: str = "tok", extra_keys: list[str] | None = None) -> DataFrame:
    """(group-cols..., bucket, mrho) register relation — the mergeable
    HLL state (union of sketches = per-register MAX)."""
    extra = list(extra_keys or [])
    rho = (
        F.lit(HLL_REM_BITS + 1)
        - F.length(F.expr(f"trim(LEADING '0' FROM lpad(bin(__hll_rem), {HLL_REM_BITS}, '0'))"))
    )
    return (
        keys.select(*extra, spark_hash64(F.col(col)).alias("__hll_h"))
        .select(
            *extra,
            F.expr(f"__hll_h div {_HLL_POW52}").alias("bucket"),
            (F.col("__hll_h") % F.lit(_HLL_POW52)).alias("__hll_rem"),
        )
        .select(*extra, "bucket", rho.alias("rho"))
        .groupBy(*extra, "bucket")
        .agg(F.max("rho").alias("mrho"))
    )


def _hll_estimate_from_regs(regs: DataFrame) -> DataFrame:
    """(n_present, harmonic_s, hll_estimate) from a register relation."""
    stats = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - mrho)"))
        .cast("long")
        .alias("present_sum"),
    )
    s_col = (
        F.col("present_sum") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(_HLL_POW53)
    ).cast("long")
    raw = F.lit(_HLL_ALPHA_NUM) / s_col.cast("double")
    v = F.lit(HLL_M) - F.col("n_present")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))
    est = F.when((raw <= F.lit(_HLL_LC_BOUND)) & (v > 0), F.round(lc, 4)).otherwise(
        F.round(raw, 4)
    )
    return stats.select(
        F.col("n_present").cast("bigint").alias("n_present"),
        s_col.alias("harmonic_s"),
        est.alias("hll_estimate"),
    )


def _duck_hll_merge_sql() -> str:
    from .dedup import _DUCK_SHINGLES

    rank = (
        f"{HLL_REM_BITS + 1} - length(trim(LEADING '0' FROM "
        f"lpad(bin(h % {_HLL_POW52}), {HLL_REM_BITS}, '0')))"
    )
    est = (
        f"CASE WHEN ({_HLL_ALPHA_NUM} / harmonic_s) <= {_HLL_LC_BOUND} AND ({HLL_M} - n_present) > 0 "
        f"THEN ROUND({float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_present)), 4) "
        f"ELSE ROUND({_HLL_ALPHA_NUM} / harmonic_s, 4) END"
    )
    return f"""
WITH tokd AS (
  SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents
), keys AS (
  SELECT DISTINCT source < 'src2' AS grp, s.tok FROM tokd, unnest({_DUCK_SHINGLES}) AS s(tok)
), hashed AS (
  SELECT grp, {duck_hash64('tok')} AS h FROM keys
), per_group_regs AS (
  SELECT grp, h // {_HLL_POW52} AS bucket, MAX({rank}) AS mrho
  FROM hashed GROUP BY grp, bucket
), merged_regs AS (
  SELECT bucket, MAX(mrho) AS mrho FROM per_group_regs GROUP BY bucket
), direct_regs AS (
  SELECT h // {_HLL_POW52} AS bucket, MAX({rank}) AS mrho
  FROM hashed GROUP BY bucket
), m AS (
  SELECT COUNT(*) AS n_present,
         CAST(SUM((1::BIGINT << ({HLL_REM_BITS + 1} - mrho))) + ({HLL_M} - COUNT(*)) * {_HLL_POW53} AS BIGINT) AS harmonic_s
  FROM merged_regs
), d AS (
  SELECT COUNT(*) AS n_present,
         CAST(SUM((1::BIGINT << ({HLL_REM_BITS + 1} - mrho))) + ({HLL_M} - COUNT(*)) * {_HLL_POW53} AS BIGINT) AS harmonic_s
  FROM direct_regs
)
SELECT (SELECT {est} FROM m) AS merged_estimate,
       (SELECT {est} FROM d) AS direct_estimate,
       (SELECT harmonic_s FROM m) = (SELECT harmonic_s FROM d) AS sketches_identical
"""


@query("hll_merge_by_source", _duck_hll_merge_sql())
def hll_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL's merge algebra, verified by value: sketch each half of the
    corpus separately (per-group registers), union by per-register MAX,
    and compare against sketching the union directly — identical
    registers, identical estimate, enforced by the oracle.  THE property
    that makes HLL the 100 TB distinct-count: per-partition sketches
    merge with no rescan (daily sketches roll up to monthly for free),
    which an exact distinct can never do."""
    from .dedup import _SPARK_SHINGLES, _repartition_if_narrow

    docs = _repartition_if_narrow(load_tables(spark, sf_dir)["documents"])

    # NO .distinct() anywhere: per-group and global registers are
    # max-per-bucket, so the raw occurrence stream sketches to the
    # bit-identical state without a vocabulary-scale shuffle.
    keys = docs.select(
        (F.col("source") < "src2").alias("grp"),
        F.filter(F.split("text", " "), lambda t: t != "").alias("toks"),
    ).select("grp", F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"))
    per_group = _hll_registers(keys, extra_keys=["grp"])
    merged = per_group.groupBy("bucket").agg(F.max("mrho").alias("mrho"))
    direct = _hll_registers(keys.select("tok"))
    m = _hll_estimate_from_regs(merged).select(
        F.col("hll_estimate").alias("merged_estimate"),
        F.col("harmonic_s").alias("ms"),
    )
    d = _hll_estimate_from_regs(direct).select(
        F.col("hll_estimate").alias("direct_estimate"),
        F.col("harmonic_s").alias("ds"),
    )
    return m.crossJoin(d).select(
        "merged_estimate",
        "direct_estimate",
        (F.col("ms") == F.col("ds")).alias("sketches_identical"),
    )
