"""Scaling probe: how the heavy operators behave as the corpus grows.

Replicates the documents/embeddings fixtures k× (doc_id offset keeps
keys unique; texts get a per-replica suffix token so replicas are
near-dups of each other — the worst realistic case for dedup) and times
the LSH / SimHash / quality / ANN paths at 1×, 4×, 16×.  Near-linear
growth here is the evidence that the banded-join design has no hidden
quadratic term; writes SCALING.md.

Usage: python tools/scaling_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def replicate_docs(docs: DataFrame, k: int) -> DataFrame:
    """k near-duplicate copies of every doc, disjoint ids."""
    n = docs.count()
    parts = []
    for i in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                # distinct replica marker → replicas are near- (not exact-) dups
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fixed_batch_docs(docs: DataFrame, k: int) -> DataFrame:
    """k×-grown CORPUS side (even doc_ids, replicated with a
    parity-preserving offset) + the ORIGINAL 1× stream side (odd ids):
    the incremental-dedup twins split corpus/stream on doc_id parity,
    so this fixture grows the corpus while holding the arriving batch
    FIXED — isolating the inline twin's per-ingest corpus
    re-derivation term from its batch-pair output term (r12 verdict
    item 5)."""
    n = docs.count()
    off = n + (n % 2)  # even offset → replica ids keep their parity
    parts = [docs.filter(F.col("doc_id") % 2 == 1)]
    for i in range(k):
        parts.append(
            docs.filter(F.col("doc_id") % 2 == 0).select(
                (F.col("doc_id") + i * off).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(emb: DataFrame, k: int) -> DataFrame:
    n = emb.count()
    parts = [
        emb.select((F.col("vec_id") + i * n).alias("vec_id"), "embedding", "label")
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from duckdb_extension_kafquack_spark.operators.dedup import (
        dup_span_coverage,
        minhash_near_duplicates,
        simhash_signatures,
    )
    from duckdb_extension_kafquack_spark.operators.text import (
        bigram_surprisal_scores,
        boilerplate_phrases,
        ngram_novelty_by_source,
        source_overlap_matrix,
        source_token_kl,
        token_entropy,
    )
    from duckdb_extension_kafquack_spark.operators.dedup import (
        containment_pairs,
        cross_source_dup_matrix,
        keep_best_quality_report,
        ngram_jaccard_pairs,
    )
    from duckdb_extension_kafquack_spark.operators.similarity import (
        cosine_topk,
        embedding_near_duplicates,
        int8_ivf_topk,
        int8_topk,
        ivf_topk,
        kmeans_codebook_train,
        semdedup_cell_prune,
        semdedup_incremental,
    )
    from duckdb_extension_kafquack_spark.operators.similarity import (
        ann_int8_store_compact,
        ann_int8_store_upsert,
    )
    import duckdb_extension_kafquack_spark.operators.similarity as _sim
    from duckdb_extension_kafquack_spark.operators.dedup import (
        incremental_dedup_report,
    )
    from duckdb_extension_kafquack_spark.operators.curation import (
        contamination_counts,
        fuzzy_contamination,
        host_dedup_report,
        repetition_scores,
    )
    from duckdb_extension_kafquack_spark.operators.events import (
        co_engagement_topk,
        engagement_pagerank,
        funnel_stages,
        seeded_trust_rank,
    )
    from duckdb_extension_kafquack_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        kmv_pairwise_jaccard,
        _token_stream,
    )
    from duckdb_extension_kafquack_spark.operators.text import quality_scores
    from duckdb_extension_kafquack_spark.session import get_spark, read_table
    from duckdb_extension_kafquack_spark.streaming.windows import (
        streaming_bloom_gate,
        streaming_fuzzy_contamination,
        streaming_incremental_dedup,
        streaming_incremental_dedup_stored,
        streaming_semdedup_incremental,
    )

    import glob as globmod
    import os
    import shutil
    import tempfile

    # 1 GiB/core (32g for local[32]) — a realistic executor provisioning.
    # The session default of 8g (0.25 GiB/core) starves 32 concurrent
    # sort/agg tasks at the 64× scale: containment's ~0.5B-row prefix
    # join OOMs the heap there, which measures the harness, not the
    # operator (a real cluster spreads those rows across executors that
    # each have MORE memory per core than this).  Explicit env var wins.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = read_table(spark, sf_dir, "documents")
    emb0 = read_table(spark, sf_dir, "embeddings")
    quality_scores(docs0).write.format("noop").mode("overwrite").save()  # warmup

    results: dict[str, dict[int, float]] = {}

    def bench(name: str, k: int, make_df) -> None:
        # min-of-2: a single run can catch one-off JIT/codegen/Python-
        # worker spin-up and report a 5-10x outlier as "growth".
        # make_df is a THUNK: plan construction happens inside the
        # timing (some pipelines run an eager bounded job at build time,
        # e.g. the LSH hot-bucket size map) — same methodology as
        # bench.py's headline loop.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            make_df().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        results.setdefault(name, {})[k] = round(best, 2)
        # the pipelines persist their signature relations and never
        # unpersist (library code can't know the caller is done);
        # without this, ~50 cached relations accumulate by the 16× loop
        # and storage-memory eviction thrash reads as operator "growth"
        # (round 6 measured minhash 18.6s dirty vs 4.9s clean at 16×)
        spark.catalog.clearCache()
        # round 10: one freed-cache JVM GC per operator — a round-10
        # probe run measured containment at 62s mid-loop vs 19.5s in a
        # fresh session (same code, same data): evicted-but-uncollected
        # cache blocks inflate later operators' GC time and read as
        # growth; forcing collection right after the eviction keeps
        # each row's heap state comparable to its anchor's
        spark.sparkContext._jvm.System.gc()

    def bench_call(name: str, k: int, fn) -> None:
        """min-of-2 for operators whose product is driver-side state
        (the k-means trainer returns numpy arrays, not a DataFrame)."""
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        results.setdefault(name, {})[k] = round(best, 2)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    _fixture_dirs: list[str] = []

    def write_docs_fixture(docs_df: DataFrame, k: int) -> str:
        """Materialize a replicated-docs fixture dir with a SINGLE
        ``documents.parquet`` file, the layout `_docs_stream`'s
        pathGlobFilter expects — so the streaming twins can run their
        real readStream → availableNow → memory-sink path against the
        k× corpus (r8-verdict item 7: the probe previously covered only
        batch operators, leaving streaming broadcast-direction
        regressions invisible)."""
        base = tempfile.mkdtemp(prefix=f"scaleprobe_docs_{k}x_")
        stage = os.path.join(base, "_stage")
        docs_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(base, "documents.parquet"))
        shutil.rmtree(stage)
        _fixture_dirs.append(base)
        return base

    def write_emb_fixture(emb_df: DataFrame, k: int) -> str:
        """Same, for the embeddings table — the streaming SemDeDup twin
        reads its arriving vectors via `_emb_stream`'s pathGlobFilter
        and derives its knobs from the dir's footer row count, so it
        needs a real fixture dir, not a DataFrame."""
        base = tempfile.mkdtemp(prefix=f"scaleprobe_emb_{k}x_")
        stage = os.path.join(base, "_stage")
        emb_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(base, "embeddings.parquet"))
        shutil.rmtree(stage)
        _fixture_dirs.append(base)
        return base

    events0 = read_table(spark, sf_dir, "events")
    n_users = events0.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = events0.count()

    def replicate_events(k: int) -> DataFrame:
        parts = [
            events0.select(
                (F.col("event_id") + i * n_events).alias("event_id"),
                "ts",
                (F.col("user_id") + i * n_users).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for k in (1, 4, 16):
        docs = replicate_docs(docs0, k).localCheckpoint()
        bench("quality_scores", k, lambda: quality_scores(docs))
        bench("minhash_lsh_dedup", k, lambda: minhash_near_duplicates(docs))
        bench("simhash_signatures", k, lambda: simhash_signatures(docs))
        bench("contamination_check", k, lambda: contamination_counts(docs))
        bench("fuzzy_contamination", k, lambda: fuzzy_contamination(docs))
        bench("repetition_scores", k, lambda: repetition_scores(docs))
        bench("dup_span_coverage", k, lambda: dup_span_coverage(docs))
        bench("ngram_novelty", k, lambda: ngram_novelty_by_source(docs))
        bench("bigram_surprisal", k, lambda: bigram_surprisal_scores(docs))
        bench("source_overlap", k, lambda: source_overlap_matrix(docs))
        bench("boilerplate_phrases", k, lambda: boilerplate_phrases(docs))
        bench("source_token_kl", k, lambda: source_token_kl(docs))
        bench("token_entropy", k, lambda: token_entropy(docs))
        bench("cross_source_dup_matrix", k, lambda: cross_source_dup_matrix(docs))
        bench("keep_best_quality", k, lambda: keep_best_quality_report(docs))
        # r14 (r13 verdict item 5): the one registered query without a
        # probe row.  Host count is FIXED under replication (host =
        # source-(doc_id % 23)) while docs/host grow k×, so this probes
        # exactly the hot-host regime the (host, gram) shuffle would
        # skew in — the map-side-combined aggregate is the defense;
        # judge vs ×linear
        bench("host_dedup_report", k, lambda: host_dedup_report(docs))
        bench("containment_pairs", k, lambda: containment_pairs(docs))
        bench("ngram_jaccard", k, lambda: ngram_jaccard_pairs(docs))
        # CMS heavy-hitter path: sketch + estimates over the token stream
        stream = _token_stream(docs)
        bench("cms_sketch_estimates", k, lambda: cms_estimate(cms_build(stream), stream.distinct()))
        emb = replicate_embeddings(emb0, k).localCheckpoint()
        queries = emb.filter(F.col("vec_id") % 500 == 0)
        bench("ann_cosine_topk", k, lambda: cosine_topk(emb, queries))
        bench("ann_ivf_topk", k, lambda: ivf_topk(emb, queries))
        bench("ann_int8_topk", k, lambda: int8_topk(emb, queries))
        bench("ann_int8_ivf_topk", k, lambda: int8_ivf_topk(emb, queries))
        bench_call("ivf_kmeans_train", k, lambda: kmeans_codebook_train(emb))
        bench("incremental_dedup", k, lambda: incremental_dedup_report(docs))
        # block-pair tiled exact all-pairs: O(n²) compute by design, but
        # distributed (tiles scale with n_blocks²) — probe all k
        bench("embedding_near_dup", k, lambda: embedding_near_duplicates(emb))
        # cluster-scoped SemDeDup: replicas of a vector land in the same
        # trained cell, so the within-cell pair output grows k² (every
        # replica pair is a semantic dup) — judge against the pair
        # ceiling, not the linear floor
        bench("semdedup_cell_prune", k, lambda: semdedup_cell_prune(emb))
        # batch-vs-corpus shape: broadcast batch side × corpus cell scan —
        # pair fan-out |batch_cell|·|corpus_cell|, also a pair-model row
        bench("semdedup_incremental", k, lambda: semdedup_incremental(emb))

        # round 12 (r11 verdict item 4): the collect-free JOINED fallback
        # that actually runs beyond MAX_QUERY_BATCH arriving vectors —
        # forced by dropping the cap during plan construction (the plan
        # is fully built before the cap is restored), so the fallback
        # has the same out-of-sample growth evidence as the kernel path
        def _forced_joined(emb_df):
            saved = _sim.MAX_QUERY_BATCH
            _sim.MAX_QUERY_BATCH = 0
            try:
                return semdedup_incremental(emb_df)
            finally:
                _sim.MAX_QUERY_BATCH = saved

        bench("semdedup_incr_joined", k, lambda: _forced_joined(emb))
        ev = replicate_events(k).localCheckpoint()
        bench("funnel_stages", k, lambda: funnel_stages(ev))
        bench("engagement_pagerank", k, lambda: engagement_pagerank(ev, docs))
        bench("seeded_trust_rank", k, lambda: seeded_trust_rank(ev, docs))
        bench("co_engagement_topk", k, lambda: co_engagement_topk(ev))
        bench("kmv_pairwise_jaccard", k, lambda: kmv_pairwise_jaccard(docs))
        # streaming twins (r8-verdict item 7): the registered query fns
        # run the full readStream → availableNow → memory-sink drain
        # inside plan construction, so the bench thunk times the whole
        # stream execution end-to-end (plus the batch rollup's noop
        # write).  The fixture dir carries the k×-replicated corpus.
        sdir = write_docs_fixture(docs, k)
        bench("streaming_incremental_dedup", k,
              lambda: streaming_incremental_dedup(spark, sdir))
        # r12 verdict item 5: same inline twin, but the fixture grows
        # ONLY the corpus (stream side fixed at 1×) — its growth curve
        # is pure per-ingest corpus re-derivation + corpus-side join
        # cost, with the batch-pair output term held constant
        fdir = write_docs_fixture(fixed_batch_docs(docs0, k), k)
        bench("streaming_incr_dedup_fixedbatch", k,
              lambda: streaming_incremental_dedup(spark, fdir))
        # first run builds the corpus store (memoized per dir), so the
        # min-of-2 measures the STEADY-STATE serve — the store-serve
        # semantics the query exists for
        bench("streaming_incr_dedup_stored", k,
              lambda: streaming_incremental_dedup_stored(spark, sdir))
        bench("streaming_bloom_gate", k, lambda: streaming_bloom_gate(spark, sdir))
        bench("streaming_fuzzy_contamination", k,
              lambda: streaming_fuzzy_contamination(spark, sdir))
        # streaming SemDeDup twin (r10 verdict item 4): real readStream
        # over a k×-replicated embeddings fixture; knobs derive from the
        # dir's footer count, i.e. the REGISTERED adaptive behavior —
        # beyond ~131k vectors the centroid count grows with the corpus,
        # which bends the curve BELOW the fixed-config pair model
        edir = write_emb_fixture(emb, k)
        bench("streaming_semdedup_incremental", k,
              lambda: streaming_semdedup_incremental(spark, edir))
        # incremental index ingest (round 11): the base store builds on
        # the row's FIRST run (memoized per fixture dir — the scheduled
        # rebuild cost), so min-of-2 measures the per-ingest delta
        # encode + segment write + footer verify alone; expect
        # linear-in-arrivals growth (arrivals are 10% of the corpus)
        bench("ann_int8_store_upsert", k,
              lambda: ann_int8_store_upsert(spark, edir))
        # round 12 (r11 verdict item 7): delta compaction — reads
        # base ∪ delta CODES and rewrites the merged store (pure code
        # mover, no re-encode); expect linear-in-corpus growth (the
        # store holds one code row per vector)
        bench("ann_int8_store_compact", k,
              lambda: ann_int8_store_compact(spark, edir))
        print(f"k={k}: " + ", ".join(f"{n}={t[k]}s" for n, t in results.items() if k in t))

    # --- 64× deep probe (round-7 verdict item 5) -----------------------
    # The dedup composites' 16× ratios (cross_source 4.5×, keep_best
    # 3.9×) are CLAIMED to track the quadratic pair-output model (true
    # pairs = n·C(k,2) by construction — every replica group is a
    # k-clique).  One more two-doubling separates that model from a
    # genuine superlinear term in the CC/window stages: fit
    # t(k) = c0 + c1·k + c2·C(k,2) exactly on the k=1,4,16 points and
    # compare the k=64 PREDICTION against the measurement — a hidden
    # corpus² term would overshoot the pair model's prediction hard
    # (rows grow 4× from 16×→64×, pairs 16.8×, corpus² 16×·on-top).
    DEEP = (
        "minhash_lsh_dedup",
        "cross_source_dup_matrix",
        "keep_best_quality",
        # round-8 additions (r7 verdict item 7): the steepest 16× row and
        # the two rows that previously had no out-of-sample cell
        "containment_pairs",
        "fuzzy_contamination",
        "bigram_surprisal",
        # round-10 addition (r9 verdict item 1's "no growth change"
        # check): the char-5-gram LSH pipeline after the bigint-shingle
        # + grouped-expansion rework — judge against the pair model
        # like the minhash row (replica groups are k-cliques)
        "ngram_jaccard",
        # round-10 additions (r9 verdict item 5): the streaming twins
        # stopped at 16×, but the fuzzy batch row proved join-strategy
        # shifts only reveal themselves at 64× when relations cross the
        # broadcast threshold — probe the stream-static joins there too
        "streaming_incremental_dedup",
        "streaming_incr_dedup_stored",
        "streaming_bloom_gate",
        # round-10: cluster-scoped SemDeDup — every replica group is a
        # within-cell k-clique, so judge against the pair ceiling
        "semdedup_cell_prune",
        # round-11 additions (r10 verdict item 4): the rows that stopped
        # at 16×.  streaming_fuzzy's ~k²/7 pair model was in-sample only;
        # semdedup_incremental's fused kernel and the streaming SemDeDup
        # twin had no out-of-sample cell at all.
        "streaming_fuzzy_contamination",
        "semdedup_incremental",
        "streaming_semdedup_incremental",
        "ann_int8_store_upsert",
        # round-12 additions: the forced joined fallback (r11 verdict
        # item 4) and the delta-compaction row (item 7)
        "semdedup_incr_joined",
        "ann_int8_store_compact",
        # round-13 additions (r12 verdict items 3+5): the heavy rows
        # that stopped at 16×.  embedding_near_dup is tiled exact
        # all-pairs — O(n²) COMPUTE by design, judged against the pair
        # column like semdedup; the rank twins, repetition and
        # boilerplate are linear shapes judged against ×linear; the
        # fixed-batch inline-dedup row isolates corpus re-derivation
        # (stream side held at 1×) — its verdict is its growth vs the
        # full inline row's, not a pair model.
        "embedding_near_dup",
        "engagement_pagerank",
        "seeded_trust_rank",
        "repetition_scores",
        "boilerplate_phrases",
        "streaming_incr_dedup_fixedbatch",
        # round-14 addition (r13 verdict item 5): host-level dedup — a
        # linear shape (per-host aggregates, no pair expansion), judged
        # vs ×linear; its worst case here is the FIXED host count under
        # replication (every host 64× hotter)
        "host_dedup_report",
    )
    docs = replicate_docs(docs0, 64).localCheckpoint()
    bench("repetition_scores", 64, lambda: repetition_scores(docs))
    bench("boilerplate_phrases", 64, lambda: boilerplate_phrases(docs))
    ev64 = replicate_events(64).localCheckpoint()
    bench("engagement_pagerank", 64, lambda: engagement_pagerank(ev64, docs))
    bench("seeded_trust_rank", 64, lambda: seeded_trust_rank(ev64, docs))
    fdir64 = write_docs_fixture(fixed_batch_docs(docs0, 64), 64)
    bench("streaming_incr_dedup_fixedbatch", 64,
          lambda: streaming_incremental_dedup(spark, fdir64))
    bench("minhash_lsh_dedup", 64, lambda: minhash_near_duplicates(docs))
    bench("cross_source_dup_matrix", 64, lambda: cross_source_dup_matrix(docs))
    bench("keep_best_quality", 64, lambda: keep_best_quality_report(docs))
    bench("host_dedup_report", 64, lambda: host_dedup_report(docs))
    bench("containment_pairs", 64, lambda: containment_pairs(docs))
    bench("ngram_jaccard", 64, lambda: ngram_jaccard_pairs(docs))
    bench("fuzzy_contamination", 64, lambda: fuzzy_contamination(docs))
    bench("bigram_surprisal", 64, lambda: bigram_surprisal_scores(docs))
    sdir64 = write_docs_fixture(docs, 64)
    bench("streaming_incremental_dedup", 64,
          lambda: streaming_incremental_dedup(spark, sdir64))
    bench("streaming_incr_dedup_stored", 64,
          lambda: streaming_incremental_dedup_stored(spark, sdir64))
    bench("streaming_bloom_gate", 64,
          lambda: streaming_bloom_gate(spark, sdir64))
    bench("streaming_fuzzy_contamination", 64,
          lambda: streaming_fuzzy_contamination(spark, sdir64))
    emb64 = replicate_embeddings(emb0, 64).localCheckpoint()
    # tiled exact all-pairs: O(n²) compute by design (distributed over
    # n_blocks² tiles) — the pair column IS its honest model
    bench("embedding_near_dup", 64, lambda: embedding_near_duplicates(emb64))
    bench("semdedup_cell_prune", 64, lambda: semdedup_cell_prune(emb64))
    # default-config call like its 1/4/16 anchors (model continuity);
    # at 64× the 10% arriving batch (64k rows) still fits the bounded
    # collect, so this times the fused kernel path, not the degrade
    bench("semdedup_incremental", 64, lambda: semdedup_incremental(emb64))

    def _forced_joined64(emb_df):
        saved = _sim.MAX_QUERY_BATCH
        _sim.MAX_QUERY_BATCH = 0
        try:
            return semdedup_incremental(emb_df)
        finally:
            _sim.MAX_QUERY_BATCH = saved

    bench("semdedup_incr_joined", 64, lambda: _forced_joined64(emb64))
    edir64 = write_emb_fixture(emb64, 64)
    bench("streaming_semdedup_incremental", 64,
          lambda: streaming_semdedup_incremental(spark, edir64))
    bench("ann_int8_store_upsert", 64,
          lambda: ann_int8_store_upsert(spark, edir64))
    bench("ann_int8_store_compact", 64,
          lambda: ann_int8_store_compact(spark, edir64))
    print("k=64: " + ", ".join(f"{n}={results[n][64]}s" for n in DEEP))

    deep_rows = []
    for name in DEEP:
        t = results[name]
        # Bracketing models anchored at the measured 16× point (an exact
        # 3-term polynomial solve on 3 noisy points is ill-conditioned —
        # ±20% scheduler noise flips coefficient signs).  From 16×→64×:
        # rows grow 4×, true pair OUTPUT grows C(64,2)/C(16,2) = 16.8×,
        # and a hidden corpus² term would grow 16× ON TOP of rows.
        lin = t[16] * 4.0          # linear-in-rows floor
        pair = t[16] * (64 * 63 / 2.0) / (16 * 15 / 2.0)  # pair-output ceiling
        sq = t[16] * 16.0 * 4.0    # corpus² disaster model
        meas = t[64]
        deep_rows.append((name, t, lin, pair, sq, meas))

    n_docs = docs0.count()
    n_emb = emb0.count()
    lines = [
        "# SCALING — heavy operators vs corpus replication",
        "",
        f"Base: `{sf_dir}` ({n_docs} docs, {n_emb} vectors), replicated k× as",
        "near-duplicates (worst case for dedup: every replica group is a",
        "real near-dup cluster).  local[32], 32g heap (1 GiB/core — a",
        "realistic executor provisioning; the 8g session default starves",
        "32 concurrent sort tasks at 64× and OOMs on harness memory, not",
        "operator design).  Times in seconds (min of 2,",
        "~±20% scheduler noise; plan-build included in the timing; cache",
        "cleared between operators so persisted-relation eviction thrash",
        "can't masquerade as growth).  The question is the GROWTH SHAPE:",
        "banded LSH joins and map-only scoring should scale ~linearly in",
        "rows — a quadratic term would explode at 16×.",
        "",
        "| operator | 1× | 4× | 16× | 64× | 16×/1× ratio |",
        "|---|---|---|---|---|---|",
    ]
    for name, t in results.items():
        r16 = f"{t[16] / t[1]:.1f}×" if 16 in t and t[1] else "—"
        lines.append(
            f"| {name} | {t.get(1, '—')} | {t.get(4, '—')} | {t.get(16, '—')} |"
            f" {t.get(64, '—')} | {r16} |"
        )
    lines += [
        "",
        "## 64× deep probe — dedup composites vs the pair-output model",
        "",
        "True near-dup pairs are `n·C(k,2)` by construction (every replica",
        "group is a k-clique): from 16×→64×, rows grow 4× but true pair",
        "OUTPUT grows C(64,2)/C(16,2) = 16.8×, and a hidden corpus² term",
        "in the CC or ranking-window stages would grow 16× ON TOP of rows.",
        "Each model below is anchored at the MEASURED 16× point (a 3-term",
        "polynomial solved exactly on 3 noisy points is ill-conditioned —",
        "±20% scheduler noise flips coefficient signs), so the k=64 row is",
        "a genuine out-of-sample test: a measurement at or near the linear",
        "floor means the banded/bounded stages dominate; between linear",
        "and the pair ceiling means cost tracks the (by-construction",
        "quadratic) pair output; anywhere near the corpus² column would",
        "be a real scale-killer.  All rows land at "
        f"{min(m / l for *_, l, _p, _s, m in deep_rows):.1f}–"
        f"{max(m / l for *_, l, _p, _s, m in deep_rows):.1f}× the linear",
        f"floor, at most {max(m / p for *_, p, _s, m in deep_rows):.1f}×",
        f"the pair-output ceiling, and at most "
        f"{max(m / s for *_, s, m in deep_rows):.2f}× of the corpus²",
        "column (the anchor itself carries the ±20% single-run noise, so",
        "the ×linear column wobbles between probe runs; the",
        "corpus²-column distance is the stable signal).  A row NEAR its",
        "pair ceiling (containment at 64×) is the probe's replica",
        "construction talking: candidates ≈ true pairs there, so cost is",
        "output-bound — the result set itself is quadratic in k.  A row",
        "somewhat ABOVE its pair ceiling (fuzzy at 64× since the round-9",
        "hint removal) is a join-strategy SHIFT between anchor and",
        "measurement, not a new quadratic term: at the 16× anchor AQE",
        "still broadcasts the benchmark-derived relations, at 64× they",
        "exceed the threshold and the joins degrade to the spill-safe",
        "sort-merge — so the anchored model inherits the cheap-strategy",
        "constant.  (The removed FORCED broadcast was faster in this",
        "single-JVM harness and is exactly what OOMs a real driver; the",
        "honest distributed plan pays the sorts measured here.)",
        "",
        "| operator | linear t16·4 | pair-output t16·16.8 | corpus² t16·64 | measured 64× | ×linear |",
        "|---|---|---|---|---|---|",
        # bigram_surprisal's and streaming_bloom_gate's models are
        # LINEAR (word-count shape / constant-size filter + linear audit
        # join) — their pair-output columns are printed for table
        # uniformity but the verdict for them is the ×linear cell alone;
        # the dedup composites, containment/fuzzy, and the two streaming
        # incremental-dedup rows (replica batches are near-dups of the
        # replica corpus: flagged pairs grow ~k²) are judged against the
        # pair model.
    ]
    for name, t, lin, pair, sq, meas in deep_rows:
        lines.append(
            f"| {name} | {lin:.1f}s | {pair:.1f}s | {sq:.0f}s |"
            f" {meas}s | {meas / lin:.1f}× |"
        )
    lines += [
        "",
        "Growth models per row (what the ratio SHOULD be):",
        "",
        "* map-only ops (`quality_scores`, `repetition_scores`,",
        "  `simhash_signatures`, `funnel_stages`) — linear; the flat rows",
        "  show the fixed scheduling floor still dominating at 80k docs.",
        "* `contamination_check` — linear in corpus + benchmark (the probe",
        "  grows BOTH: the benchmark slice is 1% of the replicated corpus).",
        "  The round-2 rewrite (explode → broadcast hash join, hash table",
        "  built once per task) replaced a per-row `array_intersect` against",
        "  the collected benchmark array that this probe exposed as",
        "  quadratic (48 s at 16×; now ~1.5×).",
        "* `cms_sketch_estimates` — stream linear, sketch CONSTANT (d·w",
        "  counters regardless of corpus).",
        "* `dup_span_coverage` / `ngram_novelty` — two shuffles each on the",
        "  uniform 60-bit shingle hash (per-doc position counts / distinct",
        "  pairs, then a per-shingle reduce + join-back or min-claim);",
        "  linear in corpus token count, the same profile as word-count —",
        "  the replica-heavy probe makes every shingle corpus-duplicated",
        "  and the join-back side one row per distinct shingle, so no",
        "  quadratic term is possible by construction.",
        "* `bigram_surprisal` — word-count shape over the bigram stream",
        "  (two map-side-combined groupBys + a join-back one row per",
        "  distinct bigram); linear.",
        "* `source_overlap` — the shingle-hash self-join's fan-out is",
        "  C(sources-per-shingle, 2) ≤ sources² per shingle — a",
        "  dimension-like constant (20 sources here), so growth is linear",
        "  in distinct shingles even though replicas make every shingle",
        "  cross-source.",
        "* `ann_cosine_topk` / `ann_ivf_topk` — the probe grows queries AND",
        "  corpus k× each, so brute force is O(k²) by construction; IVF's",
        "  cell pruning keeps the measured growth far below it.",
        "* `ann_int8_ivf_topk` — same cell pruning over quantized codes",
        "  (assignment + scoring both in code space inside the per-batch",
        "  numpy kernel); flat growth tracks `ann_ivf_topk`, not the brute",
        "  int8 scan.  All four ANN rows run the late-round-5 fused",
        "  kernels (fold-order / exact-integer numpy over the corpus scan,",
        "  per-batch partial top-k).",
        "* `ivf_kmeans_train` — two Lloyd rounds = two linear corpus",
        "  passes in code space; the per-round reduce is an in-plan",
        "  groupBy(cell) with map-side partial aggregation, so reduce",
        "  output is ≤ |cells| rows REGARDLESS of corpus size (round 6 —",
        "  the round-5 driver-side fold grew with Arrow-batch count).",
        "  Expected growth: linear in rows.",
        "* `minhash_lsh_dedup` — the bucket sub-split (MAX_LSH_BUCKET=64,",
        "  hashed-modulo scatter, no ranking-window exchange) bounds",
        "  within-bucket pair candidates at O(rows·64) — LINEAR scan +",
        "  banding work.  But the probe's OUTPUT is quadratic in k BY",
        "  CONSTRUCTION: each replica group has k mutual near-dups, so",
        "  true pairs ∝ n·C(k,2) — 0 extra pairs at 1×, ~120·n at 16× —",
        "  and the verify join + result materialization pay for each.",
        "  The measured 16×/1× ratio is therefore expected to sit ABOVE",
        "  linear-in-rows but far below the unbanded quadratic (which the",
        "  pre-cap probe measured as runaway); judge the row against the",
        "  pair-output model, not against flatness.",
        "* `ngram_jaccard` — the char-5-gram twin of the minhash row",
        "  (round 10: bigint verify sets, grouped within-bucket pair",
        "  expansion — ONE groupBy shuffle instead of a two-sided",
        "  self-join, collect_list bounded by the 64-member bucket cap);",
        "  true pairs are n·C(k,2) by the same replica construction, so",
        "  judge against the pair model like minhash.",
        "* `embedding_near_dup` is the block-pair tiled EXACT all-pairs scan:",
        "  inherently O(n²) work, but fully distributed — per-tile BLAS with",
        "  only candidate ids leaving each tile, no driver collect, no",
        "  whole-corpus broadcast; `n_blocks` grows with the corpus so a",
        "  tile stays executor-sized.  The sub-quadratic rows above are the",
        "  LSH paths used at scale.",
        "* `boilerplate_phrases` / `source_token_kl` — word-count shape",
        "  (map-side-combined groupBy on the phrase/token relation; the",
        "  phrase top-k is TakeOrderedAndProject, the KL join-back is one",
        "  row per distinct (source, token)); linear in token count.",
        "* `token_entropy` — per-doc sorted run-length HOF fold inside one",
        "  projection, no shuffle at all; linear (flat rows = scheduling",
        "  floor).",
        "* `containment_pairs` — prefix-filtered containment join with",
        "  PPJoin-style count+positional bounds (round 8): the df",
        "  aggregate and per-doc global ranking are word-count shape",
        "  (linear); prefix fan-out is Σ df over each doc's",
        "  ~(1−c)·|S|+1+e RAREST shingles (the replica probe inflates",
        "  that df by k), and the pair-level count filter prunes the",
        "  aggregated candidates to ≈ the true ordered pairs, n·k(k−1) —",
        "  judge against the pair-output model, not flatness.",
        "* `engagement_pagerank` / `seeded_trust_rank` — per iteration: two",
        "  joins + two partial+final aggs over the edge relation (the",
        "  seeded variant adds one co-keyed seed join per round); edges",
        "  grow k× under replication (disjoint replica users, same",
        "  per-user fan-out) so the whole loop is linear-in-edges;",
        "  iteration count is a fixed constant, never data-dependent.",
        "* `co_engagement_topk` — pairs ≤ |users|·C(cap,2) by the",
        "  fan-out cap: replication adds USERS (disjoint ids, same",
        "  fan-out), so pair output and cost grow k×, linear by",
        "  construction — the cap is what a heavy-user corpus can't",
        "  break.",
        "* `fuzzy_contamination` — banded corpus×benchmark join with the",
        "  benchmark side broadcast; the probe replicates BOTH sides",
        "  (bench slice is 1/7 of the replicated corpus), so flagged",
        "  pairs grow ~k²/7 — judge against the pair model, not flatness.",
        "  The candidate and per-doc relations are NOT force-broadcast",
        "  (they grow with corpus × contamination density; AQE decides).",
        "* `kmv_pairwise_jaccard` — the corpus scan building the sketches",
        "  is linear; the pair join runs over |sources|²·k CONSTANT-size",
        "  arrays (replication adds docs, not sources), so growth is the",
        "  scan alone — flat-ish rows mean the sketch algebra is free.",
        "* `cross_source_dup_matrix` / `keep_best_quality` — the verified LSH",
        "  pair relation (quadratic in k by the same pair-output model as",
        "  `minhash_lsh_dedup`) plus broadcast joins of the pair/cluster",
        "  ids into the corpus scan (with the inline-scored projection and",
        "  a cluster-bounded ranking window for keep_best); growth tracks",
        "  the minhash row — never corpus².  Since the r14 CC-labels",
        "  memo, keep_best's min-of-2 measures the CC-warm steady state",
        "  (the first invocation at each k still pays the full pair",
        "  build + pointer-doubling; the pair-cache-warm caveat that",
        "  already applied to these anchors now covers the labels too).",
    ]
    lines += [
        "* streaming twins (`streaming_incremental_dedup`,",
        "  `streaming_bloom_gate`, `streaming_fuzzy_contamination`) — the",
        "  REAL readStream → availableNow → memory-sink drain against a",
        "  k×-replicated single-file fixture (timed end-to-end including",
        "  sink drain + batch rollup).  Round 9 removed the corpus-side",
        "  forced broadcasts (corpus md5 set, band+shingle index, corpus",
        "  member audit join): the static index side now grows k× with",
        "  the corpus and the planner picks the join side from stats, so",
        "  near-linear growth here is the direct evidence the",
        "  stream-static joins no longer funnel the corpus through the",
        "  driver.  The incremental-dedup row ALSO carries the",
        "  pair-output term (replica batches are near-dups of the",
        "  replica corpus: flagged pairs grow ~k²), so judge it like the",
        "  batch `incremental_dedup` row, not flatness; the bloom gate's",
        "  filter is constant-size by design, so its growth is the",
        "  stream scan + the audit join alone.",
        "* `streaming_incr_dedup_stored` — the STEADY-STATE serve cost:",
        "  the corpus store (three bucketed tables: bands on band_sig,",
        "  sets on doc_id, keys on h) is built on the row's FIRST run and",
        "  memoized per fixture dir, so the min-of-2 measures",
        "  classify-against-stores alone — the O(batch)-per-ingest",
        "  contract; compare against the inline",
        "  `streaming_incremental_dedup` row, which re-derives the corpus",
        "  index per run.  Since round 11 both incremental rows drain via",
        "  foreachBatch per-source partials (O(sources) driver state, no",
        "  state store) instead of a complete-mode memory sink that held",
        "  every doc verdict.",
        "* `streaming_incr_dedup_fixedbatch` (round 13, r12 verdict",
        "  item 5) — the INLINE twin against a fixture that grows ONLY",
        "  the corpus (arriving stream held at 1×): its growth is pure",
        "  per-ingest corpus re-derivation + corpus-side join cost, the",
        "  batch-pair output term frozen.  Read it against the full",
        "  inline row: the share of the inline row's growth this row",
        "  reproduces is the share owed to re-derivation, NOT to pair",
        "  output — which is why the STORED twin is the only sanctioned",
        "  shape at scale (the registered inline query routes to the",
        "  stored path past INLINE_DEDUP_MAX_CORPUS docs; every",
        "  oracle-checked SF and this probe sit below the floor).",
        "* `semdedup_incremental` / `streaming_semdedup_incremental` —",
        "  the batch row times the fused corpus kernel with its 1/4/16",
        "  anchors' fixed 16-cell config (the 64k-row arriving batch",
        "  still fits the bounded collect at 64×; beyond that the",
        "  registered query degrades to the cell-join shape, unit-",
        "  tested); the streaming row runs the registered ADAPTIVE",
        "  config — `semdedup_knobs` derives the centroid count from the",
        "  fixture's footer row count, so past ~131k vectors cells grow",
        "  with the corpus and the curve bends BELOW the fixed-config",
        "  pair ceiling.  Replicated vectors are EXACT copies, so every",
        "  replica group is a within-cell k-clique either way — pair",
        "  output grows k² by construction.",
        "* `semdedup_incr_joined` — the collect-free JOINED fallback the",
        "  registered query degrades to beyond MAX_QUERY_BATCH arriving",
        "  vectors, forced here by dropping the cap during plan",
        "  construction: both sides cell-assigned by the same Arrow",
        "  kernel, UNHINTED equi-join on cell, JVM-dot gate.  Pair",
        "  output is the same k² replica-clique volume as the kernel",
        "  row; the JVM dot is ~4-10× the BLAS screen per pair, so the",
        "  row is expected within a small factor of the kernel path and",
        "  judged against the same pair ceiling.",
        "* `ann_int8_store_compact` — delta compaction under the frozen",
        "  codebook: reads base ∪ delta CODE rows (no float read, no",
        "  re-encode), re-clusters on (cell, salt), rewrites the merged",
        "  store, footer-verifies.  One code row per vector in, one",
        "  out — linear in corpus rows by construction.",
    ]
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    for d in _fixture_dirs:
        shutil.rmtree(d, ignore_errors=True)
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
