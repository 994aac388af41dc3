"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Each query executes fully via the
noop sink (no driver-side collect — measures the distributed plan, not
the toPandas transfer).

Measurement protocol (round-7 verdict item 7 + round-8 order swap): the
parent process runs the whole suite in TWO fresh JVM sessions (child
subprocesses) — the first in HEADLINE order, the second REVERSED, so a
query's position-dependent costs (GC buildup, codegen-cache pollution)
differ between sessions — and keeps the per-query MIN across sessions;
each child is itself min-of-2 per query.  Round-over-round deltas then measure plans, not GC pressure or
codegen-cache luck accumulated over a 60-query session — three of round
6's four apparent regressions disagreed with a dedicated quiet run by
>1.4× for exactly that reason.  Set SPARK_GRAFT_BENCH_SESSIONS=1 to get
the old single-session behavior (used while iterating)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kafka_value_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "filter_project",
    "window_funcs",
    "topk_per_group",
    "asof_join",
    "json_scalar",
    "rollup_agg",
    "tumbling_window",
    "session_window",
    "sort_merge_join",
    "stats_agg",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_containment_summary",
    "text_quality",
    "text_fingerprint",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_int8_topk",
    "ann_int8_ivf_topk",
    "ann_int8_store_topk",
    "ann_int8_store_serve",
    "ann_int8_store_build",
    "ann_int8_store_upsert",
    "ann_int8_store_compact",
    "ivf_kmeans_codebook",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "corpus_curation",
    "source_cap",
    "skew_salted_agg",
    "kafka_datasource_batch",
    "dedup_dup_span_coverage",
    "bloom_membership",
    "ngram_novelty_by_source",
    "ann_filtered_topk",
    "text_oov_rate",
    "embedding_outliers",
    "dedup_minhash_calibration",
    "fuzzy_contamination",
    "host_dedup_report",
    "text_bigram_surprisal",
    "quality_rank_normalized",
    "semantic_retrieval_join",
    "source_overlap_matrix",
    "multimodal_payload_dedup",
    "hll_distinct",
    "kmv_distinct_by_source",
    "kmv_pairwise_jaccard",
    "engagement_pagerank",
    "seeded_trust_rank",
    "co_engagement_topk",
    "doc_transitions_topk",
    "event_path_trigrams",
    "crossmodal_label_purity",
    "shard_manifest",
    "dedup_cluster_histogram",
    "corpus_version_diff",
    "embedding_dim_stats",
    "boilerplate_phrases",
    "cross_source_dup_matrix",
    "source_token_kl",
    "source_psi_drift",
    "text_token_entropy",
    "padding_efficiency",
    "doc_engagement_join",
    "dedup_keep_best_quality",
    "engagement_weighted_sample",
    "user_behavior_entropy",
    "corpus_summary_card",
    "semdedup_cell_prune",
    "semdedup_incremental",
    "incremental_dedup_store_build",
    "streaming_incremental_dedup",
    "streaming_incremental_dedup_stored",
    "streaming_semdedup_incremental",
]


def _run_session(sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """One fresh-JVM pass over HEADLINE: min-of-2 per query.  Returns
    ``(timings, loads)`` — ``loads[name]`` is the 1-min load average
    sampled right after the query's runs (r12 verdict item 6: per-query
    load attribution makes a phantom regression diagnosable per ROW,
    not per pass — BENCH_r11's +17% was machine contention)."""
    from duckdb_extension_kafquack_spark import (  # noqa: F401
        operators,
        streaming,
        suite,
        tpch,
    )
    from duckdb_extension_kafquack_spark.session import get_spark, load_tables

    spark = get_spark("kafquack-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)  # warm the session & file listing
    # one untimed run to pay JVM/codegen/Python-worker startup once —
    # timings below measure the plans, not cold-start
    suite.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # session-order swap (round-8, r7 verdict item 6): the parent runs
    # one forward and one REVERSED pass, so a query's position in the
    # suite (accumulated GC pressure, codegen-cache pollution at slot
    # #k) differs between the sessions and the per-query min cancels
    # position effects instead of replaying them identically twice —
    # text_fingerprint disagreed 1.4× between the driver bench and a
    # dedicated quiet run for exactly this reason.
    order = list(HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_ORDER") == "reverse":
        order.reverse()
    timings: dict[str, float] = {}
    loads: dict[str, float] = {}
    for name in order:
        q = suite.REGISTRY[name]
        best = float("inf")
        for _ in range(2):  # min-of-2: steady-state plan cost, not scheduler noise
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        loads[name] = round(os.getloadavg()[0], 2)
    return timings, loads


def _cpu_reference() -> float:
    """Fixed single-thread CPU canary: seconds to md5 a deterministic
    64 MiB of data in 64 KiB chunks.  Round-over-round bench totals are
    only comparable when the HOST is comparable — r13 ran on a VM whose
    cores were ~1.25× slower than r12's (every untouched sub-second row
    inflated by the same factor, load averages normal), which without
    this field reads as a uniform suite regression.  Dividing two
    rounds' `cpu_ref_sec` gives the host-speed ratio to normalize by;
    the workload (hashing) tracks the suite's own hot path better than
    a busy-loop."""
    import hashlib
    import time as _time

    chunk = b"\xa5" * 65536
    t0 = _time.perf_counter()
    h = hashlib.md5()
    for _ in range(1024):
        h.update(chunk)
    h.hexdigest()
    return round(_time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))

    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") or n_sessions <= 1:
        timings, query_load = _run_session(sf_dir)
        session_meta = []
    else:
        # min per query across n fresh JVM sessions, load-annotated
        # (round-12, r11 verdict item 2): the driver's BENCH_r11 recorded
        # a phantom +17% regression from machine contention — record the
        # 1-min load average around each pass so a contaminated record is
        # detectable in-band, and arbitrate with a THIRD fresh-JVM pass
        # when the two passes disagree by >30% on total (the per-query
        # min then absorbs whichever pass was the noisy one).
        timings = {}
        query_load = {}
        here = os.path.abspath(__file__)
        session_meta: list[dict] = []
        session_totals: list[float] = []

        def run_child(i: int) -> None:
            env = dict(
                os.environ,
                SPARK_GRAFT_BENCH_CHILD="1",
                SPARK_GRAFT_BENCH_ORDER="reverse" if i % 2 else "forward",
            )
            load_before = os.getloadavg()[0]
            r = subprocess.run(
                [sys.executable, here], capture_output=True, text=True, env=env
            )
            load_after = os.getloadavg()[0]
            line = next(
                (
                    ln
                    for ln in reversed(r.stdout.splitlines())
                    if ln.startswith("{") and '"queries"' in ln
                ),
                None,
            )
            if line is None:
                sys.stderr.write(
                    f"bench child {i} produced no JSON; rc={r.returncode}\n"
                    + r.stderr[-4000:]
                )
                return
            parsed = json.loads(line)
            child = parsed["queries"]
            child_load = parsed.get("query_load", {})
            session_totals.append(sum(child.values()))
            session_meta.append(
                {
                    "order": env["SPARK_GRAFT_BENCH_ORDER"],
                    "load_before": round(load_before, 2),
                    "load_after": round(load_after, 2),
                    "total": round(sum(child.values()), 3),
                }
            )
            for k, v in child.items():
                if v < timings.get(k, float("inf")):
                    timings[k] = v
                    # attribute the load of the pass that provided the min
                    if k in child_load:
                        query_load[k] = child_load[k]

        for i in range(n_sessions):
            run_child(i)
        if len(session_totals) >= 2:
            lo, hi = min(session_totals), max(session_totals)
            if lo > 0 and hi / lo > 1.3:
                run_child(n_sessions)  # tie-break pass; min absorbs the noise
        if not timings:  # all children failed — run in-process as a fallback
            timings, query_load = _run_session(sf_dir)

    total = round(sum(timings.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "query_load": query_load,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "sessions": session_meta,
            "cpu_ref_sec": _cpu_reference(),
        }
    )
    print(payload)
    # Sidecar copy of the SAME JSON (r13 verdict item 2): the driver
    # captures stdout, and one noisy stderr line or a longer suite can
    # truncate the ~8 KB line mid-JSON (BENCH_r12.json parsed: null —
    # the r13 round had no machine-readable baseline).  The stdout
    # contract is unchanged; the file is a durability copy only.
    # Children skip it: the parent's merged min-of-sessions is the record.
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        return
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"),
            "w",
        ) as fh:
            fh.write(payload + "\n")
    except OSError:
        pass  # a read-only checkout must never fail the bench


if __name__ == "__main__":
    main()
