"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Each query executes fully via the
noop sink (no driver-side collect — measures the distributed plan, not
the toPandas transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_extension_kafquack_spark import operators, streaming, suite, tpch  # noqa: F401
from duckdb_extension_kafquack_spark.session import get_spark, load_tables

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
    "text_quality",
    "text_fingerprint",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_int8_topk",
    "ann_int8_ivf_topk",
    "ann_int8_store_topk",
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
    "text_bigram_surprisal",
    "quality_rank_normalized",
    "semantic_retrieval_join",
    "source_overlap_matrix",
    "multimodal_payload_dedup",
    "hll_distinct",
    "event_path_trigrams",
    "crossmodal_label_purity",
    "shard_manifest",
    "dedup_cluster_histogram",
    "corpus_version_diff",
    "embedding_dim_stats",
    "boilerplate_phrases",
    "cross_source_dup_matrix",
    "source_token_kl",
    "text_token_entropy",
    "padding_efficiency",
    "doc_engagement_join",
    "dedup_keep_best_quality",
    "engagement_weighted_sample",
    "user_behavior_entropy",
    "corpus_summary_card",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("kafquack-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)  # warm the session & file listing
    # one untimed run to pay JVM/codegen/Python-worker startup once —
    # timings below measure the plans, not cold-start
    suite.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = suite.REGISTRY[name]
        best = float("inf")
        for _ in range(2):  # min-of-2: steady-state plan cost, not scheduler noise
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
