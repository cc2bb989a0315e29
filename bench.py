"""Benchmark harness: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Each query is materialized end-to-end through the noop sink (full
execution, no driver-side collect bottleneck, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The headline set: the flagship pipelines plus every operator family
# with real weight at scale (shuffle-heavy, window-heavy, sketching,
# similarity). Names map to traits_data_spark.catalog entries.
BENCH_QUERIES = [
    "silver_e1",
    "profile_build",
    "profile_build_multi_pass",
    "gold_ratings",
    "group_zscores",
    "last_n_filter",
    "dedup_keep_best",
    "rollup_grouping_sets",
    "exact_dedup",
    "lsh_candidates",
    "jaccard_verify",
    "ngram_jaccard",
    "simhash",
    "simhash_near_dups",
    "dup_clusters",
    "decontaminate",
    "repetition_features",
    "cosine_topk",
    "cosine_topk_quantized",
    "lsh_topk",
    "lsh_topk_multiprobe",
    "ivf_topk",
    "quantize_embeddings",
    "knn_label_eval",
    "char_entropy",
    "embedding_near_dups",
    "clean_corpus",
    "event_sessions",
    "event_stats",
    "quality_features",
    "quality_classifier",
    "line_dedup",
    "semantic_dedup",
    "identify_language",
    "token_counts",
    "document_fingerprint",
    "redact_pii",
    "event_windows",
    "funnel_steps",
    "cohort_retention",
    "decayed_engagement",
    "hll_distinct",
    "kmeans_clusters",
    "ivf_topk_kmeans",
    "cms_top_terms",
    "sampled_quantiles",
    "substring_dups",
    "remove_dup_substrings",
    "bloom_decontaminate",
    "shuffle_shards",
    "mixture_plan",
    "gopher_rules",
    "containment_pairs",
    "curate_corpus",
    "epoch_expand",
    "kmv_overlap",
    "corpus_report",
    "snapshot_diff",
    "incremental_near_dups",
    "event_transitions",
    "hourly_anomalies",
    "funnel_within",
    "price_histogram",
    "merge_upsert",
    "asof_join",
    "range_join",
    "kmv_distinct",
    "rolling_agg",
    "tfidf_top_terms",
    "stratified_sample",
    "temperature_sample",
    "token_budget",
    "pivot_stats",
    "zorder_values",
    "incremental_merge",
    "continuous_rollup",
    "top_terms",
    "chunk_docs",
    "cdc_chunks",
    "pack_sequences",
    "pack_best_fit",
    "training_prep",
    "image_metadata",
    "audio_metadata",
    "split_contamination",
]


def main() -> None:
    from traits_data_spark import catalog
    from traits_data_spark.session import get_spark

    spark = get_spark("traits-data-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM / whole-stage-codegen warmup: run every benched plan once at
    # the smallest scale factor so the timed pass measures steady-state
    # execution, not first-use JIT compilation (worth ~8s on the first
    # md5-heavy plan otherwise).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in BENCH_QUERIES:
        try:
            catalog.QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        spark.catalog.clearCache()

    # Local-mode wall clocks vary ±20% run-to-run (GC, JIT, OS cache);
    # min-of-N is the stable statistic for regression tracking. The two
    # heaviest flagships get an extra rep so their round-over-round
    # deltas outrun the noise floor.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    extra_rep = {"clean_corpus", "training_prep", "curate_corpus"}
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = catalog.QUERIES[name]
        best = None
        for _ in range(max(reps, 3) if name in extra_rep else reps):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # queries that persist intermediates (LSH signature tables,
            # corpus barriers) must not leak cache blocks into the next
            # run — eviction thrash would charge query N's cost to
            # query N+1.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    total = round(sum(timings.values()), 3)
    # Record host load so a contended run is distinguishable from a
    # regression when comparing rounds (wall clocks here swing ±30%
    # when the host is loaded by other tenants).
    try:
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = None
    print(
        json.dumps(
            {
                "metric": "catalog_headline_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "load_avg_1m": load1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
