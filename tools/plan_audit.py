"""Plan-quality audit: for each headline catalog query, print the
physical-plan properties that matter at 100 TB — input scan count,
shuffle (Exchange) count, broadcast joins, parquet filter pushdown,
and whole-stage-codegen coverage.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]

This is the inspection loop behind the repo's design rules: a query
that re-scans its input N times, shuffles where it needn't, or drops
out of codegen shows up here before it shows up as a bench regression.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "silver_e1",
    "profile_build",
    "gold_ratings",
    "group_zscores",
    "last_n_filter",
    "rollup_grouping_sets",
    "exact_dedup",
    "dup_clusters",
    "decontaminate",
    "repetition_features",
    "redact_pii",
    "temperature_sample",
    "token_budget",
    "quality_classifier",
    "substring_dups",
    "kmeans_clusters",
    "ivf_topk_kmeans",
    "semantic_dedup",
    "funnel_steps",
    "hll_distinct",
    "cms_top_terms",
    "sampled_quantiles",
    "line_dedup",
    "lsh_candidates",
    "jaccard_verify",
    "simhash",
    "cosine_topk",
    "lsh_topk_multiprobe",
    "embedding_near_dups",
    "clean_corpus",
    "event_sessions",
    "event_stats",
    "merge_upsert",
    "distinct_dims",
    "kmv_distinct",
    "rolling_agg",
    "tfidf_top_terms",
    "stratified_sample",
    "pivot_stats",
    "zorder_values",
    "incremental_merge",
    "top_terms",
    "chunk_docs",
    "pack_sequences",
    "training_prep",
]


def audit(plan: str) -> dict:
    return {
        "scans": len(re.findall(r"FileScan parquet", plan)),
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "reused_exchanges": plan.count("ReusedExchange"),
        "broadcasts": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or HEADLINE

    from traits_data_spark import catalog
    from traits_data_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    header = (
        f"{'query':24} {'scans':>5} {'exch':>5} {'reuse':>5} {'bcast':>5} "
        f"{'smj':>4} {'win':>4} {'push':>5} {'wscg':>5}"
    )
    print(header)
    print("-" * len(header))
    for name in names:
        df = catalog.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        print(
            f"{name:24} {a['scans']:>5} {a['exchanges']:>5} "
            f"{a['reused_exchanges']:>5} {a['broadcasts']:>5} "
            f"{a['sort_merge_joins']:>4} {a['windows']:>4} "
            f"{a['pushed_filters']:>5} {a['codegen_stages']:>5}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
