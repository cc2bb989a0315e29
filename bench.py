"""Benchmark harness: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the ONE headline JSON line LAST (compact separators, 2-decimal
per-query values) so a fixed-size stdout tail capture always records
it intact:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>, "load_avg_1m": <load>}

``load_avg_1m`` is the START-of-run 1-minute load (sampled before the
bench drives the box) — the comparability signal; ``bench_results.json``
additionally records ``load_start_1m``/``load_end_1m``.

Full-precision detail (cold = first rep after clearCache, warm = min
of the remaining reps, per flagship) is written to
``bench_results.json`` next to this script — the tail window only
needs to carry the headline.

Each query is materialized end-to-end through the noop sink (full
execution, no driver-side collect bottleneck, no disk write skew).

Startup is LOAD-GATED against the newest pinned anchor (bounded wait
for the 1m and 5m load averages to enter the anchor's ±2 band, then
escalate to min-of-4 tail reps) so a direct ``python bench.py`` —
which is how the round driver invokes it — produces a board whose
bench_compare verdict is binding, not informational.
``SPARK_GRAFT_BENCH_NO_WAIT=1`` opts out (bench_gated owns its own
wait/retry loop).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Flagship pipelines run FIRST: early in the session the JVM is
# fresh (no accumulated GC pressure / code-cache churn from 80 prior
# plans), so their round-over-round deltas are the cleanest regression
# signal. Round 7 measured training_prep at 9.3s when benched in slot
# 81 of a loaded session vs 5.9-6.8s benched first at low load — the
# ordering is part of the measurement.
FLAGSHIPS = [
    "silver_e1",
    "profile_build",
    "profile_build_multi_pass",
    "gold_ratings",
    "clean_corpus",
    "curate_corpus",
    "training_prep",
]

# The headline set: the flagship pipelines plus every operator family
# with real weight at scale (shuffle-heavy, window-heavy, sketching,
# similarity). Names map to traits_data_spark.catalog entries.
BENCH_QUERIES = FLAGSHIPS + [
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
    "image_metadata",
    "audio_metadata",
    "split_contamination",
    "bpe_token_counts",
    "curate_corpus_bpe",
    "incremental_exact_dedup",
    "bpe_token_counts_large",
    "ann_recall",
    "video_metadata",
    "bpe_merge_token_counts",
    "lm_perplexity",
    "webm_metadata",
    "curate_corpus_ppl",
    "lm_perplexity_sampled",
    "winnow_fingerprints",
    "winnow_matches",
    "tokenizer_fertility",
    "pq_topk",
    "bm25_topk",
    "unigram_token_counts",
    "ivfpq_topk",
    "dsir_select",
    "dsir_select_sampled",
    "matryoshka_recall",
    "hard_negatives",
    "vocab_drift",
    "scd2_merge",
    "copy_pagerank",
    "pq_incremental_encode",
    "bpe_train",
    "bpe_train_tokens",
    "train_bigram_lm",
    "bm25_topk_champion",
    "ridge_stats",
    # round 12: trainer triad completion + classifier loop + layout
    "unigram_train",
    "unigram_train_tokens",
    "train_quality_classifier",
    "balanced_shards",
    "shard_local_near_dups",
    "curate_corpus_trained",
    # round 13: multi-assignment recall, sharded-dedup flagship, DSIR
    # trainer chain, serving name search
    "shard_local_near_dups_m2",
    "semantic_dedup_sharded",
    "dsir_train",
    "dsir_train_select",
    "name_search",
    "near_dup_recall_report",
    "curate_corpus_dsir",
    # round 13 second batch: hybrid retrieval fusion, semantic decon,
    # Kneser-Ney LM trainer
    "hybrid_topk_rrf",
    "semantic_decontaminate",
    "train_kn_lm",
    "kn_doc_scores",
    "decontamination_report",
    "hybrid_topk_weighted",
    "curriculum_shards",
    "source_diversity",
    # round 14: modified-KN trainer (KenLM's smoothing class),
    # add-mergeable DSIR count-index chain
    "train_mkn_lm",
    "dsir_train_counts",
    "curriculum_pack",
    # round 15: order-3 interpolated KN (trigram index + continuation
    # backoff chain + train-then-score); DSIR count-index consumption
    # inside the curation chain
    "train_kn3_lm",
    "kn3_doc_scores",
    "curate_corpus_dsir_counts",
    "train_mkn3_lm",
    # round 16: keyed-retraction MERGE, order-4 modified KN
    "merge_upsert_delete",
    "train_mkn4_lm",
    "kn4_doc_scores",
]

# --- Tiered board (round-15 verdict task 5; default re-pinned to
# FULL by round-16 verdict task 2) ----------------------------------
# The round-15 verdict asked for a fast tier (flagships + WATCHLIST +
# RECENT) on most rounds; the round-16 verdict then found the
# round-counting default would have silently shrunk the NEXT driver
# board to ~20 queries, making its headline total incomparable and
# tail regressions invisible — so FULL is now the default and the
# fast tier is explicit opt-in via SPARK_GRAFT_BENCH_TIER=fast (for
# quick local iteration only; a fast board can never be pinned as
# anchor, and bench_compare restricts to the common query subset so
# a fast board still compares against the full anchor cleanly).
# Contract noted in BASELINE.md.

WATCHLIST = [
    "hybrid_topk_rrf",
    "semantic_dedup_sharded",
    "remove_dup_substrings",
    "dsir_select",
    "ngram_jaccard",
    "profile_build_multi_pass",
]

RECENT = [
    "train_kn3_lm",
    "kn3_doc_scores",
    "curate_corpus_dsir_counts",
    "train_mkn3_lm",
    "merge_upsert_delete",
    "train_mkn4_lm",
    "kn4_doc_scores",
]


def inferred_round(here: str) -> int:
    import glob as _glob
    import re as _re

    ns = []
    for p in _glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = _re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            ns.append(int(m.group(1)))
    return (max(ns) + 1) if ns else 1


def board_tier(here: str, anchor_queries) -> str:
    mode = os.environ.get("SPARK_GRAFT_BENCH_TIER", "auto")
    if mode in ("full", "fast"):
        return mode
    return "full"

# Catalog entries EXPLICITLY excluded from the bench board. Every
# catalog query must appear in exactly one of BENCH_QUERIES /
# BENCH_EXCLUDED (tests/test_catalog_window.py asserts the union) so
# a new query can never silently skip the bench_compare regression
# gate — an unbenched regression would otherwise be invisible.
# Exclusion reasons:
# - tiny relational/scalar utilities whose whole runtime is session
#   overhead (sub-100 ms plans: cumcount, scalar_funcs, hash_split,
#   json_props, ...) — the flagship plans exercise the same operators
#   under real data weight;
# - rows-only binary/packing entries (multimodal_features,
#   audio_features) whose cost is the synthetic payload decode, and
#   per-group sub-steps of benched composites (minhash_sigs is inside
#   lsh_candidates; source_mixture is inside mixture_plan).
BENCH_EXCLUDED = {
    "any_union_agg",
    "audio_features",
    "chunk_dedup",
    "cluster_split",
    "cumcount",
    "distinct_dims",
    "feature_filter",
    "filter_small_groups",
    "frame_samples",
    "hash_split",
    "incremental_new_keys",
    "json_props",
    "minhash_sigs",
    "mismatch_join",
    "multimodal_features",
    "null_zero_profile",
    "outer_join_fill",
    "percentile_profile",
    "salted_stats",
    "scalar_funcs",
    "source_mixture",
    "topk_per_group",
    "with_group_rank",
}

# Fixed tail-capture budget on the driver side: the driver records the
# LAST 2000 chars of stdout, and this line prints last — so the line
# itself (plus newline) must stay under 2000 or the recorded artifact
# truncates its head (round 7 lost its first 7 query timings this way).
TAIL_CAPTURE_BUDGET = 1985


def headline_line(timings: dict[str, float], sf, load1) -> str:
    """Build the headline JSON line, guaranteed under the tail budget.

    Degrades precision before coverage: all queries at 2 decimals →
    drop the load field → 1 decimal → flagships-only. Full 3-decimal
    detail (plus cold/warm and load) is always in bench_results.json,
    so the stdout line only has to carry the round-over-round shape.
    """
    total = round(sum(timings.values()), 2)

    def build(q: dict[str, float], load) -> str:
        body = {
            "metric": "catalog_headline_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": q,
            "sf": sf,
        }
        if load is not None:
            body["load_avg_1m"] = load
        return json.dumps(body, separators=(",", ":"))

    attempts = [
        ({k: round(v, 2) for k, v in timings.items()}, load1),
        ({k: round(v, 2) for k, v in timings.items()}, None),
        ({k: round(v, 1) for k, v in timings.items()}, None),
        (
            {k: round(timings[k], 2) for k in FLAGSHIPS if k in timings},
            load1,
        ),
    ]
    for q, load in attempts:
        line = build(q, load)
        if len(line) <= TAIL_CAPTURE_BUDGET:
            return line
    # Pathological fallback (huge sf repr / load repr): a minimal line
    # that is ALWAYS under budget — total + sf only, no per-query map.
    # bench_results.json still carries everything.
    return json.dumps(
        {
            "metric": "catalog_headline_wall_seconds",
            "value": total,
            "unit": "sec",
            "sf": sf,
        },
        separators=(",", ":"),
    )[:TAIL_CAPTURE_BUDGET]


def _free_storage(spark) -> None:
    """Free EVERY storage block between benched queries, BLOCKING.
    Two measured round-10 mechanisms behind the warm>first_rep
    inversions (SCALE.md):

    - ``clearCache()`` never drops ``localCheckpoint`` blocks (kmeans
      fits, CC iteration checkpoints) — they outlive it and degrade
      later heavy-persist queries (curate_corpus floor 6.2 s isolated
      → 9.0 s after the checkpoint-heavy ANN/dedup family). The
      persistent-RDD registry sweep below catches them.
    - ``clearCache()``/``unpersist()`` default to ASYNC block removal,
      so rep N's drop work lands inside rep N+1's timed window on
      persist-heavy plans — curate_corpus reps [7.5, 9.4, 6.8, 6.1]
      async vs [6.1, 6.2, 6.4, 7.2] with blocking unpersist.
      ``unpersist(True)`` moves that cost out here, untimed.

    Safe between queries: nothing references the cached/checkpointed
    plans once the noop write completes."""
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist(True)
    spark.catalog.clearCache()


def main() -> None:
    from tools.benchlib import (
        anchor_start_load,
        git_sha,
        latest_anchor,
        wait_for_band,
    )

    from traits_data_spark import catalog
    from traits_data_spark.session import get_spark

    here = os.path.dirname(os.path.abspath(__file__))

    # Load-gate the run AT THE SOURCE (round-14 verdict task 1): the
    # driver invokes bench.py directly, bypassing tools/bench_gated.py,
    # so every driver board through r14 landed at whatever load the
    # preceding pipeline stages left behind (r14: 4.8 vs the anchor's
    # 0.1) and bench_compare downgraded to informational. Bounded wait
    # for the 1m AND 5m averages to enter the anchor's band; on timeout
    # escalate the tail to min-of-4 reps so a contended board's minima
    # are at least noise-resistant. Opt out with
    # SPARK_GRAFT_BENCH_NO_WAIT=1 (bench_gated sets it: it owns the
    # wait/retry loop itself and must not pay the wait twice).
    escalated = False
    if os.environ.get("SPARK_GRAFT_BENCH_NO_WAIT") != "1":
        anc = latest_anchor(here)
        target = anchor_start_load(anc) if anc else None
        if target is not None:
            max_wait = float(
                os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "600")
            )
            poll_s = float(os.environ.get("SPARK_GRAFT_BENCH_POLL_S", "30"))
            if not wait_for_band(target, max_wait, poll_s, tag="bench"):
                escalated = True
                print(
                    "bench: ESCALATING to min-of-4 tail reps; treat "
                    "per-query deltas as contended"
                )

    # Sample host load BEFORE the bench drives it: the end-of-run
    # 1-minute average mostly measures the bench itself (~12 after two
    # minutes of local[32] at full tilt), so BASELINE.md's ±2
    # comparability band is defined over THIS value; the end value is
    # still recorded to show how hard the run pushed the box.
    try:
        load_start = round(os.getloadavg()[0], 1)
    except OSError:
        load_start = None

    spark = get_spark("traits-data-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Fail loudly on unknown names: a misspelled or not-yet-registered
    # query silently vanishing from the headline produced a committed
    # baseline that never benched the round's new flagships once —
    # never again.
    missing = [n for n in BENCH_QUERIES if n not in catalog.QUERIES]
    if missing:
        raise SystemExit(
            f"BENCH_QUERIES not in catalog.QUERIES: {missing}"
        )

    # Tiered board: FULL unless explicitly opted out (see the TIER
    # contract above); the anchor-pinning step must only ever pin a
    # board whose "tier" field reads "full".
    tier = board_tier(here, None)
    rnd = inferred_round(here)
    if tier == "fast":
        keep = set(FLAGSHIPS) | set(WATCHLIST) | set(RECENT)
        board = [n for n in BENCH_QUERIES if n in keep]
        print(
            f"bench: FAST tier (inferred round {rnd}, env opt-in) — "
            f"{len(board)}/{len(BENCH_QUERIES)} queries (flagships + "
            "watchlist + last-two-rounds); unset SPARK_GRAFT_BENCH_TIER "
            "for the comparable full board"
        )
    else:
        board = list(BENCH_QUERIES)
        print(f"bench: FULL tier (inferred round {rnd}) — "
              f"{len(board)} queries")
    # Flagships keep their fixed fresh-JVM slots; the long tail runs in
    # a RANDOMIZED order so a query's slot position (GC pressure /
    # code-cache churn accumulating through the shared session) averages
    # out across rounds instead of biasing the same families every time
    # — rounds 7 and 8 both mis-read slot drift as plan regressions.
    # The seed is recorded in bench_results.json; set
    # SPARK_GRAFT_BENCH_SEED to reproduce a specific order.
    seed_env = os.environ.get("SPARK_GRAFT_BENCH_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(4), "big")
    tail = [n for n in board if n not in FLAGSHIPS]
    random.Random(seed).shuffle(tail)
    bench_queries = FLAGSHIPS + tail

    # JVM / whole-stage-codegen warmup: run every benched plan once at
    # the smallest scale factor so the timed pass measures steady-state
    # execution, not first-use JIT compilation (worth ~8s on the first
    # md5-heavy plan otherwise).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in bench_queries:
        try:
            catalog.QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        _free_storage(spark)

    # Local-mode wall clocks vary ±20% run-to-run (GC, JIT, OS cache);
    # min-of-N is the stable statistic for regression tracking. The
    # flagships get an extra rep so their round-over-round deltas
    # outrun the noise floor, and their rep-1 (cold: page cache +
    # shuffle files dropped by clearCache) vs min-of-rest (warm) are
    # recorded separately — a regression in either mode is visible.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    if escalated:
        reps = max(reps, 4)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in bench_queries:
        fn = catalog.QUERIES[name]
        rep_times = []
        n_reps = max(reps, 3) if name in FLAGSHIPS else reps
        for _ in range(n_reps):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            rep_times.append(time.time() - t0)
            # queries that persist intermediates (LSH signature tables,
            # corpus barriers) must not leak cache blocks into the next
            # run — eviction thrash would charge query N's cost to
            # query N+1.
            _free_storage(spark)
        timings[name] = round(min(rep_times), 3)
        if name in FLAGSHIPS:
            # "first_rep", not "cold": the sf0.001 warmup already
            # JIT-compiled the plan and prior rounds leave the parquet
            # in the OS page cache, so rep 1 measures a JVM-warm,
            # partially cached run — interpret cross-round deltas in
            # this split as cache state + contention, not plan cost.
            cold[name] = round(rep_times[0], 3)
            warm[name] = round(min(rep_times[1:]), 3)

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    # Record host load so a contended run is distinguishable from a
    # regression when comparing rounds (wall clocks here swing ±30%
    # when the host is loaded by other tenants). Comparability is
    # judged on load_start_1m (sampled before the bench ran); the end
    # sample is self-confounded by the bench's own two minutes of
    # local[32] work.
    try:
        load_end = round(os.getloadavg()[0], 1)
    except OSError:
        load_end = None
    load1 = load_start if load_start is not None else load_end

    detail = {
        "metric": "catalog_headline_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "flagship_first_rep": cold,
        "flagship_warm": warm,
        "tail_order_seed": seed,
        "tail_order": tail,
        "sf": sf,
        "load_avg_1m": load1,
        "load_start_1m": load_start,
        "load_end_1m": load_end,
        # code-version stamp: bench_compare only merges per-query
        # minima across boards built from the same commit
        "git_sha": git_sha(here),
        "reps_tail": reps,
        # tier contract: only a "full" board may be pinned as anchor
        "tier": tier,
        "round": rnd,
    }
    out_path = os.path.join(here, "bench_results.json")
    with open(out_path, "w") as fh:
        json.dump(detail, fh, indent=1)
        fh.write("\n")

    # Headline LAST so a fixed-size stdout tail always captures it.
    print(headline_line(timings, sf, load1))
    spark.stop()


if __name__ == "__main__":
    main()
