"""Deterministic hash split / sample: reproducibility is the entire
point, so every test is about invariance — across calls, partitionings,
and growing fractions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from traits_data_spark.quality import percentile_profile


def test_hash_split_is_deterministic_and_partition_invariant(spark, documents):
    docs = documents.select("doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    # every row gets a label; ~90% train (binomial tolerance on 500 docs)
    assert None not in a.values()
    train_frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.84 <= train_frac <= 0.96, train_frac


def test_hash_split_rejects_bad_weights(spark, documents):
    with pytest.raises(ValueError, match="sum to 10000"):
        hash_split(documents, "doc_id", splits=(("a", 5000), ("b", 400)))


def test_hash_split_salt_redeals(spark, documents):
    docs = documents.select("doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", salt="v2").collect()
    }
    assert a != b  # a different salt moves at least some rows


def test_deterministic_sample_nested_fractions(spark, documents):
    docs = documents.select("doc_id")
    small = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert small <= big  # kept sets nest as the fraction grows
    n = docs.count()
    assert abs(len(big) / n - 0.3) < 0.08


def test_percentile_profile_matches_numpy(spark, lineitem):
    out = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in percentile_profile(
            lineitem, ["l_returnflag"], "l_extendedprice"
        ).collect()
    }
    rows = lineitem.select("l_returnflag", "l_extendedprice").collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, vals in by_flag.items():
        assert out[flag][0] == pytest.approx(np.percentile(vals, 50), abs=1e-9)
        assert out[flag][1] == pytest.approx(np.percentile(vals, 95), abs=1e-9)


def test_percentile_profile_approx_form_runs(spark, lineitem):
    out = percentile_profile(
        lineitem, ["l_returnflag"], "l_extendedprice", approx=True
    ).collect()
    assert len(out) == 3 and all(r["p50"] is not None for r in out)


def test_temperature_weights_hand_computed(spark):
    from traits_data_spark.operators.sampling import temperature_weights

    rows = [(i, "big") for i in range(100)] + [(i + 100, "rare") for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    w = {
        r["source"]: r.asDict()
        for r in temperature_weights(df, "source", alpha=0.5, target_frac=1.0).collect()
    }
    # sqrt weights: 10 vs 5 -> 2/3 vs 1/3
    assert w["big"]["weight"] == 0.666667
    assert w["rare"]["weight"] == 0.333333
    # big is downsampled: target 125*2/3=83 of 100 docs -> 8300 buckets
    assert w["big"]["bucket_threshold"] == 8300
    # rare is upsampled beyond its size -> capped at the full group
    assert w["rare"]["bucket_threshold"] == 10000


def test_temperature_sample_deterministic_and_capped(spark):
    from traits_data_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(100)] + [(i + 100, "rare") for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = sorted(
        r["doc_id"]
        for r in temperature_sample(df, "source", "doc_id", alpha=0.5).collect()
    )
    out2 = sorted(
        r["doc_id"]
        for r in temperature_sample(df, "source", "doc_id", alpha=0.5).collect()
    )
    assert out1 == out2  # reproducible
    kept = temperature_sample(df, "source", "doc_id", alpha=0.5)
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert by_src["rare"] == 25  # capped: every rare doc kept
    assert by_src["big"] < 100   # majority downsampled


def test_token_budget_filter_prefix_semantics(spark):
    from traits_data_spark.operators.sampling import token_budget_filter

    rows = [
        # (id, src, quality, tokens)
        (1, "a", 9.0, 50),
        (2, "a", 8.0, 40),
        (3, "a", 7.0, 40),   # cum 130 > 100 -> dropped
        (4, "a", 6.0, 5),    # after an over-budget doc, still dropped (strict prefix? no: cum=135)
        (5, "b", 1.0, 100),  # exactly at budget -> kept
        (6, "b", 0.5, 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality", "tokens"])
    kept = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_filter(
            df, "source", "quality", "tokens", 100, "doc_id"
        ).collect()
    }
    assert kept == {1: 50, 2: 90, 5: 100}


def test_token_budget_deterministic_tiebreak(spark):
    from traits_data_spark.operators.sampling import token_budget_filter

    # equal quality: id ascending admits 10 then 11; 12 busts the budget
    rows = [(i, "s", 5.0, 60) for i in (12, 10, 11)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality", "tokens"])
    kept = sorted(
        r["doc_id"]
        for r in token_budget_filter(
            df, "source", "quality", "tokens", 120, "doc_id"
        ).collect()
    )
    assert kept == [10, 11]


def test_cluster_split_no_near_dup_leakage(spark, documents):
    """All members of a duplicate cluster share one split label."""
    from pyspark.sql import functions as F

    from traits_data_spark.operators.dedup import (
        dedup_clusters,
        simhash_near_dups,
    )
    from traits_data_spark.operators.sampling import hash_split

    docs = documents.select("doc_id", "text")
    pairs = simhash_near_dups(docs, "text", "doc_id", bands=4, max_hamming=6)
    clustered = dedup_clusters(docs, pairs, "doc_id")
    out = hash_split(clustered, "component")
    leaks = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert leaks == 0


def test_shuffle_shards_deterministic_and_complete(spark, documents):
    from traits_data_spark.operators.sampling import shuffle_shards

    ids = documents.select("doc_id")
    a = shuffle_shards(ids, "doc_id", n_shards=8, salt="ep0")
    b = shuffle_shards(ids, "doc_id", n_shards=8, salt="ep0")
    ra = {(r.doc_id, r.shard, r.shard_pos) for r in a.collect()}
    rb = {(r.doc_id, r.shard, r.shard_pos) for r in b.collect()}
    assert ra == rb and len(ra) == ids.count()
    # every shard's positions are a contiguous 1..n ranking
    by_shard = {}
    for _, sh, pos in ra:
        by_shard.setdefault(sh, []).append(pos)
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # partitioning-invariant: same assignment from a different layout
    c = shuffle_shards(ids.repartition(13), "doc_id", n_shards=8, salt="ep0")
    assert {(r.doc_id, r.shard, r.shard_pos) for r in c.collect()} == ra


def test_shuffle_shards_salt_reshuffles(spark, documents):
    from traits_data_spark.operators.sampling import shuffle_shards

    ids = documents.select("doc_id")
    a = {(r.doc_id, r.shard) for r in
         shuffle_shards(ids, "doc_id", n_shards=8, salt="ep0").collect()}
    b = {(r.doc_id, r.shard) for r in
         shuffle_shards(ids, "doc_id", n_shards=8, salt="ep1").collect()}
    assert a != b  # a fresh epoch deals differently


def test_mixture_plan_hand_computed(spark):
    from traits_data_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 10), ("a", 30), ("b", 25), ("c", 100)],
        "src string, toks long",
    )
    out = {
        r.source: r
        for r in mixture_plan(
            df, "src", "toks", {"a": 750_000, "b": 250_000}, 1_000
        ).collect()
    }
    # a: 40 tokens available, target 750, epochs 18.75 -> 19 repeats
    assert out["a"].n_docs == 2 and out["a"].n_tokens == 40
    assert out["a"].target_tokens == 750
    assert out["a"].epochs_ppm == 18_750_000
    assert out["a"].repeat_epochs == 19
    # b: 25 tokens, target 250, exactly 10 epochs
    assert out["b"].target_tokens == 250
    assert out["b"].epochs_ppm == 10_000_000
    assert out["b"].repeat_epochs == 10
    # c: not in the plan -> weight 0, nothing requested
    assert out["c"].weight_ppm == 0
    assert out["c"].target_tokens == 0 and out["c"].repeat_epochs == 0


def test_epoch_expand_hand_computed(spark):
    import hashlib
    from traits_data_spark.operators.sampling import epoch_expand

    rows = [(i, ppm) for i, ppm in enumerate(
        [0, 1_000_000, 2_300_000, 500_000, 10_000_000, -5]
    )]
    df = spark.createDataFrame(rows, "doc_id long, epochs_ppm long")
    got = {}
    for r in epoch_expand(df, "doc_id", "epochs_ppm").collect():
        got.setdefault(r.doc_id, []).append(r.epoch)
    def bucket(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 10000
    for doc_id, ppm in rows:
        n = max(ppm, 0) // 1_000_000 + (
            1 if bucket(doc_id) * 100 < max(ppm, 0) % 1_000_000 else 0
        )
        if n == 0:
            assert doc_id not in got, doc_id
        else:
            assert sorted(got[doc_id]) == list(range(n)), doc_id
    # a 2.3-epoch plan over many docs lands close to 2.3x in expectation
    many = spark.createDataFrame(
        [(i, 2_300_000) for i in range(1000)], "doc_id long, epochs_ppm long"
    )
    total = epoch_expand(many, "doc_id", "epochs_ppm").count()
    assert 2200 <= total <= 2400
