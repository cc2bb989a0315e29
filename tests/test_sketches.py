"""KMV distinct sketch, rolling range windows, TF-IDF, stratified
sampling, pivot — the round-2 additions, checked against exact/numpy
references."""

import math

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.pivot import pivot_wide, unpivot_long
from traits_data_spark.operators.sampling import stratified_sample
from traits_data_spark.operators.sketches import kmv_distinct
from traits_data_spark.operators.text import tfidf_top_terms
from traits_data_spark.operators.windows import rolling_range_agg


def test_kmv_small_group_is_exact(spark, lineitem):
    out = {
        r["l_returnflag"]: r
        for r in kmv_distinct(
            lineitem, ["l_returnflag"], "l_partkey", k=64
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for flag, row in out.items():
        assert row["n_distinct"] == exact[flag]
        if exact[flag] < 64:
            assert row["distinct_est"] == exact[flag]
        else:
            # KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
            assert abs(row["distinct_est"] - exact[flag]) <= exact[flag] * 0.55


def test_kmv_rejects_tiny_k(spark, lineitem):
    with pytest.raises(ValueError):
        kmv_distinct(lineitem, ["l_returnflag"], "l_partkey", k=1)


def test_rolling_range_agg_matches_bruteforce(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) DIV 86400").alias(
            "day"
        ),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    out = rolling_range_agg(
        orders,
        ["o_custkey"],
        "day",
        6,
        {"cents_7d": F.sum("cents"), "n_7d": F.count(F.lit(1))},
    ).collect()
    rows = orders.collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for r in out:
        peers = [
            p
            for p in by_cust[r["o_custkey"]]
            if r["day"] - 6 <= p["day"] <= r["day"]
        ]
        assert r["cents_7d"] == sum(p["cents"] for p in peers)
        assert r["n_7d"] == len(peers)


def test_tfidf_scores_and_topk(spark, documents):
    k = 3
    out = tfidf_top_terms(documents.select("doc_id", "text"), k=k).collect()
    docs = {r["doc_id"]: r["text"] for r in documents.collect()}
    n = len(docs)
    # python reference
    tf: dict[tuple, int] = {}
    dfreq: dict[str, set] = {}
    for did, text in docs.items():
        for w in text.split():
            w = w.lower()
            tf[(did, w)] = tf.get((did, w), 0) + 1
            dfreq.setdefault(w, set()).add(did)
    per_doc: dict[int, list] = {}
    for (did, w), c in tf.items():
        idf = round(math.log((n + 1.0) / (len(dfreq[w]) + 1.0)), 6)
        per_doc.setdefault(did, []).append((round(c * idf, 6), w, c))
    for r in out:
        ranked = sorted(
            per_doc[r["doc_id"]], key=lambda t: (-t[0], t[1])
        )[:k]
        assert (r["score"], r["term"], r["tf"]) in ranked
    # exactly k rows per doc (documents all have >= k distinct terms)
    counts: dict[int, int] = {}
    for r in out:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    assert set(counts.values()) == {k}


def test_stratified_sample_deterministic_and_bounded(spark, documents):
    fr = {"en": 0.2, "zh": 0.5}
    a = stratified_sample(documents, "lang", fr, "doc_id", default_fraction=1.0)
    b = stratified_sample(
        documents.repartition(5), "lang", fr, "doc_id", default_fraction=1.0
    )
    ka = sorted(r["doc_id"] for r in a.collect())
    kb = sorted(r["doc_id"] for r in b.collect())
    assert ka == kb
    by_lang_in = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang_out = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # non-listed strata kept whole; listed strata actually downsampled
    for lang, n_in in by_lang_in.items():
        if lang not in fr:
            assert by_lang_out.get(lang) == n_in
        else:
            assert by_lang_out.get(lang, 0) < n_in


def test_stratified_subset_of_larger_fraction(spark, documents):
    small = stratified_sample(documents, "lang", {"en": 0.1}, "doc_id")
    large = stratified_sample(documents, "lang", {"en": 0.4}, "doc_id")
    s = {r["doc_id"] for r in small.collect()}
    l = {r["doc_id"] for r in large.collect()}
    assert s <= l


def test_pivot_roundtrip(spark, lineitem):
    wide = pivot_wide(
        lineitem,
        ["l_returnflag"],
        "l_linestatus",
        ["O", "F"],
        F.expr("SUM(CAST(l_quantity AS BIGINT))"),
        prefix="qty_",
    )
    rows = {r["l_returnflag"]: r for r in wide.collect()}
    exact = {
        (r["l_returnflag"], r["l_linestatus"]): r["q"]
        for r in lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .collect()
    }
    for (flag, status), q in exact.items():
        assert rows[flag][f"qty_{status}"] == q
    # unpivot back to long: one row per (flag, status) with a value
    long = unpivot_long(
        wide, ["l_returnflag"], ["qty_O", "qty_F"], "status", "qty"
    ).collect()
    assert len(long) == len(rows) * 2


def test_kmv_set_ops_exact_below_k_and_bounded_above(spark):
    from traits_data_spark.operators.sketches import kmv_set_ops

    # groups small enough that the merged sketch is exact
    rows = [("a", v) for v in range(20)] + [("b", v) for v in range(10, 40)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_set_ops(df, "g", "v", k=64).collect()[0]
    assert r.union_distinct == 40  # |0..39|
    assert r.intersect_distinct == 10  # |10..19|
    # large overlapping groups: estimates land within the KMV error
    # band (~1/sqrt(k-1) ≈ 12.6% at k=64; allow 3 sigma)
    big = [("a", v) for v in range(2000)] + [("b", v) for v in range(1000, 3000)]
    df2 = spark.createDataFrame(big, "g string, v long")
    r2 = kmv_set_ops(df2, "g", "v", k=64).collect()[0]
    assert abs(r2.union_distinct - 3000) <= 3000 * 0.38
    assert abs(r2.intersect_distinct - 1000) <= 1000 * 0.75
