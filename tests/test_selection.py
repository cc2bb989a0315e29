"""DSIR importance-based data selection: feature grams, pure-Python
weight parity against the committed artifact, empty/null docs, exact
top-k selection arithmetic, and the sampled-threshold path."""

import hashlib
import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from traits_data_spark.operators.selection import (
    DSIR_MODEL_PATH,
    N_BUCKETS,
    dsir_select,
    dsir_select_sampled,
    dsir_weights,
    load_dsir_model,
    word_grams,
)


def _grams_py(text):
    if text is None:
        return []
    ws = [
        w for w in re.sub(r"\s+", " ", text).strip().lower().split(" ") if w
    ]
    return ws + [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]


def _bucket_py(g):
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:7], 16) % N_BUCKETS


def test_word_grams_tiny_docs(spark):
    df = spark.createDataFrame(
        [(1, "Alpha  beta gamma"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_grams().alias("g")).collect()
    }
    assert out[1] == [
        "alpha", "beta", "gamma", "alpha beta", "beta gamma",
    ]
    assert out[2] == ["solo"]  # no F.sequence(1, 0) descent
    assert out[3] == []
    assert out[4] is None


def test_dsir_weights_matches_pure_python_reference(spark, documents):
    """Independent-implementation parity: recompute every document's
    (n_feats, weight_micro) in plain Python from the committed dense
    model and require exact equality on real corpus text."""
    mt = pq.read_table(DSIR_MODEL_PATH)
    delta = dict(
        zip(mt.column("bucket").to_pylist(),
            mt.column("delta_micro").to_pylist())
    )
    assert len(delta) == N_BUCKETS  # dense: the broadcast join is total

    docs = documents.select("doc_id", "text").limit(120)
    model = load_dsir_model(spark)
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_micro"])
        for r in dsir_weights(docs, model).collect()
    }
    want = {}
    for r in docs.collect():
        gs = _grams_py(r["text"])
        want[r["doc_id"]] = (
            len(gs), sum(delta[_bucket_py(g)] for g in gs)
        )
    assert got == want


def test_dsir_weights_empty_and_null_docs(spark):
    model = load_dsir_model(spark)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dsir_weights(df, model).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_feats"] == 0
        assert out[d]["weight_micro"] == 0


def test_dsir_select_top_fraction_arithmetic(spark, documents):
    docs = documents.select("doc_id", "text").limit(200)
    model = load_dsir_model(spark)
    rows = dsir_select(docs, model, keep_bp=2_500).collect()
    n = len(rows)
    picked = [r for r in rows if r["selected"]]
    # rn0 * 10000 < n * 2500  <=>  rn0 < n/4  => ceil(n/4) selected
    assert len(picked) == -(-n * 2_500 // 10_000)
    # selection is exactly the top of the (weight DESC, id ASC) order
    order = sorted(rows, key=lambda r: (-r["weight_micro"], r["doc_id"]))
    assert {r["doc_id"] for r in order[: len(picked)]} == {
        r["doc_id"] for r in picked
    }


def test_dsir_select_targets_english(spark, documents):
    """Direction check: the committed model was fit with target =
    lang='en', so English documents must score higher on average and
    be over-selected relative to the pool."""
    model = load_dsir_model(spark)
    out = dsir_select(
        documents.select("doc_id", "text"), model
    ).join(documents.select("doc_id", "lang"), "doc_id")
    agg = {
        r["is_en"]: (r["mw"], r["sel"], r["n"])
        for r in out.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(
            F.avg("weight_micro").alias("mw"),
            F.avg(F.col("selected").cast("double")).alias("sel"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert agg[True][0] > agg[False][0]  # mean weight
    assert agg[True][1] > agg[False][1]  # selection rate


def test_dsir_select_sampled_full_sample_matches_exact_up_to_ties(
    spark, documents
):
    """At a 100% sample the threshold path selects the exact top set
    plus any docs tied with the cut value (ties INCLUDE by contract)."""
    docs = documents.select("doc_id", "text").limit(200)
    model = load_dsir_model(spark)
    exact = {
        r["doc_id"]: r
        for r in dsir_select(docs, model, keep_bp=2_500).collect()
    }
    sampled = {
        r["doc_id"]: r
        for r in dsir_select_sampled(
            docs, model, keep_bp=2_500, rate_bp=10_000
        ).collect()
    }
    ex = {d for d, r in exact.items() if r["selected"]}
    sa = {d for d, r in sampled.items() if r["selected"]}
    assert ex <= sa
    cut = min(exact[d]["weight_micro"] for d in ex)
    assert all(sampled[d]["weight_micro"] == cut for d in sa - ex)
    # and the threshold is monotone: nothing below the cut selected
    assert all(sampled[d]["weight_micro"] >= cut for d in sa)
