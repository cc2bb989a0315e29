"""clean_corpus pipeline: every stage's effect visible on a planted
fixture."""

from traits_data_spark.plans.corpus import clean_corpus


def test_clean_corpus_stages(spark):
    long = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, long),                                  # keeper
        (2, long),                                  # exact dup of 1 → dropped
        (3, long.replace("dog", "cat")),            # near dup of 1 → dropped
        (4, "short text"),                          # too few words
        (5, "!!! ??? *** !!! ??? *** !!! ??? *** !!!"),  # punct-heavy + und
        (6, "zzz qqq xxx yyy www vvv uuu ttt sss rrr"),  # no lang markers → und
        (7, "el perro es una mascota y los gatos son animales de la casa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = clean_corpus(
        df, min_words=5, max_punct_ratio=0.2, jaccard_threshold=0.5,
        num_hashes=16, bands=8,
    )
    kept = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert set(kept) == {1, 7}
    assert kept[1] == "en" and kept[7] == "es"


def test_curate_corpus_invariants(spark, documents):
    import pyspark.sql.functions as F
    from traits_data_spark.operators.dedup import (
        ngram_decontaminate,
        normalized_text,
    )
    from traits_data_spark.plans.curation import curate_corpus

    bench = documents.filter(F.col("source") == "src0")
    corpus = documents.filter(F.col("source") != "src0")
    weights = {"src1": 400_000, "src2": 300_000, "src3": 200_000, "src4": 100_000}
    out = curate_corpus(
        corpus, bench,
        min_words=10, stops=("the", "a", "spark", "stream"),
        weights_ppm=weights, token_budget=2_000,
    ).persist()
    rows = out.collect()
    assert rows
    # only planned sources survive
    assert {r.source for r in rows} <= set(weights)
    # no contaminated doc survives
    contaminated = {
        r.id
        for r in ngram_decontaminate(
            corpus, bench, "text", "doc_id", "doc_id", n=5
        ).collect()
    }
    assert not ({r.doc_id for r in rows} & contaminated)
    # no Jaccard-verified near-dup pair survives intact
    from traits_data_spark.operators.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
    )
    kept_docs = documents.filter(
        F.col("doc_id").isin([r.doc_id for r in rows])
    ).select("doc_id", "text")
    surviving_pairs = jaccard_verify(
        minhash_lsh_candidates(
            kept_docs, "text", "doc_id", num_hashes=16, bands=4
        ),
        kept_docs,
        "text",
        "doc_id",
        threshold=0.8,
    ).collect()
    assert not surviving_pairs
    # exact dedup held: kept ids map to distinct normalized texts
    kept_ids = [r.doc_id for r in rows]
    texts = (
        documents.filter(F.col("doc_id").isin(kept_ids))
        .select(normalized_text(F.col("text")).alias("nt"))
        .collect()
    )
    nts = [r.nt for r in texts]
    assert len(nts) == len(set(nts))
    # shard positions are contiguous rankings
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    out.unpersist()
