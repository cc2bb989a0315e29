"""§5 pipeline invariant checks."""

import pytest

from traits_data_spark.quality import (
    QualityError,
    assert_distribution,
    assert_max_multiplicity,
    assert_not_null,
    assert_unique_key,
    null_zero_profile,
)


def test_unique_key_pass_and_fail(spark):
    ok = spark.createDataFrame([(1,), (2,)], ["k"])
    assert_unique_key(ok, ["k"])
    dup = spark.createDataFrame([(1,), (1,)], ["k"])
    with pytest.raises(QualityError):
        assert_unique_key(dup, ["k"])


def test_max_multiplicity(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    assert_max_multiplicity(df, ["k"], 2)
    with pytest.raises(QualityError):
        assert_max_multiplicity(df, ["k"], 1)


def test_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "v"])
    assert_not_null(df, ["k"])
    with pytest.raises(QualityError):
        assert_not_null(df, ["v"])


def test_distribution_band(spark):
    df = spark.createDataFrame([(float(x),) for x in range(100)], ["x"])
    assert_distribution(df, "x", sigma_band=4.0)
    flat = spark.createDataFrame([(1.0,), (1.0,)], ["x"])
    with pytest.raises(QualityError):
        assert_distribution(flat, "x")


def test_null_zero_profile(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (None,), (0.0,)], ["x"]
    )
    r = null_zero_profile(df, ["x"]).collect()[0]
    assert r["pct_null_x"] == 25.0
    assert r["pct_zero_x"] == 50.0


def test_summarize_one_row_per_column(spark, lineitem, embeddings):
    from traits_data_spark.quality import summarize

    out = {r["column"]: r for r in summarize(lineitem).collect()}
    assert set(out) == set(lineitem.columns)
    n = lineitem.count()
    for c, r in out.items():
        assert r["n_rows"] == n
        assert r["n_nulls"] == 0
    qty = out["l_quantity"]
    assert float(qty["min_str"]) >= 1.0
    # approx distinct within 20% of exact for a plain column
    exact = lineitem.select("l_suppkey").distinct().count()
    assert abs(out["l_suppkey"]["approx_distinct"] - exact) <= max(2, exact * 0.2)
    # array column (embeddings.embedding) profiles without error
    emb = {r["column"]: r for r in summarize(embeddings).collect()}
    assert emb["embedding"]["n_nulls"] == 0


def test_summarize_is_single_job_plan(spark, lineitem):
    from traits_data_spark.quality import summarize

    plan = summarize(lineitem)._jdf.queryExecution().executedPlan().toString()
    # one scan, no joins — every stat comes from a single aggregation
    assert plan.count("FileScan parquet") == 1


def test_corpus_report_surfaces_all_null_source(spark):
    """Pins the full-outer report shape q_corpus_report uses: a source
    whose documents are ALL null text still appears in the datasheet
    (n_docs 0, its null count) instead of vanishing."""
    import pyspark.sql.functions as F

    # synthetic: one healthy source, one whose docs are ALL null text
    docs = spark.createDataFrame(
        [(1, "srcA", "the a spark stream " * 10)]
        + [(i, "srcB", None) for i in range(2, 6)],
        "doc_id long, source string, text string",
    )
    from traits_data_spark.functions.scalars import portable_hash64
    from traits_data_spark.operators.dedup import normalized_text
    from traits_data_spark.operators.text import gopher_rules, word_array

    scored = (
        gopher_rules(
            docs.filter(F.col("text").isNotNull()),
            min_words=5,
            stops=("the", "a", "spark", "stream"),
        )
        .select(
            "source",
            "keep",
            F.size(word_array("text")).cast("long").alias("__tok"),
            portable_hash64(normalized_text(F.col("text"))).alias("__ch"),
        )
    )
    occ = scored.groupBy("__ch").agg(F.count(F.lit(1)).alias("__occ"))
    rep = (
        scored.join(occ, "__ch")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    nulls = (
        docs.filter(F.col("text").isNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("null_texts"))
    )
    out = {
        r.source: (r.n_docs, r.null_texts)
        for r in rep.join(nulls, "source", "full_outer")
        .select(
            "source",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("null_texts", F.lit(0)).alias("null_texts"),
        )
        .collect()
    }
    # the all-null source appears with its null count, not silently absent
    assert out["srcB"] == (0, 4)
    assert out["srcA"] == (1, 0)
