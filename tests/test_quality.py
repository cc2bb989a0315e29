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
