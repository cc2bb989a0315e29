"""Skew-mitigation operators: salted join equivalence, two-phase agg."""

from pyspark.sql import functions as F

from traits_data_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # key 1 is hot (40 rows), keys 2-5 have one row each
    rows = [(1, i) for i in range(40)] + [(k, 0) for k in range(2, 6)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 5)], ["k", "name"]
    )
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, ["k"], salt=4)
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(big, small, ["k"], salt=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("name").isNull()).count() == 4


def test_salted_join_spreads_hot_key(spark):
    big = _skewed(spark)
    salted = big.withColumn("__salt", (F.rand(seed=42) * 4).cast("int"))
    n_salts = (
        salted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_salts > 1  # the hot key really lands in multiple buckets


def test_two_phase_agg_matches_single_phase(spark):
    df = _skewed(spark)
    out = two_phase_agg(
        df,
        ["k"],
        partials={
            "sum_v": F.sum("v"),
            "n": F.count(F.lit(1)),
            "max_v": F.max("v"),
        },
        combiners={"max_v": F.max},
        salt=4,
    )
    expect = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("n"),
        F.max("v").alias("max_v"),
    )
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in expect.collect()
    )
