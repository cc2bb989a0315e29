"""W2/D5 — the z-score ladder's edge semantics
(LOADERS/GOLD-data-loader.py:219-234): null→0, zero-variance→0,
inverse ×−1, eligibility-gated population, sample (ddof=1) std."""

import math

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.zscore import group_stats, group_zscores


def test_basic_sample_std(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0)], ["grp", "x"]
    )
    out = group_zscores(df, ["grp"], ["x"]).collect()
    zs = sorted(r["zs_x"] for r in out)
    assert zs == pytest.approx([-1.0, 0.0, 1.0])  # std_samp = 1.0


def test_null_value_scores_zero(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)], ["grp", "x"]
    )
    out = {r["x"]: r["zs_x"] for r in group_zscores(df, ["grp"], ["x"]).collect()}
    assert out[None] == 0.0


def test_zero_variance_scores_zero(spark):
    df = spark.createDataFrame([("g", 5.0), ("g", 5.0)], ["grp", "x"])
    out = group_zscores(df, ["grp"], ["x"]).collect()
    assert all(r["zs_x"] == 0.0 for r in out)


def test_single_row_group_scores_zero(spark):
    df = spark.createDataFrame([("g", 5.0)], ["grp", "x"])
    out = group_zscores(df, ["grp"], ["x"]).collect()
    assert out[0]["zs_x"] == 0.0  # stddev_samp of 1 row is null → 0


def test_inverse_stat_negated(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0)], ["grp", "x"]
    )
    out = group_zscores(df, ["grp"], ["x"], inverse_stats=["x"]).collect()
    zs = sorted(r["zs_x"] for r in out)
    assert zs == pytest.approx([-1.0, 0.0, 1.0])  # symmetric, but...
    by_x = {r["x"]: r["zs_x"] for r in out}
    assert by_x[1.0] == pytest.approx(1.0)  # smallest value now best


def test_eligible_population_gates_stats_but_scores_all(spark):
    """The reference excludes ANY rows from mean/std but still scores
    them (GOLD-data-loader.py:446-448,466-471)."""
    rows = [("g", "A", 1.0), ("g", "A", 3.0), ("g", "ANY", 100.0)]
    df = spark.createDataFrame(rows, ["grp", "pos", "x"])
    out = group_zscores(
        df, ["grp"], ["x"], eligible=F.col("pos") != "ANY"
    ).collect()
    by = {r["pos"]: r["zs_x"] for r in out if r["x"] == 100.0}
    # mean=2, std_samp=sqrt(2) from the two eligible rows only
    assert by["ANY"] == pytest.approx((100.0 - 2.0) / math.sqrt(2.0))


def test_population_ddof_switch(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0)], ["grp", "x"]
    )
    out = group_zscores(df, ["grp"], ["x"], population=True).collect()
    by_x = {r["x"]: r["zs_x"] for r in out}
    # population std = sqrt(2/3)
    assert by_x[3.0] == pytest.approx(1.0 / math.sqrt(2.0 / 3.0))


def test_group_stats_table(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["grp", "x"]
    )
    out = {r["grp"]: r for r in group_stats(df, ["grp"], ["x"]).collect()}
    assert out["a"]["mean_x"] == 2.0
    assert out["a"]["std_x"] == pytest.approx(math.sqrt(2.0))
    assert out["b"]["std_x"] is None
