"""W1-W3, A7-A8, O1, P9 — rank-tie boundary semantics are the
reference-parity detail worth pinning (SURVEY.md §7.3)."""

from pyspark.sql import functions as F

from traits_data_spark.operators.windows import (
    cumcount,
    dedup_keep_best,
    filter_small_groups,
    last_n_filter,
    with_group_rank,
)


def _games(spark):
    # player p1: matchId 30 is tied as the 4th-most-recent game, so the
    # tie sits exactly on the last-4 boundary
    rows = [
        ("p1", 20, 1.0), ("p1", 30, 2.0), ("p1", 30, 3.0), ("p1", 40, 4.0),
        ("p1", 50, 5.0), ("p1", 60, 6.0),
        ("p2", 10, 1.0), ("p2", 20, 2.0),
    ]
    return spark.createDataFrame(rows, ["player", "match_id", "x"])


def test_rank_ties_at_last_n_boundary_included(spark):
    """rank() (the reference's choice) admits BOTH tied rows when the
    tie sits at the boundary — 5 rows for p1, not 4."""
    df = _games(spark)
    out = last_n_filter(df, ["player"], "match_id", 4, use_rank=True)
    p1 = out.filter(F.col("player") == "p1").count()
    assert p1 == 5
    strict = last_n_filter(df, ["player"], "match_id", 4, use_rank=False)
    assert strict.filter(F.col("player") == "p1").count() == 4


def test_rank_vs_row_number_values(spark):
    df = _games(spark)
    ranked = with_group_rank(
        df, ["player"], [F.col("match_id").desc()], rank_col="r", use_rank=True
    )
    rs = sorted(
        r["r"] for r in ranked.filter(F.col("player") == "p1").collect()
    )
    # ties share rank 4; rank 5 skipped
    assert rs == [1, 2, 3, 4, 4, 6]


def test_small_group_filter_is_exact(spark):
    df = _games(spark)
    out = filter_small_groups(df, ["player"], 3)
    assert {r["player"] for r in out.collect()} == {"p1"}
    assert out.count() == 6


def test_dedup_keep_best_deterministic(spark):
    df = _games(spark)
    out = dedup_keep_best(
        df, ["player"], [F.col("match_id").desc(), F.col("x").desc()]
    )
    best = {r["player"]: r["x"] for r in out.collect()}
    assert best == {"p1": 6.0, "p2": 2.0}


def test_cumcount_zero_based_dense(spark):
    df = _games(spark)
    out = cumcount(df, ["player"], ["match_id", "x"], out_col="seq")
    seqs = sorted(
        r["seq"] for r in out.filter(F.col("player") == "p1").collect()
    )
    assert seqs == [0, 1, 2, 3, 4, 5]
