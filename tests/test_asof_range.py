"""As-of join and binned range join: semantics on hand-checked frames
plus the plan shapes that make them scale (no join node for as-of, no
nested-loop for the range join)."""

from pyspark.sql import functions as F

from traits_data_spark.operators.joins import asof_join, range_join_binned


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _asof_frames(spark):
    # state (right): user 1 at t=10 (v=1.0), t=20 (v=2.0); user 2 at t=5
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 5, 9.0)],
        "user_id long, ts long, v double",
    )
    # queries (left): before any state, between states, exactly on a
    # state, after all states, and a user with no state at all
    left = spark.createDataFrame(
        [
            (100, 1, 3),   # before any state -> null
            (101, 1, 15),  # between -> t=10
            (102, 1, 20),  # equal ts -> t=20 (>= semantics)
            (103, 1, 99),  # after all -> t=20
            (104, 3, 50),  # user with no state -> null
        ],
        "qid long, user_id long, ts long",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["v"])
    got = {r["qid"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert got == {
        100: (None, None),
        101: (10, 1.0),
        102: (20, 2.0),
        103: (20, 2.0),
        104: (None, None),
    }


def test_asof_forward_semantics(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["v"], direction="forward")
    got = {r["qid"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert got == {
        100: (10, 1.0),   # earliest at-or-after
        101: (20, 2.0),
        102: (20, 2.0),   # equal ts matches
        103: (None, None),
        104: (None, None),
    }


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["v"], tolerance=10)
    got = {r["qid"]: r["asof_ts"] for r in out.collect()}
    # qid=103 is 79 ticks past the last state -> nulled; 101/102 within 10
    assert got[103] is None
    assert got[101] == 10 and got[102] == 20


def test_asof_plan_has_no_join_and_one_shuffle(spark):
    left, right = _asof_frames(spark)
    plan = _plan(asof_join(left, right, ["user_id"], "ts", "ts", ["v"]))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_matches_naive_between(spark):
    ivals = spark.createDataFrame(
        [(1, 1, 0, 25), (2, 1, 40, 45), (3, 2, 10, 250)],
        "ival_id long, user_id long, s long, e long",
    )
    pts = spark.createDataFrame(
        [(10, 1, 0), (11, 1, 25), (12, 1, 30), (13, 2, 249), (14, 2, 251)],
        "pid long, user_id long, ts long",
    )
    binned = range_join_binned(pts, ivals, "ts", "s", "e", bin_width=20,
                               on=["user_id"])
    naive = pts.join(ivals, "user_id").filter(
        F.col("ts").between(F.col("s"), F.col("e"))
    )
    key = lambda df: sorted((r["ival_id"], r["pid"]) for r in df.collect())
    # inclusive ends (10@0, 11@25), multi-bin interval (13 in [10,250])
    assert key(binned) == key(naive) == [(1, 10), (1, 11), (3, 13)]


def test_range_join_interval_spanning_many_bins_no_dup_rows(spark):
    ivals = spark.createDataFrame([(1, 0, 1000)], "ival_id long, s long, e long")
    pts = spark.createDataFrame([(10, 500)], "pid long, ts long")
    out = range_join_binned(pts, ivals, "ts", "s", "e", bin_width=10)
    assert out.count() == 1  # interval covers 101 bins; point matches once


def test_range_join_plans_hash_join_not_nested_loop(spark):
    ivals = spark.createDataFrame([(1, 1, 0, 25)], "ival_id long, user_id long, s long, e long")
    pts = spark.createDataFrame([(10, 1, 5)], "pid long, user_id long, ts long")
    plan = _plan(range_join_binned(pts, ivals, "ts", "s", "e", bin_width=20,
                                   on=["user_id"]))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
