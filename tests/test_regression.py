"""Distributed ridge sufficient statistics: exactness vs numpy,
closed-form weight recovery, quantization contract."""

import numpy as np

from traits_data_spark.operators.regression import (
    MICRO,
    ridge_solve,
    ridge_stats,
)


def _stats_rows(df, feats, label):
    return ridge_stats(df, feats, label).collect()


def test_ridge_stats_match_numpy_exactly(spark):
    rng = np.random.default_rng(7)
    X = rng.integers(0, 50, size=(200, 3)).astype(float)
    y = X @ np.array([2.0, -1.0, 0.5]) + 3.0
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "x3", "y"])
    got = {
        (r["kind"], r["i"], r["j"]): r["s_micro"]
        for r in _stats_rows(df, ["x1", "x2", "x3"], "y")
    }
    Xi = np.hstack([np.ones((len(X), 1)), X])  # intercept first
    for i in range(4):
        for j in range(i, 4):
            want = round(float(np.sum(np.round(Xi[:, i] * Xi[:, j] * MICRO))))
            assert got[("xtx", i, j)] == want
        want = round(float(np.sum(np.round(Xi[:, i] * y * MICRO))))
        assert got[("xty", i, 0)] == want
    assert got[("n", 0, 0)] == 200


def test_ridge_solve_recovers_true_weights(spark):
    rng = np.random.default_rng(11)
    X = rng.integers(0, 20, size=(300, 2)).astype(float)
    w_true = np.array([5.0, 1.5, -2.0])  # intercept, w1, w2
    y = np.hstack([np.ones((len(X), 1)), X]) @ w_true
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        ["x1", "x2", "y"],
    )
    rows = _stats_rows(df, ["x1", "x2"], "y")
    w = ridge_solve(rows, k=3, lam=0.0)
    assert np.allclose(w, w_true, atol=1e-4)
    # ridge shrinks: with lam > 0 coefficient norm strictly decreases
    w_r = ridge_solve(rows, k=3, lam=100.0)
    assert np.linalg.norm(w_r) < np.linalg.norm(w)


def test_ridge_stats_shuffle_order_free(spark):
    """The quantize-then-sum contract: repartitioned input produces
    bit-identical statistics (a plain double sum would not)."""
    rng = np.random.default_rng(3)
    rows = [
        (float(rng.uniform(0, 1)), float(rng.uniform(0, 1)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["x1", "y"])
    a = sorted(map(tuple, _stats_rows(df, ["x1"], "y")))
    b = sorted(map(tuple, _stats_rows(df.repartition(17, "x1"), ["x1"], "y")))
    assert a == b


def test_catalog_ridge_query_weights_near_unit(spark, sf_dir):
    """The catalog construction (label = sum of the bucket features)
    must solve to intercept ~0 and unit feature weights — the
    end-to-end sanity that the distributed stats feed a working
    trainer."""
    from traits_data_spark.catalog import RIDGE_BUCKETS, q_ridge_stats

    rows = q_ridge_stats(spark, sf_dir).collect()
    w = ridge_solve(rows, k=RIDGE_BUCKETS + 1, lam=0.0)
    assert abs(w[0]) < 1e-3
    assert np.allclose(w[1:], 1.0, atol=1e-3)


def test_ridge_solve_empty_input_raises_clearly(spark):
    """Zero input rows make every SUM NULL; ridge_solve must name the
    cause instead of dying on NoneType arithmetic (review finding)."""
    import pytest as _pytest

    df = spark.createDataFrame([], "x1 double, y double")
    rows = ridge_stats(df, ["x1"], "y").collect()
    with _pytest.raises(ValueError, match="0 rows"):
        ridge_solve(rows, k=2)


def test_ridge_stats_drops_rows_with_any_null(spark):
    """NULL contract (round-11 advisory): a row with NULL in any
    feature or the label is excluded entirely — n, every X^T X cell,
    and X^T y all see the same complete-row set."""
    df = spark.createDataFrame(
        [
            (1.0, 2.0, 5.0),
            (None, 3.0, 7.0),   # NULL feature -> dropped
            (2.0, None, 9.0),   # NULL feature -> dropped
            (3.0, 1.0, None),   # NULL label   -> dropped
            (4.0, 2.0, 11.0),
        ],
        "x1 double, x2 double, y double",
    )
    clean = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (4.0, 2.0, 11.0)], "x1 double, x2 double, y double"
    )
    got = sorted(map(tuple, _stats_rows(df, ["x1", "x2"], "y")))
    want = sorted(map(tuple, _stats_rows(clean, ["x1", "x2"], "y")))
    assert got == want
    n = [r for r in ridge_stats(df, ["x1", "x2"], "y").collect()
         if r["kind"] == "n"]
    assert n[0]["s_micro"] == 2


def test_ridge_solve_null_stat_with_rows_raises_clearly():
    """Hand-fed stats with a NULL sum but n_rows > 0 must raise the
    named contract error, not TypeError on None / scale."""
    import pytest as _pytest

    rows = [
        {"kind": "xtx", "i": 0, "j": 0, "s_micro": None},
        {"kind": "xtx", "i": 0, "j": 1, "s_micro": 1_000_000},
        {"kind": "xtx", "i": 1, "j": 1, "s_micro": 2_000_000},
        {"kind": "xty", "i": 0, "j": 0, "s_micro": 1_000_000},
        {"kind": "xty", "i": 1, "j": 0, "s_micro": 1_000_000},
        {"kind": "n", "i": 0, "j": 0, "s_micro": 3},
    ]
    with _pytest.raises(ValueError, match="NULL sufficient statistic"):
        ridge_solve(rows, k=2)
