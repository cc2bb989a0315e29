"""Distributed closed-form linear-model training via sufficient
statistics (the normal-equations-at-scale pattern): the cluster
computes exact integer-quantized X^T X / X^T y sums in ONE pass with
map-side combine, and the O(k^3) ridge solve happens on the bounded
k x k result driver-side — the third on-cluster trainer next to
``bpe_train`` (tokenizer) and ``train_bigram_lm`` (filter LM), here
for the linear quality scorer ``classifier_score`` applies.

Reference analogue: the reference trains nothing on-cluster (its gold
stage consumes precomputed weights CSVs, LOADERS/GOLD-data-loader.py);
this is beyond-reference capability for the 100-TB curation pipeline.

Exactness contract: each per-row product ``x_i * x_j`` (one IEEE
multiply) is quantized to integer micro-units BEFORE summation, so the
global sums are shuffle-order-free and a SQL oracle hash-matches them
(the same discipline as the PQ ADC sums and the BM25 contributions).
The driver-side solve consumes those integers, so two engines that
agree on the stats agree on the weights.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def ridge_stats(
    df: DataFrame,
    feature_cols: Sequence[str | Column],
    label_col: str | Column,
    scale: int = MICRO,
    add_intercept: bool = True,
) -> DataFrame:
    """Exact sufficient statistics for ridge regression: one row per
    (i, j) upper-triangle cell of X^T X (``kind='xtx'``), one per
    X^T y component (``kind='xty'``), plus the row count
    (``kind='n'``) — everything the closed-form solve needs.

    Scale shape (100 TB): ONE corpus pass; the k(k+3)/2 + 1 quantized
    products are computed per row inside whole-stage codegen and
    reduced by a single global aggregate (partial/map-side combine —
    the shuffle carries one row per partition). No explode, no
    driver-side data movement beyond the k x k result.

    Overflow: |sum| < n_rows * max|x_i * x_j| * scale must stay under
    2^63 — pre-normalize features (or lower ``scale``) when magnitudes
    are large; the caller owns feature scaling exactly as with any
    normal-equations solver.

    NULL contract: a row with NULL in ANY feature or the label is
    dropped before aggregation (otherwise SUM's per-cell null-skip
    would count the row in ``n`` and in cells not touching the NULL
    column, yielding mutually inconsistent X^T X entries).
    """
    feats: list[Column] = [
        F.col(c) if isinstance(c, str) else c for c in feature_cols
    ]
    if add_intercept:
        feats = [F.lit(1.0)] + feats
    y = (label_col if isinstance(label_col, Column) else F.col(label_col))
    y = y.cast("double")
    feats = [f.cast("double") for f in feats]
    k = len(feats)

    complete = y.isNotNull()
    for f in feats:
        complete = complete & f.isNotNull()
    df = df.where(complete)

    def q(prod: Column) -> Column:
        return F.round(prod * F.lit(float(scale))).cast("long")

    aggs: list[Column] = []
    names: list[tuple[str, int, int]] = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(q(feats[i] * feats[j])).alias(f"xx_{i}_{j}"))
            names.append(("xtx", i, j))
    for i in range(k):
        aggs.append(F.sum(q(feats[i] * y)).alias(f"xy_{i}"))
        names.append(("xty", i, 0))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    names.append(("n", 0, 0))

    one = df.agg(*aggs)
    # melt the single row to long form with stack (no driver collect)
    cols = [f"xx_{i}_{j}" for _, i, j in names[: k * (k + 1) // 2]]
    cols += [f"xy_{i}" for i in range(k)]
    cols += ["n_rows"]
    stack_args = ", ".join(
        f"'{kind}', {i}, {j}, {c}"
        for (kind, i, j), c in zip(names, cols)
    )
    return one.selectExpr(
        f"stack({len(names)}, {stack_args}) AS "
        "(kind, i, j, s_micro)"
    ).select(
        "kind",
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("s_micro").cast("long").alias("s_micro"),
    )


def ridge_solve(
    stats_rows: Sequence, k: int, lam: float = 0.0, scale: int = MICRO
):
    """Solve ``(X^T X + lam*I) w = X^T y`` from ``ridge_stats`` output
    rows (driver-side, bounded k x k — the only non-distributed step,
    by design). ``k`` INCLUDES the intercept column if one was added.
    Returns a numpy array of weights. The intercept (if present) is
    conventionally not regularized; pass ``lam_intercept`` semantics
    by zeroing lam's first diagonal entry yourself if needed — here
    lam applies to every coefficient for simplicity and the tests pin
    that contract."""
    import numpy as np

    rows = list(stats_rows)
    if any(r["kind"] == "n" and r["s_micro"] == 0 for r in rows):
        # zero input rows: every SUM came back NULL — fail with the
        # real cause, not a NoneType arithmetic error
        raise ValueError("ridge_solve: statistics computed over 0 rows")
    if any(r["s_micro"] is None for r in rows):
        # n_rows > 0 yet a sum is NULL: stats were built without the
        # ridge_stats NULL filter (e.g. hand-fed) — fail loudly
        raise ValueError(
            "ridge_solve: NULL sufficient statistic with n_rows > 0 "
            "(input rows with NULL features were not filtered)"
        )
    xtx = np.zeros((k, k))
    xty = np.zeros(k)
    for r in rows:
        kind, i, j, s = r["kind"], r["i"], r["j"], r["s_micro"]
        if kind == "xtx":
            xtx[i, j] = s / scale
            xtx[j, i] = s / scale
        elif kind == "xty":
            xty[i] = s / scale
    return np.linalg.solve(xtx + lam * np.eye(k), xty)
