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


def ridge_stats_wide(
    df: DataFrame,
    feature_cols: Sequence[str | Column],
    label_col: str | Column,
    scale: int = MICRO,
    add_intercept: bool = True,
) -> tuple[DataFrame, int, list[tuple[str, int, int]]]:
    """The shared single-row sufficient-statistics aggregate behind
    ``ridge_stats`` (which melts it for the stats-table contract) and
    ``train_linear_scorer`` (which consumes it wide for the in-plan
    Cramer solve). Returns ``(one_row_df, k, names)`` with columns
    ``xx_{i}_{j}`` (upper triangle), ``xy_{i}``, ``n_rows`` — all
    BIGINT micro. Same NULL/quantization contract as ``ridge_stats``.
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
    return df.agg(*aggs), k, names


def leibniz_det_sql(entries: Sequence[Sequence[str]]) -> str:
    """Leibniz-expansion determinant of a small matrix of SQL scalar
    expressions, as ONE arithmetic string with a FIXED term order
    (``itertools.permutations`` is lexicographic) and fixed
    left-to-right products — so Spark's ``F.expr`` and DuckDB parse
    the IDENTICAL expression tree and every IEEE multiply/add happens
    in the same order, making the double result bit-identical across
    engines by construction (the portable-Cramer trick: neither
    engine can solve a linear system, but both evaluate the same
    polynomial in the statistics identically). k! terms — intended
    for the k <= 5 quality-scorer regime, NOT general linear algebra
    (``ridge_solve`` is the driver-side general path)."""
    from itertools import permutations

    n = len(entries)
    if n > 5:
        raise ValueError(f"leibniz_det_sql is k<=5 only, got {n}")
    terms = []
    for perm in permutations(range(n)):
        inv = sum(
            1
            for a in range(n)
            for b in range(a + 1, n)
            if perm[a] > perm[b]
        )
        prod = " * ".join(entries[i][perm[i]] for i in range(n))
        terms.append(("- " if inv % 2 else "+ ") + f"({prod})")
    out = " ".join(terms)
    return out[2:] if out.startswith("+ ") else out


def cramer_weight_sql(
    k: int, lam: float = 1.0, scale: int = MICRO
) -> list[str]:
    """SQL expression strings for the ridge weights solved by Cramer's
    rule over the WIDE sufficient statistics (columns ``xx_{i}_{j}``
    BIGINT micro, ``xy_{i}`` BIGINT micro): entry ``(i, j)`` of
    ``X^T X + lam*I`` is ``xx/scale (+ lam on the diagonal)`` and the
    returned ``w_i`` string is ``det(A_i)/det(A)`` with ``A_i`` the
    column-substituted matrix. Engine-portable per
    ``leibniz_det_sql``'s fixed-order contract; quantize the result
    with ``CAST(ROUND(w * 1e6) AS BIGINT)`` (HALF_UP == round half
    away from zero on both engines) for exact integer scoring."""
    # every literal is CAST AS DOUBLE: DuckDB (and Spark SQL) parse a
    # bare decimal literal as DECIMAL, whose division/product rules
    # differ from IEEE doubles and overflow DECIMAL(18) at scale — the
    # portability contract here is double arithmetic only
    s = f"CAST({float(scale)!r} AS DOUBLE)"

    def a(i: int, j: int) -> str:
        lo, hi = min(i, j), max(i, j)
        base = f"(xx_{lo}_{hi} / {s})"
        if i == j and lam:
            return f"({base} + CAST({float(lam)!r} AS DOUBLE))"
        return base

    def b(i: int) -> str:
        return f"(xy_{i} / {s})"

    A = [[a(i, j) for j in range(k)] for i in range(k)]
    det = leibniz_det_sql(A)
    out = []
    for col in range(k):
        Ai = [
            [b(i) if j == col else A[i][j] for j in range(k)]
            for i in range(k)
        ]
        out.append(f"(({leibniz_det_sql(Ai)}) / ({det}))")
    return out


def train_linear_scorer(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    id_col: str = "doc_id",
    sample_mod: int = 5,
    sample_rem: int = 1,
    lam: float = 1.0,
    scale: int = MICRO,
    pred_col: str = "pred_micro",
) -> DataFrame:
    """The CLOSED training loop on ``ridge_stats``: fit a ridge model
    on the deterministic id-slice ``id % sample_mod == sample_rem``
    (the labeled sample), solve the normal equations IN-PLAN via the
    engine-portable Cramer expansion, quantize the weights to integer
    micro-units, and score EVERY row with exact BIGINT arithmetic —
    train-where-the-data-is with no driver-side solve (the k solved
    integers are collected once as the bounded model artifact, and an
    empty/all-NULL training slice raises like ``ridge_solve`` instead
    of silently scoring NULL) and no floats in the scoring path.

    Contract: ``feature_cols`` must be INTEGER-VALUED columns (counts;
    NULL→0 upstream) so ``pred = w0_micro + Σ w_i_micro * x_i`` is
    exact LONG math; the label may be any numeric (it only enters the
    quantized statistics). Rows outside the sample or with NULL label
    still get scored — that is the point (the cheap learned scorer
    generalizes the expensive label to the full corpus). Output: the
    input's ``id_col`` plus ``is_train`` (0/1) and ``pred_col``.

    Scale shape: ONE pass over the labeled slice for the statistics
    (map-side combined single-row aggregate), weights derived from
    that one row (broadcast cross join), ONE codegen projection over
    the corpus for scoring. The k! Cramer terms are scalar arithmetic
    on a single row — free at any corpus size; k is small by the
    feature contract (k <= 5 enforced by ``leibniz_det_sql``)."""
    k_feats = list(feature_cols)
    train = df.where(
        F.pmod(F.col(id_col).cast("long"), F.lit(sample_mod))
        == F.lit(sample_rem)
    )
    wide, k, _ = ridge_stats_wide(train, k_feats, label_col, scale=scale)
    wexprs = cramer_weight_sql(k, lam=lam, scale=scale)
    wrow = wide.select(
        *[
            F.expr(
                f"CAST(ROUND(({w}) * CAST({float(scale)!r} AS DOUBLE)) "
                "AS BIGINT)"
            ).alias(f"w_{i}_micro")
            for i, w in enumerate(wexprs)
        ]
    ).first()
    # fail LOUDLY like ridge_solve does, instead of silently scoring
    # every row NULL: an empty/all-NULL-label training slice makes
    # every SUM (hence every Cramer weight) NULL
    if any(wrow[f"w_{i}_micro"] is None for i in range(k)):
        raise ValueError(
            "train_linear_scorer: NULL weights — the training slice "
            f"(id % {sample_mod} == {sample_rem}) is empty or every "
            "sampled label/feature is NULL"
        )
    # the k collected integers are the model artifact; re-emitting them
    # as a VALUES literal (true LocalRelation, not a Python-RDD-backed
    # createDataFrame — see functions.literals) keeps scoring a pure
    # broadcast projection without re-running the stats aggregate or
    # spawning a Python worker per consumer
    from traits_data_spark.functions.literals import literal_frame

    weights = literal_frame(
        df.sparkSession,
        [tuple(int(wrow[f"w_{i}_micro"]) for i in range(k))],
        ", ".join(f"w_{i}_micro long" for i in range(k)),
    )
    pred = F.col("w_0_micro")
    for i, c in enumerate(k_feats, start=1):
        pred = pred + F.col(f"w_{i}_micro") * F.col(c).cast("long")
    return df.crossJoin(F.broadcast(weights)).select(
        id_col,
        F.when(
            F.pmod(F.col(id_col).cast("long"), F.lit(sample_mod))
            == F.lit(sample_rem),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_train"),
        pred.cast("long").alias(pred_col),
    )


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
    one, k, names = ridge_stats_wide(
        df, feature_cols, label_col, scale=scale, add_intercept=add_intercept
    )
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
