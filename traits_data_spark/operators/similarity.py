"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard scale playbook:

- ``cosine_topk_bruteforce`` — exact: query set × corpus with a
  broadcast of the (small) query side; dot products via
  ``zip_with``/``aggregate`` (JVM-side, codegen). Cost |Q|·|C|; right
  whenever |Q| is bounded (online lookups, evaluation batches).
- ``lsh_bucketed_topk`` — approximate: random-hyperplane signatures
  (sign bits of projections onto seeded deterministic planes) bucket
  the corpus; only same-bucket (or Hamming-adjacent probe) pairs are
  scored. Shuffle is on the bucket key; this is the 100 TB path.

No Python UDFs: the dot product compiles to a single
``aggregate(zip_with(a, b, (x,y)->x*y), 0D, (acc,x)->acc+x)`` codegen
expression.
"""

from __future__ import annotations

import random
from itertools import combinations
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.operators.dedup import _let


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _norm2(col: Column) -> Column:
    """Squared L2 norm via the same left-fold ``dot`` uses — shared by
    the zero-norm guards so every scorer prunes identically."""
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)


def _maybe_broadcast(df: DataFrame, hint: bool) -> DataFrame:
    """Apply the broadcast hint the ANN probe joins rely on (the bucket
    / cell key has few distinct values, so a shuffled join would funnel
    the corpus into that many tasks). ``hint=False`` drops it for the
    rare huge-query-batch case, letting AQE pick the strategy instead
    of risking the 8 GB broadcast limit."""
    return F.broadcast(df) if hint else df


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int | None = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """For each query vector, the top-k most-cosine-similar corpus rows
    (self-matches excluded). Query side is broadcast; ties broken by
    neighbor id for determinism.
    """
    # norms are per-ROW invariants of the |Q|×N pair join: computed
    # here (one interpreted fold per row) instead of inside the pair
    # expression (one per pair) — same l2_norm fold on the same cast
    # array, so the quotient is bit-identical (guide §1.2 step 2)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    from traits_data_spark.operators.dedup import widen_if_narrow

    # widen: the |Q|×N scoring runs in the stream side's scan
    # partitioning (broadcast join — no exchange), so a single-split
    # corpus scan would score every pair on one core
    c = widen_if_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    scored = (
        c.join(_maybe_broadcast(q, broadcast_queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _bucket_expr(v: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Random-hyperplane signature expression: Σ 2^i·[v·p_i > 0].

    Stays on the ``dot`` left-fold (zip_with + aggregate) deliberately:
    an unrolled flat-sum variant was measured (round 10) and the
    ~n_planes·dim·3 expression nodes blow the JVM 64KB codegen method
    limit at 16 planes — Spark logs an InternalCompilerException and
    falls back to interpreted anyway, paying the compile attempt on
    top. Cross-engine bucket agreement rests on SIGN robustness, not
    fold-order identity (DuckDB's list_dot_product reassociates at
    dim 64 — see _multitable_signature_udf); tune signature budgets
    by n_planes·n_tables, not by micro-optimizing this expression
    (see the ANN ladder in SCALE.md round 10)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket: Column = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = Σ 2^i·[v·p_i > 0]."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(out_col, _bucket_expr(v, dim, n_planes, seed))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    max_iter: int = 20,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    corpus into ``n_centroids`` cells; each query scores only the
    cells of its ``n_probe`` nearest centroids.

    The 100 TB shape: centroids are fit once (Spark ML k-means over
    the corpus — at scale, fit on a sample), cell assignment is a
    model transform (JVM-side), and the probe join shuffles on the
    small cell id. ``n_probe == n_centroids`` degenerates to exact
    brute force — the recall knob is explicit. Not SQL-expressible
    (k-means), so this is a rows-only correctness entry; the recall
    invariants are pinned by tests instead.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    feat = c.withColumn("__f", array_to_vector("__cv"))
    model = KMeans(
        k=n_centroids,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__f",
        predictionCol="__cid",
    ).fit(feat)
    assigned = model.transform(feat).select("neighbor_id", "__cv", "__cid")

    centers = [[float(x) for x in cc] for cc in model.clusterCenters()]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    dist_structs = []
    for i, cent in enumerate(centers):
        carr = F.array(*[F.lit(x) for x in cent])
        d2 = F.aggregate(
            F.zip_with(F.col("__qv"), carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist_structs.append(F.struct(d2.alias("d"), F.lit(i).alias("c")))
    # array_sort on structs is lexicographic: nearest centroids first
    probes = F.slice(F.array_sort(F.array(*dist_structs)), 1, n_probe)
    q_probed = q.withColumn(
        "__cid", F.explode(F.transform(probes, lambda s: s.getField("c")))
    )
    # Broadcast the probed-query side: the cell-id join key has only
    # n_centroids distinct values, so a shuffled join would hash-partition
    # the whole corpus into k-task parallelism. Broadcasting the (small,
    # |Q|·n_probe-row) probe table removes the corpus-side Exchange
    # outright instead of relying on an AQE rescue.
    scored = (
        # per-row norms hoisted out of the pair expression (same fold —
        # bit-identical rounded quotient)
        assigned.withColumn("__cn", l2_norm(F.col("__cv")))
        .join(
            _maybe_broadcast(
                q_probed.withColumn("__qn", l2_norm(F.col("__qv"))),
                broadcast_queries,
            ),
            "__cid",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def knn_label_eval(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Embedding-quality probe: for each query vector, the majority
    label among its k nearest corpus neighbours (exact cosine), the
    agreement fraction, and whether it matches the query's own label.

    The standard representation-quality eval (kNN probe accuracy)
    as one plan: brute-force top-k (broadcast query side) → count
    labels per query → majority via one more tiny aggregation.
    Ties break on (count desc, label asc) — deterministic, so a SQL
    oracle reproduces it. At 100 TB the top-k stage is the cost;
    swap in the LSH/IVF candidate generators for approximate probes.
    """
    nn = cosine_topk_bruteforce(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k
    )
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__nlabel"),
    )
    counts = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "__nlabel")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("__nlabel").asc()
    )
    majority = (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "query_id",
            F.col("__nlabel").alias("knn_label"),
            (F.col("votes").cast("double") / F.lit(float(k))).alias(
                "agreement"
            ),
        )
    )
    own = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__qlabel")
    )
    return (
        majority.join(F.broadcast(own), "query_id")
        .withColumn("is_correct", F.col("knn_label") == F.col("__qlabel"))
        .select("query_id", "knn_label", "agreement", "is_correct")
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "q_scale",
    min_col: str = "q_min",
) -> DataFrame:
    """Per-vector int8 scalar quantization of an embedding column.

    ``q[i] = round((x[i] - min) / scale) - 128`` with
    ``scale = (max - min) / 255`` — the standard 4× storage/bandwidth
    cut for 100 TB embedding stores (shuffle and scan move int8, not
    float64; exact rescoring dequantizes only the final candidates).
    Constant vectors (max == min) quantize to all -128 with scale 0.

    Pure projection (array_min/array_max/transform), no shuffle. The
    arithmetic is plain IEEE double ops so any SQL engine reproduces
    the exact codes; ``dequantize_int8`` inverts with reconstruction
    error ≤ scale/2 per component.
    """
    v = F.col(vec_col).cast("array<double>")

    def quant(x: Column) -> Column:
        def with_stats(st: Column) -> Column:
            lo = st.getField("lo")
            scale = st.getField("scale")
            codes = F.transform(
                x,
                lambda e: F.when(
                    scale > 0, F.round((e - lo) / scale).cast("int")
                ).otherwise(F.lit(0))
                - F.lit(128),
            )
            return F.struct(
                codes.alias("codes"), scale.alias("scale"), lo.alias("lo")
            )

        return _let(
            F.struct(
                F.array_min(x).alias("lo"),
                ((F.array_max(x) - F.array_min(x)) / F.lit(255.0)).alias(
                    "scale"
                ),
            ),
            with_stats,
        )

    q = _let(v, quant)
    return df.withColumns(
        {
            out_col: q.getField("codes"),
            scale_col: q.getField("scale"),
            min_col: q.getField("lo"),
        }
    )


def dequantize_int8(
    qvec: Column | str,
    scale: Column | str,
    vmin: Column | str,
) -> Column:
    """Inverse of ``quantize_int8``: ``x̂[i] = (q[i] + 128)·scale + min``."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    m = F.col(vmin) if isinstance(vmin, str) else vmin
    return F.transform(
        q, lambda e: (e.cast("double") + F.lit(128.0)) * s + m
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Brute-force top-k scored directly on int8 codes (SQ8-style):
    the pairwise work is ONE integer dot product, and the float
    reconstruction is algebra over per-row scalars.

    With u = code+128 (so x̂ᵢ = lo + s·uᵢ):

        x̂·ŷ  = d·lo_x·lo_y + lo_x·s_y·Σv + lo_y·s_x·Σu + s_x·s_y·(u·v)
        ‖x̂‖² = d·lo² + 2·lo·s·Σu + s²·Σu²

    Σu, Σu² are precomputed per row, so only the exact integer u·v
    crosses the pair space — the shuffle and the O(|Q|·|C|) inner loop
    move/process int8-derived ints, never float vectors. Integer sums
    are order-independent, so the scores are bit-reproducible on any
    engine — unlike float dot products, quantized scoring has an
    EXACT oracle by construction.
    """

    def prep(df: DataFrame, id_name: str) -> DataFrame:
        q = quantize_int8(df, vec_col=vec_col)
        u = F.transform("qvec", lambda e: (e + F.lit(128)).cast("long"))
        return q.select(
            F.col(id_col).alias(id_name),
            u.alias("__u"),
            F.col("q_scale").alias("__s"),
            F.col("q_min").alias("__lo"),
            F.aggregate(u, F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "__su"
            ),
            F.aggregate(
                u, F.lit(0).cast("long"), lambda a, x: a + x * x
            ).alias("__suu"),
        )

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id").select(
        "query_id",
        F.col("__u").alias("__qu"),
        F.col("__s").alias("__qs"),
        F.col("__lo").alias("__qlo"),
        F.col("__su").alias("__qsu"),
        F.col("__suu").alias("__qsuu"),
    )
    d = float(dim)
    uv = F.aggregate(
        F.zip_with("__u", "__qu", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    dot_hat = (
        F.lit(d) * F.col("__lo") * F.col("__qlo")
        + F.col("__lo") * F.col("__qs") * F.col("__qsu").cast("double")
        + F.col("__qlo") * F.col("__s") * F.col("__su").cast("double")
        + F.col("__s") * F.col("__qs") * uv.cast("double")
    )

    def norm2(lo: Column, s: Column, su: Column, suu: Column) -> Column:
        return (
            F.lit(d) * lo * lo
            + F.lit(2.0) * lo * s * su.cast("double")
            + s * s * suu.cast("double")
        )

    cn = norm2(F.col("__lo"), F.col("__s"), F.col("__su"), F.col("__suu"))
    qn = norm2(
        F.col("__qlo"), F.col("__qs"), F.col("__qsu"), F.col("__qsuu")
    )
    # zero-norm vectors cannot be cosine-scored (0/0 is NULL on Spark
    # but NaN on DuckDB/IEEE engines — rankings would diverge); drop
    # them BEFORE the pair join so they also never inflate it
    scored = (
        c.filter(cn > 0)
        .join(_maybe_broadcast(q.filter(qn > 0), broadcast_queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_q", F.round(dot_hat / (F.sqrt(cn) * F.sqrt(qn)), round_to)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_q", "rk")
    )


def ivf_topk_hyperplane(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_probe: int = 4,
    seed: int = 42,
    scale: int = 1_000_000,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF approximate top-k with a *deterministic* coarse quantizer.

    Cells are the 2^n_planes sign-buckets of seeded random hyperplanes
    (the same quantizer family FAISS's IVF admits); each cell's
    centroid is the exact mean of its member vectors, computed in
    fixed-point (``round(x*scale)`` summed as BIGINT) so the mean is
    independent of partitioning/summation order — that makes the whole
    operator reproducible on any engine, unlike k-means
    (``ivf_topk``), and therefore oracle-checkable.

    The 100 TB shape: one shuffle to build the (≤2^n_planes · dim)-row
    centroid table, which is then broadcast; queries rank centroids by
    exact L2 (computed as q·q − 2q·c + c·c so both engines fold in the
    same order), probe the ``n_probe`` nearest cells, and score only
    those cells' members. ``n_probe == 2^n_planes`` degenerates to
    exact brute force.
    """
    c = with_lsh_bucket(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ),
        "__cv",
        dim,
        n_planes,
        seed,
    )
    # exact fixed-point per-component mean per bucket
    comp = (
        c.select("bucket", F.posexplode("__cv").alias("pos", "x"))
        .groupBy("bucket", "pos")
        .agg(
            F.sum(F.round(F.col("x") * scale).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "bucket",
            "pos",
            (F.col("s").cast("double") / (F.lit(float(scale)) * F.col("n"))).alias(
                "comp"
            ),
        )
    )
    centroids = comp.groupBy("bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "comp"))),
            lambda s: s.getField("comp"),
        ).alias("__centv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    # L2² via the inner-product identity so Spark's fold and the
    # oracle's list_dot_product sum in the same order per term
    d2 = (
        dot(F.col("__qv"), F.col("__qv"))
        - F.lit(2.0) * dot(F.col("__qv"), F.col("__centv"))
        + dot(F.col("__centv"), F.col("__centv"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("bucket").asc()
    )
    q_probed = (
        q.join(F.broadcast(centroids))
        .withColumn("__d2", d2)
        .withColumn("__prk", F.row_number().over(wp))
        .filter(F.col("__prk") <= n_probe)
        .select("query_id", "__qv", "bucket")
    )
    # zero-norm vectors cannot be cosine-scored (0/0: NULL on Spark,
    # NaN on IEEE engines) — drop them before the pair join, mirrored
    # by the oracle's norm guard
    # Broadcast the probed-query side: "bucket" has at most 2^n_planes
    # distinct values, so a shuffled join would hash-partition the whole
    # corpus into that many tasks; broadcasting the (|Q|·n_probe)-row
    # probe table removes the corpus-side Exchange outright.
    scored = (
        c.filter(_norm2(F.col("__cv")) > 0)
        .join(
            _maybe_broadcast(
                q_probed.filter(_norm2(F.col("__qv")) > 0),
                broadcast_queries,
            ),
            "bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6) + F.lit(0.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _multitable_signature_udf(
    dim: int, n_planes: int, n_tables: int, seed: int
):
    """Arrow-batched hyperplane signatures for ALL tables at once:
    returns an ``array<long>`` of ``n_tables`` bucket ids per vector.

    Bit-identical to ``_bucket_expr``/``dot`` by construction: each
    projection accumulates ``acc = acc + v[j]·p[j]`` STRICTLY
    left-to-right — vectorized across ROWS (one numpy op per j),
    never across the reduction axis, so every per-element IEEE
    rounding step matches the Catalyst fold, and swapping the melt to
    this path cannot move any row's bucket. DuckDB's
    ``list_dot_product`` is NOT element-order-stable at dim 64
    (measured: pairwise/SIMD reassociation, few-ulp deltas vs the
    fold), so Spark↔oracle bucket agreement was never exact-by-
    construction on EITHER path — it rests on sign-of-dot robustness
    (a bit flips only when a projection lands within the ~ulp
    reassociation error of 0.0; continuous data makes that
    measure-zero in practice, and every shipped LSH oracle
    hash-matches). Do NOT write future oracles that repr-compare raw
    dot-derived doubles — only signs (buckets) and 6-dp-rounded
    cosines are portable. Justified Python (the BPE-tokenizer
    precedent): the interpreted zip_with/aggregate fold costs
    ~1 ms/row at production signature budgets (96 plane-dots/row
    measured 10 s for 2 k rows — SCALE.md round 10), while this batch
    path does the same arithmetic in n_tables·n_planes·dim numpy
    column ops.

    Vectors that are NULL, ragged, or containing null elements take
    bucket 0 in every table — exactly like the expression path
    (``when(NULL > 0).otherwise(0)`` sums to 0) and the SQL oracles'
    ``CASE WHEN … ELSE 0`` (NaN/NULL projections compare false
    per-plane)."""
    import numpy as np

    planes = [
        np.array(_hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)
    ]
    pows = (1 << np.arange(n_planes, dtype=np.int64)).astype(np.int64)
    zeros = [0] * n_tables

    @F.pandas_udf("array<long>")
    def _sig(vs: pd.Series) -> pd.Series:
        res: list = [zeros] * len(vs)
        idx = [
            i
            for i, v in enumerate(vs)
            if v is not None and len(v) == dim
        ]
        if idx:
            V = np.asarray(
                [
                    [x if x is not None else np.nan for x in vs.iloc[i]]
                    for i in idx
                ],
                dtype=np.float64,
            )
            out = np.empty((len(idx), n_tables), dtype=np.int64)
            for t, P in enumerate(planes):
                bits = np.empty((len(idx), n_planes), dtype=bool)
                for pi in range(n_planes):
                    p = P[pi]
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for j in range(dim):  # left-to-right, like the fold
                        acc = acc + V[:, j] * p[j]
                    bits[:, pi] = acc > 0  # NaN > 0 is False, like NULL
                out[:, t] = bits @ pows
            for k, i in enumerate(idx):
                res[i] = [int(x) for x in out[k]]
        return pd.Series(res)

    return _sig


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    """XOR masks enumerating every bucket id within Hamming distance
    <= probe_bits of a signature — the probing sequence of multi-probe
    LSH (Lv et al., VLDB'07). ``probe_bits=0`` -> [0] (exact bucket
    only)."""
    masks = [0]
    for m in range(1, probe_bits + 1):
        for bits in combinations(range(n_planes), m):
            masks.append(sum(1 << b for b in bits))
    return masks


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    broadcast_queries: bool = True,
    probe_bits: int = 0,
) -> DataFrame:
    """Multi-table LSH top-k: union the candidate pairs of
    ``n_tables`` independent hash tables (seeds ``seed..seed+T-1``),
    dedup, then score once.

    Recall ≈ 1 - (1 - p^n_planes)^n_tables for per-plane agreement
    p — each extra table roughly multiplies the miss rate by
    (1 - p^n_planes), at the cost of one more shuffle of the *id
    pairs* (not the vectors: candidates are collected as ids only and
    vectors are joined back exactly once for scoring).

    ``probe_bits > 0`` turns on true multi-probe (Lv et al., VLDB'07):
    each query additionally probes every bucket within Hamming
    distance ``probe_bits`` of its signature, in every table. This
    multiplies QUERY-side work (sum of C(n_planes, 0..probe_bits)
    probe keys per query per table) but leaves the corpus-side index
    untouched — at 100 TB the index size (corpus rows × n_tables) is
    the dominant cost, so probing buys recall ~4× cheaper than extra
    tables do. Measured on the sf0.1 eval corpus (near-isotropic
    synthetic embeddings, the hard case): the shipped tuned preset
    planes=12/tables=8/bits=3 reaches recall@5 = 0.926 scoring 46% of
    the corpus with an 8-table index, where plain multi-table needs
    32 tables and 41% scored for a lower 0.83 (tools/tune_ann.py
    ladder, SCALE.md round 10).
    """
    c_ids = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q_ids = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )

    # melt: one (id, table_idx, bucket) row per table, then ONE join on
    # the composite key — same candidate set as per-table joins+union,
    # at one exchange instead of n_tables (the band-melt shape from
    # minhash_lsh_candidates). ALL tables' signatures come from one
    # Arrow-batched pass (_multitable_signature_udf — bit-identical to
    # the _bucket_expr fold, ~50x faster at production table·plane
    # budgets); posexplode restores the melt grain.
    sig = _multitable_signature_udf(dim, n_planes, n_tables, seed)

    def melt(df: DataFrame, id_name: str, vec_name: str) -> DataFrame:
        return df.select(
            id_name,
            F.posexplode(sig(F.col(vec_name))).alias("table_idx", "bucket"),
        )

    cb = melt(c_ids, "neighbor_id", "__cv")
    qb = melt(q_ids, "query_id", "__qv")
    if probe_bits > 0:
        # expand each query signature into its Hamming-<=probe_bits
        # probe set via a broadcast mask frame: query-side rows only,
        # the corpus melt is untouched
        spark = corpus.sparkSession
        from traits_data_spark.functions.literals import literal_frame

        masks = literal_frame(
            spark,
            [(m,) for m in probe_masks(n_planes, probe_bits)],
            "mask long",
        )
        qb = (
            qb.crossJoin(F.broadcast(masks))
            .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("mask")))
            .drop("mask")
        )
    # (table_idx, bucket) has only n_tables·2^n_planes distinct values —
    # broadcast the query-side melt so the corpus melt never exchanges
    cands = (
        cb.join(_maybe_broadcast(qb, broadcast_queries), ["table_idx", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    scored = (
        # per-row norms hoisted out of the per-candidate expression
        # (same fold — bit-identical rounded quotient)
        cands.join(
            c_ids.withColumn("__cn", l2_norm(F.col("__cv"))), "neighbor_id"
        )
        .join(
            F.broadcast(q_ids.withColumn("__qn", l2_norm(F.col("__qv")))),
            "query_id",
        )
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus,
    score only same-bucket pairs, keep cosine ≥ threshold.

    The 100 TB shape: one shuffle on the bucket key, quadratic work
    only within buckets (2^n_planes of them). Fewer planes → higher
    recall, bigger buckets; a high threshold tolerates few planes
    because near-identical vectors almost never straddle a hyperplane.
    Returns ``(id_a, id_b, cosine)`` with id_a < id_b.
    """
    from traits_data_spark.operators.dedup import widen_if_narrow

    # widen BEFORE bucketing: the n_planes signature dots are map-side
    # per-row compute on the scan's partitioning
    b = with_lsh_bucket(
        widen_if_narrow(
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("__v"),
            )
        ),
        "__v",
        dim,
        n_planes,
        seed,
    )
    return keyed_near_dups(
        b, "bucket", id_col="id", vec_col="__v",
        threshold=threshold, round_to=round_to,
    )


def keyed_near_dups(
    df: DataFrame,
    key_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Same-key pairwise cosine near-duplicates: ONE shuffle on
    ``key_col``, quadratic work only within a key group. The key is
    the recall/cost dial — an LSH bucket (``embedding_near_dups``),
    a balanced semantic shard (``layout.balanced_shards`` — the
    shard-local dedup pass a sharded corpus runs instead of a global
    one), or any other co-location key. Returns ``(id_a, id_b,
    cosine)`` with ``id_a < id_b``; NULL keys pair with nothing (an
    unkeyed row has no locality group)."""
    b = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.col(key_col).alias("__k"),
        )
        .filter(_norm2(F.col("__v")) > 0)  # zero-norm vectors have no
        # cosine: under ANSI the division throws, and NaN >= threshold
        # is TRUE on Spark but the oracle's x/0.0 is NULL — same guard
        # as the IVF scorers
        # per-row l2 norm hoisted out of the within-key pair join: one
        # interpreted fold per ROW, not per PAIR; same fold on the same
        # array, so the rounded quotient is bit-identical
        .withColumn("__n", l2_norm(F.col("__v")))
    )
    left = b.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "__k",
    )
    right = b.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "__k",
    )
    pairs = (
        # shuffle-hash, not sort-merge: the pair join's output is
        # quadratic within keys, so the planner's sorts buy nothing —
        # hash-build the right side per partition (guide §3.1).
        # Build-side memory bound: the hash relation holds every member
        # of every key hashed into that partition, so ONE hot locality
        # key's full member set must fit in task memory; with a key
        # that skewed the quadratic pair OUTPUT (|members|² rows) is
        # the job-killer long before the build side is — cap or salt
        # the key upstream rather than switching this join back to
        # sort-merge (which would spill the build but still emit the
        # quadratic pairs).
        left.join(right.hint("shuffle_hash"), "__k")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                round_to,
            )
            + F.lit(0.0),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.select("id_a", "id_b", "cosine")


def all_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold with block-pair parallelism
    — the distributed brute-force shape (the ground-truth pass behind
    recall evaluation; still quadratic work BY DEFINITION, use it on
    samples, not the corpus).

    A constant-key self-join puts every row in ONE task (a 1000-
    executor cluster runs it on one core — measured 25 s vs 2 s at a
    2k-vector sample). Instead: block each row by ``id % n_blocks``
    and emit one key per OTHER block — ``(least(b, x), greatest(b,
    x))`` for every x — so block-pair group (i, j) holds exactly the
    rows of blocks i and j, each once, and every unordered pair meets
    in exactly one group: the cross pair at its (min, max) block key,
    the intra-block pair at (i, i) — the (i ≠ j → blocks must differ)
    filter removes the intra-block double-count from cross groups.
    Replication factor ``n_blocks``, parallelism ``n_blocks(n_blocks
    + 1)/2`` tasks, each ~2N/n_blocks rows. Same rounded-cosine
    output rows as ``keyed_near_dups`` with a constant key (pinned by
    test); results are key-strategy-independent, so oracles replaying
    a plain a.id < b.id join match unchanged.

    ``id_col`` must be integral (the block is ``pmod(id,
    n_blocks)``); hash string ids to a long first.
    """
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    b = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .filter(_norm2(F.col("__v")) > 0)
        .withColumn(
            "__blk", F.pmod(F.col("id").cast("long"), F.lit(int(n_blocks)))
        )
        # per-row norm rides the n_blocks-way replication (8 bytes/row)
        # so the O(N²) pair expression folds ONCE per pair, not thrice;
        # same l2_norm fold — the rounded quotient is bit-identical
        .withColumn("__n", l2_norm(F.col("__v")))
    )
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_blocks) - 1)),
        lambda x: F.struct(
            F.least(F.col("__blk"), x.cast("long")).alias("i"),
            F.greatest(F.col("__blk"), x.cast("long")).alias("j"),
        ),
    )
    rep = b.select(
        "id", "__v", "__n", "__blk", F.explode(keys).alias("__bp")
    )
    # the probe side is small enough to broadcast, so WITHOUT an
    # explicit exchange the join executes in the stream side's scan
    # partitioning — a single-row-group parquet sample = ONE task,
    # which is the exact serialization this operator exists to avoid.
    # Repartitioning the stream side on the block-pair key pins the
    # scoring parallelism to the block-pair grid; the partition COUNT
    # is pinned too, because the shuffled bytes are tiny (vectors ×
    # n_blocks) and AQE would coalesce a byte-sized exchange under a
    # compute-bound join (measured: 24 s single-task → 12 s AQE-
    # coalesced-to-5 → 2.6 s at the pinned 136-task grid, 2k vectors,
    # 32 threads).
    sc = df.sparkSession.sparkContext
    n_parts = min(
        int(n_blocks) * (int(n_blocks) + 1) // 2,
        max(sc.defaultParallelism * 2, 1),
    )
    left = rep.repartition(n_parts, F.col("__bp")).select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__blk").alias("__ba"),
        "__bp",
    )
    right = rep.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__blk").alias("__bb"),
        "__bp",
    )
    pairs = (
        # shuffle-hash as in keyed_near_dups: no sort before a
        # quadratic-output block-pair join
        left.join(right.hint("shuffle_hash"), "__bp")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                (F.col("__bp.i") == F.col("__bp.j"))
                | (F.col("__ba") != F.col("__bb"))
            )
        )
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                round_to,
            )
            + F.lit(0.0),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.select("id_a", "id_b", "cosine")


def hyperplane_bucket_index(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """``(id, bucket, embedding)`` hyperplane-bucket table — the
    persistable SEMANTIC dedup index, the embedding-space counterpart
    of ``dedup.banded_signatures``. Bucketing is a pure projection
    (sign pattern of seeded hyperplane dot products — deterministic,
    so the index is reproducible from the same seed). Write this once
    per corpus snapshot; new embedding batches then dedup against it
    incrementally (``incremental_embedding_near_dups``) without
    re-bucketing history. The vectors ride along so scoring never
    re-reads the original embedding table.
    """
    return with_lsh_bucket(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        ),
        "embedding",
        dim,
        n_planes,
        seed,
    ).select("id", "bucket", "embedding")


def incremental_embedding_near_dups(
    new_vecs: DataFrame,
    existing_index: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    round_to: int = 6,
    broadcast_new: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs for an ingest batch against an
    existing corpus WITHOUT re-bucketing history: only the new batch
    is hyperplane-bucketed; the existing corpus participates via its
    persisted ``hyperplane_bucket_index`` table (read back from
    parquet). Returns ``(id_a, id_b, cosine)`` with id_a < id_b,
    covering new×existing and new×new — exactly the pairs a full
    ``embedding_near_dups`` re-run over old+new would add. Bucketing
    params must match the ones the index was built with.

    Scale shape: with ``broadcast_new=True`` (the steady-state
    default) the new side is explicitly broadcast — the bucket key has
    only 2^n_planes distinct values, so a shuffled join would
    hash-partition the whole history into that many tasks, and a
    per-trigger ingest batch is the small side by construction.
    History streams through the broadcast join map-side; nothing is
    re-bucketed or re-shuffled. The streaming deployment should bound
    the batch (``maxFilesPerTrigger`` / ``maxBytesPerTrigger``) so it
    stays under Spark's 8 GB broadcast limit; for an unbounded batch —
    e.g. an initial backfill arriving as ONE availableNow trigger —
    pass ``broadcast_new=False`` to drop the hint and let AQE choose
    the join strategy (it still converts to broadcast when the batch
    turns out small).
    """
    new_idx = hyperplane_bucket_index(
        new_vecs, dim, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, seed=seed,
    )
    all_idx = existing_index.select("id", "bucket", "embedding").unionByName(
        new_idx
    )
    left = new_idx.select(
        F.col("id").alias("id_a"), F.col("embedding").alias("__va"), "bucket"
    )
    right = all_idx.select(
        F.col("id").alias("id_b"), F.col("embedding").alias("__vb"), "bucket"
    )
    pairs = (
        # per-row norms hoisted out of the pair expression (same fold —
        # bit-identical rounded quotient)
        right.withColumn("__nb", l2_norm(F.col("__vb")))
        .join(
            F.broadcast(left.withColumn("__na", l2_norm(F.col("__va"))))
            if broadcast_new
            else left.withColumn("__na", l2_norm(F.col("__va"))),
            "bucket",
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                round_to,
            )
            + F.lit(0.0),
        )
        .filter(F.col("cosine") >= threshold)
    )
    # new×new pairs arrive in both orientations; cosine is orientation-
    # independent bit-for-bit (same fold order, commutative products),
    # so distinct() collapses them exactly
    return pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "cosine",
    ).distinct()


def semantic_decontaminate(
    corpus_vecs: DataFrame,
    eval_index: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose
    cosine to ANY benchmark/eval vector reaches ``threshold`` — the
    semantic complement of the n-gram paths (``dedup.decontaminate`` /
    ``dedup.bloom_decontaminate``), catching paraphrased or lightly
    reworded benchmark leakage that exact n-grams miss.

    The eval side arrives as a persisted ``hyperplane_bucket_index``
    (built once per benchmark release); the corpus computes its bucket
    as a pure projection and joins the BROADCAST eval index on the
    bucket key — the corpus never shuffles, exactly the
    ``bloom_decontaminate`` scale contract. Candidate pairs are scored
    exactly; per flagged corpus row the BEST match is kept
    (max cosine, ties to the smallest eval id) plus ``n_matches``, the
    exact count of eval vectors at/above the threshold.

    Recall caveat (same as every single-table LSH path here): a true
    near-match in a different bucket is missed; raise recall with
    fewer planes or a multi-probe/multi-table index, traded against
    candidate volume. Output: ``(<id_col>, eval_id, cosine,
    n_matches)``.
    """
    c = with_lsh_bucket(
        corpus_vecs.select(
            F.col(id_col).alias(id_col),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ),
        "__cv",
        dim,
        n_planes,
        seed,
    )
    e = eval_index.select(
        F.col("id").alias("eval_id"),
        "bucket",
        F.col("embedding").alias("__ev"),
    )
    hits = (
        c.join(F.broadcast(e), "bucket")
        .withColumn(
            "cosine",
            F.round(cosine(F.col("__cv"), F.col("__ev")), round_to)
            + F.lit(0.0),
        )
        .filter(F.col("cosine") >= threshold)
    )
    # flagged rows only (a small fraction of the corpus by contract),
    # so the best-match window shuffles a frame bounded by the
    # contamination rate, not the corpus
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("eval_id").asc()
    )
    nw = Window.partitionBy(id_col)
    return (
        hits.withColumn("n_matches", F.count(F.lit(1)).over(nw))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, "eval_id", "cosine", "n_matches")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs. Recall rises
    with fewer planes / multiple probe tables; this single-table variant
    is the building block.
    """
    cb = with_lsh_bucket(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ),
        "__cv",
        dim,
        n_planes,
        seed,
    )
    qb = with_lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        ),
        "__qv",
        dim,
        n_planes,
        seed,
    )
    # "bucket" has at most 2^n_planes distinct values — broadcast the
    # query side so the corpus never hash-partitions on it. Norms are
    # hoisted per row out of the per-pair expression (same fold —
    # bit-identical quotient).
    scored = (
        cb.withColumn("__cn", l2_norm(F.col("__cv")))
        .join(
            _maybe_broadcast(
                qb.withColumn("__qn", l2_norm(F.col("__qv"))),
                broadcast_queries,
            ),
            "bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _ranked_centroid_dists() -> Column:
    """The ONE copy of the per-row centroid-distance ranking expression
    both assignment forms share: identity-form L2² (v·v − 2 v·c + c·c —
    same fold order on any engine) rounded to 6 dp with the centroid id
    as tiebreak, distance-sorted. HOF lambdas run INTERPRETED and
    re-evaluate any outer expression they close over per element (the
    winnow_fingerprints lesson), so the two loop-invariant folds are
    hoisted: ``c·c`` is precomputed per centroid in the packed struct
    (k folds total, not k per corpus row) and ``v·v`` is `_let`-bound
    (one fold per row, not one per centroid). The summation order
    ``(vv − 2·vc) + cc`` is unchanged, so distances are bit-identical.
    Expects columns ``__v`` and ``__cs`` (array of ``struct(cid,
    __centv, __cc)``)."""
    return _let(
        dot(F.col("__v"), F.col("__v")),
        lambda vv: F.array_sort(
            F.transform(
                F.col("__cs"),
                lambda s: F.struct(
                    F.round(
                        vv
                        - F.lit(2.0) * dot(F.col("__v"), s.getField("__centv"))
                        + s.getField("__cc"),
                        6,
                    ).alias("d"),
                    s.getField("cid").alias("cid"),
                ),
            )
        ),
    )


def _pack_centroids(cid: Column, centv: Column) -> Column:
    """``collect_list`` aggregate packing centroids as ``struct(cid,
    __centv, __cc)`` with the self-dot precomputed once per centroid
    (same left-fold ``dot``, so the value is the IEEE-identical bits
    the per-row evaluation produced)."""
    return F.collect_list(
        F.struct(
            cid.alias("cid"),
            centv.alias("__centv"),
            dot(centv, centv).alias("__cc"),
        )
    ).alias("__cs")


def _kmeans_dist_ranked(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Broadcast the packed single-row centroid array and rank every
    vector against every centroid (see ``_ranked_centroid_dists``).
    Zero-shuffle — the corpus never moves. Returns ``(__id, __v,
    __ranked)`` where ``__ranked`` is the distance-sorted
    ``struct(d, cid)`` array."""
    packed = centroids.agg(
        _pack_centroids(F.col("cid"), F.col("__centv"))
    )
    return (
        v.crossJoin(F.broadcast(packed))
        .withColumn("__ranked", _ranked_centroid_dists())
        .select("__id", "__v", "__ranked")
    )


def _kmeans_dist_ranked_grouped(
    v: DataFrame, centroids: DataFrame, group_col: str = "__grp"
) -> DataFrame:
    """Grouped twin of ``_kmeans_dist_ranked``: ``v`` carries a group
    key (``(group, __id, __v)``) and ``centroids`` one codebook per
    group (``(group, cid, __centv)``); every row is ranked against its
    OWN group's centroids only. The packed centroid table is one row
    per group (bounded: groups × k structs) and broadcast, so the
    corpus side still never shuffles — the m independent per-subspace
    assignment passes of the PQ family collapse into ONE plan with
    identical per-row arithmetic (same ``round(d2, 6)`` + cid
    tie-break)."""
    packed = centroids.groupBy(group_col).agg(
        _pack_centroids(F.col("cid"), F.col("__centv"))
    )
    return (
        v.join(F.broadcast(packed), group_col)
        .withColumn("__ranked", _ranked_centroid_dists())
        .select(group_col, "__id", "__v", "__ranked")
    )


def _local_centroids(spark, rows) -> DataFrame:
    """(cid, __centv) rows → a literal centroid table — the
    bounded-model-artifact bridge of the driver-iterated Lloyd fits
    (k·dim doubles cross the driver per iteration, bit-exactly). See
    ``functions.literals.literal_frame`` for why this must be a SQL
    ``VALUES`` LocalRelation and not ``createDataFrame``/``inline``
    (both measured dead ends, round 16)."""
    from traits_data_spark.functions.literals import literal_frame

    return literal_frame(spark, rows, "cid int, __centv array<double>")


def _local_grouped_centroids(spark, grp_type, rows) -> DataFrame:
    """Grouped twin of ``_local_centroids``: (__grp, cid, __centv)."""
    from traits_data_spark.functions.literals import literal_frame

    return literal_frame(
        spark,
        rows,
        f"__grp {grp_type.simpleString()}, cid int, "
        "__centv array<double>",
    )


def kmeans_fit_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str = "__id",
    vec_col: str = "__v",
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
    checkpoint: bool = True,
    seed_ids: Sequence | None = None,
) -> DataFrame:
    """Fit ONE deterministic Lloyd k-means PER GROUP in a single plan
    — the batched form of running ``kmeans_fit`` once per group.
    Returns ``(group_col, cid, __centv)``.

    Bit-identical to the per-group loop: seeds are each group's ``k``
    rows with the smallest ``(portable_hash64(id), id)`` (the same
    global top-k per group the ungrouped fit takes — the hash ignores
    the group, so identical id sets seed identically), assignment uses
    the shared ``round(d2, 6) + cid`` ranking, and centroid rebuilds
    sum the same ``round(x*scale)`` BIGINTs per ``(group, cid, pos)``.

    Why it exists: ``pq_fit`` ran m=16 INDEPENDENT fits, each ending
    in an eager ``localCheckpoint`` — 192 jobs at PQ_ITER=2 whose
    per-job fixed cost dominated the fit at bench scale (9.5 s of an
    11.7 s pq_topk, stage-profiled round 16) and whose job storm is
    pure scheduler pressure at any scale.

    Like ``kmeans_fit``, the Lloyd loop iterates DRIVER-SIDE (the
    MLlib pattern): each step is one job over the melted input whose
    (groups × k)-row centroid result is collected (bounded model
    artifact) and re-embedded as a literal ``LocalRelation``, so no
    iteration ever nests inside another's broadcast and downstream
    consumers see a literal codebook. ``checkpoint`` is kept for API
    compatibility and ignored.

    ``seed_ids`` (ordered, rank = cid) skips the per-group seeding
    window entirely: when every group contains the same id set —
    ``pq_fit``'s melt does by construction, which is also what makes
    the per-group top-k equal the global top-k — the caller passes
    the globally ranked ids and seeds are fetched with one filter
    instead of a full-input window sort.
    """
    spark = df.sparkSession
    from traits_data_spark.operators.dedup import widen_if_narrow

    # widen as in kmeans_fit (no-op for the usual cached-melt input,
    # which reports no files)
    v = widen_if_narrow(
        df.select(
            F.col(group_col).alias("__grp"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    from traits_data_spark.functions.scalars import portable_hash64

    grp_type = v.schema["__grp"].dataType
    if seed_ids is not None:
        rank = {sid: i for i, sid in enumerate(seed_ids)}
        rows = v.filter(F.col("__id").isin(list(seed_ids))).collect()
        seed_tuples = [
            (r["__grp"], rank[r["__id"]], list(r["__v"])) for r in rows
        ]
    else:
        wseed = Window.partitionBy("__grp").orderBy("__h", "__id")
        rows = (
            v.withColumn(
                "__h", portable_hash64(F.col("__id").cast("string"))
            )
            .withColumn("__rn", F.row_number().over(wseed))
            .filter(F.col("__rn") <= k)
            .select(
                "__grp",
                (F.col("__rn") - 1).cast("int").alias("cid"),
                F.col("__v").alias("__centv"),
            )
            .collect()
        )
        seed_tuples = [
            (r["__grp"], int(r["cid"]), list(r["__centv"])) for r in rows
        ]
    centroids = _local_grouped_centroids(spark, grp_type, seed_tuples)
    for _ in range(n_iter):
        assigned = (
            _kmeans_dist_ranked_grouped(v, centroids)
            .withColumn("__best", F.element_at(F.col("__ranked"), 1))
            .select("__grp", "__id", "__v", F.col("__best.cid").alias("cid"))
        )
        comp = (
            assigned.select(
                "__grp", "cid", F.posexplode("__v").alias("pos", "x")
            )
            .groupBy("__grp", "cid", "pos")
            .agg(
                F.sum(F.round(F.col("x") * scale).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        new_rows = (
            comp.groupBy("__grp", "cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                (
                                    F.col("s").cast("double")
                                    / (F.lit(float(scale)) * F.col("n"))
                                ).alias("comp"),
                            )
                        )
                    ),
                    lambda s: s.getField("comp"),
                ).alias("__centv")
            )
            .collect()
        )
        centroids = _local_grouped_centroids(
            spark,
            grp_type,
            [
                (r["__grp"], int(r["cid"]), list(r["__centv"]))
                for r in new_rows
            ],
        )
    return centroids.withColumnRenamed("__grp", group_col)


def _kmeans_assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (rank 1 of ``_kmeans_dist_ranked``)."""
    return (
        _kmeans_dist_ranked(v, centroids)
        .withColumn("__best", F.element_at(F.col("__ranked"), 1))
        .select(
            "__id",
            "__v",
            F.col("__best.cid").alias("cid"),
            F.col("__best.d").alias("__d"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic Lloyd k-means fit → ``(cid, __centv)`` centroid
    table, exactly reproducible by a SQL oracle (unlike Spark ML's
    KMeans, whose sampled init and float reduction order are
    engine-private).

    The fit iterates DRIVER-SIDE, exactly like Spark MLlib's own
    ``KMeans``: each Lloyd step runs one job whose k-row centroid
    result is collected to the driver (a bounded model artifact —
    k·dim doubles, the same contract as the repo's vocab collects)
    and re-embedded as a literal ``LocalRelation`` for the next step.
    Downstream consumers therefore see a LITERAL centroid table: no
    nested fit subtree is ever re-analyzed or re-executed, and the
    broadcast side of every assignment join is free. (The previous
    lazy-composition form nested iteration ``i``'s whole plan inside
    iteration ``i+1``'s broadcast exchange; with an eager trailing
    ``localCheckpoint`` that cost one job per broadcast barrier plus
    quadratic plan re-analysis — 35 jobs / 8.5 s of driver time for
    ``ivfpq_topk`` at sf0.1, stage-profiled round 16.) The call is
    eager: the fit runs at DataFrame-construction time. ``checkpoint``
    is kept for API compatibility and ignored — a LocalRelation is
    inherently materialized and holds no executor storage.

    Seeds are the ``k`` vectors with the smallest portable 60-bit hash
    of their id (a deterministic stand-in for k-means++ sampling);
    each Lloyd step assigns every vector to its nearest centroid and
    recomputes centroids as fixed-point means (``round(x*scale)``
    summed as BIGINT — order-independent).

    Scale shape (100 TB): seeding is a global top-k
    (TakeOrderedAndProject — no full sort); each iteration is ONE
    shuffle (the k·dim-row centroid rebuild) because assignment cross
    joins a broadcast single-row centroid array and never moves the
    corpus; k iterations = k small shuffles, corpus scanned k+1 times
    (persist upstream if the input is an expensive plan). Empty
    clusters drop out (both engines lose the id the same way).
    """
    from traits_data_spark.functions.scalars import portable_hash64
    from traits_data_spark.operators.dedup import widen_if_narrow

    spark = df.sparkSession
    # widen: each Lloyd step re-scans this projection, and a narrow
    # (single-split) input serializes every iteration onto one core
    v = widen_if_narrow(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    # seeding: global top-k by (hash, id) — TakeOrderedAndProject, no
    # full sort; the k rows come back in rank order, re-sorted
    # driver-side by the same keys for belt-and-braces determinism
    seed_rows = (
        v.withColumn("__h", portable_hash64(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    seed_rows.sort(key=lambda r: (r["__h"], r["__id"]))
    centroids = _local_centroids(
        spark, [(i, list(r["__v"])) for i, r in enumerate(seed_rows)]
    )
    for _ in range(n_iter):
        assigned = _kmeans_assign(v, centroids)
        comp = (
            assigned.select("cid", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.round(F.col("x") * scale).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # same fixed-point mean expressions as ever; only the
        # materialization changed (collect k rows vs checkpoint) —
        # doubles round-trip the driver bit-exactly (IEEE 754)
        new_rows = (
            comp.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                (
                                    F.col("s").cast("double")
                                    / (F.lit(float(scale)) * F.col("n"))
                                ).alias("comp"),
                            )
                        )
                    ),
                    lambda s: s.getField("comp"),
                ).alias("__centv")
            )
            .collect()
        )
        centroids = _local_centroids(
            spark, [(int(r["cid"]), list(r["__centv"])) for r in new_rows]
        )
    return centroids


def kmeans_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column: one row
    per vector with its final cluster and squared distance. See
    ``kmeans_fit`` for the determinism and scale contract."""
    from traits_data_spark.operators.dedup import widen_if_narrow

    v = widen_if_narrow(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    centroids = kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=k, n_iter=n_iter, scale=scale
    )
    final = _kmeans_assign(v, centroids)
    return final.select(
        F.col("__id").alias(id_col),
        F.col("cid").cast("long").alias("cluster"),
        (F.col("__d") + F.lit(0.0)).alias("dist2"),
    )


def kmeans_clusters_topm(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    m: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-``m`` multi-assignment k-means: one row per (vector,
    assignment rank) for the ``m`` nearest centroids — the SemDeDup
    cross-boundary recall move. Single-assignment shard-local dedup
    structurally misses near-dup pairs whose members' PRIMARY clusters
    differ (a pair straddling a k-means boundary); assigning each
    vector to its top-2 centroids puts both members of such a pair in
    their shared second-choice cluster, so a cluster-keyed dedup pass
    recovers them at ≤ m× the comparisons.

    Same zero-shuffle assignment as ``kmeans_clusters`` (broadcast
    packed centroid array, identity-form L2² rounded to 6 dp, cid
    tiebreak); ``F.slice`` of the sorted distance array replaces
    ``element_at(..., 1)``, and ``posexplode`` emits ``arank``
    (1-based: 1 = nearest). Output: ``(id_col, cluster, arank,
    dist2)`` — ``m × n`` rows (fewer only if the fit lost centroids
    to empty clusters and fewer than ``m`` remain).
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    from traits_data_spark.operators.dedup import widen_if_narrow

    v = widen_if_narrow(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    centroids = kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=k, n_iter=n_iter, scale=scale
    )
    return (
        _kmeans_dist_ranked(v, centroids)
        .select(
            "__id",
            F.posexplode(F.slice(F.col("__ranked"), 1, m)).alias(
                "__pos", "__a"
            ),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__a.cid").cast("long").alias("cluster"),
            (F.col("__pos") + F.lit(1)).cast("long").alias("arank"),
            (F.col("__a.d") + F.lit(0.0)).alias("dist2"),
        )
    )


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    n_iter: int = 2,
    n_probe: int = 2,
    scale: int = 1_000_000,
    broadcast_queries: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k with a *deterministic k-means* coarse
    quantizer — the classic FAISS IVF-Flat shape, but oracle-checkable:
    cells come from ``kmeans_fit`` (hash-seeded Lloyd, fixed-point
    means), so the whole index build + probe + score pipeline is
    reproducible bit-for-bit by a SQL engine, unlike the Spark ML
    variant (``ivf_topk``).

    Scale shape (100 TB): the centroid fit never shuffles the corpus
    (see ``kmeans_fit``); cell assignment is the same broadcast map;
    queries rank the broadcast centroid table and probe their
    ``n_probe`` nearest cells, so the only corpus-sized shuffle is the
    cell-id join. ``n_probe == n_centroids`` degenerates to exact
    brute force.

    Pass ``centroids`` (a ``kmeans_fit`` result) to reuse an existing
    index across calls — what a deployment sweeping ``n_probe`` or
    serving many query batches does instead of refitting per batch.
    """
    if centroids is None:
        centroids = kmeans_fit(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            k=n_centroids,
            n_iter=n_iter,
            scale=scale,
        )
    from traits_data_spark.operators.dedup import widen_if_narrow

    c = widen_if_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
    )
    assigned = _kmeans_assign(
        c.select(F.col("neighbor_id").alias("__id"), F.col("__cv").alias("__v")),
        centroids,
    ).select(
        F.col("__id").alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        F.col("cid").alias("__cid"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    # rank centroids per query on the same rounded L2², probe the
    # n_probe nearest cells
    d2 = (
        dot(F.col("__qv"), F.col("__qv"))
        - F.lit(2.0) * dot(F.col("__qv"), F.col("__centv"))
        + dot(F.col("__centv"), F.col("__centv"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("__cid").asc()
    )
    q_probed = (
        q.join(F.broadcast(centroids.withColumnRenamed("cid", "__cid")))
        .withColumn("__d2", F.round(d2, 6))
        .withColumn("__prk", F.row_number().over(wp))
        .filter(F.col("__prk") <= n_probe)
        .select("query_id", "__qv", "__cid")
    )
    # Broadcast the probed-query side (see ivf_topk): __cid has only
    # n_centroids distinct values, so a shuffled join would funnel the
    # corpus into k tasks; broadcasting removes the corpus-side Exchange.
    # per-row norms hoisted out of the pair expression (one fold per
    # row, not per pair; same fold — bit-identical quotient)
    scored = (
        assigned.filter(_norm2(F.col("__cv")) > 0)
        .withColumn("__cn", l2_norm(F.col("__cv")))
        .join(
            _maybe_broadcast(
                q_probed.filter(_norm2(F.col("__qv")) > 0).withColumn(
                    "__qn", l2_norm(F.col("__qv"))
                ),
                broadcast_queries,
            ),
            "__cid",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _vector_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to ``(id, vector-as-double)`` and persist: the ONE
    materialization every PQ fit/encode pass slices its subspaces
    from. Without it, each of the ``m`` sub-fits (times the Lloyd
    iterations inside) and each of the ``m`` encode slices re-executes
    the raw input plan — plan-audited at 34 parquet scans for
    ``pq_topk`` with m=16 before this, ≤3 after. Freed by
    ``spark.catalog.clearCache()`` (same lifecycle as ``ivfpq_topk``'s
    residual frame). The fit-then-encode recipe (``pq_fit(df)`` then
    ``pq_encode(df, books)``) does NOT double-cache: both calls build
    the identical analyzed plan and Spark's cacheManager dedupes it
    (probed: 1 persistent RDD after both, round 11) — callers only
    need ``materialize=False`` when the input is ALREADY persisted
    under a different plan (ivfpq's residual frame)."""
    from traits_data_spark.operators.dedup import widen_if_narrow

    # widen BEFORE persisting: the testdata/single-row-group case scans
    # as ONE split, and a 1-partition cache serializes every fit
    # iteration and encode pass onto one core (at real scale the input
    # already splits >= cores and this is a no-op — guide §2.5/§6)
    return widen_if_narrow(
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
    ).persist()


def pq_fit(
    df: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., TPAMI'11 — the
    FAISS ``PQ`` index family): split each ``dim``-vector into ``m``
    contiguous subspaces and fit an independent deterministic k-means
    codebook per subspace (``kmeans_fit``: hash-seeded, fixed-point
    means — so the whole fit is SQL-reproducible, unlike FAISS's).
    Returns ``(sub, cid, cvec)``, ``m·k`` rows — a bounded model
    artifact (m·k·(dim/m) doubles) that broadcasts everywhere it is
    used. Memory story at 100 TB: encoded vectors cost ``m·log2(k)``
    bits instead of ``dim·64`` (here 12 bits vs 4096 — ~340×).

    ``materialize=True`` (default) persists the ``(id, vector)``
    projection once before the melted grouped fit so the per-iteration
    scans hit the cache, not the raw input plan. Pass
    ``materialize=False`` when ``df`` is ALREADY persisted/
    checkpointed (``ivfpq_topk``'s residual frame, ``pq_topk``'s
    shared base) to avoid caching the same rows twice."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    src = _vector_base(df, id_col, vec_col) if materialize else df
    v = F.col(vec_col).cast("array<double>")

    # ONE melted (id, sub, subvector) pass feeds a single grouped fit:
    # round 11 killed the per-subspace RE-SCANS with the persisted
    # base; round 16 kills the per-subspace JOB CASCADES — m
    # independent fits each ending in an eager localCheckpoint ran 192
    # jobs for m=16/n_iter=2 (9.5 s of pq_topk's 11.7 s wall was this
    # construction-time fit, stage-profiled), where the grouped fit
    # runs ONE lazy chain with ONE checkpoint. Codebooks are
    # bit-identical (see kmeans_fit_grouped).
    melted = src.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(v, s * sub + 1, sub),
            )
        ).alias("__sub", "__sv"),
    )
    # every subspace group holds the SAME id set, so the per-group
    # seed ranking equals the global (hash, id) top-k — computed once
    # on the unmelted projection (TakeOrderedAndProject) instead of a
    # window sort over the full melt
    from traits_data_spark.functions.scalars import portable_hash64

    seed_rows = (
        src.select(F.col(id_col).alias("__id"))
        .withColumn("__h", portable_hash64(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    seed_rows.sort(key=lambda r: (r["__h"], r["__id"]))
    books = kmeans_fit_grouped(
        melted, "__sub", id_col=id_col, vec_col="__sv", k=k,
        n_iter=n_iter, scale=scale,
        seed_ids=[r["__id"] for r in seed_rows],
    )
    return books.select(
        F.col("__sub").cast("int").alias("sub"),
        "cid",
        F.col("__centv").alias("cvec"),
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """Encode vectors against PQ codebooks: one row per (vector,
    subspace) with the nearest-centroid code — the melt form a
    code-keyed ADC join consumes directly (pack to an array with
    ``collect_list`` if storing). Assignment reuses ``_kmeans_assign``
    (broadcast centroid array, round(d2,6) + cid tie-break), so codes
    are exactly SQL-reproducible and the corpus never shuffles.
    ``materialize`` as in ``pq_fit`` — False when ``df`` is already
    persisted."""
    sub = dim // m
    src = _vector_base(df, id_col, vec_col) if materialize else df
    v = F.col(vec_col).cast("array<double>")
    # single melt + grouped assignment (same round(d2,6)+cid ranking
    # per subspace): the m-way unionByName of per-subspace assigns
    # rebuilt the corpus subtree m times in the plan; this is one
    # subtree and one broadcast of the packed (m × k)-row codebook
    melted = src.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(v, s * sub + 1, sub),
            )
        ).alias("__grp", "__v"),
    )
    cb = codebooks.select(
        F.col("sub").alias("__grp"), "cid", F.col("cvec").alias("__centv")
    )
    return (
        _kmeans_dist_ranked_grouped(melted, cb)
        .withColumn("__best", F.element_at(F.col("__ranked"), 1))
        .select(
            F.col("__id").alias(id_col),
            F.col("__grp").cast("int").alias("sub"),
            F.col("__best.cid").alias("code"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_codes: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
    codebooks: DataFrame | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation (ADC):
    queries stay full-precision, the corpus is its PQ codes, and each
    candidate's distance is the sum of per-subspace query→centroid
    distances looked up by code.

    Exactness contract: per-subspace distances are INTEGER micro-units
    (``round(d2_raw · 10⁶)`` as BIGINT), so the m-way sum is
    order-independent — a plain double sum across a shuffle would
    round differently per execution and could never hash-match an
    oracle. Output: ``(query_id, neighbor_id, approx_d2_micro, rk)``
    ranked ascending (ties → neighbor_id).

    Scale shape: the corpus is touched as codes only (one encode pass
    of broadcast assignments, then an ``m``-row-per-vector melt); the
    query-side distance table is |Q|·m·k rows, broadcast; the only
    aggregation is the pair-keyed integer sum with map-side combine.
    Pass ``codebooks`` (a ``pq_fit`` result) to reuse a trained index
    across batches.

    ``rerank=R`` runs the deployment shape: ADC retrieves the top-R
    candidates per query, then ONLY those R vectors are fetched
    full-precision and re-ranked by exact L2 — output gains ``d2``
    (exact, 6-dp) and ranks by it. Measured on the sf0.1 eval corpus
    (m=16, k=16, R=100): recall@5 = 0.858 scanning 5% of the corpus —
    the best cost/recall point of every ANN method in the SCALE.md
    round-10 ladder, which is exactly why FAISS deployments pair PQ
    with a re-rank stage. Without re-rank, pure 12-128-bit ADC recall
    on near-isotropic data is 0.04-0.48 (ladder) — honest, and not
    deployable alone."""
    # ONE materialization of the corpus projection feeds the fit's
    # m·(n_iter+1) subspace scans, the encode's m slices, AND the
    # re-rank vector fetch (34 raw scans before, ≤3 after — plan_audit)
    base = _vector_base(corpus, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_fit(
            base, dim, m=m, id_col=id_col, vec_col=vec_col, k=n_codes,
            n_iter=n_iter, scale=scale, materialize=False,
        )
    codes = pq_encode(
        base, codebooks, dim, m=m, id_col=id_col, vec_col=vec_col,
        materialize=False,
    ).withColumnRenamed(id_col, "neighbor_id")
    sub = dim // m
    qv = F.col(vec_col).cast("array<double>")
    d2 = (
        dot(F.col("__qv"), F.col("__qv"))
        - F.lit(2.0) * dot(F.col("__qv"), F.col("cvec"))
        + dot(F.col("cvec"), F.col("cvec"))
    )
    # melt queries to (query_id, sub, subvector) with ONE posexplode —
    # an m-way unionByName here re-scans the queries input m times
    # (the residue of round 10's 34-scan audit after the corpus base
    # was persisted)
    qmelt = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(qv, s * sub + 1, sub),
            )
        ).alias("sub", "__qv"),
    )
    qtab = (
        qmelt.join(codebooks, "sub")
        .select(
            "query_id",
            "sub",
            F.col("cid").alias("code"),
            F.round(d2 * F.lit(1_000_000.0))
            .cast("long")
            .alias("__d2_micro"),
        )
    )
    paired = (
        codes.join(F.broadcast(qtab), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d2_micro").cast("long").alias("approx_d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    if rerank is None:
        return (
            paired.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "approx_d2_micro", "rk")
        )
    cands = (
        paired.withColumn("__ark", F.row_number().over(w))
        .filter(F.col("__ark") <= int(rerank))
        .select("query_id", "neighbor_id")
    )
    cvecs = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    exact_d2 = F.round(
        dot(F.col("__qv"), F.col("__qv"))
        - F.lit(2.0) * dot(F.col("__qv"), F.col("__cv"))
        + dot(F.col("__cv"), F.col("__cv")),
        6,
    ) + F.lit(0.0)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("d2", exact_d2)
        .withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "d2", "rk")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 8,
    cell_iter: int = 2,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    pq_iter: int = 2,
    scale: int = 1_000_000,
    rerank: int | None = None,
    centroids: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. TPAMI'11 §V; the FAISS
    ``IVFx,PQy`` production index): a deterministic k-means coarse
    quantizer routes each vector to a cell, the RESIDUAL (vector minus
    its cell centroid) is product-quantized with ONE codebook shared
    across cells, and queries score only the codes in their ``n_probe``
    nearest cells by integer-micro ADC in residual space — combining
    IVF's candidate pruning (cand_frac ≈ n_probe/n_cells) with PQ's
    ``m·log2(n_codes)``-bit memory story. ``rerank=R`` then fetches
    only the top-R full-precision vectors per query and re-ranks by
    exact L2 in the ORIGINAL space (the deployment shape).

    Exactness contract: every stage reuses an established
    hash-matchable pattern — hash-seeded fixed-point Lloyd
    (``kmeans_fit``), round(d2,6)+cid assignment ties, element-wise
    residual subtraction (one IEEE op per component), and per-subspace
    ADC distances rounded to INTEGER micro-units so the m-way sum is
    shuffle-order-free.

    Scale shape (100 TB): the corpus never shuffles — cell assignment
    and code assignment are broadcast-centroid cross joins; the
    residual frame is persisted once (callers should unpersist via
    ``spark.catalog.clearCache()`` when done; pass ``centroids=`` to
    reuse a coarse index across batches) and scanned by the
    ``m·(pq_iter+1)`` bounded sub-fits; the ADC join streams codes
    against a broadcast |Q|·n_probe·m·n_codes distance table keyed by
    (cell, sub, code), so only probed cells' codes survive the join —
    the IVF pruning happens map-side. The only aggregation is the
    pair-keyed integer sum with map-side combine."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    if centroids is None:
        centroids = kmeans_fit(
            corpus, id_col=id_col, vec_col=vec_col, k=n_cells,
            n_iter=cell_iter, scale=scale,
        )
    from traits_data_spark.operators.dedup import widen_if_narrow

    # widen: the cell assignment + residual build is per-row compute
    # over a broadcast join — a single-split scan runs it on one core
    c = widen_if_narrow(
        corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    assigned = _kmeans_assign(c, centroids)
    cents = centroids.select(
        F.col("cid"), F.col("__centv").alias("__cellv")
    )
    resid = (
        assigned.join(F.broadcast(cents), "cid")
        .select(
            F.col("__id").alias(id_col),
            F.col("cid").alias("cell"),
            F.zip_with(
                F.col("__v"), F.col("__cellv"), lambda a, b: a - b
            ).alias("embedding"),
        )
        .persist()
    )
    books = pq_fit(
        resid, dim, m=m, id_col=id_col, vec_col="embedding", k=n_codes,
        n_iter=pq_iter, scale=scale, materialize=False,
    )
    # encode residuals carrying the cell through pq_encode's id slot
    # as a struct (pure projection — no extra corpus join)
    enc_in = resid.select(
        F.struct(
            F.col(id_col).alias("i"), F.col("cell").alias("c")
        ).alias(id_col),
        "embedding",
    )
    codes = pq_encode(
        enc_in, books, dim, m=m, id_col=id_col, vec_col="embedding",
        materialize=False,
    ).select(
        F.col(id_col).getField("i").alias("neighbor_id"),
        F.col(id_col).getField("c").alias("cell"),
        "sub",
        "code",
    )
    # queries rank the broadcast cell centroids, probe n_probe cells,
    # and move to residual space vs each probed cell
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    d2c = (
        dot(F.col("__qv"), F.col("__qv"))
        - F.lit(2.0) * dot(F.col("__qv"), F.col("__cellv"))
        + dot(F.col("__cellv"), F.col("__cellv"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("cell").asc()
    )
    q_probed = (
        q.join(F.broadcast(cents.withColumnRenamed("cid", "cell")))
        .withColumn("__d2", F.round(d2c, 6))
        .withColumn("__prk", F.row_number().over(wp))
        .filter(F.col("__prk") <= n_probe)
        .select(
            "query_id",
            "cell",
            F.zip_with(
                F.col("__qv"), F.col("__cellv"), lambda a, b: a - b
            ).alias("__qr"),
        )
    )
    d2t = (
        dot(F.col("__qs"), F.col("__qs"))
        - F.lit(2.0) * dot(F.col("__qs"), F.col("cvec"))
        + dot(F.col("cvec"), F.col("cvec"))
    )
    qsubs = []
    for s in range(m):
        qsubs.append(
            q_probed.select(
                "query_id",
                "cell",
                F.lit(s).alias("sub"),
                F.slice(F.col("__qr"), s * sub + 1, sub).alias("__qs"),
            )
        )
    qmelt = qsubs[0]
    for qd in qsubs[1:]:
        qmelt = qmelt.unionByName(qd)
    qtab = qmelt.join(books, "sub").select(
        "query_id",
        "cell",
        "sub",
        F.col("cid").alias("code"),
        F.round(d2t * F.lit(1_000_000.0)).cast("long").alias("__d2_micro"),
    )
    paired = (
        codes.join(_maybe_broadcast(qtab, broadcast_queries),
                   ["cell", "sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d2_micro").cast("long").alias("approx_d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    if rerank is None:
        return (
            paired.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "approx_d2_micro", "rk")
        )
    cands = (
        paired.withColumn("__ark", F.row_number().over(w))
        .filter(F.col("__ark") <= int(rerank))
        .select("query_id", "neighbor_id")
    )
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvx"),
    )
    exact_d2 = F.round(
        dot(F.col("__qvx"), F.col("__qvx"))
        - F.lit(2.0) * dot(F.col("__qvx"), F.col("__cv"))
        + dot(F.col("__cv"), F.col("__cv")),
        6,
    ) + F.lit(0.0)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("d2", exact_d2)
        .withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "d2", "rk")
    )


def ann_recall(
    exact: DataFrame,
    approx_by_method: dict[str, DataFrame],
    k: int,
) -> DataFrame:
    """Recall@k of each approximate top-k method against the exact
    brute-force top-k on the same query set — the evaluation loop every
    ANN deployment needs before trusting an index (FAISS's standard
    metric). Deterministic given deterministic inputs (both sides
    break cosine ties on neighbor_id), hence fully oracle-able.

    Inputs are ``(query_id, neighbor_id, ...)`` top-k frames as
    produced by ``cosine_topk_bruteforce`` / ``lsh_bucketed_topk`` /
    ``ivf_topk_kmeans``. Output: one row per (method, query) —
    ``(method, query_id, hits, recall_at_k)`` with
    ``recall = hits / k``. Queries an approximate method misses
    entirely (empty LSH bucket) still appear, with recall 0 — macro
    averages over this frame are honest.

    Scale shape: the exact top-k is |Q|·k rows — persisted once and
    reused for every method, so the |Q|·|C| brute-force scan behind it
    runs exactly once; each per-method join is a broadcast of bounded
    evaluation frames. The expensive parts (the top-k computations
    themselves) are the INPUTS, not this operator.

    Persist lifecycle: the exact pairs stay cached for the session
    (the returned frame is lazy, so eager unpersist would defeat the
    single-scan shape). Long-lived callers should
    ``spark.catalog.clearCache()`` (or unpersist via
    ``df.sparkSession``) once the result is materialized; the bench
    harness already clears cache between queries.

    Both sides are deduplicated on (query_id, neighbor_id) before the
    hit join, so recall stays <= 1.0 even if a caller passes a
    candidate frame with repeated pairs (e.g. a multi-table LSH union
    without its final dedup).
    """
    exact_pairs = (
        exact.select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .persist()
    )
    base = exact_pairs.select("query_id").distinct()
    outs = []
    for method in sorted(approx_by_method):
        hits = (
            exact_pairs.join(
                approx_by_method[method]
                .select("query_id", "neighbor_id")
                .dropDuplicates(["query_id", "neighbor_id"]),
                ["query_id", "neighbor_id"],
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        got = F.coalesce(F.col("hits"), F.lit(0)).cast("long")
        outs.append(
            base.join(hits, "query_id", "left").select(
                F.lit(method).alias("method"),
                "query_id",
                got.alias("hits"),
                (
                    F.round(got.cast("double") / F.lit(float(k)), 6)
                    + F.lit(0.0)
                ).alias("recall_at_k"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Truncation-recall curve for Matryoshka-style embeddings
    (Kusupati et al., NeurIPS 2022): recall@k of brute-force cosine
    top-k over the FIRST ``d`` dimensions against full-dimension
    brute-force top-k, one method row-group per ``d`` in ``dims``
    (labeled ``dim_04``-style). This is the EMBEDDING-side compression
    eval next to the index-side ones already graded by ``ann_recall``
    (PQ/SQ8 shrink the index; truncation shrinks the vectors
    themselves — storage, shuffle AND scoring cost drop linearly in
    ``d``, which at 100 TB is usually the bigger lever).

    Truncated cosine re-normalizes implicitly: ``cosine`` divides by
    the sliced vectors' own norms, exactly how an MRL deployment
    scores prefixes. Every stage is deterministic (neighbor-id
    tie-breaks), so per-query recall is fully oracle-able.

    Scale shape: same as ``ann_recall`` — callers persist the (sampled)
    eval corpus once; each per-dim pipeline is a broadcast of the
    bounded query frame against the cached corpus, and the recall
    joins are |Q|·k-sized.
    """
    exact = cosine_topk_bruteforce(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k
    )
    approx = {}
    for d in dims:
        sliced_c = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), 1, int(d)).alias(vec_col),
        )
        sliced_q = queries.select(
            F.col(id_col),
            F.slice(F.col(vec_col), 1, int(d)).alias(vec_col),
        )
        approx[f"dim_{int(d):02d}"] = cosine_topk_bruteforce(
            sliced_c, sliced_q, id_col=id_col, vec_col=vec_col, k=k
        )
    return ann_recall(exact, approx, k=k)


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    k_pos: int = 2,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Contrastive training-pair mining: for each anchor vector, the
    top ``k_pos`` SAME-label neighbours (positives) and the top
    ``k_neg`` DIFFERENT-label neighbours by cosine (hard negatives —
    the wrong-label items closest to the anchor, which is where
    triplet/InfoNCE losses get their gradient; random negatives are
    too easy to teach anything). This is the training-data GENERATOR
    next to the representation probes (``knn_label_eval`` grades an
    embedding; this one mines the pairs that improve it).

    One cosine pass: corpus ⋈ broadcast(anchors) scored once, roles
    split by null-safe label equality, one window per
    (anchor, role) for the two top-k cuts — the positive and negative
    rankings never interleave, so a rank-partitioned SQL oracle
    reproduces every row. Output: ``(anchor_id, role 'pos'|'neg',
    rk, neighbor_id, cosine)``; anchors with fewer than ``k`` same/
    different-label rows emit what exists.

    Scale shape: identical to ``cosine_topk_bruteforce`` — the anchor
    frame broadcasts, the corpus never shuffles, and the window
    partitions on (anchor_id, role) so no single task sees more than
    one anchor's candidates. At 100 TB swap the scored-candidate
    source for an ANN candidate generator (LSH/IVF top-m with
    m >> k_pos+k_neg) and keep the role split/cut unchanged.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).cast("array<double>").alias("__av"),
        F.col(label_col).alias("__al"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        F.col(label_col).alias("__nl"),
    )
    scored = (
        # per-row norms hoisted out of the |A|×N pair expression (same
        # fold — bit-identical rounded quotient)
        c.withColumn("__cn", l2_norm(F.col("__cv")))
        .join(F.broadcast(a.withColumn("__an", l2_norm(F.col("__av")))))
        .filter(F.col("neighbor_id") != F.col("anchor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__av"), F.col("__cv"))
                / (F.col("__an") * F.col("__cn")),
                round_to,
            ),
        )
        .withColumn(
            "role",
            F.when(F.col("__nl").eqNullSafe(F.col("__al")), "pos").otherwise(
                "neg"
            ),
        )
    )
    w = Window.partitionBy("anchor_id", "role").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    keep = F.when(F.col("role") == "pos", F.lit(int(k_pos))).otherwise(
        F.lit(int(k_neg))
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= keep)
        .select("anchor_id", "role", "rk", "neighbor_id", "cosine")
    )
