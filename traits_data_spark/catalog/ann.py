"""Embedding / ANN family: cosine & quantized top-k, LSH (multiprobe), IVF, deterministic k-means, PQ / IVF-PQ, recall eval, matryoshka, hard negatives, semantic dedup, balanced shards."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    SparkSession,
    Window,
    _H60,
    _NORM,
    _hyperplanes,
    _t,
    ann_recall,
    bm25_topk,
    cosine_topk_bruteforce,
    cosine_topk_quantized,
    dedup_clusters,
    dequantize_int8,
    embedding_near_dups,
    hard_negative_mining,
    hyperplane_bucket_index,
    incremental_embedding_near_dups,
    ivf_topk_hyperplane,
    ivf_topk_kmeans,
    ivfpq_topk,
    kmeans_clusters,
    kmeans_fit,
    knn_label_eval,
    lsh_bucketed_topk,
    lsh_topk_multiprobe,
    matryoshka_recall,
    pq_encode,
    pq_fit,
    pq_topk,
    probe_masks,
    quantize_int8,
)

# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

EMB_DIM = 64
N_PLANES = 6
TOPK = 5
_QUERY_PRED = "vec_id < 10"


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk_bruteforce(
        emb, emb.filter(F.expr(_QUERY_PRED)), id_col="vec_id", k=TOPK
    )
    return out.withColumn("rk", F.col("rk").cast("long")).withColumn(
        "cosine", F.col("cosine") + F.lit(0.0)  # -0.0 → +0.0
    )


_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
           AS cosine
  FROM c, q WHERE neighbor_id != query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk FROM s)
SELECT query_id, neighbor_id, cosine + 0.0 AS cosine, rk FROM r WHERE rk <= {TOPK}
"""


def q_cosine_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-style top-k scored on int8 codes: one exact integer dot
    product per pair + per-row scalar algebra — the 4× bandwidth cut
    applied to the scoring loop itself, with an EXACT oracle because
    integer sums are order-independent."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_quantized(
        emb, emb.filter(F.expr(_QUERY_PRED)), dim=EMB_DIM, k=TOPK
    ).withColumn("rk", F.col("rk").cast("long"))


_QUANT_TOPK_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
st AS (
  SELECT vec_id, x, list_min(x) AS lo,
         (list_max(x) - list_min(x)) / 255.0 AS s
  FROM v
),
u AS (
  SELECT vec_id, lo, s,
         list_transform(
           x, e -> CAST(CASE WHEN s > 0 THEN round((e - lo) / s)
                        ELSE 0 END AS BIGINT)
         ) AS uv
  FROM st
),
m AS (
  SELECT vec_id, lo, s, uv,
         CAST(list_sum(uv) AS BIGINT) AS su,
         CAST(list_sum(list_transform(uv, y -> y * y)) AS BIGINT) AS suu
  FROM u
),
q AS (SELECT vec_id AS query_id, lo AS qlo, s AS qs, uv AS quv,
             su AS qsu, suu AS qsuu
      FROM m WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, lo, s, uv, su, suu FROM m),
p AS (
  SELECT query_id, neighbor_id,
         {float(EMB_DIM)} * lo * qlo
           + lo * qs * CAST(qsu AS DOUBLE)
           + qlo * s * CAST(su AS DOUBLE)
           + s * qs * CAST(list_dot_product(uv, quv) AS DOUBLE) AS dot_hat,
         {float(EMB_DIM)} * lo * lo
           + 2.0 * lo * s * CAST(su AS DOUBLE)
           + s * s * CAST(suu AS DOUBLE) AS cn,
         {float(EMB_DIM)} * qlo * qlo
           + 2.0 * qlo * qs * CAST(qsu AS DOUBLE)
           + qs * qs * CAST(qsuu AS DOUBLE) AS qn
  FROM c, q WHERE neighbor_id != query_id
),
r AS (
  SELECT query_id, neighbor_id,
         round(dot_hat / (sqrt(cn) * sqrt(qn)), 6) AS cosine_q
  FROM p WHERE cn > 0 AND qn > 0
),
rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_q DESC, neighbor_id) AS rk
       FROM r)
SELECT query_id, neighbor_id, cosine_q, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= {TOPK}
"""


def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN probe eval of the embedding space: majority neighbour label
    per query, agreement fraction, and own-label accuracy flag."""
    emb = _t(spark, sf_dir, "embeddings")
    return knn_label_eval(emb, emb.filter(F.expr(_QUERY_PRED)), k=TOPK)


_KNN_EVAL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label
           FROM embeddings WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, c.label AS nlabel,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
           AS cosine
  FROM c, q WHERE neighbor_id != query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk FROM s),
v AS (
  SELECT query_id, nlabel, COUNT(*) AS votes
  FROM r WHERE rk <= {TOPK} GROUP BY query_id, nlabel
),
m AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, nlabel) AS mrk
  FROM v
)
SELECT m.query_id, m.nlabel AS knn_label,
       CAST(m.votes AS DOUBLE) / {float(TOPK)} AS agreement,
       m.nlabel = q.label AS is_correct
FROM m JOIN q ON m.query_id = q.query_id
WHERE m.mrk = 1
"""


def _bucket_sql(v: str, n_planes: int, seed: int = 42) -> str:
    planes = _hyperplanes(EMB_DIM, n_planes, seed)
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product({v}, {arr}) > 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(terms)


NEAR_DUP_THRESHOLD = 0.3
NEAR_DUP_PLANES = 4
MULTIPROBE_TABLES = 3


def q_lsh_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH top-k — the recall-improving scale path (union
    of candidates from independent hash tables, scored once)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = lsh_topk_multiprobe(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        dim=EMB_DIM,
        k=TOPK,
        n_planes=N_PLANES,
        n_tables=MULTIPROBE_TABLES,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


def _lsh_multiprobe_sql() -> str:
    tables = " UNION ALL ".join(
        f"""SELECT q.id AS query_id, c.id AS neighbor_id
FROM (SELECT vec_id AS id, {_bucket_sql('embedding::DOUBLE[]', N_PLANES, 42 + t)} AS bucket
      FROM embeddings) c
JOIN (SELECT vec_id AS id, {_bucket_sql('embedding::DOUBLE[]', N_PLANES, 42 + t)} AS bucket
      FROM embeddings WHERE {_QUERY_PRED}) q USING (bucket)"""
        for t in range(MULTIPROBE_TABLES)
    )
    return f"""
WITH cand AS (
  SELECT DISTINCT query_id, neighbor_id FROM ({tables})
  WHERE query_id != neighbor_id
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv.vec, cv.vec)
               / (sqrt(list_dot_product(qv.vec, qv.vec))
                  * sqrt(list_dot_product(cv.vec, cv.vec))), 6) + 0.0 AS cosine
  FROM cand JOIN v cv ON cand.neighbor_id = cv.vec_id
            JOIN v qv ON cand.query_id = qv.vec_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk FROM s)
SELECT query_id, neighbor_id, cosine, rk FROM r WHERE rk <= {TOPK}
"""


def _lsh_multiprobe_probed_sql(
    n_planes: int, n_tables: int, probe_bits: int
) -> str:
    """Oracle for ``lsh_topk_multiprobe(probe_bits>0)``: per-table
    signatures from a planes VALUES table (each plane literal written
    once — 16 planes x 8 tables would otherwise repeat 256 CASE
    chains), then the query side expands each signature by XOR with
    every Hamming-<=probe_bits mask, exactly like the Spark operator's
    broadcast mask frame."""
    plane_rows = ", ".join(
        f"({t}, {i}, ["
        + ", ".join(repr(x) for x in p)
        + "]::DOUBLE[])"
        for t in range(n_tables)
        for i, p in enumerate(_hyperplanes(EMB_DIM, n_planes, 42 + t))
    )
    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_bits))
    return f"""
WITH planes AS (
  SELECT * FROM (VALUES {plane_rows}) AS pl(t, i, p)
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
sig AS (
  SELECT v.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(v.vec, pl.p) > 0
                       THEN (CAST(1 AS BIGINT) << pl.i)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes pl GROUP BY v.vec_id, pl.t
),
masks AS (SELECT unnest([{masks}]::BIGINT[]) AS mask),
probes AS (
  SELECT s.vec_id AS query_id, s.t, xor(s.bucket, m.mask) AS bucket
  FROM sig s CROSS JOIN masks m
  WHERE s.vec_id IN (SELECT vec_id FROM embeddings WHERE {_QUERY_PRED})
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN sig c ON c.t = p.t AND c.bucket = p.bucket
  WHERE c.vec_id != p.query_id
),
s AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_dot_product(qv.vec, cv.vec)
               / (sqrt(list_dot_product(qv.vec, qv.vec))
                  * sqrt(list_dot_product(cv.vec, cv.vec))), 6) + 0.0 AS cosine
  FROM cand JOIN v cv ON cand.neighbor_id = cv.vec_id
            JOIN v qv ON cand.query_id = qv.vec_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk FROM s)
SELECT query_id, neighbor_id, cosine, rk FROM r WHERE rk <= {TOPK}
"""


IVF_PLANES = 4  # 16 cells
IVF_PROBE = 4
IVF_SEED = 7
IVF_SCALE = 1_000_000


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with the deterministic hyperplane coarse
    quantizer (``ivf_topk_hyperplane``): cells = sign-buckets of
    seeded planes, centroids = exact fixed-point cell means — fully
    oracle-checkable. The Spark-ML k-means variant (``ivf_topk``)
    remains library-only (engine-private init); its deterministic
    replacement with a full oracle is ``ivf_topk_kmeans``."""
    emb = _t(spark, sf_dir, "embeddings")
    out = ivf_topk_hyperplane(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        dim=EMB_DIM,
        k=TOPK,
        n_planes=IVF_PLANES,
        n_probe=IVF_PROBE,
        seed=IVF_SEED,
        scale=IVF_SCALE,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


KMEANS_K = 8
KMEANS_ITER = 2


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means over the embeddings table
    (``operators.similarity.kmeans_clusters``): hash-seeded init,
    fixed-point centroid means, identity-form L2² — each step exactly
    reproducible by the SQL oracle, unlike Spark ML's KMeans."""
    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, k=KMEANS_K, n_iter=KMEANS_ITER)


def _kmeans_assign_cte(src_cent: str, tag: str, p: str = "") -> str:
    return f"""
{p}a{tag} AS (
  SELECT v.vec_id, v.vec, c.cid,
         round(list_dot_product(v.vec, v.vec)
               - 2.0 * list_dot_product(v.vec, c.vec)
               + list_dot_product(c.vec, c.vec), 6) AS d
  FROM {p}v v CROSS JOIN {src_cent} c
),
{p}m{tag} AS (
  SELECT vec_id, vec, cid, d FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM {p}a{tag}
  ) WHERE rn = 1
)"""


def _kmeans_cent_ctes(
    k: int,
    n_iter: int,
    p: str = "",
    vec_expr: str = "embedding::DOUBLE[]",
    dim: int = EMB_DIM,
    with_kw: bool = True,
    src: str = "embeddings",
) -> str:
    """WITH-chain mirroring kmeans_fit: hash-ranked seeds →
    (assign → fixed-point recompute) × n_iter; ends at
    ``{p}cent{n_iter}``. Defaults emit the original unprefixed
    whole-vector chain; the PQ oracle runs one prefixed chain per
    subspace over ``list_slice`` sub-vectors (``with_kw=False`` for
    every chain but the first); the IVF-PQ oracle points ``src`` at a
    derived residual CTE instead of the ``embeddings`` view."""
    h = _H60.format(x="CAST(vec_id AS VARCHAR)")
    scale = IVF_SCALE

    def recompute(tag: str, out: str) -> str:
        return f"""
{p}comp{out} AS (
  SELECT cid, gs.pos,
         CAST(SUM(CAST(ROUND(vec[gs.pos] * {scale}) AS BIGINT)) AS DOUBLE)
           / ({float(scale)} * COUNT(*)) AS comp
  FROM {p}m{tag} CROSS JOIN generate_series(1, {dim}) AS gs(pos)
  GROUP BY cid, gs.pos
),
{p}cent{out} AS (
  SELECT cid, array_agg(comp ORDER BY pos) AS vec FROM {p}comp{out} GROUP BY cid
)"""

    parts = [
        f"""{"WITH " if with_kw else ""}{p}v AS (
  SELECT vec_id, {vec_expr} AS vec FROM {src}
),
{p}seeds AS (
  SELECT {vec_expr} AS vec,
         CAST(row_number() OVER (ORDER BY {h}, vec_id) - 1 AS INT) AS cid
  FROM {src} ORDER BY {h}, vec_id LIMIT {k}
),
{p}cent0 AS (SELECT cid, vec::DOUBLE[] AS vec FROM {p}seeds)"""
    ]
    for i in range(n_iter):
        parts.append(_kmeans_assign_cte(f"{p}cent{i}", str(i), p))
        parts.append(recompute(str(i), str(i + 1)))
    return ",".join(parts)


def _kmeans_sql(k: int = KMEANS_K, n_iter: int = KMEANS_ITER) -> str:
    """CTE chain mirroring kmeans_clusters: seeds → (assign →
    recompute) × n_iter → final assign."""
    return (
        _kmeans_cent_ctes(k, n_iter)
        + ","
        + _kmeans_assign_cte(f"cent{n_iter}", "f")
        + """
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d + 0.0 AS dist2 FROM mf"""
    )


BALANCED_SHARDS_N = 6
SHARD_TARGET_SIZE = 84  # rows per shard the size-targeted layout holds


def q_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced embedding-space sharding
    (``operators.layout.balanced_shards`` over
    ``similarity.kmeans_clusters``): k-means the embeddings with the
    deterministic Lloyd fit, then chunk the (cluster, id) order into
    exactly-even shards — semantic neighbours co-locate per shard
    (curriculum sampling, shard-local near-dup) while shard sizes
    differ by at most one row (no straggler output files). The 1-D
    semantic analogue of ``zorder_values``' multi-column layout. No
    corpus-wide total order: cluster offsets come from a k-row
    cumulative window; rows rank within their cluster only. 500
    vectors / 6 shards → sizes 83/84, pinned by test."""
    from traits_data_spark.operators.layout import balanced_shards

    emb = _t(spark, sf_dir, "embeddings")
    # persist the assignment: balanced_shards consumes it three times
    # (cluster counts, total, within-cluster rank) and the k-means
    # assign pass — a vectors × centroids distance fold — must run
    # ONCE, not per consumer (measured 23.5 s → 16.7 s at the 20×
    # stress; the remainder is the fit+assign passes themselves,
    # in-family with ivf_topk_kmeans' 20× row)
    asg = (
        kmeans_clusters(emb, k=KMEANS_K, n_iter=KMEANS_ITER)
        .select("vec_id", "cluster")
        .persist()
    )
    return balanced_shards(
        asg, "vec_id", "cluster", n_shards=BALANCED_SHARDS_N
    )


def _balanced_shards_ctes(
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    n_shards: "int | str" = BALANCED_SHARDS_N,
) -> str:
    """Shared kmeans→balanced-shard CTE chain ending in ``bshard
    (vec_id, cluster, shard)`` — used by the ``balanced_shards``
    oracle and by every shard-consuming oracle downstream
    (``shard_local_near_dups``), so the layout replay can never
    diverge between them."""
    return (
        _kmeans_cent_ctes(k, n_iter)
        + ","
        + _kmeans_assign_cte(f"cent{n_iter}", "f")
        + """,
basg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM mf)"""
        + _bshard_layout_ctes("basg", f"{n_shards}", "")
    )


def _balanced_shards_sql(
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    n_shards: int = BALANCED_SHARDS_N,
) -> str:
    return (
        _balanced_shards_ctes(k, n_iter, n_shards)
        + "\nSELECT vec_id, cluster, shard FROM bshard"
    )


def q_shard_local_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-LOCAL near-duplicate pairs
    (``similarity.keyed_near_dups`` over ``layout.balanced_shards``):
    the dedup pass a semantically-sharded corpus actually runs —
    pairwise cosine WITHIN each balanced shard only, so the quadratic
    work is bounded by (total/n_shards)² per shard and the shuffle key
    is the layout itself (the SemDeDup deployment shape: cluster, then
    dedup inside clusters). Because ``balanced_shards`` co-locates
    k-means neighbours, the shard-local pass recovers the bulk of the
    global near-dup pairs at a fraction of the comparisons — the
    recall-vs-cost contract is pinned by test, and the pairs are
    hash-exact against the oracle's replay of the full layout chain +
    same-shard join."""
    from traits_data_spark.operators.layout import balanced_shards
    from traits_data_spark.operators.similarity import keyed_near_dups

    import math

    emb = _t(spark, sf_dir, "embeddings")
    asg = (
        kmeans_clusters(emb, k=KMEANS_K, n_iter=KMEANS_ITER)
        .select("vec_id", "cluster")
        .persist()
    )
    # shard SIZE is the scale contract, not shard count: n_shards
    # grows with the corpus so per-shard pairwise work stays
    # ~SHARD_TARGET_SIZE² regardless of N (a fixed count is quadratic
    # in N — measured as the 20× stress blowing past 10 minutes before
    # this derivation). Identical formula in the oracle:
    # greatest(1, ceil(t / SHARD_TARGET_SIZE)).
    n_shards = max(1, math.ceil(asg.count() / float(SHARD_TARGET_SIZE)))
    sh = balanced_shards(asg, "vec_id", "cluster", n_shards)
    keyed = emb.join(sh.select("vec_id", "shard"), "vec_id")
    return keyed_near_dups(
        keyed, "shard", threshold=NEAR_DUP_THRESHOLD
    )


def _shard_local_near_dups_sql(
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    target: int = SHARD_TARGET_SIZE,
) -> str:
    return (
        _balanced_shards_ctes(
            k,
            n_iter,
            f"greatest(1, CAST(ceil(t.t / {float(target)!r}) AS BIGINT))",
        )
        + f""",
se AS (
  SELECT s.shard, e.vec_id AS id, e.embedding::DOUBLE[] AS v
  FROM bshard s JOIN embeddings e USING (vec_id)
  WHERE list_dot_product(e.embedding::DOUBLE[],
                         e.embedding::DOUBLE[]) > 0
),
sp AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6)
           + 0.0 AS cosine
  FROM se a JOIN se b USING (shard) WHERE a.id < b.id
)
SELECT id_a, id_b, cosine FROM sp WHERE cosine >= {NEAR_DUP_THRESHOLD}"""
    )


def _m2_pairs(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Shared Spark chain for the top-2 multi-assignment shard-local
    near-dup pass: top-2 k-means assignment → balanced shards over the
    union of both assignments (cluster is the locality key, so a pair
    straddling a k-means boundary meets in its shared second-choice
    cluster) → same-shard pairwise cosine → DISTINCT (a pair sharing
    BOTH clusters surfaces once per shared cluster)."""
    import math

    from traits_data_spark.operators.layout import balanced_shards
    from traits_data_spark.operators.similarity import (
        keyed_near_dups,
        kmeans_clusters_topm,
    )

    asg = (
        kmeans_clusters_topm(emb, k=KMEANS_K, n_iter=KMEANS_ITER, m=2)
        .select("vec_id", "cluster")
        .persist()
    )
    # shard SIZE stays the scale contract (see shard_local_near_dups):
    # the assignment table has 2N rows, so n_shards doubles with the
    # multiplicity and per-shard pairwise work stays ~SHARD_TARGET²
    # — total comparisons ≈ 2× the single-assignment pass, the
    # SemDeDup multi-assignment recall/cost trade.
    n_shards = max(1, math.ceil(asg.count() / float(SHARD_TARGET_SIZE)))
    sh = balanced_shards(asg, "vec_id", "cluster", n_shards)
    keyed = emb.join(sh.select("vec_id", "shard"), "vec_id")
    return keyed_near_dups(
        keyed, "shard", threshold=NEAR_DUP_THRESHOLD
    ).distinct()


def q_shard_local_near_dups_m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local near-dup pairs with TOP-2 CLUSTER MULTI-ASSIGNMENT
    (``similarity.kmeans_clusters_topm`` + ``layout.balanced_shards``
    + ``similarity.keyed_near_dups``): the cross-shard recall fix for
    ``shard_local_near_dups``, which can only find pairs whose members
    land in the same shard — near-dups straddling a k-means boundary
    are structurally missed. SemDeDup practice: assign every vector to
    its TWO nearest centroids; a boundary pair whose primary clusters
    differ still shares a second-choice cluster, so the cluster-keyed
    shard layout co-locates it. Costs ≤2× the comparisons (2N
    assignment rows → 2× shards of the same target size); the recall
    lift over the single-assignment pass is pinned by test. Pairs are
    hash-exact against the oracle's replay of the top-2 assignment,
    the same balanced layout arithmetic, and the same-shard join."""
    emb = _t(spark, sf_dir, "embeddings")
    return _m2_pairs(spark, emb)


def _m2a_cte(m: int = 2) -> str:
    """The top-``m`` multi-assignment replay CTE ``m2a(vec_id,
    cluster)`` over the shared final-assignment distance CTE ``af`` —
    ONE copy (the ``_bshard_layout_ctes`` discipline) consumed by both
    the m2 pair chain and the recall report, so the assignment
    tiebreak can never diverge between their oracles."""
    return f"""m2a AS (
  SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM af
  ) WHERE rn <= {m}
)"""


def _bshard_layout_ctes(src: str, n_shards_expr: str, p: str) -> str:
    """THE balanced-shard layout replay over an assignment relation
    ``{src}(vec_id, cluster)`` — the single copy of the layout
    arithmetic, consumed (prefix ``""``) by ``_balanced_shards_ctes``
    for the round-12 oracles and (prefix ``"m2"``) by the
    multi-assignment pair chain, so the shard formula can never
    diverge between them. Emits ``{p}bshard(vec_id, cluster,
    shard)``; ``n_shards_expr`` may reference ``t.t``."""
    return f""",
{p}bcs AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS csz FROM {src} GROUP BY cluster
),
{p}boff AS (
  -- NULLS FIRST + null-safe join: the Spark operator treats a NULL
  -- cluster as a leading group (layout.py balanced_shards); DuckDB's
  -- window default is NULLS LAST and USING() drops NULL keys
  SELECT cluster,
         SUM(csz) OVER (ORDER BY cluster ASC NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - csz AS o
  FROM {p}bcs
),
{p}btot AS (SELECT CAST(SUM(csz) AS BIGINT) AS t FROM {p}bcs),
{p}brn AS (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id ASC) AS rn
  FROM {src}
),
{p}bshard AS (
  SELECT r.vec_id, r.cluster,
         CAST(((o.o + r.rn - 1) * ({n_shards_expr})) // t.t AS BIGINT) AS shard
  FROM {p}brn r JOIN {p}boff o ON r.cluster IS NOT DISTINCT FROM o.cluster
  CROSS JOIN {p}btot t
)"""


def _m2_pair_ctes(
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    target: int = SHARD_TARGET_SIZE,
    thr: float = NEAR_DUP_THRESHOLD,
    with_kw: bool = True,
) -> str:
    """CTE chain replaying ``_m2_pairs`` end-to-end: kmeans fit →
    top-2 assignment (``row_number() <= 2`` over the same ``(d, cid)``
    order the single-assignment oracle ranks by) → balanced layout
    over the 2N-row union → same-shard cosine pairs → DISTINCT.
    Ends in ``m2pairs(id_a, id_b, cosine)``. ``with_kw=False`` lets
    the caller prepend ``WITH RECURSIVE`` (the sharded-dedup flagship
    adds a recursive connected-components tail)."""
    return (
        _kmeans_cent_ctes(k, n_iter, with_kw=with_kw)
        + ","
        + _kmeans_assign_cte(f"cent{n_iter}", "f")
        + ",\n"
        + _m2a_cte()
        + _bshard_layout_ctes(
            "m2a",
            f"greatest(1, CAST(ceil(t.t / {float(target)!r}) AS BIGINT))",
            "m2",
        )
        + f""",
m2se AS (
  SELECT s.shard, e.vec_id AS id, e.embedding::DOUBLE[] AS v
  FROM m2bshard s JOIN embeddings e USING (vec_id)
  WHERE list_dot_product(e.embedding::DOUBLE[],
                         e.embedding::DOUBLE[]) > 0
),
m2sp AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6)
           + 0.0 AS cosine
  FROM m2se a JOIN m2se b USING (shard) WHERE a.id < b.id
),
m2pairs AS (
  SELECT DISTINCT id_a, id_b, cosine FROM m2sp WHERE cosine >= {thr}
)"""
    )


def _shard_local_near_dups_m2_sql() -> str:
    return _m2_pair_ctes() + "\nSELECT id_a, id_b, cosine FROM m2pairs"


def q_semantic_dedup_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-command global semantic dedup at the 100 TB deployment
    shape (SemDeDup, Abbas et al. 2023): the full chain —
    ``kmeans_clusters_topm`` (top-2 assignment) →
    ``layout.balanced_shards`` (size-bounded semantic shards) →
    ``similarity.keyed_near_dups`` (shard-local pairwise cosine) →
    ``dedup.connected_components`` (transitive closure on the pair
    subgraph only) → canonical-keep — as a single attested plan,
    where the pieces were previously attested only separately
    (``balanced_shards`` / ``shard_local_near_dups`` /
    ``dup_clusters``). Output: one row per embedding with its
    semantic-duplicate ``component`` (min reachable vec_id) and
    ``is_canonical`` flag. Shuffle budget: one shuffle on the shard
    key + bounded per-shard quadratic work for pairs; CC iterates on
    the (tiny) pair subgraph; the corpus is joined ONCE at the end."""
    from traits_data_spark.catalog._shared import dedup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = _m2_pairs(spark, emb)
    return dedup_clusters(emb, pairs, "vec_id")


def _semantic_dedup_sharded_sql() -> str:
    return (
        "WITH RECURSIVE "
        + _m2_pair_ctes(with_kw=False)
        + """,
sdedges AS (
  SELECT id_a AS src, id_b AS dst FROM m2pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM m2pairs
),
sdcc(id, label) AS (
  SELECT DISTINCT src, src FROM sdedges
  UNION
  SELECT e.src, sdcc.label FROM sdcc JOIN sdedges e ON sdcc.id = e.dst
),
sdcomp AS (SELECT id, MIN(label) AS component FROM sdcc GROUP BY id)
SELECT e.vec_id,
       COALESCE(c.component, e.vec_id) AS component,
       COALESCE(c.component, e.vec_id) = e.vec_id AS is_canonical
FROM embeddings e LEFT JOIN sdcomp c ON e.vec_id = c.id"""
    )


def _ppm_expr(num: str, den: str, spark: bool) -> str:
    """ONE copy of the cross-engine-sensitive ppm arithmetic (cast →
    double multiply → divide → floor → BIGINT; the BIGINT
    multiply-then-DIV form overflows past ~4.3M sample vectors).
    Hash-exactness requires every consumer to run the identical IEEE
    op sequence, so both the Spark select (``F.expr``) and the DuckDB
    oracle splice this string — only the double-literal spelling
    differs per dialect (bare ``1000000.0`` parses as DECIMAL on
    both engines)."""
    lit = "1000000.0D" if spark else "1000000.0::DOUBLE"
    return (
        f"CASE WHEN {den} > 0 THEN CAST(floor(CAST({num} AS DOUBLE)"
        f" * {lit} / CAST({den} AS DOUBLE)) AS BIGINT) END"
    )


def q_near_dup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost report for the three scale-path near-dup
    strategies against brute-force truth — the decision artifact a
    data team produces ON A SAMPLE before committing a dedup config
    to a 100 TB run (the brute-force truth row is quadratic BY
    CONTRACT; the strategies it grades are the linear paths). One row
    per method:

    - ``candidate_pairs`` — same-key comparisons the method performs
      (Σ C(group,2) over its locality key; for the multi-assignment
      layout a pair co-located twice is two comparisons — the real
      cost),
    - ``kept_pairs`` — distinct pairs found at the threshold (every
      method scores true cosine, so kept ⊆ truth by construction),
    - ``recall_ppm`` — kept / truth in integer parts-per-million,
    - ``cost_ppm`` — candidates / brute-force-candidates in ppm.

    Methods: ``brute_force`` (truth; recall/cost ≡ 1e6),
    ``lsh_bucket`` (``embedding_near_dups``' 4-plane config),
    ``shard_local`` (single-assignment balanced shards),
    ``shard_local_m2`` (top-2 multi-assignment). All-integer output,
    hash-exact against the oracle's replay of all four chains."""
    import math

    from traits_data_spark.operators.layout import balanced_shards
    from traits_data_spark.operators.similarity import (
        _norm2,
        keyed_near_dups,
        kmeans_clusters_topm,
        with_lsh_bucket,
    )

    emb = _t(spark, sf_dir, "embeddings")
    nz = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    ).filter(_norm2(F.col("__v")) > 0)

    def method_row(method: str, keyed: DataFrame, distinct_pairs: bool):
        """(method, candidate_pairs, kept_pairs) from a keyed nonzero
        frame (id, __v, __k)."""
        cand = (
            keyed.groupBy("__k")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .agg(
                F.coalesce(F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0))
                .cast("long")
                .alias("candidate_pairs")
            )
        )
        p = keyed_near_dups(
            keyed, "__k", id_col="id", vec_col="__v",
            threshold=NEAR_DUP_THRESHOLD,
        ).select("id_a", "id_b")
        if distinct_pairs:
            p = p.distinct()
        kept = p.agg(F.count(F.lit(1)).cast("long").alias("kept_pairs"))
        return cand.crossJoin(kept).select(
            F.lit(method).alias("method"), "candidate_pairs", "kept_pairs"
        )

    # brute truth via the block-pair all-pairs join (NOT a constant
    # key, which would run the whole N² scoring in one task — 25 s vs
    # ~3 s measured at sf0.1); candidates are C(n, 2) by definition.
    # Persisted: the brute row is both a report row AND the truth
    # denominators — without the pin the N² join runs twice.
    from traits_data_spark.operators.similarity import all_pairs_cosine

    bcand = (
        nz.agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.expr("n * (n - 1) DIV 2").cast("long").alias("candidate_pairs")
        )
    )
    bkept = all_pairs_cosine(
        nz, id_col="id", vec_col="__v", threshold=NEAR_DUP_THRESHOLD
    ).agg(F.count(F.lit(1)).cast("long").alias("kept_pairs"))
    rows = [
        bcand.crossJoin(bkept)
        .select(
            F.lit("brute_force").alias("method"),
            "candidate_pairs",
            "kept_pairs",
        )
        .persist(),
        method_row(
            "lsh_bucket",
            with_lsh_bucket(
                nz, "__v", EMB_DIM, NEAR_DUP_PLANES, 42
            ).withColumnRenamed("bucket", "__k"),
            False,
        ),
    ]
    # ONE k-means fit serves both shard rows: the single-assignment
    # table IS rank 1 of the top-2 assignment (pinned by
    # test_topm_rank1_equals_single_assignment), so the report never
    # pays a second Lloyd fit — the same sharing the oracle gets from
    # its common `af` CTE
    asg_both = (
        kmeans_clusters_topm(emb, k=KMEANS_K, n_iter=KMEANS_ITER, m=2)
        .select("vec_id", "cluster", "arank")
        .persist()
    )
    asg1 = asg_both.filter(F.col("arank") == 1).select("vec_id", "cluster")
    n1 = max(1, math.ceil(asg1.count() / float(SHARD_TARGET_SIZE)))
    sh1 = balanced_shards(asg1, "vec_id", "cluster", n1).select(
        "vec_id", F.col("shard").alias("__k")
    )
    rows.append(
        method_row(
            "shard_local", nz.join(sh1, nz["id"] == sh1["vec_id"]), False
        )
    )
    asg2 = asg_both.select("vec_id", "cluster")
    n2 = max(1, math.ceil(asg2.count() / float(SHARD_TARGET_SIZE)))
    sh2 = balanced_shards(asg2, "vec_id", "cluster", n2).select(
        "vec_id", F.col("shard").alias("__k")
    )
    rows.append(
        method_row(
            "shard_local_m2", nz.join(sh2, nz["id"] == sh2["vec_id"]), True
        )
    )

    rep = rows[0]
    for r in rows[1:]:
        rep = rep.unionByName(r)
    truth = rows[0].select(
        F.col("kept_pairs").alias("__truth_kept"),
        F.col("candidate_pairs").alias("__brute_cand"),
    )
    return rep.crossJoin(F.broadcast(truth)).select(
        "method",
        "candidate_pairs",
        "kept_pairs",
        F.expr(_ppm_expr("kept_pairs", "__truth_kept", spark=True)).alias(
            "recall_ppm"
        ),
        F.expr(
            _ppm_expr("candidate_pairs", "__brute_cand", spark=True)
        ).alias("cost_ppm"),
    )


def _near_dup_recall_report_sql(
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    target: int = SHARD_TARGET_SIZE,
    thr: float = NEAR_DUP_THRESHOLD,
) -> str:
    nsh = f"greatest(1, CAST(ceil(t.t / {float(target)!r}) AS BIGINT))"
    return (
        _balanced_shards_ctes(k, n_iter, nsh)
        + ",\n"
        + _m2a_cte()
        + _bshard_layout_ctes("m2a", nsh, "m2")
        + f""",
rnz AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
),
rbc AS (
  SELECT CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS candidate_pairs
  FROM rnz
),
rbk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kept_pairs
  FROM rnz a JOIN rnz b ON a.id < b.id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) + 0.0 >= {thr}
),
rle AS (SELECT id, v, {_bucket_sql('v', NEAR_DUP_PLANES)} AS bucket FROM rnz),
rlc AS (
  SELECT CAST(coalesce(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS candidate_pairs
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rle GROUP BY bucket)
),
rlk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kept_pairs
  FROM rle a JOIN rle b USING (bucket)
  WHERE a.id < b.id
    AND round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) + 0.0 >= {thr}
),
rs1 AS (
  SELECT s.shard, e.id, e.v FROM bshard s JOIN rnz e ON s.vec_id = e.id
),
rs1c AS (
  SELECT CAST(coalesce(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS candidate_pairs
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rs1 GROUP BY shard)
),
rs1k AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kept_pairs
  FROM rs1 a JOIN rs1 b USING (shard)
  WHERE a.id < b.id
    AND round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) + 0.0 >= {thr}
),
rs2 AS (
  SELECT s.shard, e.id, e.v FROM m2bshard s JOIN rnz e ON s.vec_id = e.id
),
rs2c AS (
  SELECT CAST(coalesce(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS candidate_pairs
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rs2 GROUP BY shard)
),
rs2k AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kept_pairs FROM (
    SELECT DISTINCT a.id, b.id AS idb
    FROM rs2 a JOIN rs2 b USING (shard)
    WHERE a.id < b.id
      AND round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) + 0.0 >= {thr}
  )
),
rrep AS (
  SELECT 'brute_force' AS method, rbc.candidate_pairs, rbk.kept_pairs
  FROM rbc CROSS JOIN rbk
  UNION ALL
  SELECT 'lsh_bucket', rlc.candidate_pairs, rlk.kept_pairs
  FROM rlc CROSS JOIN rlk
  UNION ALL
  SELECT 'shard_local', rs1c.candidate_pairs, rs1k.kept_pairs
  FROM rs1c CROSS JOIN rs1k
  UNION ALL
  SELECT 'shard_local_m2', rs2c.candidate_pairs, rs2k.kept_pairs
  FROM rs2c CROSS JOIN rs2k
)
SELECT rrep.method, rrep.candidate_pairs, rrep.kept_pairs,
       {_ppm_expr("rrep.kept_pairs", "t.kept_pairs", spark=False)}
         AS recall_ppm,
       {_ppm_expr("rrep.candidate_pairs", "c.candidate_pairs", spark=False)}
         AS cost_ppm
FROM rrep CROSS JOIN rbk t CROSS JOIN rbc c"""
    )


IVF_KMEANS_PROBE = 2


def q_ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat top-k with the deterministic k-means coarse quantizer
    (``operators.similarity.ivf_topk_kmeans``): the classic FAISS IVF
    shape, fully oracle-checkable because the index build is
    ``kmeans_fit`` rather than Spark ML's engine-private KMeans."""
    emb = _t(spark, sf_dir, "embeddings")
    out = ivf_topk_kmeans(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        k=TOPK,
        n_centroids=KMEANS_K,
        n_iter=KMEANS_ITER,
        n_probe=IVF_KMEANS_PROBE,
        scale=IVF_SCALE,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ivf_kmeans_sql(
    k: int = KMEANS_K, n_iter: int = KMEANS_ITER, n_probe: int = IVF_KMEANS_PROBE
) -> str:
    return (
        _kmeans_cent_ctes(k, n_iter)
        + ","
        + _kmeans_assign_cte(f"cent{n_iter}", "f")
        + f""",
q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE {_QUERY_PRED}),
pd AS (
  SELECT q.query_id, q.qv, c.cid,
         round(list_dot_product(q.qv, q.qv)
               - 2.0 * list_dot_product(q.qv, c.vec)
               + list_dot_product(c.vec, c.vec), 6) AS d2
  FROM q CROSS JOIN cent{n_iter} c
),
pr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, cid) AS prk
  FROM pd
),
probe AS (SELECT query_id, qv, cid FROM pr WHERE prk <= {n_probe}),
s AS (
  SELECT probe.query_id, m.vec_id AS neighbor_id,
         round(list_dot_product(probe.qv, m.vec)
               / (sqrt(list_dot_product(probe.qv, probe.qv))
                  * sqrt(list_dot_product(m.vec, m.vec))), 6) + 0.0 AS cosine
  FROM probe JOIN mf m USING (cid)
  WHERE m.vec_id != probe.query_id
    AND list_dot_product(m.vec, m.vec) > 0
    AND list_dot_product(probe.qv, probe.qv) > 0
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM s)
SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TOPK}"""
    )


# Deployable PQ preset: 16 subspaces x 16 codes = 64 bits/vector
# (~64x smaller than float64) with exact re-rank of the ADC top-100 —
# recall@5 = 0.858 at sf0.1 scanning 5% of the corpus full-precision,
# the best cost/recall point in the round-10 ANN ladder (SCALE.md).
# Pure ADC at these bit budgets reads 0.04-0.48 on this isotropic
# corpus, which is why FAISS deployments pair PQ with a re-rank stage.
PQ_M = 16
PQ_CODES = 16
PQ_ITER = 2
PQ_RERANK = 100


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization retrieve-then-re-rank top-k
    (``operators.similarity.pq_topk(rerank=)``): per-subspace
    deterministic k-means codebooks (16 subspaces × 16 codes = 64
    bits/vector), corpus encoded once, ADC retrieves the top-100 by
    integer micro-unit distance-table sums, and only those 100 vectors
    per query are fetched full-precision for the exact-L2 final rank —
    the FAISS PQ deployment shape, fully oracle-checkable because
    every stage (hash-seeded fits, round(d2,6)+cid assignment, integer
    ADC sums, exact re-rank) is replayed bit-for-bit by the SQL below.
    The m-way distance sum is INTEGER so shuffle order cannot change a
    single rounding."""
    emb = _t(spark, sf_dir, "embeddings")
    out = pq_topk(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        dim=EMB_DIM,
        m=PQ_M,
        k=TOPK,
        n_codes=PQ_CODES,
        n_iter=PQ_ITER,
        scale=IVF_SCALE,
        rerank=PQ_RERANK,
    )
    return out


def _pq_topk_sql() -> str:
    sub = EMB_DIM // PQ_M
    chains = []
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        chains.append(
            _kmeans_cent_ctes(
                PQ_CODES,
                PQ_ITER,
                p=f"p{s}",
                vec_expr=f"list_slice(embedding::DOUBLE[], {lo}, {hi})",
                dim=sub,
                with_kw=(s == 0),
            )
        )
        chains.append(
            _kmeans_assign_cte(f"p{s}cent{PQ_ITER}", "f", p=f"p{s}")
        )
    codes_union = "\n  UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, {s} AS sub, cid AS code FROM p{s}mf"
        for s in range(PQ_M)
    )

    def qtab_select(s: int) -> str:
        lo, hi = s * sub + 1, (s + 1) * sub
        qs = f"list_slice(q.vec, {lo}, {hi})"
        return f"""SELECT q.query_id, {s} AS sub, c.cid AS code,
       CAST(round((list_dot_product({qs}, {qs})
                   - 2.0 * list_dot_product({qs}, c.vec)
                   + list_dot_product(c.vec, c.vec)) * 1000000.0)
            AS BIGINT) AS d2m
FROM q CROSS JOIN p{s}cent{PQ_ITER} c"""

    qtab_union = "\n  UNION ALL ".join(qtab_select(s) for s in range(PQ_M))
    return f"""{",".join(chains)},
codes AS (
  {codes_union}
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS vec
      FROM embeddings WHERE {_QUERY_PRED}),
qtab AS (
  {qtab_union}
),
paired AS (
  SELECT t.query_id, c.neighbor_id,
         CAST(SUM(t.d2m) AS BIGINT) AS approx_d2_micro
  FROM codes c JOIN qtab t ON t.sub = c.sub AND t.code = c.code
  WHERE c.neighbor_id != t.query_id
  GROUP BY t.query_id, c.neighbor_id
),
ar AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_d2_micro, neighbor_id) AS ark
  FROM paired
),
cand AS (SELECT query_id, neighbor_id FROM ar WHERE ark <= {PQ_RERANK}),
cvec AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
ex AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_dot_product(q.vec, q.vec)
               - 2.0 * list_dot_product(q.vec, c.vec)
               + list_dot_product(c.vec, c.vec), 6) + 0.0 AS d2
  FROM cand JOIN cvec c ON c.vec_id = cand.neighbor_id
            JOIN q ON q.query_id = cand.query_id
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, neighbor_id) AS rk
  FROM ex
)
SELECT query_id, neighbor_id, d2, CAST(rk AS BIGINT) AS rk
FROM r2 WHERE rk <= {TOPK}
"""


# Incremental index-maintenance preset: 8 subspaces x 8 codes keeps
# the oracle at half of pq_topk's 16 kmeans chains — the preset is
# irrelevant to the contract being attested (batch-split invariance
# of encode against a FROZEN index).
PQ_INC_M = 8
PQ_INC_CODES = 8


def q_pq_incremental_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN-index maintenance attestation: codebooks are
    fit ONLY on the historical corpus slice (``vec_id % 10 != 0`` —
    "yesterday's snapshot"), then the history and the new-arrival
    delta (``vec_id % 10 == 0``) are encoded in two SEPARATE
    ``pq_encode`` calls against that frozen index and unioned — the
    daily-snapshot deployment shape, where stored codes are reused and
    only new vectors are ever encoded. The DuckDB oracle fits the same
    hash-seeded codebooks on the history slice but assigns ALL vectors
    in ONE pass, so a hash match proves encode-new-only == full
    re-encode (batch-split invariance: assignment is row-local given a
    frozen model). Output is the per-(subspace, code) occupancy
    histogram with an id-sum witness — any single vector landing in a
    different code changes both aggregates.

    Reference analogue: the keyed-upsert incremental contract
    (``DEPRECATED/statsbomb-silver.py:50-111``) that the exact-dedup /
    LSH / semantic incremental family already mirrors, applied to the
    ANN index. At 100 TB: the index build touches only the delta
    (broadcast codebooks, no corpus shuffle), and this query is the
    standing proof that doing so loses nothing."""
    emb = _t(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).persist()
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    books = pq_fit(
        hist, EMB_DIM, m=PQ_INC_M, k=PQ_INC_CODES, n_iter=PQ_ITER,
        scale=IVF_SCALE, materialize=False,
    )
    enc = pq_encode(
        hist, books, EMB_DIM, m=PQ_INC_M, materialize=False
    ).unionByName(
        pq_encode(delta, books, EMB_DIM, m=PQ_INC_M)
    )
    return enc.groupBy("sub", "code").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("vec_id").alias("id_sum"),
    )


def _pq_incremental_encode_sql() -> str:
    sub = EMB_DIM // PQ_INC_M
    parts = [
        "WITH hist AS (SELECT * FROM embeddings WHERE vec_id % 10 != 0)"
    ]
    assigns = []
    for s in range(PQ_INC_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        sl = f"list_slice(embedding::DOUBLE[], {lo}, {hi})"
        parts.append(
            _kmeans_cent_ctes(
                PQ_INC_CODES,
                PQ_ITER,
                p=f"i{s}",
                vec_expr=sl,
                dim=sub,
                with_kw=False,
                src="hist",
            )
        )
        # assign ALL vectors (history + delta in one pass — the
        # non-incremental form the Spark side must equal) against the
        # hist-fit centroids
        parts.append(
            f"""
i{s}all AS (SELECT vec_id, {sl} AS vec FROM embeddings),
i{s}fa AS (
  SELECT v.vec_id, c.cid,
         round(list_dot_product(v.vec, v.vec)
               - 2.0 * list_dot_product(v.vec, c.vec)
               + list_dot_product(c.vec, c.vec), 6) AS d
  FROM i{s}all v CROSS JOIN i{s}cent{PQ_ITER} c
),
i{s}fm AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM i{s}fa
  ) WHERE rn = 1
)"""
        )
        assigns.append(f"SELECT vec_id, {s} AS sub, cid AS code FROM i{s}fm")
    codes_union = "\n  UNION ALL ".join(assigns)
    return (
        ",".join(parts)
        + f""",
allcodes AS (
  {codes_union}
)
SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vec_id) AS BIGINT) AS id_sum
FROM allcodes GROUP BY sub, code"""
    )


# Deployable operating point (swept on the sf0.1 eval corpus, 2000
# vecs / 100 queries, vs exact L2 top-5 — SCALE.md round-10 ladder):
# probe 6/8 cells + rerank 400 reaches recall@5 = 0.842 with 32-bit
# codes (m=8 x 16 codes); m=16 (64-bit) trades 2x codebook/encode cost
# for 0.860 at rerank 200. probe=4/rerank=100 scores only 0.53 on the
# near-isotropic eval — below the 0.8 deployability bar the round-9
# ann_recall discipline established, so the shipped preset is the
# 0.842 point.
IVFPQ_M = 8
IVFPQ_CODES = 16
IVFPQ_PROBE = 6
IVFPQ_RERANK = 400


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ retrieve-then-re-rank top-k
    (``operators.similarity.ivfpq_topk``): deterministic k-means cells
    route vectors, residuals are product-quantized with one shared
    codebook (8 subspaces x 16 codes = 32 bits/vector), queries probe
    their 4 nearest of 8 cells and score codes by integer-micro ADC in
    residual space, and only the top-100 candidates per query are
    fetched full-precision for the exact-L2 final rank — the FAISS
    ``IVF8,PQ8`` production shape, fully oracle-checkable because every
    stage (hash-seeded fits, round(d2,6)+cid ties, element-wise
    residuals, integer ADC sums, exact re-rank) is replayed
    bit-for-bit by the SQL below."""
    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        dim=EMB_DIM,
        k=TOPK,
        n_cells=KMEANS_K,
        cell_iter=KMEANS_ITER,
        n_probe=IVFPQ_PROBE,
        m=IVFPQ_M,
        n_codes=IVFPQ_CODES,
        pq_iter=PQ_ITER,
        scale=IVF_SCALE,
        rerank=IVFPQ_RERANK,
    )


def _ivfpq_sql() -> str:
    sub = EMB_DIM // IVFPQ_M
    parts = [_kmeans_cent_ctes(KMEANS_K, KMEANS_ITER, p="g", with_kw=True)]
    parts.append(_kmeans_assign_cte(f"gcent{KMEANS_ITER}", "f", p="g"))
    parts.append(f"""
resid AS (
  SELECT m.vec_id, m.cid AS cell,
         list_transform(range(1, {EMB_DIM} + 1),
                        i -> m.vec[i] - c.vec[i]) AS vec
  FROM gmf m JOIN gcent{KMEANS_ITER} c USING (cid)
)""")
    for s in range(IVFPQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            _kmeans_cent_ctes(
                IVFPQ_CODES,
                PQ_ITER,
                p=f"r{s}",
                vec_expr=f"list_slice(vec, {lo}, {hi})",
                dim=sub,
                with_kw=False,
                src="resid",
            )
        )
        parts.append(_kmeans_assign_cte(f"r{s}cent{PQ_ITER}", "f", p=f"r{s}"))
    codes_union = "\n  UNION ALL ".join(
        f"""SELECT m.vec_id AS neighbor_id, r.cell, {s} AS sub, m.cid AS code
FROM r{s}mf m JOIN resid r USING (vec_id)"""
        for s in range(IVFPQ_M)
    )

    def qtab_select(s: int) -> str:
        lo, hi = s * sub + 1, (s + 1) * sub
        qs = f"list_slice(p.qr, {lo}, {hi})"
        return f"""SELECT p.query_id, p.cell, {s} AS sub, c.cid AS code,
       CAST(round((list_dot_product({qs}, {qs})
                   - 2.0 * list_dot_product({qs}, c.vec)
                   + list_dot_product(c.vec, c.vec)) * 1000000.0)
            AS BIGINT) AS d2m
FROM qp p CROSS JOIN r{s}cent{PQ_ITER} c"""

    qtab_union = "\n  UNION ALL ".join(
        qtab_select(s) for s in range(IVFPQ_M)
    )
    return f"""{",".join(parts)},
codes AS (
  {codes_union}
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS vec
      FROM embeddings WHERE {_QUERY_PRED}),
qp AS (
  SELECT query_id, cell, qr FROM (
    SELECT query_id, cell, qr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d2, cell) AS prk
    FROM (
      SELECT q.query_id, c.cid AS cell,
             round(list_dot_product(q.vec, q.vec)
                   - 2.0 * list_dot_product(q.vec, c.vec)
                   + list_dot_product(c.vec, c.vec), 6) AS d2,
             list_transform(range(1, {EMB_DIM} + 1),
                            i -> q.vec[i] - c.vec[i]) AS qr
      FROM q CROSS JOIN gcent{KMEANS_ITER} c
    )
  ) WHERE prk <= {IVFPQ_PROBE}
),
qtab AS (
  {qtab_union}
),
paired AS (
  SELECT t.query_id, c.neighbor_id,
         CAST(SUM(t.d2m) AS BIGINT) AS approx_d2_micro
  FROM codes c
  JOIN qtab t ON t.cell = c.cell AND t.sub = c.sub AND t.code = c.code
  WHERE c.neighbor_id != t.query_id
  GROUP BY t.query_id, c.neighbor_id
),
ar AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_d2_micro, neighbor_id) AS ark
  FROM paired
),
cand AS (SELECT query_id, neighbor_id FROM ar WHERE ark <= {IVFPQ_RERANK}),
cvec AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
ex AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_dot_product(q.vec, q.vec)
               - 2.0 * list_dot_product(q.vec, c.vec)
               + list_dot_product(c.vec, c.vec), 6) + 0.0 AS d2
  FROM cand JOIN cvec c ON c.vec_id = cand.neighbor_id
            JOIN q ON q.query_id = cand.query_id
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, neighbor_id) AS rk
  FROM ex
)
SELECT query_id, neighbor_id, d2, CAST(rk AS BIGINT) AS rk
FROM r2 WHERE rk <= {TOPK}
"""


# Tuned ANN operating point (round 10): the round-9 ann_recall eval
# proved the shipped presets undeployable (recall@5 = 0.02 single-table
# / 0.12 multi-table / 0.52 IVF). tools/tune_ann.py swept the knobs
# with an exact numpy replica of the Spark math on the sf0.1 eval
# corpus (near-isotropic synthetic embeddings — the hard case for any
# sublinear index): bit-flip multi-probe (Lv et al., VLDB'07) at
# planes=12 / tables=8 / probe_bits=3 reaches recall@5 = 0.926 at
# sf0.1 (100 queries) and 0.88 on the tiny sf0.01 10-query eval,
# scoring ~46% of the corpus — with 96 signature dots/row (the
# interpreted-HOF cost that actually dominates wall time, see
# _bucket_expr) and a 4x smaller corpus-side index than the best
# plain multi-table point (32 tables, 41% scored, 0.83). The full
# recall-vs-cost ladder lives in SCALE.md (round 10).
ANN_TUNED_PLANES = 12
ANN_TUNED_TABLES = 8
ANN_TUNED_PROBE_BITS = 3
IVF_TUNED_PROBE = 6  # 8 centroids, probe 6 -> recall 0.92 (ladder)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index evaluation (``operators.similarity.ann_recall``):
    recall@k of the LSH-bucketed and IVF-kmeans approximate top-k
    against brute-force cosine top-k on the same query set — the
    grading loop that was missing while the ANN operators themselves
    were benched. Every stage is deterministic (seeded planes,
    hash-seeded Lloyd, neighbor_id tie-breaks), so per-query recall is
    hash-checked against a DuckDB oracle that recomputes all six
    top-k sets. Single-table LSH at 6 planes is honestly terrible here
    (recall 0.02 — 64 buckets over ~1k vectors prune almost every true
    neighbor); the multiprobe and IVF rows quantify what the extra
    candidate generation buys, which is exactly the trade an index
    deployment tunes. The round-10 ``*_tuned`` rows grade the shipped
    deployable presets (``ANN_TUNED_*``: bit-flip multi-probe LSH;
    ``IVF_TUNED_PROBE``) found by the tools/tune_ann.py sweep.

    The eval corpus is persisted ONCE and shared by all top-k
    pipelines — without the barrier each method re-scans the
    embeddings source (10 scans total; the audit gate rightly flags
    it); likewise the two IVF probe depths share ONE kmeans fit via
    the precomputed-centroids path. At 100 TB an ANN eval runs on a
    sampled slice, which is exactly what this persist holds."""
    emb = _t(spark, sf_dir, "embeddings").persist()
    q = emb.filter(F.expr(_QUERY_PRED))
    exact = cosine_topk_bruteforce(emb, q, id_col="vec_id", k=TOPK)
    centroids = kmeans_fit(
        emb, k=KMEANS_K, n_iter=KMEANS_ITER, scale=IVF_SCALE
    )
    approx = {
        "lsh": lsh_bucketed_topk(
            emb, q, dim=EMB_DIM, id_col="vec_id", k=TOPK, n_planes=N_PLANES
        ),
        "lsh_multiprobe": lsh_topk_multiprobe(
            emb,
            q,
            dim=EMB_DIM,
            k=TOPK,
            n_planes=N_PLANES,
            n_tables=MULTIPROBE_TABLES,
        ),
        "lsh_multiprobe_tuned": lsh_topk_multiprobe(
            emb,
            q,
            dim=EMB_DIM,
            k=TOPK,
            n_planes=ANN_TUNED_PLANES,
            n_tables=ANN_TUNED_TABLES,
            probe_bits=ANN_TUNED_PROBE_BITS,
        ),
        "ivf_kmeans": ivf_topk_kmeans(
            emb,
            q,
            k=TOPK,
            n_probe=IVF_KMEANS_PROBE,
            scale=IVF_SCALE,
            centroids=centroids,
        ),
        "ivf_kmeans_tuned": ivf_topk_kmeans(
            emb,
            q,
            k=TOPK,
            n_probe=IVF_TUNED_PROBE,
            scale=IVF_SCALE,
            centroids=centroids,
        ),
    }
    return ann_recall(exact, approx, k=TOPK)


def _ann_recall_sql() -> str:
    # reuse the three attested top-k oracles verbatim as derived
    # tables; recall is then pure counting over their (query, neighbor)
    # pairs. hits/k divisions of identical doubles are bit-identical
    # across engines.
    def method_ctes(name: str) -> str:
        return f"""
h_{name} AS (
  SELECT e.query_id, count(*) AS hits
  FROM exact e JOIN {name} a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
r_{name} AS (
  SELECT '{name}' AS method, qs.query_id,
         CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         round(CAST(coalesce(h.hits, 0) AS DOUBLE) / {float(TOPK)}, 6)
           + 0.0 AS recall_at_k
  FROM qs LEFT JOIN h_{name} h USING (query_id)
)"""

    return f"""
WITH
exact AS (SELECT query_id, neighbor_id FROM ({_COSINE_SQL})),
lsh AS (SELECT query_id, neighbor_id FROM ({_lsh_topk_sql()})),
lsh_multiprobe AS (
  SELECT query_id, neighbor_id FROM ({_lsh_multiprobe_sql()})),
lsh_multiprobe_tuned AS (
  SELECT query_id, neighbor_id FROM ({_lsh_multiprobe_probed_sql(
      ANN_TUNED_PLANES, ANN_TUNED_TABLES, ANN_TUNED_PROBE_BITS)})),
ivf_kmeans AS (SELECT query_id, neighbor_id FROM ({_ivf_kmeans_sql()})),
ivf_kmeans_tuned AS (
  SELECT query_id, neighbor_id FROM ({_ivf_kmeans_sql(
      n_probe=IVF_TUNED_PROBE)})),
qs AS (SELECT DISTINCT query_id FROM exact),
{method_ctes('ivf_kmeans')},
{method_ctes('ivf_kmeans_tuned')},
{method_ctes('lsh')},
{method_ctes('lsh_multiprobe')},
{method_ctes('lsh_multiprobe_tuned')}
SELECT * FROM r_ivf_kmeans
UNION ALL SELECT * FROM r_ivf_kmeans_tuned
UNION ALL SELECT * FROM r_lsh
UNION ALL SELECT * FROM r_lsh_multiprobe
UNION ALL SELECT * FROM r_lsh_multiprobe_tuned
"""


MATRYOSHKA_DIMS = (8, 16, 32)


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation-recall curve
    (``operators.similarity.matryoshka_recall``; Kusupati et al.,
    NeurIPS 2022): recall@k of brute-force cosine over the first
    8/16/32 of 64 dimensions against full-dimension top-k — the
    EMBEDDING-side compression eval completing the index-side ones
    ``ann_recall`` grades (PQ/SQ8 shrink the index; truncation shrinks
    storage, shuffle and scoring cost linearly in d). Eval corpus
    persisted once and shared by all four top-k pipelines (the
    ``ann_recall`` single-scan discipline)."""
    emb = _t(spark, sf_dir, "embeddings").persist()
    q = emb.filter(F.expr(_QUERY_PRED))
    return matryoshka_recall(emb, q, dims=MATRYOSHKA_DIMS, k=TOPK)


def _truncated_cosine_sql(d: int) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, (embedding::DOUBLE[])[1:{d}] AS qv
           FROM embeddings WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, (embedding::DOUBLE[])[1:{d}] AS cv
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM c, q WHERE neighbor_id != query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM s)
SELECT query_id, neighbor_id FROM r WHERE rk <= {TOPK}
"""


def _matryoshka_sql() -> str:
    names = [f"dim_{d:02d}" for d in MATRYOSHKA_DIMS]

    def method_ctes(name: str) -> str:
        return f"""h_{name} AS (
  SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
  FROM exact e JOIN {name} a USING (query_id, neighbor_id)
  GROUP BY e.query_id
),
r_{name} AS (
  SELECT '{name}' AS method, qs.query_id,
         CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         round(CAST(coalesce(h.hits, 0) AS DOUBLE) / {float(TOPK)}, 6)
           + 0.0 AS recall_at_k
  FROM qs LEFT JOIN h_{name} h USING (query_id)
)"""

    dim_ctes = ",\n".join(
        f"{n} AS (SELECT query_id, neighbor_id FROM"
        f" ({_truncated_cosine_sql(d)}))"
        for n, d in zip(names, MATRYOSHKA_DIMS)
    )
    unions = "\nUNION ALL ".join(f"SELECT * FROM r_{n}" for n in names)
    return f"""
WITH
exact AS (SELECT query_id, neighbor_id FROM ({_COSINE_SQL})),
{dim_ctes},
qs AS (SELECT DISTINCT query_id FROM exact),
{",".join(method_ctes(n) for n in names)}
{unions}
"""


HARD_NEG_K_POS = 2
HARD_NEG_K_NEG = 3


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining
    (``operators.similarity.hard_negative_mining``): top same-label
    positives + top different-label hard negatives per anchor — the
    training-data GENERATOR next to the representation probes
    (``knn_label_eval`` grades embeddings; this mines the triplets
    that improve them). One broadcast cosine pass, roles split by
    null-safe label equality, rank windows per (anchor, role)."""
    emb = _t(spark, sf_dir, "embeddings")
    return hard_negative_mining(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        k_pos=HARD_NEG_K_POS,
        k_neg=HARD_NEG_K_NEG,
    ).withColumn("rk", F.col("rk").cast("long"))


_HARD_NEG_SQL = f"""
WITH a AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av, label AS al
           FROM embeddings WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS nl
      FROM embeddings),
s AS (
  SELECT anchor_id, neighbor_id,
         round(list_dot_product(av, cv)
               / (sqrt(list_dot_product(av, av))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine,
         CASE WHEN nl IS NOT DISTINCT FROM al THEN 'pos'
              ELSE 'neg' END AS role
  FROM c, a WHERE neighbor_id != anchor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id, role
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM s)
SELECT anchor_id, role, CAST(rk AS BIGINT) AS rk, neighbor_id,
       cosine + 0.0 AS cosine
FROM r
WHERE rk <= CASE WHEN role = 'pos' THEN {HARD_NEG_K_POS}
            ELSE {HARD_NEG_K_NEG} END
"""


def _ivf_sql() -> str:
    bucket = _bucket_sql("vec", IVF_PLANES, IVF_SEED)
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
),
b AS (SELECT vec_id AS neighbor_id, vec, {bucket} AS bucket FROM v),
comp AS (
  SELECT bucket, gs.pos,
         CAST(SUM(CAST(ROUND(vec[gs.pos] * {IVF_SCALE}) AS BIGINT)) AS DOUBLE)
           / ({float(IVF_SCALE)} * COUNT(*)) AS comp
  FROM b CROSS JOIN generate_series(1, {EMB_DIM}) AS gs(pos)
  GROUP BY bucket, gs.pos
),
cent AS (
  SELECT bucket, array_agg(comp ORDER BY pos) AS cv FROM comp GROUP BY bucket
),
q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE {_QUERY_PRED}),
pd AS (
  SELECT q.query_id, q.qv, cent.bucket,
         list_dot_product(q.qv, q.qv)
           - 2.0 * list_dot_product(q.qv, cent.cv)
           + list_dot_product(cent.cv, cent.cv) AS d2
  FROM q CROSS JOIN cent
),
pr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d2, bucket) AS prk
  FROM pd
),
probe AS (SELECT query_id, qv, bucket FROM pr WHERE prk <= {IVF_PROBE}),
s AS (
  SELECT probe.query_id, b.neighbor_id,
         round(list_dot_product(probe.qv, b.vec)
               / (sqrt(list_dot_product(probe.qv, probe.qv))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) + 0.0 AS cosine
  FROM probe JOIN b USING (bucket)
  WHERE b.neighbor_id != probe.query_id
    AND list_dot_product(b.vec, b.vec) > 0
    AND list_dot_product(probe.qv, probe.qv) > 0
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM s)
SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TOPK}
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization round-trip audit: per vector, the
    quantization scale, the sum of codes (pins every code exactly),
    and the max reconstruction error (pins the dequantize path; must
    be ≤ scale/2)."""
    emb = _t(spark, sf_dir, "embeddings")
    qd = quantize_int8(emb, vec_col="embedding")
    deq = dequantize_int8("qvec", "q_scale", "q_min")
    err = F.array_max(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            deq,
            lambda a, b: F.abs(a - b),
        )
    )
    # compute the error in its own projection: putting it in the same
    # select as the ``round(q_scale, 9) AS q_scale`` alias makes the
    # dequantize expression bind to the ROUNDED scale
    audited = qd.withColumn("__err", err)
    return audited.select(
        "vec_id",
        F.round("q_scale", 9).alias("q_scale"),
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.round("__err", 9).alias("max_err"),
    )


_QUANTIZE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
st AS (
  SELECT vec_id, x, list_min(x) AS lo,
         (list_max(x) - list_min(x)) / 255.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, x, lo, scale,
         list_transform(
           x,
           e -> CAST(CASE WHEN scale > 0 THEN round((e - lo) / scale)
                          ELSE 0 END AS INT) - 128
         ) AS codes
  FROM st
),
e AS (
  SELECT vec_id,
         max(abs(x[gs.i] - ((codes[gs.i] + 128) * scale + lo))) AS max_err,
         CAST(SUM(codes[gs.i]) AS BIGINT) AS code_sum
  FROM q CROSS JOIN generate_series(1, {EMB_DIM}) AS gs(i)
  GROUP BY vec_id
)
SELECT q.vec_id, round(q.scale, 9) AS q_scale, e.code_sum,
       round(e.max_err, 9) AS max_err
FROM q JOIN e USING (vec_id)
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (the
    synthetic embeddings are unclustered, so the demo threshold is low;
    production near-dup dedup runs ≥0.95)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        emb,
        dim=EMB_DIM,
        threshold=NEAR_DUP_THRESHOLD,
        n_planes=NEAR_DUP_PLANES,
    )


def _near_dups_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  {_bucket_sql('embedding::DOUBLE[]', NEAR_DUP_PLANES)} AS bucket
           FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[]) > 0),
p AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
           + 0.0 AS cosine
  FROM e a JOIN e b USING (bucket) WHERE a.id < b.id
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= {NEAR_DUP_THRESHOLD}
"""


def q_incremental_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup
    (``similarity.incremental_embedding_near_dups``): the 20% of
    vectors with ``vec_id % 5 == 0`` play the ingest batch, the rest
    the existing corpus with a persisted ``hyperplane_bucket_index``
    — only the batch is bucketed; history streams through a broadcast
    join. Pairs returned are exactly those a full
    ``embedding_near_dups`` re-run would add for the batch."""
    emb = _t(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    index = hyperplane_bucket_index(
        old, dim=EMB_DIM, n_planes=NEAR_DUP_PLANES
    )
    return incremental_embedding_near_dups(
        new,
        index,
        dim=EMB_DIM,
        threshold=NEAR_DUP_THRESHOLD,
        n_planes=NEAR_DUP_PLANES,
    )


def _incremental_near_dups_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  {_bucket_sql('embedding::DOUBLE[]', NEAR_DUP_PLANES)} AS bucket
           FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[]) > 0),
p AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
           + 0.0 AS cosine
  FROM e a JOIN e b USING (bucket)
  WHERE a.id < b.id AND (a.id % 5 = 0 OR b.id % 5 = 0)
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= {NEAR_DUP_THRESHOLD}
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: embedding-space near-dup
    pairs (LSH-bucketed cosine, never all-pairs) → transitive
    connected components → one canonical representative per semantic
    cluster. The embedding analogue of `dup_clusters`: keeps exactly
    one member of every group of semantically-equivalent items even
    when not all pairs were direct candidates. Iteration runs on the
    (small) edge subgraph only; the full embedding table is touched by
    ONE left join."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(
        emb,
        dim=EMB_DIM,
        threshold=NEAR_DUP_THRESHOLD,
        n_planes=NEAR_DUP_PLANES,
    )
    return dedup_clusters(emb, pairs.select("id_a", "id_b"), "vec_id")


def _semantic_dedup_sql() -> str:
    return f"""
WITH RECURSIVE
pairs AS ({_near_dups_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc(id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM cc JOIN edges e ON cc.id = e.dst
),
comp AS (SELECT id, MIN(label) AS component FROM cc GROUP BY id)
SELECT emb.vec_id,
       COALESCE(c.component, emb.vec_id) AS component,
       COALESCE(c.component, emb.vec_id) = emb.vec_id AS is_canonical
FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.id
"""


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = lsh_bucketed_topk(
        emb,
        emb.filter(F.expr(_QUERY_PRED)),
        dim=EMB_DIM,
        id_col="vec_id",
        k=TOPK,
        n_planes=N_PLANES,
    )
    return out.withColumn("rk", F.col("rk").cast("long")).withColumn(
        "cosine", F.col("cosine") + F.lit(0.0)  # -0.0 → +0.0
    )


def _lsh_topk_sql() -> str:
    planes = _hyperplanes(EMB_DIM, N_PLANES, 42)
    def bucket(v: str) -> str:
        terms = []
        for i, p in enumerate(planes):
            arr = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
            terms.append(
                f"CASE WHEN list_dot_product({v}, {arr}) > 0 "
                f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            )
        return " + ".join(terms)

    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                  {bucket('embedding::DOUBLE[]')} AS bucket
           FROM embeddings WHERE {_QUERY_PRED}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             {bucket('embedding::DOUBLE[]')} AS bucket
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
           AS cosine
  FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk FROM s)
SELECT query_id, neighbor_id, cosine + 0.0 AS cosine, rk FROM r WHERE rk <= {TOPK}
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine fused by reciprocal rank fusion
# ---------------------------------------------------------------------------

HYBRID_POOL = 20
HYBRID_K = 5
HYBRID_RRF_K0 = 60
# query docs carry BOTH a text row (documents.doc_id) and an embedding
# row (embeddings.vec_id) — the synthetic tables share the id space
_HYBRID_QUERY_PRED = "doc_id % 50 = 0"


def q_hybrid_topk_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (``operators.fusion.rrf_fuse``): per query doc,
    a lexical top-20 pool (champion-list ``bm25_topk`` — the BOUNDED
    deployment arm; the exhaustive form is attested separately as
    ``bm25_topk`` — self-hit removed and the pool re-ranked on the
    same (score_micro, id) order) and a dense top-20 pool
    (``cosine_topk_bruteforce`` over the doc's embedding) are fused by
    reciprocal rank fusion (Cormack et al. SIGIR'09, k0=60 — the
    Elasticsearch/OpenSearch hybrid-search default) into one top-5.
    Each reciprocal term is a single rounded IEEE division in integer
    micro-units, so the fused score is a BIGINT sum —
    shuffle-order-free. Scale shape: the arms carry the corpus-sized
    work (champion lists bound per-term postings; brute-force dense
    scoring swappable for the attested IVF/PQ paths); fusion itself
    touches only ``2 * 20`` rows per query. Measured: fixed query
    batch, 20× corpus → ~10× wall (arm-linear; fusion is
    query-batch-sized at any corpus scale)."""
    from traits_data_spark.catalog.text import (
        BM25_B,
        BM25_CHAMPION_N,
        BM25_K1,
    )
    from traits_data_spark.operators.fusion import rrf_fuse

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q_docs = docs.filter(F.expr(_HYBRID_QUERY_PRED))
    # pool+1 then drop the self-hit: the top-POOL non-self rows are a
    # subset of the top-(POOL+1) overall (at most one self row exists)
    lex = bm25_topk(
        docs,
        q_docs,
        k=HYBRID_POOL + 1,
        k1=BM25_K1,
        b=BM25_B,
        champion_n=BM25_CHAMPION_N,
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("neighbor_id").asc()
    )
    lex = (
        lex.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HYBRID_POOL)
        .select("query_id", "neighbor_id", "rk")
    )
    emb = _t(spark, sf_dir, "embeddings")
    dense = cosine_topk_bruteforce(
        emb,
        emb.filter(F.expr("vec_id % 50 = 0")),
        id_col="vec_id",
        k=HYBRID_POOL,
    ).select("query_id", "neighbor_id", "rk")
    fused = rrf_fuse(
        {"lex": lex, "dense": dense}, k=HYBRID_K, rrf_k=HYBRID_RRF_K0
    )
    # catalog outputs avoid NULL columns (cross-engine NULL ordering /
    # hashing differs); rank 0 = "not retrieved by this arm"
    zero = F.lit(0).cast("long")
    return fused.select(
        "query_id",
        "neighbor_id",
        F.coalesce("lex_rk", zero).alias("lex_rk"),
        F.coalesce("dense_rk", zero).alias("dense_rk"),
        "rrf_micro",
        "rk",
    )


def _hybrid_rrf_sql(wl: int = 1, wd: int = 1) -> str:
    from traits_data_spark.catalog.text import BM25_CHAMPION_N, _bm25_sql

    # weighted form multiplies each run's rounded micro term AFTER
    # rounding (exact BIGINT), mirroring rrf_fuse(weights=); the
    # unweighted default emits the original text unchanged
    contrib = "CAST(ROUND(1000000.0 / ({k0} + rk), 0) AS BIGINT)".format(
        k0=HYBRID_RRF_K0
    )
    if (wl, wd) != (1, 1):
        contrib += (
            f" * CASE WHEN run = 'lex' THEN {int(wl)} ELSE {int(wd)} END"
        )
    return f"""
WITH lexpool AS (
  SELECT query_id, neighbor_id, score_micro
  FROM ({_bm25_sql(champion_n=BM25_CHAMPION_N, k=HYBRID_POOL + 1)})
  WHERE neighbor_id != query_id
),
lex AS (
  SELECT query_id, neighbor_id, rk FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_micro DESC,
                                       neighbor_id ASC) AS rk
    FROM lexpool)
  WHERE rk <= {HYBRID_POOL}
),
dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id % 50 = 0),
dc AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
       FROM embeddings),
ds AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM dc, dq WHERE neighbor_id != query_id
),
dense AS (
  SELECT query_id, neighbor_id, rk FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rk
    FROM ds)
  WHERE rk <= {HYBRID_POOL}
),
u AS (
  SELECT query_id, neighbor_id, rk, 'lex' AS run FROM lex
  UNION ALL
  SELECT query_id, neighbor_id, rk, 'dense' AS run FROM dense
),
f AS (
  SELECT query_id, neighbor_id,
         COALESCE(CAST(MAX(CASE WHEN run = 'lex' THEN rk END) AS BIGINT),
                  CAST(0 AS BIGINT)) AS lex_rk,
         COALESCE(CAST(MAX(CASE WHEN run = 'dense' THEN rk END) AS BIGINT),
                  CAST(0 AS BIGINT)) AS dense_rk,
         CAST(SUM({contrib}) AS BIGINT) AS rrf_micro
  FROM u GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC,
                                        neighbor_id ASC) AS rk
  FROM f
)
SELECT query_id, neighbor_id, lex_rk, dense_rk, rrf_micro,
       CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {HYBRID_K}
"""


# ---------------------------------------------------------------------------
# Semantic (embedding-space) decontamination
# ---------------------------------------------------------------------------

# the synthetic embeddings are unclustered, so the demo threshold is
# low (13 flagged rows at sf0.01); production decontamination runs
# >= 0.9 against real benchmark embeddings
SEM_DECON_THRESHOLD = NEAR_DUP_THRESHOLD


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination
    (``similarity.semantic_decontaminate``): docs from the benchmark
    source (``source = 'src0'``, the same split the n-gram
    ``decontaminate`` / ``bloom_decontaminate`` entries use) play the
    eval set; their embeddings become a persisted
    ``hyperplane_bucket_index``, and every remaining corpus vector is
    checked against it through a broadcast bucket join — the corpus
    never shuffles. The eval membership test itself is a broadcast
    semi/anti join on the (small) benchmark id list, so the corpus
    side stays map-side end to end. Flags paraphrase-level leakage the
    exact n-gram paths structurally miss."""
    from traits_data_spark.catalog.dedup import DECON_BENCH_SOURCE
    from traits_data_spark.operators.similarity import (
        semantic_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    eval_ids = docs.filter(
        F.col("source") == DECON_BENCH_SOURCE
    ).select(F.col("doc_id").alias("vec_id"))
    emb = _t(spark, sf_dir, "embeddings")
    ev = emb.join(F.broadcast(eval_ids), "vec_id")
    corpus = emb.join(F.broadcast(eval_ids), "vec_id", "left_anti")
    index = hyperplane_bucket_index(
        ev, dim=EMB_DIM, n_planes=NEAR_DUP_PLANES
    )
    return semantic_decontaminate(
        corpus,
        index,
        dim=EMB_DIM,
        threshold=SEM_DECON_THRESHOLD,
        n_planes=NEAR_DUP_PLANES,
    )


def _semantic_decontaminate_sql() -> str:
    from traits_data_spark.catalog.dedup import DECON_BENCH_SOURCE

    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  {_bucket_sql('embedding::DOUBLE[]', NEAR_DUP_PLANES)} AS bucket
           FROM embeddings),
bench AS (SELECT doc_id FROM documents
          WHERE source = '{DECON_BENCH_SOURCE}'),
ev AS (SELECT e.id AS eval_id, e.v AS evv, e.bucket
       FROM e JOIN bench ON e.id = bench.doc_id),
tr AS (SELECT e.* FROM e
       WHERE e.id NOT IN (SELECT doc_id FROM bench)),
p AS (
  SELECT tr.id AS vec_id, ev.eval_id,
         round(list_dot_product(tr.v, ev.evv)
               / (sqrt(list_dot_product(tr.v, tr.v))
                  * sqrt(list_dot_product(ev.evv, ev.evv))), 6)
           + 0.0 AS cosine
  FROM tr JOIN ev USING (bucket)
),
flagged AS (
  SELECT vec_id, eval_id, cosine,
         CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n_matches,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, eval_id ASC) AS rk
  FROM p WHERE cosine >= {SEM_DECON_THRESHOLD}
)
SELECT vec_id, eval_id, cosine, n_matches FROM flagged WHERE rk = 1
"""


def q_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row decontamination datasheet against the src0 benchmark:
    the three detection channels a production decon pass layers —
    exact content-hash (verbatim benchmark copies), word-5-gram
    overlap (the GPT-3/PaLM n-gram rule, ``decontaminate``'s config),
    and embedding cosine (``semantic_decontaminate``'s config,
    paraphrase leakage n-grams miss) — run against the SAME benchmark
    slice, with per-channel flagged counts, how much of each channel
    is corroborated by another, the union, and the multi-channel
    core. The decision artifact for picking a decon config: exact ⊆
    ngram by construction (identical text shares every n-gram), while
    semantic-only rows are the recall the n-gram rule forfeits. Scale
    shape: all three channels keep the corpus map-side (broadcast
    benchmark hashes / n-grams / bucket index), the report aggregates
    a contamination-rate-sized union of flagged ids — one tiny
    groupBy + one-row agg on top of the three attested channels."""
    from traits_data_spark.catalog.dedup import (
        DECON_BENCH_SOURCE,
        DECON_N,
    )
    from traits_data_spark.operators.dedup import (
        ngram_decontaminate,
        normalized_text,
    )
    from traits_data_spark.functions.scalars import portable_hash64

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == DECON_BENCH_SOURCE)
    corpus = docs.filter(F.col("source") != DECON_BENCH_SOURCE)

    ng = ngram_decontaminate(
        corpus, bench, "text", "doc_id", "doc_id", n=DECON_N
    ).select(F.col("id"))
    bh = bench.select(
        portable_hash64(normalized_text("text")).alias("__h")
    ).distinct()
    eh = (
        corpus.select(
            "doc_id", portable_hash64(normalized_text("text")).alias("__h")
        )
        .join(F.broadcast(bh), "__h")
        .select(F.col("doc_id").alias("id"))
        .distinct()
    )
    sem = q_semantic_decontaminate(spark, sf_dir).select(
        F.col("vec_id").alias("id")
    )
    flags = (
        ng.select("id", F.lit("ngram").alias("m"))
        .unionByName(eh.select("id", F.lit("exact_hash").alias("m")))
        .unionByName(sem.select("id", F.lit("semantic").alias("m")))
    )
    per = flags.groupBy("id").agg(
        F.max(F.when(F.col("m") == "ngram", 1).otherwise(0)).alias("f_ng"),
        F.max(F.when(F.col("m") == "exact_hash", 1).otherwise(0)).alias(
            "f_eh"
        ),
        F.max(F.when(F.col("m") == "semantic", 1).otherwise(0)).alias(
            "f_se"
        ),
    ).withColumn(
        "nm", F.col("f_ng") + F.col("f_eh") + F.col("f_se")
    )
    multi = (F.col("nm") >= 2).cast("int")
    return per.agg(
        F.sum("f_ng").cast("long").alias("ngram_flagged"),
        F.sum(F.col("f_ng") * multi).cast("long").alias("ngram_multi"),
        F.sum("f_eh").cast("long").alias("exact_flagged"),
        F.sum(F.col("f_eh") * multi).cast("long").alias("exact_multi"),
        F.sum("f_se").cast("long").alias("semantic_flagged"),
        F.sum(F.col("f_se") * multi).cast("long").alias("semantic_multi"),
        F.count(F.lit(1)).cast("long").alias("any_flagged"),
        F.sum(multi).cast("long").alias("multi_flagged"),
    )


def _decontamination_report_sql() -> str:
    from traits_data_spark.catalog.dedup import (
        DECON_BENCH_SOURCE,
        DECON_N,
        _ngrams_sql,
    )

    return f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split({_NORM}, ' '), t -> length(t) > 0) AS wl
  FROM documents
),
cg AS (
  SELECT doc_id AS id, unnest({_ngrams_sql(DECON_N)}) AS gram
  FROM w WHERE source <> '{DECON_BENCH_SOURCE}'
),
bg AS (
  SELECT DISTINCT unnest({_ngrams_sql(DECON_N)}) AS gram
  FROM w WHERE source = '{DECON_BENCH_SOURCE}'
),
ng AS (SELECT DISTINCT id FROM cg JOIN bg USING (gram)),
bh AS (
  SELECT DISTINCT {_H60.format(x=_NORM)} AS h
  FROM documents WHERE source = '{DECON_BENCH_SOURCE}'
),
eh AS (
  SELECT DISTINCT doc_id AS id
  FROM (SELECT doc_id, {_H60.format(x=_NORM)} AS h
        FROM documents WHERE source <> '{DECON_BENCH_SOURCE}')
  JOIN bh USING (h)
),
e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v,
             {_bucket_sql('embedding::DOUBLE[]', NEAR_DUP_PLANES)} AS bucket
      FROM embeddings),
sbench AS (SELECT doc_id FROM documents
           WHERE source = '{DECON_BENCH_SOURCE}'),
sev AS (SELECT e.vid, e.v, e.bucket
        FROM e JOIN sbench ON e.vid = sbench.doc_id),
str_ AS (SELECT e.* FROM e
         WHERE e.vid NOT IN (SELECT doc_id FROM sbench)),
sem AS (
  SELECT DISTINCT str_.vid AS id
  FROM str_ JOIN sev USING (bucket)
  WHERE round(list_dot_product(str_.v, sev.v)
              / (sqrt(list_dot_product(str_.v, str_.v))
                 * sqrt(list_dot_product(sev.v, sev.v))), 6)
        >= {SEM_DECON_THRESHOLD}
),
flags AS (
  SELECT id, 'ngram' AS m FROM ng
  UNION ALL SELECT id, 'exact_hash' AS m FROM eh
  UNION ALL SELECT id, 'semantic' AS m FROM sem
),
per AS (
  SELECT id,
         MAX(CASE WHEN m = 'ngram' THEN 1 ELSE 0 END) AS f_ng,
         MAX(CASE WHEN m = 'exact_hash' THEN 1 ELSE 0 END) AS f_eh,
         MAX(CASE WHEN m = 'semantic' THEN 1 ELSE 0 END) AS f_se
  FROM flags GROUP BY id
),
pm AS (SELECT *, CASE WHEN f_ng + f_eh + f_se >= 2 THEN 1 ELSE 0 END AS mu
       FROM per)
SELECT CAST(SUM(f_ng) AS BIGINT) AS ngram_flagged,
       CAST(SUM(f_ng * mu) AS BIGINT) AS ngram_multi,
       CAST(SUM(f_eh) AS BIGINT) AS exact_flagged,
       CAST(SUM(f_eh * mu) AS BIGINT) AS exact_multi,
       CAST(SUM(f_se) AS BIGINT) AS semantic_flagged,
       CAST(SUM(f_se * mu) AS BIGINT) AS semantic_multi,
       CAST(COUNT(*) AS BIGINT) AS any_flagged,
       CAST(SUM(mu) AS BIGINT) AS multi_flagged
FROM pm
"""


HYBRID_W_DENSE = 2


def q_hybrid_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted hybrid retrieval (``rrf_fuse(weights=)``): same arms
    as ``hybrid_topk_rrf`` with the dense arm boosted 2× — the
    serving-layer knob for a corpus whose embeddings are trusted over
    its lexical surface (ES/Vespa hybrid-search weighting). The boost
    is an integer multiplier applied AFTER the micro rounding, so the
    fused score stays an exact BIGINT and the oracle replays it with
    one CASE multiplier."""
    from traits_data_spark.catalog.text import (
        BM25_B,
        BM25_CHAMPION_N,
        BM25_K1,
    )
    from traits_data_spark.operators.fusion import rrf_fuse

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q_docs = docs.filter(F.expr(_HYBRID_QUERY_PRED))
    lex = bm25_topk(
        docs,
        q_docs,
        k=HYBRID_POOL + 1,
        k1=BM25_K1,
        b=BM25_B,
        champion_n=BM25_CHAMPION_N,
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("neighbor_id").asc()
    )
    lex = (
        lex.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HYBRID_POOL)
        .select("query_id", "neighbor_id", "rk")
    )
    emb = _t(spark, sf_dir, "embeddings")
    dense = cosine_topk_bruteforce(
        emb,
        emb.filter(F.expr("vec_id % 50 = 0")),
        id_col="vec_id",
        k=HYBRID_POOL,
    ).select("query_id", "neighbor_id", "rk")
    fused = rrf_fuse(
        {"lex": lex, "dense": dense},
        k=HYBRID_K,
        rrf_k=HYBRID_RRF_K0,
        weights={"dense": HYBRID_W_DENSE},
    )
    zero = F.lit(0).cast("long")
    return fused.select(
        "query_id",
        "neighbor_id",
        F.coalesce("lex_rk", zero).alias("lex_rk"),
        F.coalesce("dense_rk", zero).alias("dense_rk"),
        "rrf_micro",
        "rk",
    )


def _hybrid_weighted_sql() -> str:
    return _hybrid_rrf_sql(wl=1, wd=HYBRID_W_DENSE)
