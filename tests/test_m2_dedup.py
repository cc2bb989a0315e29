"""Top-2 multi-assignment shard-local dedup + the sharded SemDeDup
flagship: recall-lift and comparison-budget contracts, component
consistency, and the top-m assignment operator itself."""

import math

import pytest
from pyspark.sql import functions as F

from traits_data_spark.catalog.ann import (
    KMEANS_ITER,
    KMEANS_K,
    NEAR_DUP_THRESHOLD,
    SHARD_TARGET_SIZE,
    q_semantic_dedup_sharded,
    q_shard_local_near_dups,
    q_shard_local_near_dups_m2,
)
from traits_data_spark.operators.layout import balanced_shards
from traits_data_spark.operators.similarity import (
    keyed_near_dups,
    kmeans_clusters,
    kmeans_clusters_topm,
)


@pytest.fixture(scope="module")
def truth_pairs(spark, embeddings):
    """Exact all-pairs near-dup ground truth (constant locality key =
    brute force) at the catalog threshold."""
    allp = keyed_near_dups(
        embeddings.withColumn("__all", F.lit(0)),
        "__all",
        threshold=NEAR_DUP_THRESHOLD,
    )
    return {(r.id_a, r.id_b) for r in allp.collect()}


def test_topm_rank1_equals_single_assignment(spark, embeddings):
    single = {
        r.vec_id: r.cluster
        for r in kmeans_clusters(
            embeddings, k=KMEANS_K, n_iter=KMEANS_ITER
        ).collect()
    }
    top2 = kmeans_clusters_topm(
        embeddings, k=KMEANS_K, n_iter=KMEANS_ITER, m=2
    ).collect()
    rank1 = {r.vec_id: r.cluster for r in top2 if r.arank == 1}
    assert rank1 == single


def test_topm_shape_and_distance_order(spark, embeddings):
    rows = kmeans_clusters_topm(
        embeddings, k=KMEANS_K, n_iter=KMEANS_ITER, m=2
    ).collect()
    n = embeddings.count()
    assert len(rows) == 2 * n
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, rs in by_vec.items():
        assert sorted(r.arank for r in rs) == [1, 2]
        assert len({r.cluster for r in rs}) == 2
        r1 = next(r for r in rs if r.arank == 1)
        r2 = next(r for r in rs if r.arank == 2)
        assert r1.dist2 <= r2.dist2

    with pytest.raises(ValueError):
        kmeans_clusters_topm(embeddings, m=0)


def _comparisons(sh):
    """Σ C(size, 2) over shards — the pairwise work the layout buys."""
    sizes = [r.c for r in sh.groupBy("shard").agg(F.count("*").alias("c")).collect()]
    return sum(s * (s - 1) // 2 for s in sizes)


def test_m2_recall_lift_within_2x_comparisons(spark, sf_dir, embeddings, truth_pairs):
    """The round-13 contract: top-2 multi-assignment recovers MORE of
    the true near-dup pairs than the single-assignment pass (which
    structurally misses pairs straddling a k-means boundary) while
    costing at most ~2x the same-shard comparisons.

    Measured on the synthetic corpus (threshold 0.3 on near-random
    vectors, so k-means locality predicts pairs weakly and ABSOLUTE
    recall is low by construction): sf0.001 0.288 -> 0.478, sf0.01
    0.286 -> 0.480, sf0.1 0.087 -> 0.119. Real SemDeDup deployments
    (0.95+ cosine on trained embeddings) co-locate far better; the
    pinned contract is the LIFT and the comparison budget, not an
    absolute recall bar the data cannot support."""
    m1 = {(r.id_a, r.id_b) for r in q_shard_local_near_dups(spark, sf_dir).collect()}
    m2 = {(r.id_a, r.id_b) for r in q_shard_local_near_dups_m2(spark, sf_dir).collect()}
    assert m2 <= truth_pairs  # every reported pair is a true pair
    r1 = len(m1 & truth_pairs) / len(truth_pairs)
    r2 = len(m2 & truth_pairs) / len(truth_pairs)
    assert r2 > r1, f"multi-assignment recall {r2:.3f} <= single {r1:.3f}"
    assert r2 >= 1.3 * r1  # the measured lift is ~1.7x; 1.3x is the floor

    # comparison budget: replicate both layouts and count same-shard
    # pairs — the m2 layout has 2N rows in ~2x the shards of the same
    # target size, so the quadratic work is <= ~2x (+1 shard rounding)
    asg1 = kmeans_clusters(embeddings, k=KMEANS_K, n_iter=KMEANS_ITER).select(
        "vec_id", "cluster"
    )
    n1 = max(1, math.ceil(asg1.count() / float(SHARD_TARGET_SIZE)))
    c1 = _comparisons(balanced_shards(asg1, "vec_id", "cluster", n1))
    asg2 = kmeans_clusters_topm(
        embeddings, k=KMEANS_K, n_iter=KMEANS_ITER, m=2
    ).select("vec_id", "cluster")
    n2 = max(1, math.ceil(asg2.count() / float(SHARD_TARGET_SIZE)))
    c2 = _comparisons(balanced_shards(asg2, "vec_id", "cluster", n2))
    assert c2 <= 2.1 * c1, f"{c2} comparisons vs single-assignment {c1}"


def test_semantic_dedup_sharded_components_match_union_find(spark, sf_dir):
    """The flagship's components equal a driver-side union-find over
    the SAME pair set (min-id labels), and canonical flags mark
    exactly the label rows; vectors in no pair are singletons."""
    pairs = [
        (r.id_a, r.id_b)
        for r in q_shard_local_near_dups_m2(spark, sf_dir).collect()
    ]
    out = q_semantic_dedup_sharded(spark, sf_dir).collect()

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    # path-compress to final minima
    labels = {x: find(x) for x in list(parent)}
    expected = {}
    for x, r in labels.items():
        # min id reachable: find() with min-union gives the min root
        expected[x] = r
    for row in out:
        want = expected.get(row.vec_id, row.vec_id)
        assert row.component == want, (row.vec_id, row.component, want)
        assert row.is_canonical == (row.component == row.vec_id)
    assert len(out) == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def test_near_dup_recall_report_consistency(spark, sf_dir, truth_pairs):
    """The report's rows are internally consistent and agree with the
    standalone catalog entries: brute kept == ground truth, method
    kept == the corresponding entry's pair count, m2 candidates are
    exactly 2x the single-assignment candidates (same shard-size
    target over 2N rows), and the ppm columns are the integer ratios."""
    from traits_data_spark.catalog.ann import q_near_dup_recall_report

    rep = {r.method: r for r in q_near_dup_recall_report(spark, sf_dir).collect()}
    assert set(rep) == {"brute_force", "lsh_bucket", "shard_local", "shard_local_m2"}
    b = rep["brute_force"]
    assert b.kept_pairs == len(truth_pairs)
    assert b.recall_ppm == 1_000_000 and b.cost_ppm == 1_000_000
    m1 = {(r.id_a, r.id_b) for r in q_shard_local_near_dups(spark, sf_dir).collect()}
    m2 = {(r.id_a, r.id_b) for r in q_shard_local_near_dups_m2(spark, sf_dir).collect()}
    assert rep["shard_local"].kept_pairs == len(m1)
    assert rep["shard_local_m2"].kept_pairs == len(m2)
    assert rep["shard_local_m2"].candidate_pairs == 2 * rep["shard_local"].candidate_pairs
    for r in rep.values():
        assert r.recall_ppm == r.kept_pairs * 1_000_000 // b.kept_pairs
        assert r.cost_ppm == r.candidate_pairs * 1_000_000 // b.candidate_pairs
        assert r.kept_pairs <= b.kept_pairs


def test_all_pairs_cosine_matches_constant_key_join(spark, embeddings):
    """Block-pair parallel brute force returns EXACTLY the constant-key
    self-join's rows (every unordered pair meets in exactly one block
    group: cross pairs at (min,max), intra at (i,i)) — at several
    block counts including 1 and > N."""
    from traits_data_spark.operators.similarity import all_pairs_cosine

    ref = {
        (r.id_a, r.id_b, r.cosine)
        for r in keyed_near_dups(
            embeddings.withColumn("__k", F.lit(0)),
            "__k",
            threshold=NEAR_DUP_THRESHOLD,
        ).collect()
    }
    for nb in (1, 3, 8, 601):
        got = {
            (r.id_a, r.id_b, r.cosine)
            for r in all_pairs_cosine(
                embeddings, threshold=NEAR_DUP_THRESHOLD, n_blocks=nb
            ).collect()
        }
        assert got == ref, f"n_blocks={nb}"

    import pytest as _pt

    with _pt.raises(ValueError):
        all_pairs_cosine(embeddings, n_blocks=0)
