"""Reciprocal rank fusion (operators/fusion.py) and the hybrid
retrieval + semantic decontamination catalog entries."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.fusion import rrf_fuse
from traits_data_spark.operators.similarity import (
    hyperplane_bucket_index,
    semantic_decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def _rrf(rank: int, k0: int = 60) -> int:
    return round(1_000_000.0 / (k0 + rank))


def test_rrf_fuse_hand_computed(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rk long",
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, neighbor_id long, rk long",
    )
    out = rrf_fuse({"lex": lex, "dense": dense}, k=10)
    rows = {r["neighbor_id"]: r for r in out.collect()}
    # doc 11 is in both runs: 1/(60+2) + 1/(60+1)
    assert rows[11]["rrf_micro"] == _rrf(2) + _rrf(1)
    assert rows[11]["lex_rk"] == 2 and rows[11]["dense_rk"] == 1
    # doc 10 only lexical
    assert rows[10]["rrf_micro"] == _rrf(1)
    assert rows[10]["dense_rk"] is None
    # doc 13 only dense
    assert rows[13]["rrf_micro"] == _rrf(2)
    assert rows[13]["lex_rk"] is None
    # fused order: 11 (two contributions) first, then 10 (rank-1 single
    # run beats every deeper single-run doc), then 13, then 12
    order = [
        r["neighbor_id"]
        for r in sorted(rows.values(), key=lambda r: r["rk"])
    ]
    assert order == [11, 10, 13, 12]


def test_rrf_fuse_tie_breaks_on_neighbor_id(spark):
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)],
        "query_id long, neighbor_id long, rk long",
    )
    b = spark.createDataFrame(
        [(1, 30, 1), (1, 20, 2)],
        "query_id long, neighbor_id long, rk long",
    )
    out = rrf_fuse({"a": a, "b": b}, k=2).collect()
    # both docs score rrf(1)+rrf(2): tie broken by neighbor_id asc
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])] == [
        20,
        30,
    ]
    assert out[0]["rrf_micro"] == out[1]["rrf_micro"]


def test_rrf_fuse_weights(spark):
    """Weighted RRF: an integer per-run boost multiplies the rounded
    micro contribution exactly, and can flip the fused order."""
    import pytest as _pytest

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)],
        "query_id long, neighbor_id long, rk long",
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 2)],
        "query_id long, neighbor_id long, rk long",
    )
    out = rrf_fuse({"a": a, "b": b}, k=2, weights={"b": 3}).collect()
    rows = {r["neighbor_id"]: r for r in out}
    assert rows[20]["rrf_micro"] == _rrf(2) + 3 * _rrf(1)
    assert rows[10]["rrf_micro"] == _rrf(1) + 3 * _rrf(2)
    # run b dominates: its rank-1 doc (20) wins the fused ranking
    assert rows[20]["rk"] == 1 and rows[10]["rk"] == 2
    with _pytest.raises(ValueError):
        rrf_fuse({"a": a}, weights={"a": -1})


def test_rrf_fuse_k_cut_and_empty_runs(spark):
    lex = spark.createDataFrame(
        [(1, i, i) for i in range(1, 8)],
        "query_id long, neighbor_id long, rk long",
    )
    assert rrf_fuse({"lex": lex}, k=3).count() == 3
    with pytest.raises(ValueError):
        rrf_fuse({}, k=3)


def test_hybrid_catalog_entry_invariants(spark):
    from traits_data_spark.catalog.ann import HYBRID_K, q_hybrid_topk_rrf

    out = q_hybrid_topk_rrf(spark, SF_DIR)
    rows = out.collect()
    assert rows, "hybrid retrieval returned nothing at sf0.001"
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        # every fused row was retrieved by at least one arm (catalog
        # convention: rank 0 = not retrieved, no NULL columns), never
        # a self-hit, and carries the sum of its arms' contributions
        assert r["lex_rk"] > 0 or r["dense_rk"] > 0
        assert r["neighbor_id"] != r["query_id"]
        expect = sum(
            _rrf(r[c]) for c in ("lex_rk", "dense_rk") if r[c] > 0
        )
        assert r["rrf_micro"] == expect
    for q, rs in per_q.items():
        assert len(rs) <= HYBRID_K
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))


def test_semantic_decontaminate_hand_computed(spark):
    # dim 4, 2 planes: buckets are deterministic from the seeded
    # hyperplanes; an identical vector always shares its twin's bucket
    eval_vecs = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),   # exact copy of eval 100
            (2, [0.0, 0.0, 0.0, 1.0]),   # orthogonal to both
            (3, [2.0, 0.0, 0.0, 0.0]),   # scaled copy: cosine 1.0
        ],
        "vec_id long, embedding array<double>",
    )
    idx = hyperplane_bucket_index(eval_vecs, dim=4, n_planes=2)
    out = semantic_decontaminate(
        corpus, idx, dim=4, threshold=0.99, n_planes=2
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}
    for v in (1, 3):
        assert rows[v]["eval_id"] == 100
        assert rows[v]["cosine"] == pytest.approx(1.0)
        assert rows[v]["n_matches"] == 1


def test_semantic_decontaminate_best_match_and_counts(spark):
    # two eval twins of the same corpus vector: n_matches counts both,
    # best match ties to the smaller eval id
    eval_vecs = spark.createDataFrame(
        [(200, [1.0, 1.0, 0.0, 0.0]), (201, [1.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(7, [2.0, 2.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = hyperplane_bucket_index(eval_vecs, dim=4, n_planes=2)
    out = semantic_decontaminate(
        corpus, idx, dim=4, threshold=0.5, n_planes=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["vec_id"] == 7 and r["eval_id"] == 200
    assert r["n_matches"] == 2


def test_semantic_decontaminate_catalog_matches_bruteforce(spark):
    """Every flagged row must be a TRUE near-match (precision is exact
    by construction); recall is bounded by bucket agreement, so the
    flagged set must equal the brute-force same-bucket pairs."""
    from traits_data_spark.catalog.ann import (
        EMB_DIM,
        NEAR_DUP_PLANES,
        SEM_DECON_THRESHOLD,
        q_semantic_decontaminate,
    )
    from traits_data_spark.operators.similarity import with_lsh_bucket

    out = q_semantic_decontaminate(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bench_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "src0").collect()
    }
    b = with_lsh_bucket(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        "v",
        EMB_DIM,
        NEAR_DUP_PLANES,
    ).collect()
    ev = [r for r in b if r["vec_id"] in bench_ids]
    tr = [r for r in b if r["vec_id"] not in bench_ids]

    def cos(a, bb):
        num = sum(x * y for x, y in zip(a, bb))
        import math

        return num / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in bb))
        )

    expect = {}
    for t in tr:
        ms = [
            (round(cos(t["v"], e["v"]), 6), e["vec_id"])
            for e in ev
            if e["bucket"] == t["bucket"]
        ]
        ms = [m for m in ms if m[0] >= SEM_DECON_THRESHOLD]
        if ms:
            best = max(ms, key=lambda m: (m[0], -m[1]))
            expect[t["vec_id"]] = (best[1], len(ms))
    got = {r["vec_id"]: (r["eval_id"], r["n_matches"]) for r in out}
    assert got == expect


def test_hybrid_weighted_catalog_invariants(spark):
    """The dense-boosted entry: every fused score equals the lexical
    reciprocal term plus HYBRID_W_DENSE x the dense term."""
    from traits_data_spark.catalog.ann import (
        HYBRID_W_DENSE,
        q_hybrid_topk_weighted,
    )

    rows = q_hybrid_topk_weighted(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = 0
        if r["lex_rk"] > 0:
            expect += _rrf(r["lex_rk"])
        if r["dense_rk"] > 0:
            expect += HYBRID_W_DENSE * _rrf(r["dense_rk"])
        assert r["rrf_micro"] == expect


def test_curriculum_shards_invariants(spark):
    """Curriculum layout: shard sizes exactly even (max diff 1) and
    difficulty is monotone ACROSS shard boundaries — no document in a
    later shard is easier than any document in an earlier one beyond
    the single band a chunk boundary may split."""
    from traits_data_spark.catalog.text import (
        CURRICULUM_SHARDS,
        q_curriculum_shards,
    )

    rows = q_curriculum_shards(spark, SF_DIR).collect()
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(
            r["bits_per_bigram_q20"]
        )
    sizes = [len(v) for _, v in sorted(by_shard.items())]
    assert max(sizes) - min(sizes) <= 1
    assert len(by_shard) <= CURRICULUM_SHARDS
    shards = sorted(by_shard)
    for a, b in zip(shards, shards[1:]):
        # a band can straddle the boundary, but order never inverts
        assert max(by_shard[a]) <= min(by_shard[b])
