"""Rank fusion for hybrid retrieval (reciprocal rank fusion, RRF).

Production retrieval over a curated corpus almost never runs ONE
scorer: a lexical arm (BM25 over an inverted index) catches exact
terminology, a dense arm (embedding cosine) catches paraphrase, and
the serving layer fuses the two ranked lists. Reciprocal rank fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) is the standard fusion rule
because it needs no score calibration between arms — only ranks:

    rrf(d) = sum over runs r containing d of 1 / (k0 + rank_r(d))

with k0 = 60 in the original paper and in most deployments
(Elasticsearch/OpenSearch hybrid search use the same constant).

Engine-portability: each reciprocal term is ONE IEEE division rounded
to integer micro-units, so the per-document fused score is a sum of
BIGINTs — shuffle-order-free and bit-identical across engines (the
same micro-unit discipline as ``operators.text.bm25_topk``).

Scale shape: inputs are already per-query top-N pools (N bounded by
the caller), so the fused frame is at most ``n_runs * N`` rows per
query. The union is shuffle-free, the groupBy shuffles on
``(query_id, neighbor_id)`` over that bounded pool — cost scales with
the query batch, never with the corpus; the corpus-sized work lives
in the upstream retrieval arms.

Reference analogue: none — the reference serves FULLTEXT matches only
(LOADERS/GOLD-data-loader.py:593-632); fusion is part of this
engine's retrieval extension surface.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0 = 60
RRF_MICRO = 1_000_000.0


def rrf_fuse(
    runs: Mapping[str, DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K0,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rk",
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """Fuse named per-query ranked pools into one RRF-ranked top-k.

    Each run must carry ``(query_col, id_col, rank_col)`` with
    rank_col a 1-based rank within the query. Output columns:
    ``query_id, neighbor_id, <name>_rk`` per run (NULL when that run
    did not retrieve the document), ``rrf_micro`` (the fused score in
    integer micro-units), and the fused 1-based ``rk`` (ties broken by
    ``neighbor_id`` for determinism), cut at ``k``.

    ``weights`` (optional, INTEGER per run name — the serving-layer
    "boost the dense arm 2x" knob, ES/Vespa hybrid-search style)
    multiplies each run's micro contribution AFTER rounding, so the
    fused score stays an exact BIGINT sum; missing names weigh 1.
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    names = list(runs)
    w = dict(weights or {})
    bad = [n for n, x in w.items() if not isinstance(x, int) or x < 0]
    if bad:
        raise ValueError(f"weights must be non-negative ints: {bad}")
    tagged = [
        df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.col(rank_col).cast("long").alias("__rk"),
            F.lit(name).alias("__run"),
            F.lit(int(w.get(name, 1))).cast("long").alias("__w"),
        )
        for name, df in runs.items()
    ]
    pool = reduce(DataFrame.unionByName, tagged)
    contrib = pool.withColumn(
        "__c",
        F.round(F.lit(RRF_MICRO) / (F.lit(rrf_k) + F.col("__rk")), 0).cast(
            "long"
        )
        * F.col("__w"),
    )
    fused = contrib.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("__run") == n, F.col("__rk"))).alias(
                f"{n}_rk"
            )
            for n in names
        ],
        F.sum("__c").alias("rrf_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
