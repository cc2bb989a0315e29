"""Graph centrality over document-similarity graphs.

The near-dup / copy-detection operators emit PAIR LISTS (winnowing
matches, LSH candidates, simhash bands); ``connected_components``
(``operators.dedup``) collapses them into clusters. PageRank is the
other graph question a curation pipeline asks of the same edges:
WHICH documents are the hubs — the templates / boilerplate sources a
large fraction of the copy-graph hangs off. A doc with high copy-graph
centrality is usually a mirrored license page, a scraped template, or
an aggregator shell; curation wants them surfaced, not just clustered.

Arithmetic contract: everything is INTEGER micro-units so a DuckDB
oracle reproduces every rank bit-for-bit — rank starts at 1e6 per
node, each iteration is

    rank' = base + (damping_pct * Σ_in (rank DIV deg)) DIV 100

with ``base = (100 - damping_pct) * 1e6 DIV 100``. Integer DIV
truncates identically on both engines for the non-negative operands
here (the floor-division gotcha only bites negatives). Truncation
sheds up to ``deg`` micro-units of mass per node per round — PageRank
here is a deterministic centrality SCORE, not a conserved probability
distribution (no dangling-mass redistribution either, the usual
simplification when ranks are compared, not summed).

Scale shape: the loop runs on the EDGE SUBGRAPH only (the
``connected_components`` discipline) — edges are checkpointed once
and consumed once per iteration; each round is one join + one
key-shuffle aggregate on graph-sized frames, never corpus-sized. A
fixed iteration count (default 5) keeps the oracle expressible as
unrolled CTEs and is plenty to separate hubs from leaves on the
clique-ish graphs near-dup detection produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from traits_data_spark.functions.barrier import barrier

MICRO = 1_000_000


def pagerank(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping_pct: int = 85,
    n_iter: int = 5,
) -> DataFrame:
    """Integer-exact damped PageRank over an undirected pair list.

    Returns one row per node appearing in ``pairs``:
    ``(id, degree, rank_micro)`` after exactly ``n_iter`` rounds.
    Isolated documents (no pairs) are not scored — their rank is the
    constant ``base`` and callers needing full coverage left-join and
    ``coalesce`` it in.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85)
    so the damping multiply stays in BIGINT.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    # single-scan symmetrization (the any_union explode pattern): a
    # union of two selects embeds the pair-generation subtree TWICE in
    # the plan, and the eager checkpoint below then executes it twice
    # — for the winnow copy-graph that was two full fingerprint+match
    # passes (stage-profiled round 16)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src).cast("long").alias("e_src"),
                    F.col(dst).cast("long").alias("e_dst"),
                ),
                F.struct(
                    F.col(dst).cast("long").alias("e_src"),
                    F.col(src).cast("long").alias("e_dst"),
                ),
            )
        ).alias("__e")
    ).select("__e.e_src", "__e.e_dst")
    edges = (
        sym.distinct()
        # consumed once per iteration + once for degrees; recomputing
        # the upstream pair generation per round would dominate
        .transform(barrier)
    )
    deg = (
        edges.groupBy(F.col("e_src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .transform(barrier)
    )
    base = (100 - damping_pct) * MICRO // 100
    r = deg.select("id", F.lit(MICRO).cast("long").alias("rank_micro"))
    for _ in range(int(n_iter)):
        out_share = (
            r.join(deg, "id")
            .select(
                F.col("id").alias("e_src"),
                F.expr("rank_micro DIV degree").alias("__share"),
            )
        )
        msgs = (
            edges.join(out_share, "e_src")
            .groupBy(F.col("e_dst").alias("id"))
            .agg(F.sum("__share").alias("__in"))
        )
        r = deg.join(msgs, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.expr(
                    f"CAST({int(damping_pct)} * coalesce(__in, 0) "
                    "DIV 100 AS BIGINT)"
                )
            ).cast("long").alias("rank_micro"),
        )
    return deg.join(r, "id").select("id", "degree", "rank_micro")
