"""Deterministic sampling / dataset splitting for training-data
pipelines.

Random `df.sample()` is non-reproducible across runs, cluster layouts,
and engines; a training pipeline needs the SAME document to land in
the same split every run, on every engine, regardless of partitioning.
Hashing a stable key gives that: the split is a pure projection (no
shuffle, no state), survives incremental re-processing (new docs don't
reshuffle old ones between splits), and is recomputable in any SQL
engine via the portable md5 hash (``functions.scalars.portable_hash64``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.functions.scalars import map_lookup, portable_hash64

N_BUCKETS = 10_000  # 0.01% split granularity


def split_bucket(key: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from the md5 of ``salt || key``.
    Changing ``salt`` re-deals every row independently — the knob for
    drawing a fresh holdout without touching the data."""
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash64(F.concat(F.lit(salt), c.cast("string"))) % N_BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 9000), ("val", 500), ("test", 500)),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by hash bucket.

    ``splits`` maps label → bucket weight out of 10000 (so the default
    is a 90/5/5 split); weights must sum to 10000 exactly — a silent
    remainder bucket would leak rows into no split.
    """
    total = sum(w for _, w in splits)
    if total != N_BUCKETS:
        raise ValueError(f"split weights must sum to {N_BUCKETS}, got {total}")
    b = split_bucket(key_col, salt)
    expr: Column | None = None
    hi = 0
    for label, w in splits:
        hi += w
        cond = b < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: Mapping[object, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket fraction (strata absent from ``fractions`` keep
    ``default_fraction``). The downsample-the-majority-class move for
    rebalancing training corpora (e.g. per-language caps).

    Pure projection + filter — no shuffle, no ``sampleBy`` RNG: the
    same row survives every run, on every engine, under any
    partitioning, and enlarging one stratum's fraction only ever adds
    rows (same salt), so corpus versions stay supersets.
    """
    thresholds = {
        v: int(round(f * N_BUCKETS)) for v, f in fractions.items()
    }
    thr = map_lookup(
        stratum_col,
        thresholds,
        default=F.lit(int(round(default_fraction * N_BUCKETS))),
    )
    return df.filter(split_bucket(key_col, salt) < thr)


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    target_frac: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-group temperature sampling weights: ``weight ∝ count^alpha``
    (the multilingual/source rebalancing rule from the GPT/LLaMA data
    recipes — ``alpha < 1`` upsamples rare sources relative to their
    share, ``alpha = 1`` is proportional, ``alpha = 0`` uniform).

    Returns one row per group: ``n_docs``, normalized ``weight``, and
    ``bucket_threshold`` — the [0, 10000) hash-bucket cutoff such that
    keeping rows with ``split_bucket < threshold`` draws ~``target_frac
    × corpus_size × weight`` rows from the group (capped at the whole
    group).

    Cross-engine determinism: the ``pow`` is scaled to an integer
    (×1e6, round) so the normalizing sum is exact integer arithmetic;
    the remaining float steps are single operations rounded on both
    engines.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    ws = F.round(
        F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))) * 1e6, 0
    ).cast("long")
    out = (
        counts.withColumn("__ws", ws)
        # the group table is tiny (distinct sources); a whole-table
        # window over it is a single-partition no-op, not a scale risk
        .withColumn(
            "weight",
            F.round(F.col("__ws") / F.sum("__ws").over(w_all), round_to),
        )
        .withColumn(
            "__target_n",
            F.round(
                F.lit(float(target_frac))
                * F.sum("n_docs").over(w_all)
                * F.col("weight"),
                0,
            ).cast("long"),
        )
        .withColumn(
            "bucket_threshold",
            F.least(
                F.lit(N_BUCKETS),
                F.round(
                    F.lit(float(N_BUCKETS)) * F.col("__target_n") / F.col("n_docs"), 0
                ).cast("int"),
            ),
        )
    )
    return out.select(group_col, "n_docs", "weight", "bucket_threshold")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministically resample the corpus toward the ``count^alpha``
    source mixture: one tiny aggregate, a broadcast join of the
    per-group thresholds, and a pure projection filter — the corpus
    itself never shuffles."""
    w = temperature_weights(df, group_col, alpha=alpha, target_frac=target_frac)
    thr = F.broadcast(w.select(group_col, "bucket_threshold"))
    return (
        df.join(thr, group_col)
        .filter(split_bucket(key_col, salt) < F.col("bucket_threshold"))
        .drop("bucket_threshold")
    )


def token_budget_filter(
    df: DataFrame,
    group_col: str,
    quality_col: str,
    token_col: str,
    budget: int,
    key_col: str,
    descending: bool = True,
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Quality-ranked token-budget curation: within each group, keep
    documents in descending quality order until the group's token
    budget is exhausted (the kept set is every doc whose running token
    total fits the budget).

    One window shuffle on the group key — the running sum and the keep
    decision happen in a single pass, no join-backs, no driver loop.
    ``key_col`` is the deterministic tiebreak so equal-quality docs
    admit identically on every run/engine. The first over-budget doc
    is NOT kept (strict ``cum <= budget``), so the result is a stable
    prefix of the quality ranking.
    """
    order = [
        F.col(quality_col).desc() if descending else F.col(quality_col).asc(),
        F.col(key_col),
    ]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(out_col, F.sum(F.col(token_col)).over(w))
        .filter(F.col(out_col) <= budget)
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep a stable ``fraction`` of rows by hash bucket — the
    reproducible replacement for ``df.sample(fraction)``. Resolution is
    1/10000; the kept set is a subset of any larger fraction's kept set
    (same salt), so nested sample sizes are consistent."""
    return df.filter(split_bucket(key_col, salt) < int(round(fraction * N_BUCKETS)))


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training-order shuffle, sharded: every row
    gets ``(shard, shard_pos)`` — the shard file it belongs to and its
    position within that shard — from a pure hash of ``salt || key``.
    Reading shards in index order, each sorted by ``shard_pos``, yields
    the same globally-shuffled document order on every run, engine, and
    cluster layout; changing ``salt`` is a fresh epoch-level reshuffle
    without touching the data. This is the standard way a training
    pipeline materializes "shuffle the corpus" at scale: no single
    total-order sort, just ``n_shards`` independent writers.

    Scale shape: the shard assignment is a stateless projection; the
    only shuffle is the window on ``shard`` (uniform by construction —
    hash-dealt), and per-task work is the ``N/n_shards`` rows of one
    shard, so ``n_shards`` scales with the corpus (1024 here; tens of
    thousands at 100 TB keeps per-shard sorts in memory). No skew: the
    partition key is a hash, not a natural key.
    """
    h = portable_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    )
    out = df.withColumn("__sh", h).withColumn(
        "shard", (F.col("__sh") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__sh"), F.col(key_col))
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("__sh")
    )


PPM = 1_000_000


def mixture_plan(
    df: DataFrame,
    group_col: str,
    token_col: str,
    weights_ppm: Mapping[str, int],
    token_budget: int,
) -> DataFrame:
    """Data-mixture planning: given per-source target weights (in
    parts-per-million, so the plan is integer-exact and
    engine-portable) and a total token budget, compute what each
    source must contribute and how to get there — the bookkeeping
    behind mixture tables like GPT-3's (weights chosen per corpus,
    some sources repeated ~3 epochs, CommonCrawl subsampled).

    Per source: ``n_docs``/``n_tokens`` actually available,
    ``weight_ppm`` (0 for sources not in the plan),
    ``target_tokens = token_budget * weight_ppm / PPM`` (floor), and
    ``epochs_ppm = target_tokens * PPM / n_tokens`` (floor) — the
    repeat factor in ppm: under PPM means subsample at that rate, over
    PPM means repeat (``ceil(epochs_ppm / PPM)`` passes with a final
    subsample). All arithmetic is 64-bit integer and exact while
    ``token_budget * max_weight_ppm < 2^63`` (budget up to ~9e12
    tokens) and ``n_tokens < ~9e12`` per source; beyond that,
    pre-scale to thousands of tokens.

    Scale shape: ONE map-side-combinable groupBy over the corpus; the
    weight table is a literal map (no join). Output is one row per
    source.
    """
    per = (
        df.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "weight_ppm",
            F.coalesce(
                map_lookup(F.col("source"), dict(weights_ppm)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "target_tokens",
            F.expr(f"CAST({token_budget} AS BIGINT) * weight_ppm DIV {PPM}"),
        )
    )
    # floor(target * PPM / n_tokens) without 128-bit: split quotient
    # and remainder so no intermediate exceeds target + n_tokens * PPM
    return per.withColumn(
        "epochs_ppm",
        F.expr(
            f"CASE WHEN n_tokens > 0 THEN "
            f"(target_tokens DIV n_tokens) * {PPM} "
            f"+ ((target_tokens % n_tokens) * {PPM}) DIV n_tokens "
            f"ELSE CAST(0 AS BIGINT) END"
        ),
    ).withColumn(
        "repeat_epochs",
        F.expr(f"CAST((epochs_ppm + {PPM - 1}) DIV {PPM} AS INT)"),
    )


def epoch_expand(
    df: DataFrame,
    id_col: str,
    epochs_ppm_col: str,
    salt: str = "",
    out_col: str = "epoch",
) -> DataFrame:
    """Materialize a repeat factor: every row is emitted once per full
    epoch (``epochs_ppm // PPM``) plus once more in the final partial
    epoch when its deterministic hash bucket clears the fractional
    part — so a source planned at 2.3 epochs yields every doc twice
    and a stable 30% of docs a third time, and the expanded corpus
    lands on the planned token share in expectation AND in hash-exact
    membership. Rows with ``epochs_ppm <= 0`` disappear (unplanned
    sources). ``out_col`` numbers the copies 0..n-1 so downstream
    shuffles (e.g. ``shuffle_shards`` salted per epoch) can separate
    them.

    This is the loader-side half of executing a ``mixture_plan``:
    ``curate_corpus`` THINS over-target sources at curation time
    (dropping is free); repetition is deferred to here because
    repeating at rest would multiply storage.

    Scale shape: a stateless generate (explode of a per-row
    ``sequence``) — no shuffle, no join; the epoch count is bounded by
    the plan, not the data.
    """
    n_full = F.expr(f"CAST({epochs_ppm_col} AS BIGINT) DIV {PPM}")
    frac = F.expr(f"CAST({epochs_ppm_col} AS BIGINT) % {PPM}")
    extra = (
        split_bucket(F.col(id_col), salt) * (PPM // N_BUCKETS) < frac
    ).cast("long")
    n = (n_full + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(
            out_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)),
        )
        .drop("__n")
    )
