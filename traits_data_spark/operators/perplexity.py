"""CCNet-style LM-perplexity quality scoring.

The standard stratifier for web corpora (CCNet: Wenzek et al., LREC
2020) scores every document under a language model trained on trusted
text and buckets the corpus by perplexity percentile; the engine's
quality stack had heuristics (``gopher_rules``), a linear classifier
(``classifier_score``) and a char-entropy proxy, but not this.

Model contract: a Laplace-smoothed word-bigram LM shipped as a
committed artifact (``tools/build_word_lm.py``) with ALL transcendental
math precomputed — per-bigram natural-log probabilities in integer
micro-nats (``lp_micro``), plus a per-context unseen-continuation
log-prob. The distributed plan does ONLY integer sums, one IEEE-exact
double division, and an integer decile bucket, so DuckDB oracles
recompute it bit-for-bit from the same parquet artifacts (``ln``/
``exp`` are not correctly-rounded and may differ in the last ulp
between the JVM and glibc — they never run in-plan here; the same
reasoning keeps KenLM scores out of cross-engine gates in real
deployments).

Scale shape (100 TB): the LM is a bounded model artifact (CCNet ships
a ~few-GB KenLM the same way) — both tables broadcast; the corpus
explodes to tokens, takes one shuffle on ``doc_id`` (window for the
previous-token lag, reused by the per-doc sum), and every lookup is a
broadcast-hash join. The decile ranking is a global sort of the
PER-DOCUMENT score frame (one row per doc, k columns) — at extreme
corpus cardinality swap it for sampled quantile cuts
(``operators.sketches.sampled_quantiles``); the scoring itself never
globally sorts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.operators.dedup import normalized_text

BOS = "<s>"
UNK = "<unk>"
MICRO = 1_000_000

_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)
WORD_LM_BIGRAM_PATH = os.path.join(_DATA_DIR, "word_lm.parquet")
WORD_LM_CONTEXT_PATH = os.path.join(_DATA_DIR, "word_lm_context.parquet")


def load_word_lm(spark) -> tuple[DataFrame, DataFrame]:
    """Load the committed bigram/context LM tables (see
    ``tools/build_word_lm.py`` for provenance). Bounded model
    artifacts — the same broadcast-dim contract as
    ``load_bpe_vocab``."""
    return (
        spark.read.parquet(WORD_LM_BIGRAM_PATH),
        spark.read.parquet(WORD_LM_CONTEXT_PATH),
    )


def doc_lp_sums(
    df: DataFrame,
    bigram_lp: DataFrame,
    context_lp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM score sums — the bucket-free core of
    ``score_perplexity`` (one row per doc WITH tokens: ``__id``,
    ``n_scored``, ``sum_lp_micro``, ``avg_lp_micro``). Use directly
    for threshold filters (e.g. the ``curate_corpus`` LM hook) that
    don't need the global decile window."""
    warr = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )
    toks = df.select(
        F.col(id_col).alias("__id"), F.posexplode(warr).alias("__pos", "__w0")
    )
    vocab = context_lp.select(F.col("u").alias("__w0")).distinct()
    mapped = toks.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "__w0", "left"
    ).select(
        "__id",
        "__pos",
        F.when(F.col("__in").isNotNull(), F.col("__w0"))
        .otherwise(F.lit(UNK))
        .alias("__w"),
    )
    w_prev = Window.partitionBy("__id").orderBy("__pos")
    paired = mapped.withColumn("__u", F.lag("__w", 1, BOS).over(w_prev))
    bi = bigram_lp.select(
        F.col("u").alias("__u"),
        F.col("w").alias("__w"),
        F.col("lp_micro").alias("__bi_lp"),
    )
    ctx = context_lp.select(
        F.col("u").alias("__u"), F.col("unseen_lp_micro").alias("__un_lp")
    )
    scored = (
        paired.join(F.broadcast(bi), ["__u", "__w"], "left")
        .join(F.broadcast(ctx), "__u", "left")
        .withColumn("__lp", F.coalesce(F.col("__bi_lp"), F.col("__un_lp")))
    )
    sums = scored.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum("__lp").cast("long").alias("sum_lp_micro"),
    )
    avg = F.round(
        F.col("sum_lp_micro").cast("double") / F.col("n_scored"), 6
    ) + F.lit(0.0)
    return sums.withColumn("avg_lp_micro", avg)


def score_perplexity(
    df: DataFrame,
    bigram_lp: DataFrame,
    context_lp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
    emit_perplexity: bool = False,
) -> DataFrame:
    """Per-document bigram-LM score: one row per input row with

    - ``n_scored`` — tokens scored (0 for null/empty text),
    - ``sum_lp_micro`` — Σ log p(w_i | w_{i-1}) in integer micro-nats
      (BIGINT; exact),
    - ``avg_lp_micro`` — ``sum/n`` as one IEEE-exact double division,
      rounded to 6 dp (NULL when ``n_scored = 0``),
    - ``ppl_bucket`` — 0..n_buckets-1 by ascending ``avg_lp_micro``
      (bucket 0 = LOWEST mean log-prob = most perplexing; CCNet's
      head/middle/tail generalized to deciles), integer row-number
      arithmetic, NULL for unscored docs.

    OOV handling: any word outside the artifact's context vocabulary
    maps to ``<unk>`` before both lookups, which makes
    ``coalesce(seen-bigram lp, per-context unseen lp)`` total — the
    artifact carries a context row for every vocab word, ``<s>`` and
    ``<unk>``.

    ``emit_perplexity=True`` appends ``perplexity = exp(-avg/1e6)``
    for humans — display-only: ``exp`` is transcendental and excluded
    from cross-engine oracles (see module docstring).
    """
    sums = doc_lp_sums(df, bigram_lp, context_lp, text_col, id_col)
    # decile by ascending mean log-prob, doc id tiebreak; integer
    # bucket arithmetic (DIV, not double /) so both engines agree
    # exactly at any cardinality
    w_rank = Window.orderBy(F.col("avg_lp_micro").asc(), F.col("__id").asc())
    n_docs = Window.partitionBy()
    bucketed = (
        sums.withColumn(
            "__rn0", (F.row_number().over(w_rank) - F.lit(1)).cast("long")
        )
        .withColumn("__cnt", F.count(F.lit(1)).over(n_docs).cast("long"))
        .withColumn(
            "ppl_bucket",
            F.expr(f"CAST((__rn0 * {int(n_buckets)}) DIV __cnt AS BIGINT)"),
        )
    )
    out = df.join(
        bucketed.select(
            F.col("__id").alias(id_col),
            "n_scored",
            "sum_lp_micro",
            "avg_lp_micro",
            "ppl_bucket",
        ),
        id_col,
        "left",
    ).withColumns(
        {
            "n_scored": F.coalesce(F.col("n_scored"), F.lit(0)).cast("long"),
            "sum_lp_micro": F.coalesce(
                F.col("sum_lp_micro"), F.lit(0)
            ).cast("long"),
        }
    )
    if emit_perplexity:
        out = out.withColumn(
            "perplexity",
            F.exp(-F.col("avg_lp_micro") / F.lit(float(MICRO))),
        )
    return out


def score_perplexity_sampled(
    df: DataFrame,
    bigram_lp: DataFrame,
    context_lp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
    rate_bp: int = 2_000,
) -> DataFrame:
    """``score_perplexity`` with the SCALE-SAFE bucket path: instead of
    ranking every document in one global window (one row per doc, but
    still a total order), bucket cut values come from a deterministic
    hash sample — the ``sampled_quantiles`` discipline applied to the
    perplexity stratifier, which is how CCNet actually buckets (cuts
    from a sample, corpus assigned by comparison).

    Pipeline: per-doc scores (``doc_lp_sums``) → keep docs whose
    ``portable_hash64(id) % 10000 < rate_bp`` → rank the SAMPLE by
    ``(avg_lp_micro, id)`` → select the ``n_buckets-1`` discrete cut
    values at 1-based ranks ``(q·(n-1)) DIV n_buckets + 1`` → collect
    them into one broadcast array row → every doc's
    ``ppl_bucket_sampled = Σ [avg >= cut]`` (0..n_buckets-1,
    0 = most perplexing). Only the sample shuffles into a sort window;
    the corpus-sized stages are scans, broadcast joins, and one
    doc-keyed aggregate. All selection is discrete (actual sample
    values, integer rank arithmetic, exact double comparisons), so a
    SQL oracle reproduces every bucket bit-for-bit.
    """
    from traits_data_spark.functions.scalars import portable_hash64

    sums = doc_lp_sums(df, bigram_lp, context_lp, text_col, id_col)
    h = F.pmod(portable_hash64(F.col("__id").cast("string")), F.lit(10_000))
    sample = sums.filter(h < rate_bp).select("avg_lp_micro", "__id")
    w = Window.orderBy(F.col("avg_lp_micro").asc(), F.col("__id").asc())
    ranked = (
        sample.withColumn("__rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy()).cast("long")
        )
    )
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # 1-based cut ranks (q·(n-1)) DIV n_buckets + 1 — floor division of
    # non-negative ints via the exact subtract-pmod-divide form (the
    # double division of an exact multiple is exact; no DIV operator is
    # reachable inside a transform lambda)
    def cut_rank(q):
        x = q.cast("long") * (F.col("__n") - 1)
        nb = F.lit(int(n_buckets))
        return ((x - F.pmod(x, nb)) / nb).cast("long") + F.lit(1)

    if n_buckets == 1:
        # zero cuts — everything in bucket 0. Guard explicitly:
        # F.sequence(1, 0) would DESCEND ([1, 0]) and select spurious
        # cut rows (review finding, round 10).
        is_cut = F.lit(False)
    else:
        is_cut = F.array_contains(
            F.transform(
                F.sequence(F.lit(1), F.lit(int(n_buckets) - 1)), cut_rank
            ),
            F.col("__rn"),
        )
    cuts = ranked.filter(is_cut).agg(
        F.array_sort(F.collect_list("avg_lp_micro")).alias("__cuts")
    )
    bucket = F.aggregate(
        F.col("__cuts"),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(F.col("avg_lp_micro") >= c, F.lit(1)).otherwise(0),
    )
    scored = (
        sums.crossJoin(F.broadcast(cuts))
        .withColumn("ppl_bucket_sampled", bucket)
        .select(
            F.col("__id").alias(id_col),
            "n_scored",
            "sum_lp_micro",
            "avg_lp_micro",
            "ppl_bucket_sampled",
        )
    )
    return df.join(scored, id_col, "left").withColumns(
        {
            "n_scored": F.coalesce(F.col("n_scored"), F.lit(0)).cast("long"),
            "sum_lp_micro": F.coalesce(
                F.col("sum_lp_micro"), F.lit(0)
            ).cast("long"),
        }
    )
