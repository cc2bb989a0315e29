"""The training-data corpus-cleaning pipeline — the LLM-pipeline
flagship, composing the text stack end-to-end:

    quality filter → language filter → exact dedup (keep canonical)
    → MinHash-LSH near-dup removal (Jaccard-verified)

Every stage is the already-oracle-checked operator; the composition
adds no new primitives, only the realistic ordering: cheap projection
filters first (quality/langid are scan-speed), the linear exact dedup
next, and the candidate-bounded near-dup pass last, over the smallest
surviving set. Removal is greedy keep-smallest-id (a doc is dropped if
it is the larger side of any verified near-dup pair) — the standard
single-pass policy; full transitive clustering needs iteration and is
deliberately out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traits_data_spark.functions.scalars import portable_hash64
from traits_data_spark.operators.dedup import (
    jaccard_verify,
    minhash_lsh_candidates,
    normalized_text,
    widen_if_narrow,
)
from traits_data_spark.operators.text import identify_language, quality_features


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_punct_ratio: float = 0.2,
    drop_lang: str = "und",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Return the surviving documents with their quality/lang columns.

    Output: one row per kept doc — ``(id_col, lang_pred, n_words)``.
    """
    # The scoring projection is regex-CPU-bound; a small input file
    # scans as one partition and would serialize it onto one core.
    base = widen_if_narrow(docs.select(id_col, text_col))
    # Persist the scored projection BEFORE filtering. Without the
    # barrier Catalyst substitutes the quality/langid expressions into
    # the filter predicate and pushes it below the widening exchange —
    # the full regex stack then evaluates at the scan (serially, on a
    # single-row-group file) and AGAIN in the projection. The persist
    # pins the regex pass to exactly one parallel evaluation (measured
    # 6x on the sf0.1 bench); at cluster scale it also halves the
    # dominant regex CPU in exchange for one corpus-sized
    # MEMORY_AND_DISK cache alongside the exact-kept barrier below.
    scored = identify_language(
        quality_features(base, text_col=text_col), text_col=text_col
    ).persist()
    filtered = scored.filter(
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") < max_punct_ratio)
        & (F.col("lang_pred") != drop_lang)
    )

    # Exact dedup: keep each content group's smallest id, as ONE
    # min_by aggregation on the content hash — partial aggregation
    # collapses duplicate groups map-side before the exchange, so the
    # shuffle moves one row per distinct content even when the corpus
    # is dup-heavy (the window form shuffles every row, then sorts).
    # The persist is the plan's one barrier: the exact-kept set feeds
    # shingling, both jaccard sides, and the final anti-join — without
    # it Catalyst re-derives the whole regex-heavy scoring subtree at
    # every consumer (and the fused quality+langid+minhash projection
    # overflows whole-stage codegen).
    row = F.struct(*[F.col(c) for c in filtered.columns])
    exact_kept = (
        filtered.withColumn(
            "__ch", portable_hash64(normalized_text(text_col))
        )
        .groupBy("__ch")
        .agg(F.min_by(row, F.col(id_col)).alias("__r"))
        .select("__r.*")
        .persist()
    )

    # near-dup removal over the exact-kept set: drop the larger id of
    # every verified pair
    # The bucket cap guards the quadratic blow-up on degenerate band
    # keys; any docs it drops from candidacy are near-certain exact
    # dups, which the exact pass above already collapsed. On corpora
    # where no bucket reaches the cap it is a no-op (the oracle relies
    # on that at test scale).
    # widen=False: exact_kept is already partitioned by the dedup
    # aggregation's shuffle, so the probe-and-repartition would be a
    # no-op that still pays a full plan→RDD conversion on the driver.
    cand = minhash_lsh_candidates(
        exact_kept, text_col, id_col, num_hashes=num_hashes, bands=bands,
        max_bucket_size=max_bucket_size, widen=False,
    )
    near = jaccard_verify(
        cand, exact_kept, text_col, id_col, threshold=jaccard_threshold,
        widen=False,
    ).select(F.col("id_b").alias(id_col))
    kept = exact_kept.join(near, id_col, "left_anti")
    return kept.select(id_col, "lang_pred", "n_words")
