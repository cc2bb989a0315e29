"""Sequence packing and document chunking for LLM training data.

Chunking splits long documents into overlapping context-window pieces
(pure projection: ``sequence`` → ``explode`` → ``substr`` — scan-speed,
no shuffle). Packing assigns documents to fixed-budget training packs
by contiguous fill in a deterministic order: pack boundaries fall out
of an exclusive running sum, so the layout is reproducible on any
engine and stable under re-partitioning.

Packing note: a global contiguous fill orders the whole corpus in one
window partition — a driver-sized bottleneck at 100 TB. Pass
``partition_cols`` (e.g. a hash bucket of the id: packs then form
within each bucket independently, one window shuffle, no global sort).
Buckets only matter for pack NUMBERING, not validity, so any bucket
count works; pack ids are made globally unique by prefixing the
bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """Content-defined chunking: boundaries where the hash of the
    trailing ``window``-char substring ≡ 0 (mod ``modulus``).

    Unlike fixed-size chunking, CDC boundaries are anchored to CONTENT,
    so an insertion early in a document shifts only the chunks up to
    the next boundary — every later chunk re-aligns and hashes
    identically, which is what makes chunk-level dedup survive edits
    (the rsync/LBFS principle). Expected chunk length ≈ ``modulus``.

    Pure expressions: boundary positions via a let-bound
    filter-over-sequence (one md5 per position — same cost class as
    shingling), chunk spans assembled array-side, one ``posexplode``.
    Deterministic and engine-portable (md5-derived hash), so a SQL
    oracle reproduces every span. Documents shorter than ``window``
    yield one chunk; null text is dropped.

    Output: ``(id, chunk_idx, chunk_start, chunk_len, chunk_hash)``
    with 1-based ``chunk_start`` and the portable 60-bit hash of the
    chunk text (the chunk-level dedup key).
    """
    from traits_data_spark.functions.scalars import portable_hash64
    from traits_data_spark.operators.dedup import _let

    df = df.filter(F.col(text_col).isNotNull())

    def spans(t: Column) -> Column:
        length = F.length(t)
        pos = F.when(
            length >= window, F.sequence(F.lit(window), length)
        ).otherwise(F.array().cast("array<int>"))
        is_boundary = (
            lambda p: F.conv(
                F.substring(F.md5(t.substr(p - (window - 1), F.lit(window))), 1, 7),
                16,
                10,
            ).cast("long")
            % modulus
            == 0
        )
        ends_expr = F.array_sort(
            F.array_distinct(
                F.concat(
                    F.filter(pos, is_boundary),
                    F.when(length >= 1, F.array(length)).otherwise(
                        F.array().cast("array<int>")
                    ),
                )
            )
        )

        # let-bind the boundary array: the indexed lambda reads
        # ends[i-1], and an unbound reference would recompute the
        # whole O(len) boundary scan per chunk
        def mk(ends: Column) -> Column:
            return F.transform(
                ends,
                lambda e, i: F.struct(
                    F.when(i == 0, F.lit(1))
                    .otherwise(F.try_element_at(ends, i) + 1)
                    .alias("start"),
                    e.alias("end"),
                ),
            )

        return _let(ends_expr, mk)

    out = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
        F.posexplode(_let(F.col(text_col), spans)).alias("chunk_idx", "__s"),
    )
    start = F.col("__s.start")
    clen = F.col("__s.end") - start + 1
    return out.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("chunk_start"),
        clen.cast("long").alias("chunk_len"),
        portable_hash64(F.col("__t").substr(start, clen)).alias("chunk_hash"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 500,
    overlap: int = 100,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_idx``, ``chunk_start`` (1-based)
    and ``chunk_text``. Consecutive chunks share ``overlap`` characters;
    the final chunk may be shorter. Documents shorter than
    ``chunk_chars`` yield exactly one chunk; null-text documents are
    dropped (explicitly — repair nulls upstream if they must survive).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    df = df.filter(F.col(text_col).isNotNull())
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    out = df.select(
        F.col(id_col),
        t.alias("__t"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.col("__t").substr(F.col("chunk_start"), F.lit(chunk_chars)).alias(
            "chunk_text"
        ),
    )


def pack_contiguous(
    df: DataFrame,
    weight_col: str,
    order_by: Sequence[Column | str],
    budget: int,
    partition_cols: Sequence[str] = (),
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a pack id by contiguous fill: walk rows in
    ``order_by`` order, a row joins the pack its exclusive running
    weight lands in (``floor(cumsum_before / budget)``).

    Packs average ``budget`` exactly; a row can straddle a boundary
    (its pack then exceeds budget by less than one row's weight) —
    the standard trade for a single-pass, shuffle-free-after-sort
    layout. Rows heavier than ``budget`` get a pack to themselves
    plus spill, never an error.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*partition_cols).orderBy(*cols)
    before = F.coalesce(
        F.sum(weight_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    pack = F.floor(before / F.lit(budget)).cast("long")
    if partition_cols:
        pack = F.concat_ws(
            "-", *[F.col(c).cast("string") for c in partition_cols],
            pack.cast("string"),
        )
    return df.withColumn(pack_col, pack)


def pack_best_fit(
    df: DataFrame,
    weight_col: str,
    budget: int,
    partition_cols: Sequence[str] = (),
    id_order: Sequence[str] = ("doc_id",),
    pack_col: str = "pack_id",
) -> DataFrame:
    """First-fit-decreasing bin packing: within each partition group,
    rows are sorted heaviest-first and each is placed in the FIRST
    open pack with room, opening a new pack only when none fits.
    Classic FFD guarantees ≤ 11/9·OPT + 1 packs — materially less
    padding waste than contiguous fill when weights vary, and padding
    is wasted FLOPs at training time.

    The fill order is inherently sequential, so this is the legitimate
    Python-kernel case: an Arrow-batched ``applyInPandas`` per group.
    Pass ``partition_cols`` (e.g. ``pmod(hash(id), B)``) to bound group
    size — each group is ONE task holding its rows in memory, exactly
    like ``pack_contiguous``'s window partition, and bucketing costs
    only pack numbering, never validity. With no ``partition_cols``
    the whole input is a single task (fine for tests, wrong at scale).

    Rows heavier than ``budget`` get a pack to themselves. Rows are
    re-sorted by ``(weight desc, *id_order)`` inside the kernel, so
    the result is deterministic regardless of shuffle arrival order.
    ``weight_col`` must be non-null. Returns the input plus
    ``pack_col`` (bucket-prefixed string when partitioned, else the
    bin index as a long — the ``pack_contiguous`` contract).
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    keys = list(partition_cols)
    ids = [c for c in id_order if c not in keys]
    out_schema = StructType(
        df.schema.fields + [StructField("__bin", LongType(), False)]
    )

    def _ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [weight_col, *ids],
            ascending=[False] + [True] * len(ids),
            kind="mergesort",
        ).reset_index(drop=True)
        caps: list[int] = []
        assign: list[int] = []
        for wt in pdf[weight_col]:
            placed = -1
            for i, cap in enumerate(caps):
                if cap >= wt:
                    placed = i
                    caps[i] = cap - wt
                    break
            if placed < 0:
                caps.append(budget - wt)
                placed = len(caps) - 1
            assign.append(placed)
        pdf["__bin"] = pd.array(assign, dtype="int64")
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy()
    out = grouped.applyInPandas(_ffd, schema=out_schema)
    if keys:
        pack = F.concat_ws(
            "-",
            *[F.col(c).cast("string") for c in keys],
            F.col("__bin").cast("string"),
        )
    else:
        pack = F.col("__bin")
    return out.withColumn(pack_col, pack).drop("__bin")
