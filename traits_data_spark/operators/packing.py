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
