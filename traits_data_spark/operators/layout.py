"""Data-layout clustering for scan pruning (z-order).

Parquet readers skip row groups / files whose column min-max ranges
exclude the predicate. That only works if the write CLUSTERED the
data: a table range-sorted on one column prunes on that column only;
interleaving the bits of several columns (Morton / z-order curve)
gives every interleaved column locality, so multi-dimensional point
and range predicates prune files. This is the same layout move as
Delta's OPTIMIZE ZORDER BY, as plain open-Spark: compute the z-value
expression, ``repartitionByRange`` + in-partition sort on it, write.

The z-value is pure bit arithmetic — deterministic, engine-portable
(``zvalue_sql`` emits the identical formula for a SQL oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zvalue(cols: Sequence[Column | str], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``bits`` low bits of each column into one long.

    Inputs must be non-negative ints < 2**bits — bucketize raw values
    first (e.g. ``F.ntile`` ranks or fixed-width bins); z-order
    locality is about relative ordering, not exact values. With k
    columns the result uses k*bits bits, so k*bits must stay < 63.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflows a signed long")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, b * k + i)
    return out


def zvalue_sql(cols: Sequence[str], bits: int = DEFAULT_BITS) -> str:
    """The identical z-value formula as ANSI-ish SQL (DuckDB/Trino
    operators) for oracles and cross-engine reconciliation."""
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write parquet clustered on the z-order curve of ``zorder_by``.

    ``repartitionByRange`` on the z-value puts neighboring curve
    positions in the same file; the in-partition sort tightens each
    row group's min-max spans. One range-exchange (sampled
    boundaries), fully parallel — no global sort bottleneck.
    """
    z = zvalue(zorder_by, bits=bits).alias("__z")
    parted = (
        df.withColumn("__z", z).repartitionByRange(num_files, "__z")
        if num_files
        else df.withColumn("__z", z).repartitionByRange("__z")
    )
    (
        parted.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def balanced_shards(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """EXACTLY-balanced, semantically-contiguous shard assignment —
    the embedding-space layout step downstream of ``kmeans_clusters``:
    order rows by ``(cluster, id)`` conceptually and chunk that order
    into ``n_shards`` equal slices (sizes differ by at most 1), so
    semantic neighbours co-locate in the same output shard (the layout
    a curriculum sampler or a shard-local near-dup pass wants) while
    shard sizes stay perfectly even (what the write path wants — no
    straggler files). Same layout move as ``write_zordered``, with the
    cluster id as the 1-D locality key.

    NO corpus-wide total order exists in the plan (the
    ``sampled_quantiles`` discipline): per-cluster counts (a k-row
    frame) cumulative-sum into cluster offsets in a k-row window, each
    row ranks WITHIN its cluster (``row_number`` partitioned by
    cluster — parallel across clusters), and the global position is
    ``offset + rank``. ``shard = (pos * n_shards) DIV total`` is
    integer arithmetic, engine-exact. A severely skewed cluster makes
    its within-cluster sort one task — at that point the cluster id
    itself is the skew problem and k should grow; the id-order within
    a cluster is only a determinism tie-break, not a semantic
    contract.

    Output: input columns plus ``shard_col`` (0-based BIGINT).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    counts = (
        df.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__csz"))
    )
    w_off = (
        Window.orderBy(F.col(cluster_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        cluster_col,
        (F.sum("__csz").over(w_off) - F.col("__csz")).alias("__off"),
    )
    total = counts.agg(F.sum("__csz").cast("long").alias("__tot"))
    w_rn = Window.partitionBy(cluster_col).orderBy(F.col(id_col).asc())
    # null-safe offset join: a NULL cluster is a legitimate group
    # (groupBy and the rank window both treat it as one) and an
    # equi-join would silently DROP those rows while the total still
    # counted them — breaking both "every row gets a shard" and the
    # exact-balance contract. NULL sorts first in the offset window,
    # so the NULL group occupies the leading shard slots.
    return (
        df.withColumn("__rn", F.row_number().over(w_rn).cast("long"))
        .join(
            F.broadcast(offsets.withColumnRenamed(cluster_col, "__bs_c")),
            F.col(cluster_col).eqNullSafe(F.col("__bs_c")),
        )
        .drop("__bs_c")
        .crossJoin(F.broadcast(total))
        .withColumn(
            shard_col,
            F.expr(
                f"((__off + __rn - 1) * {int(n_shards)}) DIV __tot"
            ).cast("long"),
        )
        .drop("__rn", "__off", "__tot")
    )
