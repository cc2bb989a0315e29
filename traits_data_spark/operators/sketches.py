"""Engine-portable cardinality sketches.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
right default for pure estimation at cluster scale — but its register
layout is engine-private, so the estimate is not reproducible by a
SQL oracle, not comparable across engines, and not stable across
Spark versions. KMV (k-minimum-values, Bar-Yossef et al. 2002) gives
a deterministic alternative: hash every value with the portable
60-bit md5 hash, keep the k smallest distinct hashes per group, and
estimate ``(k-1) * 2^60 / h_k``. Any engine that can sort and hash
recomputes the identical estimate bit-for-bit.

Scale notes: the first shuffle is a map-side-combined distinct on
``(group, hash)`` — the same cost HLL pays to see each value once.
The second shuffle moves only distinct hashes to rank them; when the
per-group distinct cardinality itself is huge, prefer
``approx_count_distinct`` (no second shuffle, fixed-size state) and
reserve KMV for where reproducibility is part of the contract
(correctness gates, cross-engine reconciliation, incremental sketch
files).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.functions.scalars import portable_hash64

HASH_BITS = 60
HASH_SPACE = float(2**HASH_BITS)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    est_col: str = "distinct_est",
    exact_col: str = "n_distinct",
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Output: one row per group with ``exact_col`` (the exact count of
    distinct hashes — collision-free in practice at 60 bits) and
    ``est_col`` (the KMV estimate, = exact when the group has fewer
    than ``k`` distinct values). Keeping both makes estimate quality
    visible and oracle-checkable.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    hashed = df.select(*group_cols, h.alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = hashed.withColumn("__rn", F.row_number().over(w))
    # (k-1) * 2^60 has <= ~6+60 bits but only len(bin(k-1)) significant
    # bits, so the double literal is exact for any small k.
    scale = F.lit(float(k - 1) * HASH_SPACE)
    kth = F.max(F.when(F.col("__rn") == k, F.col("__h")))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(exact_col),
        kth.alias("__kth"),
    )
    est = (
        F.when(F.col(exact_col) < k, F.col(exact_col))
        .otherwise(F.floor(scale / F.col("__kth")).cast("long"))
        .alias(est_col)
    )
    return agg.select(*group_cols, F.col(exact_col), est)
