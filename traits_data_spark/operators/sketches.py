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
    visible and oracle-checkable. NULL values are ignored, so a group
    whose values are ALL null is absent from the output (join a
    distinct-group frame back if empty groups must appear as 0).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    # NULL values are ignored (see kmv_set_ops: a null hash ranks
    # first on Spark, last on DuckDB — cross-engine divergence)
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
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


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise distinct-set algebra between groups from mergeable KMV
    sketches: for every group pair ``(a, b)`` with ``a < b``, estimate
    ``union_distinct`` and ``intersect_distinct`` WITHOUT touching the
    raw values again — the k-min sketches merge by taking the k
    smallest of the concatenation (the theta-sketch identity), and the
    intersection estimate is the fraction of merged minima present in
    both sketches times the union estimate. This is what HLL cannot do
    (HLL only unions); ``(distinct users shared by two event types)``
    is the canonical ask.

    Returns ``(group_a, group_b, union_distinct, intersect_distinct,
    jaccard_k)``; the union falls back to the exact distinct count when
    the merged sketch holds fewer than ``k`` minima (small groups), so
    small-pair results are exact — and all arithmetic is the same
    floor-division form ``kmv_distinct`` uses, reproducible by a SQL
    oracle. NULL values are ignored (a group with only nulls carries
    no sketch and appears in no pair).

    Scale shape: ONE shuffle builds the per-group sketches (row_number
    window on the group key, k rows kept per group); the pairwise join
    runs on one k-array row per group — |G|² pairs of k-length arrays,
    driver-free and broadcastable for any realistic group count.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    # NULL values are ignored: a null hash would sort FIRST in the
    # Spark window (consuming a sketch slot) but drop out of
    # collect_list, silently shrinking the sketch to k-1 minima — and
    # DuckDB sorts NULLs LAST, so the engines would disagree
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(group_col, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("__h")
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("__h")).alias("__mins"))
        .persist()  # consumed by BOTH pair sides — one sketch build
    )
    a = sk.select(F.col(group_col).alias("group_a"), F.col("__mins").alias("__ma"))
    b = sk.select(F.col(group_col).alias("group_b"), F.col("__mins").alias("__mb"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__ma"), F.col("__mb")))),
        1,
        k,
    )
    scale = F.lit(float(k - 1) * HASH_SPACE)
    out = (
        pairs.withColumn("__m", merged)
        .withColumn("__msz", F.size("__m"))
        .withColumn(
            "__match",
            F.size(
                F.array_intersect(
                    F.col("__m"), F.array_intersect("__ma", "__mb")
                )
            ),
        )
        .withColumn(
            "union_distinct",
            F.when(F.col("__msz") < k, F.col("__msz").cast("long")).otherwise(
                F.floor(scale / F.try_element_at("__m", F.lit(k))).cast("long")
            ),
        )
        .withColumn(
            "intersect_distinct",
            F.expr("CAST(__match AS BIGINT) * union_distinct DIV __msz"),
        )
        .withColumn(
            "jaccard_k",
            F.round(
                F.col("__match").cast("double") / F.col("__msz"), 6
            )
            + F.lit(0.0),
        )
    )
    return out.select(
        "group_a", "group_b", "union_distinct", "intersect_distinct", "jaccard_k"
    )


# ---------------------------------------------------------------------------
# HyperLogLog with portable registers
# ---------------------------------------------------------------------------

# Register max()s are order-independent, and the raw-estimate division
# is computed from exact integers, so — unlike Spark's built-in
# approx_count_distinct, whose HLL++ register layout is engine-private
# — this sketch is reproducible bit-for-bit by any SQL engine
# (merge-able too: max() over register tables unions sketches).
_HLL_P = 6                       # 2^6 = 64 registers
_HLL_M = 1 << _HLL_P
_HLL_ALPHA_M = 0.709             # Flajolet et al. 2007, alpha for m=64
_HLL_REM_BITS = HASH_BITS - _HLL_P   # 54 low bits feed the rho count
_HLL_SCALE_BITS = 48             # sum(2^-reg) tracked as sum(2^(48-reg))


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    reg_col: str = "register",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group HyperLogLog register table (64 registers of
    leading-zero ranks from the portable 60-bit hash).

    Output: ``group_cols + [bucket_col, reg_col]`` — exactly
    ``2^p`` rows per group, zero-filled for empty buckets so register
    tables from different partitions/engines union by ``max()``.

    rho (the rank) is computed from the *bit length* of the low 54
    hash bits via the engine-portable ``bin()`` string — no
    floating-point log2, whose boundary rounding differs per libm.

    Scale: one map-side-combined ``max`` aggregate on
    ``(group, bucket)`` — fixed 64-rows-per-group state, the same
    sketch shape approx_count_distinct maintains internally. The
    zero-fill join is a broadcast of ``group × 64``.
    """
    h = portable_hash64(F.col(value_col).cast("string"))
    rem = F.pmod(h, F.lit(1 << _HLL_REM_BITS))
    rho = (
        F.when(rem == 0, F.lit(_HLL_REM_BITS + 1))
        .otherwise(F.lit(_HLL_REM_BITS) - (F.length(F.bin(rem)) - F.lit(1)))
        .cast("int")
    )
    hashed = df.select(
        *group_cols,
        (h - rem).cast("long").alias("__top"),
        rho.alias("__rho"),
    ).withColumn(bucket_col, F.expr(f"__top DIV {1 << _HLL_REM_BITS}").cast("int"))
    regs = hashed.groupBy(*group_cols, bucket_col).agg(
        F.max("__rho").alias(reg_col)
    )
    groups = df.select(*group_cols).distinct()
    buckets = groups.crossJoin(
        F.broadcast(
            regs.sparkSession.range(_HLL_M).select(
                F.col("id").cast("int").alias(bucket_col)
            )
        )
    )
    # null-safe equality on the group keys: a NULL group (e.g. a NULL
    # source) must still collect its registers — a plain equality join
    # would zero-fill it regardless of true cardinality
    cond = F.col(f"__b.{bucket_col}") == F.col(f"__r.{bucket_col}")
    for g in group_cols:
        cond = cond & F.col(f"__b.{g}").eqNullSafe(F.col(f"__r.{g}"))
    return (
        buckets.alias("__b")
        .join(regs.alias("__r"), cond, "left")
        .select(
            *[F.col(f"__b.{g}").alias(g) for g in group_cols],
            F.col(f"__b.{bucket_col}").alias(bucket_col),
            F.coalesce(F.col(f"__r.{reg_col}"), F.lit(0))
            .cast("int")
            .alias(reg_col),
        )
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    reg_col: str = "register",
    est_col: str = "distinct_est",
) -> DataFrame:
    """Collapse a register table to the raw HLL estimate
    ``alpha_m * m^2 / sum(2^-reg)``.

    The harmonic sum is tracked as ``sum(2^(48-min(reg,48)))`` — an
    exact BIGINT, order-independent — so the estimate is ONE division
    of exact integers scaled by a literal constant: bit-identical on
    every engine. The estimate floor()s to a BIGINT (matching
    kmv_distinct's output contract). No small-range correction: that
    needs ln(), which is libm-dependent; pair with kmv_distinct when
    the cardinality is tiny.
    """
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"{_HLL_SCALE_BITS} - least({reg_col}, {_HLL_SCALE_BITS}))"
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("__sum_scaled"),
        F.sum(F.when(F.col(reg_col) == 0, 1).otherwise(0)).alias("zero_registers"),
    )
    num = F.lit(_HLL_ALPHA_M * _HLL_M * _HLL_M * float(1 << _HLL_SCALE_BITS))
    return agg.select(
        *group_cols,
        "zero_registers",
        F.col("__sum_scaled").alias("sum_scaled"),
        F.floor(num / F.col("__sum_scaled")).cast("long").alias(est_col),
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------


def _cms_cells(value_col: str, depth: int, width: int):
    """The (row, bucket) cell array a value hashes into — shared by the
    sketch build and the probe path so the two can never drift."""
    v = F.col(value_col).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    portable_hash64(F.concat(F.lit(f"{i}:"), v)), F.lit(width)
                )
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a value
    column: a ``depth × width`` counter grid where row ``i`` buckets
    each value by the portable 60-bit hash of ``"i:value"``.

    Returns ``(row, bucket, cnt)`` — only occupied cells (missing
    cells are zero). Counters are BIGINT sums, so sketches merge by
    adding cells and the whole structure is order-independent and
    engine-portable (same reproducibility contract as
    ``hll_registers`` / ``kmv_distinct``).

    Scale: ONE map-side-combined aggregate with at most
    ``depth · width`` cells of state per partition — frequency
    estimation over a 100 TB corpus without shuffling its distinct
    values (exact heavy-hitter counting shuffles every distinct term;
    this shuffles ≤ depth·width rows per partition, with the skew of
    the hottest terms absorbed by the partial aggregation).
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(
            F.explode(_cms_cells(value_col, depth, width)).alias("__c"),
            w.alias("__w"),
        )
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    est_col: str = "est_count",
) -> DataFrame:
    """Estimate each probe value's frequency from a count-min sketch:
    ``min`` over the depth rows of the counter each row hashes the
    value into. Guarantees ``estimate >= true count`` (one-sided
    error); the sketch is broadcast, so probing never shuffles the
    probe side.
    """
    melted = probes.select(
        "*", F.explode(_cms_cells(value_col, depth, width)).alias("__c")
    ).select("*", F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    joined = melted.join(F.broadcast(sketch), ["row", "bucket"], "left")
    keys = [c for c in probes.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col))
    )


# ---------------------------------------------------------------------------
# Deterministic hash-sampled quantiles
# ---------------------------------------------------------------------------


def _q_label(q: float) -> str:
    """Exact, collision-free column label for a quantile: percent with
    any fractional part kept ('p50', 'p99', 'p99_9', 'p0_4') — naive
    int(round(q*100)) would alias 0.999 and 1.0 both to 'p100'."""
    pct = format(q * 100, ".10g")
    if "." in pct:
        pct = pct.rstrip("0").rstrip(".")
    return pct.replace(".", "_").replace("-", "m")


def sampled_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    rate_bp: int = 1000,
    prefix: str = "p",
) -> DataFrame:
    """Per-group discrete quantiles from a deterministic hash sample —
    the engine-portable alternative to ``approx_percentile``, whose
    GK/KLL sketch state (like HLL++'s registers) is engine-private and
    non-reproducible.

    Rows whose ``portable_hash64(key) % 10000 < rate_bp`` survive (a
    deterministic uniform sample keyed on ``key_col``; basis points,
    so ``rate_bp=1000`` keeps 10%). Each requested quantile ``q`` is
    the sample value at 1-based rank ``floor(q*(n-1)) + 1`` under
    ``(value, key)`` ordering — discrete selection of an actual data
    value, so no interpolation arithmetic can diverge across engines.
    Samples merge by union (the hash predicate is stable), so sketches
    from different days/partitions compose.

    Scale: the corpus-sized stage is a scan + hash filter (no
    shuffle); only the sample (rate_bp/10000 of the data) shuffles
    into the per-group sort window. ``n_sample`` is emitted so
    downstream can judge estimate quality per group.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if not 0 < rate_bp <= 10_000:
        raise ValueError("rate_bp must be in (0, 10000]")
    sample = df.select(
        *group_cols, F.col(value_col).alias("__v"), F.col(key_col).alias("__k")
    )
    if rate_bp < 10_000:
        # at rate_bp=10000 the predicate is vacuously true — skip the
        # corpus-wide hash pass entirely (exact full-data quantiles)
        h = F.pmod(
            portable_hash64(F.col(key_col).cast("string")), F.lit(10_000)
        )
        sample = df.filter(h < rate_bp).select(
            *group_cols,
            F.col(value_col).alias("__v"),
            F.col(key_col).alias("__k"),
        )
    w = Window.partitionBy(*group_cols).orderBy("__v", "__k")
    ranked = sample.withColumn("__rn", F.row_number().over(w))
    # rank selection needs the group size alongside each row; the
    # unordered count window rides the same partitioning as the sort
    # window (one exchange total)
    counted = ranked.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    sel = [
        F.max(
            F.when(
                F.col("__rn")
                == F.floor(F.lit(float(q)) * (F.col("__n") - 1)).cast("long") + 1,
                F.col("__v"),
            )
        ).alias(f"{prefix}{_q_label(q)}")
        for q in quantiles
    ]
    return counted.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sample"), *sel
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int = 32,
    bin_col: str = "bin",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Per-group equi-width histogram over an integer-valued column
    (pre-scale floats to cents/micros upstream): ``bin = (v - lo) DIV
    width`` clamped to ``[0, n_bins)`` so under/overflow lands in the
    edge bins.

    Integer-exact end to end — ``hi - lo`` must divide evenly by
    ``n_bins`` so the bin width is a whole number and no engine ever
    touches a float. Only occupied cells are returned; histograms
    merge by summing ``cnt`` per (group, bin), the same add-merge
    contract as ``count_min_sketch``.

    Scale: ONE map-side-combined aggregate with ≤ ``n_bins`` cells of
    state per group per partition — the distribution profile of a
    100 TB column for the cost of a scan. Pair with
    ``sampled_quantiles`` when exact quantile values (not densities)
    are needed.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if hi <= lo or (hi - lo) % n_bins:
        raise ValueError("hi - lo must be positive and divisible by n_bins")
    width = (hi - lo) // n_bins
    bin_ = F.least(
        F.greatest(
            F.expr(f"(CAST({value_col} AS BIGINT) - {lo}) DIV {width}"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(*group_cols, bin_.alias(bin_col))
        .groupBy(*group_cols, bin_col)
        .agg(F.count(F.lit(1)).alias(cnt_col))
    )
