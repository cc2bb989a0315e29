"""Pipeline invariant checks (SURVEY.md §5).

The reference enforces correctness with inline runtime assertions
(uniqueness of profileId — GOLD-data-loader.py:423-424; dtype asserts —
:549-563; distribution sanity — statsbomb-gold-temp-v2.py:442-449;
row-multiplicity — SILVER-adapter-wyscout.py:274-287). Each becomes a
reusable check that computes its violation count in ONE aggregation
(no collect of data rows; only scalar counts come to the driver).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(AssertionError):
    pass


def assert_unique_key(df: DataFrame, keys: Sequence[str], name: str = "") -> None:
    """PK uniqueness: no key group with >1 row."""
    dupes = (
        df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dupes:
        raise QualityError(f"{name or keys}: duplicate keys found")


def assert_max_multiplicity(
    df: DataFrame, keys: Sequence[str], max_rows: int, name: str = ""
) -> None:
    """Row-multiplicity bound (≤2 rows per player-match after the ANY
    union, etc.)."""
    over = (
        df.groupBy(*keys).count().filter(F.col("count") > max_rows).limit(1).count()
    )
    if over:
        raise QualityError(f"{name or keys}: multiplicity > {max_rows}")


def assert_not_null(df: DataFrame, cols: Sequence[str], name: str = "") -> None:
    conds = [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in cols]
    row = df.agg(*conds).first()
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise QualityError(f"{name}: nulls present: {bad}")


def assert_distribution(
    df: DataFrame, col: str, sigma_band: float = 4.0, name: str = ""
) -> None:
    """Std > 0 and min/max within ±sigma_band standard deviations
    (DEPRECATED/statsbomb-gold-temp-v2.py:442-449)."""
    row = df.agg(
        F.avg(col).alias("mu"),
        F.stddev_samp(col).alias("sd"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    ).first()
    if row["sd"] is None or row["sd"] <= 0:
        raise QualityError(f"{name or col}: zero/undefined variance")
    lo_band = row["mu"] - sigma_band * row["sd"]
    hi_band = row["mu"] + sigma_band * row["sd"]
    if row["lo"] < lo_band or row["hi"] > hi_band:
        raise QualityError(
            f"{name or col}: values outside ±{sigma_band}σ "
            f"([{row['lo']}, {row['hi']}] vs [{lo_band}, {hi_band}])"
        )


def null_zero_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """%NA and %zero per column (A11) as one aggregation."""
    n = F.count(F.lit(1))
    aggs = []
    for c in cols:
        aggs.append(
            (F.sum(F.col(c).isNull().cast("int")) / n * 100).alias(f"pct_null_{c}")
        )
        aggs.append(
            (F.sum((F.col(c) == 0).cast("int")) / n * 100).alias(f"pct_zero_{c}")
        )
    return df.agg(*aggs)


def percentile_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.95),
    approx: bool = False,
) -> DataFrame:
    """Per-group percentiles of ``value_col`` — the distribution-sanity
    profile as data (``assert_distribution`` is the hard-fail form).

    Exact ``percentile`` buffers each group's values for a full sort —
    fine for bounded group cardinality × group size; at 100 TB pass
    ``approx=True`` for t-digest ``approx_percentile`` (mergeable,
    bounded memory, no exact-sort barrier). Exact linear interpolation
    is bit-identical to DuckDB's ``quantile_cont``, so only the exact
    form is oracle-checked.
    """
    fn = "approx_percentile" if approx else "percentile"
    aggs = [
        F.expr(f"{fn}({value_col}, {p})").alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def summarize(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """One-pass table profile: a row per column with null count,
    approximate distinct count (HLL++, ``approx_rsd`` relative error),
    and min/max rendered as strings (type-heterogeneous columns can't
    share a typed column).

    The ANALYZE-TABLE move for pipeline debugging at scale: every
    statistic is computed in a SINGLE aggregation over one scan — never
    one job per column — and only ncols scalar rows reach the driver.
    For engine-portable (oracle-checkable) cardinalities use
    ``operators.sketches.kmv_distinct`` per column instead.
    """
    dtypes = dict(df.dtypes)
    aggs = []
    for c in df.columns:
        col = F.col(c)
        # map columns are not orderable/hashable — profile nulls only
        plain = not dtypes[c].startswith("map")
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"__n_{c}"),
                F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"),
                (
                    F.approx_count_distinct(c, approx_rsd)
                    if plain
                    else F.lit(None).cast("long")
                ).alias(f"__dist_{c}"),
                (F.min(col).cast("string") if plain else F.lit(None)).alias(
                    f"__min_{c}"
                ),
                (F.max(col).cast("string") if plain else F.lit(None)).alias(
                    f"__max_{c}"
                ),
            ]
        )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("approx_distinct"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
        )
        for c in df.columns
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
