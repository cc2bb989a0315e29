"""Window operators: last-N ranking, deterministic dedup, sequence
numbering (SURVEY.md §2.5 W1-W3, §2.4 A7/A8).

Scale note: every helper here is a single ``Window.partitionBy`` — one
shuffle on the partition keys, no join-back. Spark's window exec sorts
within partitions only; with AQE enabled skewed partition keys are
split at runtime.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def with_group_rank(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    rank_col: str = "rnk",
    use_rank: bool = True,
) -> DataFrame:
    """Attach a per-group rank.

    ``use_rank=True`` reproduces the reference's last-N semantics
    exactly: it uses ``rank()`` (ties share a rank, so a tie at the
    boundary admits >N rows — ADAPTERS/SILVER-adapter-wyscout.py:439-442),
    not ``row_number()``. Pass ``use_rank=False`` for strict top-N.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    fn = F.rank() if use_rank else F.row_number()
    return df.withColumn(rank_col, fn.over(w))


def last_n_filter(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    n: int,
    use_rank: bool = True,
) -> DataFrame:
    """Keep each group's last N rows by descending ``order_col`` —
    the "last four / last eight games" views (W1).
    """
    ranked = with_group_rank(
        df, partition_by, [F.col(order_col).desc()], "__rnk", use_rank
    )
    return ranked.filter(F.col("__rnk") <= n).drop("__rnk")


def dedup_keep_best(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Deterministic one-row-per-key dedup: ``row_number()==1`` over an
    explicit ordering.

    Replaces the reference's nondeterministic
    ``dropDuplicates(['profileId'])`` (author-acknowledged at
    ADAPTERS/SILVER-adapter-wyscout.py:458-459) and pandas
    ``drop_duplicates(keep='first')`` /
    ``groupby(...).idxmax()`` keep-max-row
    (DEPRECATED/statsbomb-silver.py:222-224). Callers must pass a
    total order (include a unique tiebreak column).
    """
    w = Window.partitionBy(*keys).orderBy(*_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def filter_small_groups(
    df: DataFrame,
    keys: Sequence[str],
    min_rows: int,
) -> DataFrame:
    """P9: drop every group with fewer than ``min_rows`` rows — the
    reference's small-season skip guard
    (LOADERS/GOLD-data-loader.py:437-443), expressed as a window count
    so no driver-side count()/collect() is needed: the guard runs
    inside the plan, per group, in one shuffle.
    """
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__grp_n", F.count(F.lit(1)).over(w))
        .filter(F.col("__grp_n") >= min_rows)
        .drop("__grp_n")
    )


def rolling_range_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: Column | str,
    preceding: int,
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Rolling aggregates over a value-range frame: for each row, every
    agg in ``aggs`` is computed over the partition's rows whose
    ``order_col`` lies in ``[row - preceding, row]`` — the "last 7
    days per customer" feature family.

    ``order_col`` must be numeric (epoch day / epoch seconds): a
    RANGE frame over an integer key is engine-portable and immune to
    the timezone traps of interval frames. Rows that tie on
    ``order_col`` are frame peers, so results are deterministic even
    when the ordering is not total.

    One shuffle on the partition keys; the frame is evaluated with a
    sliding aggregate inside the sorted partition (no self-join, no
    row explosion — contrast a ``t BETWEEN t-7d AND t`` range
    self-join which at 100 TB multiplies every row by its window).
    """
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(c)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return df.withColumns({name: expr.over(w) for name, expr in aggs.items()})


def cumcount(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str = "seq",
) -> DataFrame:
    """0-based per-group sequence number — pandas ``groupby.cumcount``
    (DEPRECATED/statsbomb-gold-temp-v2.py:297-300), used to suffix
    multi-competition duplicates.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    return df.withColumn(out_col, F.row_number().over(w) - F.lit(1))
