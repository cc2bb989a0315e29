"""Group z-score normalization with the reference's edge semantics
(SURVEY.md §2.5 W2, §2.8 D5).

Reference behavior (LOADERS/GOLD-data-loader.py:219-234,446-448,466-471):
per (positionGroup, competitionName, seasonName) mean/std — *sample*
std (pandas default ddof=1 → Spark ``stddev_samp``) — then per row
``(x - mean) / std`` with:

- null value        → 0
- zero/1-row std    → 0 (NaN→0 fill in the reference)
- inverse stats     → multiplied by -1

The mean/std population can be restricted (the reference excludes
``positionGroup == 'ANY'`` rows and non-season aggregation periods from
the statistics while still scoring every row). We express that as
*conditional aggregation inside the window* —
``avg(when(eligible, x)) over w`` — which computes group statistics
over eligible rows only and scores all rows in ONE pass: one shuffle,
no stats join-back, no pandas row-wise apply. This is the engine's
single biggest physical win over the reference (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zscore_expr(
    value: Column,
    mean: Column,
    std: Column,
    inverse: bool = False,
) -> Column:
    """The null→0 / zero-variance→0 / inverse ladder as one expression."""
    z = F.when(value.isNull(), F.lit(0.0)).otherwise(
        F.when(
            std.isNull() | (std == 0) | F.isnan(std), F.lit(0.0)
        ).otherwise((value - mean) / std)
    )
    return (z * F.lit(-1.0)) if inverse else z


def group_zscores(
    df: DataFrame,
    group_cols: Sequence[str],
    stat_cols: Sequence[str],
    inverse_stats: Sequence[str] = (),
    eligible: Column | None = None,
    prefix: str = "zs_",
    population: bool = False,
) -> DataFrame:
    """Append ``{prefix}{stat}`` z-score columns for each stat.

    ``eligible`` restricts which rows contribute to the group mean/std
    (all rows are still scored). ``population=True`` switches to
    ``stddev_pop`` (ddof=0) to reproduce the deprecated scipy path
    (SURVEY.md §7.3 ddof caveat); the production path is sample std.
    """
    w = Window.partitionBy(*group_cols)
    std_fn = F.stddev_pop if population else F.stddev_samp
    inv = set(inverse_stats)
    new_cols = {}
    for stat in stat_cols:
        x = F.col(stat)
        contrib = F.when(eligible, x) if eligible is not None else x
        mean = F.avg(contrib).over(w)
        std = std_fn(contrib).over(w)
        new_cols[prefix + stat] = zscore_expr(x, mean, std, inverse=stat in inv)
    return df.withColumns(new_cols)


def group_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    stat_cols: Sequence[str],
    population: bool = False,
) -> DataFrame:
    """Standalone per-group mean/std table (A4) for when the stats
    themselves are the product (diagnostics, drift checks)."""
    std_fn = F.stddev_pop if population else F.stddev_samp
    aggs = []
    for stat in stat_cols:
        aggs.append(F.avg(stat).alias(f"mean_{stat}"))
        aggs.append(std_fn(stat).alias(f"std_{stat}"))
    return df.groupBy(*group_cols).agg(*aggs)
