"""The gold ratings pipeline (SURVEY.md §3 E2) as one Spark plan.

Reference: LOADERS/GOLD-data-loader.py — single-node pandas, per-season
jobs (the authors' acknowledged chokepoint). Here: eligibility filters →
windowed z-scores (sample std, null/zero-variance/inverse rules) →
weights-hierarchy rollup as column expressions. No collect, no
join-backs; the only shuffle is the z-score window partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traits_data_spark.operators.ratings import WeightsHierarchy
from traits_data_spark.operators.zscore import group_zscores


@dataclass
class GoldSpec:
    """Gold build configuration (defaults mirror the reference).

    ``norm_group_cols``: z-score population grouping — reference uses
    (positionGroup, competitionName, seasonName)
    (GOLD-data-loader.py:446-448).
    ``min_sample_size`` / ``min_minutes``: eligibility thresholds
    (sampleSize >= 3.5, totalMinutesInSample >= 300 — :74-75,434).
    ``exclude_from_stats``: predicate SQL for rows excluded from the
    normalization population but still scored (ANY rows, non-season
    periods).
    """

    norm_group_cols: Sequence[str] = field(
        default_factory=lambda: ["positionGroup", "competitionName", "seasonName"]
    )
    pos_col: str = "positionGroup"
    any_label: str = "ANY"
    sample_size_col: str = "sampleSize"
    minutes_col: str = "totalMinutesInSample"
    min_sample_size: float = 3.5
    min_minutes: float = 300.0
    period_col: str | None = "aggregationPeriod"
    stats_period: str = "season"
    round_to: int = 2


def eligibility_filter(df: DataFrame, spec: GoldSpec) -> DataFrame:
    """P6: sample-size + minutes thresholds."""
    return df.filter(
        (F.col(spec.sample_size_col) >= F.lit(spec.min_sample_size))
        & (F.col(spec.minutes_col) >= F.lit(spec.min_minutes))
    )


def stats_population(spec: GoldSpec) -> Column:
    """Rows contributing to group mean/std: non-ANY, season-period."""
    cond = F.col(spec.pos_col) != F.lit(spec.any_label)
    if spec.period_col is not None:
        cond = cond & (F.col(spec.period_col) == F.lit(spec.stats_period))
    return cond


def build_ratings(
    df: DataFrame,
    weights: WeightsHierarchy,
    spec: GoldSpec | None = None,
    stat_cols: Sequence[str] | None = None,
    apply_eligibility: bool = True,
) -> DataFrame:
    """silver profiles → z-scores → metrics/traits/Rating."""
    spec = spec or GoldSpec()
    if stat_cols is None:
        stat_cols = sorted({r.stat_name for r in weights.rows})
    out = eligibility_filter(df, spec) if apply_eligibility else df
    out = group_zscores(
        out,
        group_cols=list(spec.norm_group_cols),
        stat_cols=list(stat_cols),
        inverse_stats=weights.inverse_stats(),
        eligible=stats_population(spec),
        prefix="zs_",
    )
    return weights.apply(
        out, pos_col=spec.pos_col, zscore_prefix="zs_", round_to=spec.round_to
    )
