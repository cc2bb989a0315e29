"""The silver profile pipeline — the reference's flagship query shape
(SURVEY.md §3 E1, steps 6-15), provider-agnostic.

Input: a long fact table (one row per entity per event/match).
Output: one row per (profile × aggregationPeriod) with feature-store
aggregates, where profile = entity keys × coarse-group and periods are
{season, last_four, last_eight} (last-N by rank over a descending order
column, with ``rank()`` tie semantics preserved —
ADAPTERS/SILVER-adapter-wyscout.py:439-448).

Two physical strategies:

- ``multi_pass`` (reference-shaped): persist the fact frame, run the
  generated aggregation 3× (full / rank<=4 / rank<=8), unionByName.
  3 shuffles over the same input.
- ``explode`` (Spark-first, default): compute the rank once, attach an
  array of the periods each row belongs to, ``explode`` it, and run ONE
  aggregation grouped by (profile, period). One window shuffle + one
  agg shuffle regardless of how many periods are defined — at 100 TB
  this replaces P full-input aggregations with one 3×-row aggregation
  whose map-side combine collapses it back to |profiles|×P rows before
  the exchange. Results are row-identical to multi_pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import FeatureStore
from traits_data_spark.functions.scalars import surrogate_key
from traits_data_spark.operators.any_union import union_with_coarse_group
from traits_data_spark.operators.windows import dedup_keep_best


@dataclass
class ProfileSpec:
    """Configuration of the profile build.

    ``entity_cols``: id columns concatenated into the profile key
    (reference: playerId, teamId, seasonId, competitionId).
    ``group_col``: the coarse-group column duplicated as ``any_label``
    (reference: positionGroup).
    ``order_col``: descending recency order for last-N windows
    (reference: matchId).
    ``playtime_col``/``playtime_threshold``: eligibility predicate
    ``playtime > threshold OR group == any_label``
    (ADAPTERS/SILVER-adapter-wyscout.py:301-303).
    ``periods``: name → N (None = all rows / "season").
    """

    entity_cols: Sequence[str]
    group_col: str
    order_col: str
    playtime_col: str | None = None
    playtime_threshold: float = 33.0
    any_label: str = "ANY"
    profile_col: str = "profileId"
    period_col: str = "aggregationPeriod"
    periods: Mapping[str, int | None] = field(
        default_factory=lambda: {"season": None, "last_four": 4, "last_eight": 8}
    )
    use_rank: bool = True  # rank() tie semantics, not row_number()


def _prepare(df: DataFrame, spec: ProfileSpec) -> DataFrame:
    """ANY-union, playtime filter, profile key synthesis."""
    out = union_with_coarse_group(df, {spec.group_col: spec.any_label})
    if spec.playtime_col is not None:
        out = out.filter(
            (F.col(spec.playtime_col) > F.lit(spec.playtime_threshold))
            | (F.col(spec.group_col) == F.lit(spec.any_label))
        )
    return out.withColumn(
        spec.profile_col, surrogate_key(*spec.entity_cols, spec.group_col)
    )


def _ranked(df: DataFrame, spec: ProfileSpec) -> DataFrame:
    w = Window.partitionBy(spec.profile_col).orderBy(F.col(spec.order_col).desc())
    fn = F.rank() if spec.use_rank else F.row_number()
    return df.withColumn("__rnk", fn.over(w))


def build_profiles(
    df: DataFrame,
    features: FeatureStore,
    spec: ProfileSpec,
    extra_aggs: Sequence[Column] = (),
    strategy: str = "explode",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Fact rows → (profileId, aggregationPeriod, features...).

    ``carry_cols``: columns functionally determined by the profile key
    (the entity ids and the coarse group) to carry through as extra
    GROUP BY keys. This is free — it does not change the grouping
    cardinality — and removes the J4 meta re-join for those columns,
    which otherwise re-scans and re-windows the whole fact input a
    second time. Use ``attach_meta`` only for genuinely varying meta
    (e.g. names that differ across rows of one profile).
    """
    prepared = _prepare(df, spec)
    carry = list(carry_cols)

    if strategy == "multi_pass":
        ranked = _ranked(prepared, spec).persist()
        parts: list[DataFrame] = []
        for period, n in spec.periods.items():
            subset = ranked if n is None else ranked.filter(F.col("__rnk") <= n)
            agg = features.aggregate(
                subset.drop("__rnk"),
                [spec.profile_col, *carry],
                extra=list(extra_aggs),
            )
            parts.append(agg.withColumn(spec.period_col, F.lit(period)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if strategy != "explode":
        raise ValueError(f"unknown strategy {strategy!r}")

    ranked = _ranked(prepared, spec)
    # period membership array: always the full-window periods, plus each
    # last-N period whose rank bound admits this row.
    full = [F.lit(name) for name, n in spec.periods.items() if n is None]
    membership = F.array(*full) if full else F.array().cast("array<string>")
    for name, n in spec.periods.items():
        if n is not None:
            membership = F.when(
                F.col("__rnk") <= n, F.array_union(membership, F.array(F.lit(name)))
            ).otherwise(membership)
    exploded = ranked.withColumn(
        spec.period_col, F.explode(membership)
    ).drop("__rnk")
    return features.aggregate(
        exploded,
        [spec.profile_col, spec.period_col, *carry],
        extra=list(extra_aggs),
    )


def attach_any_season_totals(
    profiles_with_keys: DataFrame,
    spec: ProfileSpec,
    totals: Mapping[str, str],
    season_period: str = "season",
) -> DataFrame:
    """J5: attach season-total columns from the (ANY, season) slice.

    The reference self-joins the ANY-position season aggregate back on
    the entity keys so every profile row carries
    ``totalMinutesForSeason``/``appearancesForSeason``
    (ADAPTERS/SILVER-adapter-wyscout.py:466-473).

    ``totals`` maps output name → source column on the ANY/season rows,
    e.g. ``{"totalMinutesForSeason": "totalMinutesInSample"}``.
    ``profiles_with_keys`` must still carry the entity columns (attach
    them via ``attach_meta`` first). The join key is the entity columns
    minus the coarse group, so it is a many-to-one join — no fan-out.
    """
    keys = [c for c in spec.entity_cols]
    slice_cond = F.col(spec.group_col) == F.lit(spec.any_label)
    if spec.period_col in profiles_with_keys.columns:
        slice_cond = slice_cond & (
            F.col(spec.period_col) == F.lit(season_period)
        )
    totals_df = (
        profiles_with_keys.filter(slice_cond)
        .select(*keys, *[F.col(src).alias(out) for out, src in totals.items()])
    )
    return profiles_with_keys.join(totals_df, keys, "left")


def attach_meta(
    profiles: DataFrame,
    facts_with_profile: DataFrame,
    spec: ProfileSpec,
    meta_cols: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Re-join descriptive columns onto the aggregated profiles (J4).

    The reference uses ``dropDuplicates(['profileId'])`` which picks an
    arbitrary row; we require a deterministic order (default: descending
    ``order_col`` = most recent match wins).
    """
    if order_by is None:
        # Order by recency; include order_col in the projection exactly
        # once even when it is also a requested meta column.
        select_cols = list(
            dict.fromkeys([spec.profile_col, *meta_cols, spec.order_col])
        )
        meta = dedup_keep_best(
            facts_with_profile.select(*select_cols),
            [spec.profile_col],
            [F.col(spec.order_col).desc()],
        )
        if spec.order_col not in meta_cols:
            meta = meta.drop(spec.order_col)
    else:
        select_cols = list(dict.fromkeys([spec.profile_col, *meta_cols]))
        meta = dedup_keep_best(
            facts_with_profile.select(*select_cols),
            [spec.profile_col],
            list(order_by),
        )
    return profiles.join(meta, spec.profile_col, "left")
