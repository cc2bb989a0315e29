"""The event-stream adapter — the reference's StatsBomb silver variant
(SURVEY.md §3 E1-variant; STAGING/SILVER-adapter-statsbomb-notebook.ipynb).

Stages, each a dedicated helper:

- ``flatten_events`` (P2): the wide aliased projection over nested
  event structs — the select map IS the column-pruning whitelist
  (Catalyst prunes unselected nested fields from the scan), including
  ``location[0]/[1]`` → x/y (F7).
- ``attach_match_context`` (J6): pull per-(match, player) context
  (e.g. possession share) onto every event row for adjusted stats.
- ``derive_match_stats`` (A2): the stats-catalogue GROUP BY — one
  generated conditional-aggregate pass from (name, fragment) metadata.
- ``cards_from_lineups`` (A3/P10/J8): per-color outcome counts joined
  FULL OUTER with zero-fill — the yellow ⋈ red cards pattern.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import FeatureStore
from traits_data_spark.operators.joins import dim_join


def location_xy(
    col: Column | str, x_name: str = "location_x", y_name: str = "location_y"
) -> list[Column]:
    """F7: ``location`` array → x/y columns. ``try_element_at`` (not
    ``element_at``) because Spark 4 runs ANSI mode: a short array —
    one malformed event in 100 TB — would otherwise fail the job with
    INVALID_ARRAY_INDEX instead of yielding NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.try_element_at(c, F.lit(1)).alias(x_name),
        F.try_element_at(c, F.lit(2)).alias(y_name),
    ]


def flatten_events(
    raw: DataFrame,
    select_map: Mapping[str, Column | str],
    location_col: str | None = "location",
) -> DataFrame:
    """P2: explicit wide projection with aliasing.

    ``select_map``: output name → nested path string (``"pass.outcome.name"``)
    or Column expression. Only named fields are read — on columnar
    sources the projection doubles as the scan schema.
    """
    cols = [
        (F.col(v) if isinstance(v, str) else v).alias(k)
        for k, v in select_map.items()
    ]
    if location_col is not None and location_col in raw.columns:
        cols.extend(location_xy(location_col))
    return raw.select(*cols)


def attach_match_context(
    events: DataFrame,
    match_stats: DataFrame,
    keys: Sequence[str] = ("match_id", "player_id"),
    context_cols: Sequence[str] = ("player_match_possession",),
) -> DataFrame:
    """J6: per-(match, player) context onto each event row. The stats
    side is one row per player-match — orders of magnitude smaller
    than the event stream — so it broadcasts."""
    ctx = match_stats.select(*keys, *context_cols)
    return dim_join(events, ctx, keys, how="left")


def derive_match_stats(
    flat_events: DataFrame,
    catalog: FeatureStore,
    keys: Sequence[str] = ("match_id", "player_id"),
) -> DataFrame:
    """A2: the stats-catalogue GROUP BY over flattened events."""
    return catalog.aggregate(flat_events, list(keys))


def cards_from_lineups(
    card_events: DataFrame,
    keys: Sequence[str] = ("match_id", "player_id"),
    outcome_col: str = "outcome",
    yellow: str = "Yellow Card",
    red: str = "Red Card",
) -> DataFrame:
    """A3 + P10 + J8: filter card outcomes, count per color, FULL
    OUTER join the two count frames, zero-fill."""
    y = (
        card_events.filter(F.col(outcome_col) == yellow)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("yellow_cards"))
    )
    r = (
        card_events.filter(F.col(outcome_col) == red)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("red_cards"))
    )
    return y.join(r, list(keys), "outer").na.fill(
        0, ["yellow_cards", "red_cards"]
    )
