"""FIXTURES.md F2-shaped domain test: the StatsBomb events adapter
end-to-end — wide nested projection with location x/y, possession
context join, stats-catalogue derivation, cards full-outer."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import Feature, FeatureStore
from traits_data_spark.plans.events import (
    attach_match_context,
    cards_from_lineups,
    derive_match_stats,
    flatten_events,
)


@pytest.fixture(scope="module")
def raw_events(spark):
    def ev(mid, pid, etype, outcome=None, loc=None, length=None):
        return Row(
            match_id=mid,
            player_id=pid,
            type=Row(name=etype),
            pass_=Row(outcome=Row(name=outcome), length=length),
            location=loc,
        )

    rows = [
        ev(1, 10, "Pass", outcome=None, loc=[10.0, 20.0], length=5.0),
        ev(1, 10, "Pass", outcome="Incomplete", loc=[30.0, 40.0], length=15.0),
        ev(1, 10, "Shot", loc=[90.0, 50.0]),
        ev(1, 11, "Pass", outcome=None, loc=[50.0], length=25.0),  # short loc
        ev(2, 10, "Shot", loc=None),
    ]
    return spark.createDataFrame(rows)


def test_wide_projection_with_location(spark, raw_events):
    flat = flatten_events(
        raw_events,
        {
            "match_id": "match_id",
            "player_id": "player_id",
            "type": "type.name",
            "pass_outcome": "pass_.outcome.name",
            "pass_length": "pass_.length",
        },
    )
    assert set(flat.columns) == {
        "match_id", "player_id", "type", "pass_outcome", "pass_length",
        "location_x", "location_y",
    }
    rows = flat.collect()
    by = {(r["match_id"], r["player_id"], r["type"], r["pass_outcome"]): r for r in rows}
    assert by[(1, 10, "Pass", "Incomplete")]["location_x"] == 30.0
    # short array: x present, y null; null array: both null
    short = [r for r in rows if r["player_id"] == 11][0]
    assert short["location_x"] == 50.0 and short["location_y"] is None
    noloc = [r for r in rows if r["match_id"] == 2][0]
    assert noloc["location_x"] is None


def test_stats_catalogue_derivation(spark, raw_events):
    flat = flatten_events(
        raw_events,
        {
            "match_id": "match_id",
            "player_id": "player_id",
            "type": "type.name",
            "pass_outcome": "pass_.outcome.name",
            "pass_length": "pass_.length",
        },
    )
    catalog = FeatureStore(
        [
            Feature("passes", "SUM(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END)"),
            Feature(
                "completed_passes",
                "SUM(CASE WHEN type = 'Pass' AND pass_outcome IS NULL THEN 1 ELSE 0 END)",
            ),
            Feature("shots", "SUM(CASE WHEN type = 'Shot' THEN 1 ELSE 0 END)"),
        ]
    )
    stats = derive_match_stats(flat, catalog)
    by = {(r["match_id"], r["player_id"]): r for r in stats.collect()}
    # StatsBomb convention: null outcome = completed pass
    assert by[(1, 10)]["passes"] == 2
    assert by[(1, 10)]["completed_passes"] == 1
    assert by[(1, 10)]["shots"] == 1
    assert by[(2, 10)]["shots"] == 1


def test_match_context_join_and_adjusted_stat(spark, raw_events):
    ctx = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.25)],
        ["match_id", "player_id", "player_match_possession"],
    )
    flat = flatten_events(
        raw_events,
        {"match_id": "match_id", "player_id": "player_id", "type": "type.name"},
        location_col=None,
    )
    out = attach_match_context(flat, ctx)
    rows = out.filter(
        (F.col("match_id") == 1) & (F.col("player_id") == 10)
    ).collect()
    assert all(r["player_match_possession"] == 0.5 for r in rows)
    # match 2 has no context row → null (left join)
    assert (
        out.filter(F.col("match_id") == 2).collect()[0]["player_match_possession"]
        is None
    )


def test_cards_full_outer_zero_fill(spark):
    rows = [
        (1, 10, "Yellow Card"), (1, 10, "Yellow Card"), (1, 10, "Red Card"),
        (1, 11, "Yellow Card"),
        (1, 12, "Red Card"),
        (1, 13, "Goal"),  # not a card: filtered
    ]
    df = spark.createDataFrame(rows, ["match_id", "player_id", "outcome"])
    out = {(r["match_id"], r["player_id"]): (r["yellow_cards"], r["red_cards"])
           for r in cards_from_lineups(df).collect()}
    assert out == {(1, 10): (2, 1), (1, 11): (1, 0), (1, 12): (0, 1)}
