"""End-to-end E1 parity fixture (FIXTURES.md F1 shape): a small
match-player frame with hand-computed expected silver rows, exercising
the full chain — ANY union → playtime filter → profile key → feature
GROUP BY → last-N rank → meta re-join → ANY/season totals → cast
contract (ADAPTERS/SILVER-adapter-wyscout.py:292-503)."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import Feature, FeatureStore
from traits_data_spark.operators.flatten import enforce_cast_contract
from traits_data_spark.plans.silver import (
    ProfileSpec,
    _prepare,
    attach_any_season_totals,
    attach_meta,
    build_profiles,
)

SPEC = ProfileSpec(
    entity_cols=["playerId"],
    group_col="positionGroup",
    order_col="matchId",
    playtime_col="minutesOnField",
    playtime_threshold=33.0,
    periods={"season": None, "last_four": 4},
)

FS = FeatureStore(
    [
        Feature("sum_goals", "SUM(CAST(goals AS BIGINT))"),
        Feature("appearances", "COUNT(1)"),
        Feature("minutes", "SUM(CAST(minutesOnField AS BIGINT))"),
    ]
)


@pytest.fixture(scope="module")
def silver(spark):
    rows = [
        # playerId, positionGroup, matchId, minutesOnField, goals, name
        (1, "GK", 1, 90.0, 1, "Alice"),
        (1, "GK", 2, 90.0, 2, "Alice"),
        (1, "GK", 3, 20.0, 3, "Alice"),  # below threshold: GK drops, ANY keeps
        (1, "GK", 4, 90.0, 4, "Alice"),
        (1, "GK", 5, 90.0, 5, "Alice"),
        (1, "GK", 6, 90.0, 6, "Alice"),
        (2, "ST", 1, 40.0, 1, "Bob"),
        (2, "ST", 2, 40.0, 0, "Bob"),
    ]
    df = spark.createDataFrame(
        rows,
        ["playerId", "positionGroup", "matchId", "minutesOnField", "goals", "name"],
    )
    profiles = build_profiles(df, FS, SPEC)
    facts = _prepare(df, SPEC)
    meta = attach_meta(
        profiles, facts, SPEC, meta_cols=["playerId", "positionGroup", "name"]
    )
    totals = attach_any_season_totals(
        meta, SPEC, {"minutesForSeason": "minutes", "appearancesForSeason": "appearances"}
    )
    out = enforce_cast_contract(
        totals,
        int_cols=["playerId"],
        string_cols=["profileId", "aggregationPeriod", "positionGroup", "name"],
    )
    return {
        (r["profileId"], r["aggregationPeriod"]): r for r in out.collect()
    }


def test_row_count(silver):
    # profiles: 1GK, 1ANY, 2ST, 2ANY × 2 periods
    assert len(silver) == 8


def test_gk_season_excludes_low_minutes(silver):
    r = silver[("1GK", "season")]
    assert r["sum_goals"] == 1 + 2 + 4 + 5 + 6
    assert r["appearances"] == 5.0
    assert r["minutes"] == 450.0


def test_gk_last_four_rank_skips_filtered_match(silver):
    r = silver[("1GK", "last_four")]
    # rank over remaining matches desc: 6,5,4,2
    assert r["sum_goals"] == 6 + 5 + 4 + 2


def test_any_keeps_low_minutes_row(silver):
    r = silver[("1ANY", "season")]
    assert r["sum_goals"] == 21.0
    assert r["appearances"] == 6.0
    r4 = silver[("1ANY", "last_four")]
    assert r4["sum_goals"] == 6 + 5 + 4 + 3  # match 3 present in ANY


def test_small_sample_last_four_equals_season(silver):
    assert silver[("2ST", "last_four")]["sum_goals"] == silver[("2ST", "season")]["sum_goals"]


def test_any_season_totals_attached_to_every_row(silver):
    # player 1's ANY/season minutes = 470 (includes the 20-min match)
    for period in ("season", "last_four"):
        assert silver[("1GK", period)]["minutesForSeason"] == 470.0
        assert silver[("1ANY", period)]["minutesForSeason"] == 470.0
    assert silver[("2ST", "season")]["minutesForSeason"] == 80.0


def test_meta_and_cast_contract(silver):
    r = silver[("1GK", "season")]
    assert r["name"] == "Alice"
    assert isinstance(r["playerId"], int)
    assert isinstance(r["sum_goals"], float)  # blanket double
