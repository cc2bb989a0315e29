"""Weights-hierarchy rollup parity with GOLD-data-loader.py:487-534:
hand-computed values, the base-constant rule for missing terms, NULL
only for positions absent from the weights."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.ratings import WeightRow, WeightsHierarchy

CSV = """POS,statName,statWgt,metricName,metricWgt,traitName,traitWgt,inverse
GK,saves,0.7,shotstop,0.8,keeping,1.0,0
GK,errors,0.3,shotstop,0.8,keeping,1.0,1
GK,claims,1.0,aerial,0.2,keeping,1.0,0
ST,goals,1.0,finishing,1.0,scoring,1.0,0
"""


def test_hand_computed_rollup(spark):
    wh = WeightsHierarchy.from_csv(CSV)
    df = spark.createDataFrame(
        [("GK", 1.0, -0.5, 2.0, 0.0)],
        ["positionGroup", "zs_saves", "zs_errors", "zs_claims", "zs_goals"],
    )
    row = wh.apply(df).collect()[0]
    shotstop = 2.5 + 1.0 * 0.7 + (-0.5) * 0.3  # inverse already applied upstream
    aerial = 2.5 + 2.0 * 1.0
    keeping = shotstop * 0.8 + aerial * 0.2
    assert row["shotstop"] == pytest.approx(round(shotstop, 2))
    assert row["aerial"] == pytest.approx(round(aerial, 2))
    assert row["keeping"] == pytest.approx(round(keeping, 2))
    assert row["Rating"] == pytest.approx(round(keeping * 1.0, 2))


def test_missing_metric_gets_base_constant_not_null(spark):
    """ST has no rows for 'shotstop'/'aerial' → reference computes
    sum([]) = 0 → metric = 2.5, trait contribution 0.0."""
    wh = WeightsHierarchy.from_csv(CSV)
    df = spark.createDataFrame([("ST", 1.0)], ["positionGroup", "zs_goals"])
    df = df.withColumns(
        {c: F.lit(0.0) for c in ["zs_saves", "zs_errors", "zs_claims"]}
    )
    row = wh.apply(df).collect()[0]
    assert row["shotstop"] == 2.5
    assert row["aerial"] == 2.5
    assert row["keeping"] == 0.0  # trait with no terms → 0.0
    assert row["finishing"] == 3.5
    assert row["Rating"] == pytest.approx(3.5)


def test_position_absent_from_weights_is_null(spark):
    wh = WeightsHierarchy.from_csv(CSV)
    df = spark.createDataFrame([("DF", 1.0)], ["positionGroup", "zs_goals"])
    df = df.withColumns(
        {c: F.lit(0.0) for c in ["zs_saves", "zs_errors", "zs_claims"]}
    )
    row = wh.apply(df).collect()[0]
    assert row["shotstop"] is None
    assert row["Rating"] is None


def test_inverse_stats_listing():
    wh = WeightsHierarchy.from_csv(CSV)
    assert wh.inverse_stats() == ["errors"]
    assert wh.inverse_stats("ST") == []


def test_from_rows_equivalent():
    wh = WeightsHierarchy(
        [WeightRow("GK", "saves", 0.7, "shotstop", 0.8, "keeping", 1.0)]
    )
    assert wh.positions() == ["GK"]
    assert wh.metric_names() == ["shotstop"]
