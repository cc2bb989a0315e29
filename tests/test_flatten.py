"""P1/P2/F7: recursive struct flattening, array-of-struct explode."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from traits_data_spark.operators.flatten import (
    explode_array_of_structs,
    flatten_struct_columns,
    flattened_columns,
)


def _nested(spark):
    rows = [
        Row(
            id=1,
            player=Row(name="A", birthArea=Row(name="X", code="x")),
            total=Row(goals=2, assists=1),
        )
    ]
    return spark.createDataFrame(rows)


def test_flatten_all_structs(spark):
    df = _nested(spark)
    out = flatten_struct_columns(df)
    assert set(out.columns) == {
        "id",
        "player_name",
        "player_birthArea_name",
        "player_birthArea_code",
        "total_goals",
        "total_assists",
    }
    r = out.collect()[0]
    assert r["player_birthArea_name"] == "X"
    assert r["total_goals"] == 2


def test_flatten_only_selected(spark):
    df = _nested(spark)
    out = flatten_struct_columns(df, only=["total"])
    assert "total_goals" in out.columns
    assert "player" in out.columns  # untouched struct passes through


def test_flattened_columns_standalone(spark):
    df = _nested(spark)
    cols = flattened_columns(df.schema)
    assert len(cols) == 6


def test_explode_array_of_structs(spark):
    rows = [
        Row(match_id=1, players=[Row(pid=10, goals=1), Row(pid=11, goals=0)]),
        Row(match_id=2, players=[Row(pid=10, goals=2)]),
    ]
    df = spark.createDataFrame(rows)
    out = explode_array_of_structs(df, "players", keep=["match_id"])
    assert set(out.columns) == {"match_id", "pid", "goals"}
    assert out.count() == 3
    assert out.filter((F.col("pid") == 10) & (F.col("match_id") == 2)).collect()[0][
        "goals"
    ] == 2


def test_explode_rejects_non_array(spark):
    df = _nested(spark)
    with pytest.raises(TypeError):
        explode_array_of_structs(df, "player")
