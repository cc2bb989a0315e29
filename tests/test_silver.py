"""E1 plan semantics: explode ≡ multi_pass, ANY double-counting,
deterministic meta dedup, J5 totals, F11 cast contract."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import Feature, FeatureStore
from traits_data_spark.operators.any_union import union_with_coarse_group
from traits_data_spark.operators.flatten import enforce_cast_contract
from traits_data_spark.plans.silver import (
    ProfileSpec,
    _prepare,
    attach_any_season_totals,
    attach_meta,
    build_profiles,
)

FS = FeatureStore(
    [
        Feature("sum_qty", "SUM(CAST(l_quantity AS BIGINT))"),
        Feature("n_lines", "COUNT(1)"),
    ]
)

SPEC = ProfileSpec(
    entity_cols=["l_suppkey"],
    group_col="l_returnflag",
    order_col="l_orderkey",
    playtime_col="l_quantity",
    playtime_threshold=25.0,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_explode_equals_multi_pass(lineitem):
    a = build_profiles(lineitem, FS, SPEC, strategy="explode")
    b = build_profiles(lineitem, FS, SPEC, strategy="multi_pass")
    assert sorted(a.columns) == sorted(b.columns)
    assert _rows(a.select(*sorted(a.columns))) == _rows(b.select(*sorted(a.columns)))


def test_any_union_double_counts(spark):
    df = spark.createDataFrame([(1, "A"), (2, "R")], ["k", "flag"])
    u = union_with_coarse_group(df, {"flag": "ANY"})
    assert u.count() == 4
    assert u.filter(F.col("flag") == "ANY").count() == 2


def test_any_rows_bypass_playtime_filter(spark):
    rows = [(1, "A", 5, 10.0), (1, "A", 6, 90.0)]
    df = spark.createDataFrame(
        rows, ["l_suppkey", "l_returnflag", "l_orderkey", "l_quantity"]
    )
    prepared = _prepare(df, SPEC)
    # low-playtime row is dropped from its own group but kept in ANY
    assert prepared.filter(F.col("l_returnflag") == "A").count() == 1
    assert prepared.filter(F.col("l_returnflag") == "ANY").count() == 2


def test_attach_meta_is_deterministic_latest_wins(spark):
    rows = [
        (1, "A", 5, 30.0, "old-name"),
        (1, "A", 9, 30.0, "new-name"),
    ]
    df = spark.createDataFrame(
        rows, ["l_suppkey", "l_returnflag", "l_orderkey", "l_quantity", "name"]
    )
    facts = _prepare(df, SPEC)
    profiles = build_profiles(df, FS, SPEC)
    out = attach_meta(profiles, facts, SPEC, meta_cols=["name"])
    names = {r["name"] for r in out.filter(F.col("profileId") == "1A").collect()}
    assert names == {"new-name"}  # highest order_col wins, never arbitrary


def test_attach_meta_order_col_in_meta_cols(lineitem):
    profiles = build_profiles(lineitem, FS, SPEC)
    facts = _prepare(lineitem, SPEC)
    out = attach_meta(
        profiles, facts, SPEC, meta_cols=["l_suppkey", "l_orderkey"]
    )
    assert out.columns.count("l_orderkey") == 1


def test_any_season_totals_self_join(lineitem):
    profiles = build_profiles(lineitem, FS, SPEC)
    facts = _prepare(lineitem, SPEC)
    meta = attach_meta(profiles, facts, SPEC, meta_cols=["l_suppkey", "l_returnflag"])
    out = attach_any_season_totals(
        meta, SPEC, {"qty_for_season": "sum_qty"}
    )
    anyrow = out.filter(
        (F.col("l_returnflag") == "ANY")
        & (F.col("aggregationPeriod") == "season")
    ).first()
    assert anyrow["qty_for_season"] == anyrow["sum_qty"]
    # non-ANY rows carry the season total of their entity, >= own qty
    row = out.filter(
        (F.col("l_returnflag") != "ANY")
        & (F.col("aggregationPeriod") == "season")
    ).first()
    assert row["qty_for_season"] >= row["sum_qty"]


def test_cast_contract_int_string_else_double(spark):
    df = spark.createDataFrame(
        [(1, "x", 2, True, 3.5)], ["i", "s", "other_int", "b", "d"]
    )
    out = enforce_cast_contract(df, int_cols=["i"], string_cols=["s"])
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {
        "i": "int",
        "s": "string",
        "other_int": "double",
        "b": "double",
        "d": "double",
    }


def test_cast_contract_exclude_passthrough(spark):
    df = spark.createDataFrame([(1, "2024-01-01")], ["i", "dt"])
    df = df.withColumn("dt", F.col("dt").cast("date"))
    out = enforce_cast_contract(df, int_cols=["i"], exclude=["dt"])
    assert out.schema["dt"].dataType.simpleString() == "date"
