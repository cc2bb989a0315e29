"""U2: ANY-union vs single-pass grouping sets equivalence."""

from pyspark.sql import functions as F

from traits_data_spark.operators.any_union import (
    rollup_grouping_sets,
    union_with_coarse_group,
)


def _agg_exprs():
    return [
        F.expr("SUM(CAST(l_quantity AS BIGINT))").alias("sq"),
        F.count(F.lit(1)).alias("n"),
    ]


def test_grouping_sets_equals_union_path(lineitem):
    gs = rollup_grouping_sets(
        lineitem, ["l_suppkey"], "l_returnflag", _agg_exprs()
    )
    u = (
        union_with_coarse_group(lineitem, {"l_returnflag": "ANY"})
        .groupBy("l_suppkey", "l_returnflag")
        .agg(*_agg_exprs())
    )
    assert sorted(gs.columns) == sorted(u.columns)
    cols = sorted(gs.columns)
    a = sorted(tuple(r) for r in gs.select(*cols).collect())
    b = sorted(tuple(r) for r in u.select(*cols).collect())
    assert a == b


def test_multiple_override_columns(spark):
    df = spark.createDataFrame(
        [(1, "A", "a1"), (2, "R", "r1")], ["k", "grp", "name"]
    )
    u = union_with_coarse_group(df, {"grp": "ANY", "name": "ANY"})
    anyrows = u.filter(F.col("grp") == "ANY").collect()
    assert len(anyrows) == 2
    assert all(r["name"] == "ANY" for r in anyrows)


def test_grouping_sets_concurrent_calls_no_collision(lineitem):
    """The old implementation used a global temp view name; two plans
    built before either executes must not clobber each other."""
    a = rollup_grouping_sets(lineitem, ["l_suppkey"], "l_returnflag", _agg_exprs())
    b = rollup_grouping_sets(
        lineitem.filter(F.col("l_quantity") > 25),
        ["l_suppkey"],
        "l_returnflag",
        _agg_exprs(),
    )
    assert a.count() > 0 and b.count() > 0
    assert a.count() >= b.count()
