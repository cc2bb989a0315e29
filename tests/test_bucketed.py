"""Bucketed tables: the co-located join actually eliminates the
shuffle — asserted on the physical plan, not assumed."""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from traits_data_spark.sinks.bucketed import write_bucketed_table


@pytest.fixture()
def bucketed_cleanup(spark):
    yield
    for t in ("b_facts", "b_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # local metastore artifacts (default warehouse lives under cwd)
    for d in ("spark-warehouse", "metastore_db"):
        shutil.rmtree(d, ignore_errors=True)
    Path("derby.log").unlink(missing_ok=True)


def test_bucketed_join_has_no_exchange(spark, lineitem, bucketed_cleanup):
    facts = lineitem.select("l_suppkey", "l_orderkey", "l_quantity")
    dims = (
        lineitem.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("l_suppkey", "n")
    )
    write_bucketed_table(facts, "b_facts", ["l_suppkey"], n_buckets=8,
                         sort_cols=["l_suppkey"])
    write_bucketed_table(dims, "b_dims", ["l_suppkey"], n_buckets=8,
                         sort_cols=["l_suppkey"])

    a = spark.table("b_facts")
    b = spark.table("b_dims")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_suppkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == a.count()
        # aggregation on the bucket key also skips its exchange
        agg = a.groupBy("l_suppkey").agg(F.sum("l_quantity"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_exchange(spark, lineitem, bucketed_cleanup):
    """Control: the same join without bucketing shuffles."""
    facts = lineitem.select("l_suppkey", "l_orderkey", "l_quantity")
    dims = lineitem.select("l_suppkey").distinct()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            facts.join(dims, "l_suppkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
