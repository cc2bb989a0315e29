"""allowlist_filter: isin literal path vs semi-join path equivalence."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.joins import allowlist_filter


def test_literal_and_semi_join_paths_agree(spark, lineitem):
    keys = [1, 2, 3, 5, 8]
    lit = allowlist_filter(lineitem, "l_suppkey", keys)
    as_df = allowlist_filter(
        lineitem, "l_suppkey",
        spark.createDataFrame([(k,) for k in keys], ["k"]),
    )
    assert lit.count() == as_df.count() > 0
    assert {r["l_suppkey"] for r in lit.select("l_suppkey").distinct().collect()} <= set(keys)


def test_negate_is_complement(spark, lineitem):
    keys = [1, 2]
    n_in = allowlist_filter(lineitem, "l_suppkey", keys).count()
    n_out = allowlist_filter(lineitem, "l_suppkey", keys, negate=True).count()
    assert n_in + n_out == lineitem.count()


def test_isin_pushes_down_to_scan(spark, lineitem):
    plan = (
        allowlist_filter(lineitem.select("l_suppkey"), "l_suppkey", [1, 2, 3])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [In(l_suppkey" in plan


def test_rejects_wide_allowlist_df(spark, lineitem):
    with pytest.raises(ValueError, match="1 column"):
        allowlist_filter(lineitem, "l_suppkey", lineitem.select("l_suppkey", "l_partkey"))
