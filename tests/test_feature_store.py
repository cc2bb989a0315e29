"""Feature-store compiler: validation, FILTER guard, CSV loading."""

import pytest

from traits_data_spark.functions.feature_store import (
    Feature,
    FeatureDefinitionError,
    FeatureStore,
    _is_single_call,
)


def test_compile_and_aggregate(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 3.0, 30.0), ("b", 5.0, 50.0)],
        ["k", "x", "y"],
    )
    fs = FeatureStore(
        [Feature("sx", "SUM(x)"), Feature("ratio", "SUM(y) / SUM(x)")]
    )
    out = {r["k"]: r for r in fs.aggregate(df, ["k"]).collect()}
    assert out["a"]["sx"] == 4.0
    assert out["a"]["ratio"] == 10.0


def test_duplicate_names_rejected():
    with pytest.raises(FeatureDefinitionError):
        FeatureStore([Feature("a", "SUM(x)"), Feature("a", "SUM(y)")])


def test_validate_rejects_injection(spark):
    fs = FeatureStore([Feature("bad", "SUM(x); DROP TABLE t")])
    with pytest.raises(FeatureDefinitionError):
        fs.validate(spark)
    fs2 = FeatureStore([Feature("bad", "SUM(x) -- comment")])
    with pytest.raises(FeatureDefinitionError):
        fs2.validate(spark)


def test_validate_accepts_real_fragments(spark):
    fs = FeatureStore(
        [
            Feature("a", "SUM(goals)"),
            Feature("b", "SUM(goals)*90/SUM(minutes)"),
            Feature("c", "SUM(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END)"),
        ]
    )
    fs.validate(spark)  # should not raise


class _ConnectLikeSession:
    """Minimal stand-in for a Spark Connect session: no py4j gateway
    (``_jsparkSession`` raises AttributeError), DataFrame API intact."""

    def __init__(self, spark):
        self._spark = spark

    @property
    def _jsparkSession(self):
        raise AttributeError("Connect sessions have no JVM gateway")

    def range(self, n):
        return self._spark.range(n)


def test_validate_connect_fallback(spark):
    """Without the py4j parser, validate must still accept real
    fragments (unresolved columns are fine — they bind at use time)
    and reject unparseable ones via the selectExpr probe."""
    connect = _ConnectLikeSession(spark)
    good = FeatureStore(
        [
            Feature("a", "SUM(goals)"),
            Feature("b", "SUM(goals)*90/SUM(minutes)"),
            Feature("c", "SUM(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END)"),
        ]
    )
    good.validate(connect)  # should not raise

    with pytest.raises(FeatureDefinitionError):
        FeatureStore([Feature("bad", "SUM(x FROM WHERE")]).validate(connect)
    with pytest.raises(FeatureDefinitionError):
        FeatureStore([Feature("bad", "SUM(x); DROP TABLE t")]).validate(connect)


def test_execute_on_db_connect_boundary(spark):
    """_execute_on_db must fail with a documented boundary error on
    Connect-like sessions, not an AttributeError."""
    from traits_data_spark.sinks.jdbc import _execute_on_db

    class _NoJvm:
        @property
        def _jvm(self):
            raise AttributeError

    with pytest.raises(NotImplementedError, match="py4j JVM gateway"):
        _execute_on_db(_NoJvm(), "jdbc:x", {}, "SELECT 1")


def test_filter_where_rejects_compound_fragment():
    fs = FeatureStore([Feature("r", "SUM(a)*90/SUM(b)")])
    with pytest.raises(FeatureDefinitionError, match="single aggregate"):
        fs.columns(where="c > 0")


def test_filter_where_single_call_correct(spark):
    df = spark.createDataFrame(
        [("a", 1.0, "F"), ("a", 3.0, "O"), ("a", 5.0, "F")], ["k", "x", "st"]
    )
    fs = FeatureStore([Feature("sx_f", "SUM(x)")])
    out = df.groupBy("k").agg(*fs.columns(where="st = 'F'")).collect()[0]
    assert out["sx_f"] == 6.0


def test_is_single_call_parser():
    assert _is_single_call("SUM(x)")
    assert _is_single_call("SUM(CASE WHEN a = ')' THEN 1 END)")
    assert not _is_single_call("SUM(a)*90/SUM(b)")
    assert not _is_single_call("SUM(a) + 1")
    assert not _is_single_call("1 + SUM(a)")


def test_from_csv_text_and_skipped_rows():
    fs = FeatureStore.from_csv(
        "feature_name,base_sql\ngoals,SUM(goals)\nempty,\n"
    )
    assert fs.names() == ["goals"]
    assert fs.skipped == ["empty"]


def test_generated_sql_roundtrip(spark, lineitem):
    fs = FeatureStore([Feature("sq", "SUM(CAST(l_quantity AS BIGINT))")])
    lineitem.createOrReplaceTempView("li_tmp")
    sql = fs.generated_sql("li_tmp", ["l_returnflag"])
    a = {tuple(r) for r in spark.sql(sql).collect()}
    b = {tuple(r) for r in fs.aggregate(lineitem, ["l_returnflag"]).collect()}
    assert a == b
