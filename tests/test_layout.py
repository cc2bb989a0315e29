"""Z-order layout: z-value correctness vs a pure-Python Morton
reference, and the clustered writer's file-level locality."""

import os

import pytest
from pyspark.sql import functions as F

from traits_data_spark.operators.layout import (
    write_zordered,
    zvalue,
    zvalue_sql,
)


def _morton(xs: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for i, x in enumerate(xs):
            out |= ((x >> b) & 1) << (b * len(xs) + i)
    return out


def test_zvalue_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1, 2), (40000, 123)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 16)


def test_zvalue_overflow_guard(spark):
    with pytest.raises(ValueError, match="overflows"):
        zvalue(["a", "b", "c", "d"], bits=16)


def test_zvalue_sql_emits_same_formula(spark, lineitem):
    z = lineitem.select(
        zvalue([F.expr("l_partkey % 256"), F.expr("l_suppkey % 256")], bits=8
               ).alias("z")
    )
    sql_z = lineitem.selectExpr(
        zvalue_sql(["(l_partkey % 256)", "(l_suppkey % 256)"], bits=8) + " AS z"
    )
    assert sorted(r["z"] for r in z.collect()) == sorted(
        r["z"] for r in sql_z.collect()
    )


def test_write_zordered_clusters_files(spark, lineitem, tmp_path):
    path = str(tmp_path / "zordered")
    df = lineitem.withColumn("pk", F.expr("l_partkey % 65536")).withColumn(
        "sk", F.expr("l_suppkey % 65536")
    )
    write_zordered(df, path, zorder_by=["pk", "sk"], num_files=4)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4
    out = spark.read.parquet(path)
    assert out.count() == lineitem.count()
    # range partitioning on the z-curve → per-file z ranges are
    # (nearly) disjoint: max of file i's z-span below min of file i+2's
    spans = []
    for f in files:
        part = spark.read.parquet(os.path.join(path, f))
        zs = part.select(
            zvalue(["pk", "sk"]).alias("z")
        ).agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()[0]
        spans.append((zs["lo"], zs["hi"]))
    spans.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # disjoint consecutive files
