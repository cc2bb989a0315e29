"""UDF-replacement scalar expressions (D1-D5, F1, F5, F8)."""

import pytest
from pyspark.sql import functions as F

from traits_data_spark.functions.scalars import (
    age_at,
    map_lookup,
    portable_hash64,
    surrogate_key,
    weighted_sum,
)


def test_surrogate_key_concat_and_null_propagation(spark):
    df = spark.createDataFrame(
        [(1, 2, "GK"), (3, None, "ST")], ["a", "b", "pos"]
    )
    out = df.select(surrogate_key("a", "b", "pos").alias("k")).collect()
    assert out[0]["k"] == "12GK"
    assert out[1]["k"] is None  # null part nulls the key (SQL CONCAT)


def test_surrogate_key_with_separator(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = df.select(surrogate_key("a", "b", sep="-").alias("k")).collect()
    assert out[0]["k"] == "1-x"


def test_age_at_birthday_boundaries(spark):
    rows = [
        ("2000-06-15", "2026-06-14"),  # day before 26th birthday
        ("2000-06-15", "2026-06-15"),  # on the birthday
        ("2000-06-15", "2026-06-16"),  # day after
    ]
    df = spark.createDataFrame(rows, ["b", "ref"])
    out = df.select(
        age_at(F.col("b").cast("date"), F.col("ref").cast("date")).alias("age")
    ).collect()
    assert [r["age"] for r in out] == [25, 26, 26]


def test_map_lookup_with_default(spark):
    df = spark.createDataFrame([("GK",), ("??",)], ["pos"])
    out = df.select(
        map_lookup("pos", {"GK": "Goalkeeper"}, default=F.lit("Unknown")).alias("g")
    ).collect()
    assert [r["g"] for r in out] == ["Goalkeeper", "Unknown"]


def test_map_lookup_no_default_null(spark):
    df = spark.createDataFrame([("??",)], ["pos"])
    out = df.select(map_lookup("pos", {"GK": "G"}).alias("g")).collect()
    assert out[0]["g"] is None


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("hello",), ("world",)], ["t"])
    got = {
        r["t"]: r["h"]
        for r in df.select("t", portable_hash64("t").alias("h")).collect()
    }
    for t, h in got.items():
        d = duckdb.sql(
            f"SELECT CAST(('0x' || substr(md5('{t}'), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        assert h == d


def test_weighted_sum(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    out = df.select(
        weighted_sum([("x", 0.5), ("y", 0.25)], base=2.5).alias("w")
    ).collect()
    assert out[0]["w"] == pytest.approx(2.5 + 0.5 + 0.5)


def test_suffixed_name(spark):
    from traits_data_spark.functions.scalars import suffixed_name

    df = spark.createDataFrame(
        [("United", "AFL"), ("United", "VFL"), ("City", "SANFL")],
        ["team", "comp"],
    )
    out = df.select(
        suffixed_name("team", "comp", {"AFL": "(AFL)", "VFL": "(VFL)"}).alias("n")
    ).collect()
    assert [r["n"] for r in out] == ["United (AFL)", "United (VFL)", "City"]
