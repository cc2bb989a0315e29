"""Test-data table loading (TESTDATA.md).

One parquet file per table under ``$SPARK_GRAFT_SF_DIR`` (or an explicit
sf dir). These are the engine's stand-in for the reference's silver
inputs in correctness tests and benchmarks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf: str | None = None) -> DataFrame:
    base = sf or sf_dir()
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf: str | None = None, register_views: bool = False
) -> dict[str, DataFrame]:
    out = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, name, sf)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
