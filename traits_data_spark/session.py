"""SparkSession factory with scale-oriented defaults.

The reference runs on AWS Glue (4 x G.1X for silver; see BASELINE.md).
We target a generic Spark cluster; these defaults are the ones that
matter at 100 TB: AQE for runtime re-planning (skew joins, partition
coalescing), dynamic partition overwrite for idempotent partition
rebuilds (reference: ADAPTERS/SILVER-adapter-wyscout.py:495), and
Arrow for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe and beneficial on both local[] and a real
# cluster. Sizing configs (shuffle partitions, memory) are environment
# dependent and accepted as parameters.
_BASE_CONFS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split
    # skewed ones, convert to broadcast joins when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Idempotent partition-scoped rebuilds (silver contract, S9).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow-batched pandas interchange for the few vectorized UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + predicate pushdown are on by
    # default; keep explicit so a misconfigured cluster can't lose them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Timestamps without timezone semantics (testdata uses naive ts).
    "spark.sql.session.timeZone": "UTC",
}

# AQE coalescing floor. With parallelismFirst=true (default) the
# coalesced-partition target is max(totalShuffleBytes/parallelism,
# minPartitionSize); the stock 1 MB floor serializes compute-dense
# stages whose shuffle *input* is small but whose per-row work is
# large (e.g. BM25 term fan-out: a 2 MB postings shuffle coalesced to
# 2 tasks that then explode to 15 MB + heavy scoring). 64 KB keeps
# such stages wide; at production scale totalBytes/parallelism dwarfs
# any floor, so the setting is inert there. Override via
# SPARK_GRAFT_AQE_MIN_PARTITION (e.g. "1m" to restore the default).
_AQE_MIN_PARTITION_ENV = "SPARK_GRAFT_AQE_MIN_PARTITION"


def get_spark(
    app_name: str = "traits_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*])
    when no cluster manager is configured, matching the test/bench
    environment; on a real deployment ``master`` is left to
    spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if master and master.startswith("local"):
        # In local mode the driver JVM is also every executor; the 1g
        # default OOMs under many parallel scan threads. Only effective
        # before the JVM starts — a no-op on getOrCreate reuse.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    for k, v in _BASE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        os.environ.get(_AQE_MIN_PARTITION_ENV, "64k"),
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
