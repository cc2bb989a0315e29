"""Keyed upsert sinks (SURVEY.md §2.1 S10/S11).

The reference upserts Parquet in place with pandas (update matching
keys, append new, reconcile schema — DEPRECATED/statsbomb-silver.py:50-111)
and upserts MySQL row-chunks (INSERT .. ON DUPLICATE KEY UPDATE —
LOADERS/GOLD-data-loader.py:278-303,654-676).

Plain-Spark MERGE semantics: read the target partition(s), reconcile
schemas with ``unionByName(allowMissingColumns=True)``, keep the newest
row per key with a deterministic window, dynamic-overwrite the touched
partitions. (On a Delta/Iceberg table this whole function is
``MERGE INTO``; we keep the dependency-free formulation.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from traits_data_spark.operators.windows import dedup_keep_best

_SRC_FLAG = "__is_update"


def merge_upsert(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE: updates win over existing on key collision; schemas are
    reconciled by name (missing columns → null)."""
    flagged_new = updates.withColumn(_SRC_FLAG, F.lit(1))
    if existing is None:
        merged = flagged_new
    else:
        merged = existing.withColumn(_SRC_FLAG, F.lit(0)).unionByName(
            flagged_new, allowMissingColumns=True
        )
    out = dedup_keep_best(merged, list(keys), [F.col(_SRC_FLAG).desc()])
    return out.drop(_SRC_FLAG)


def upsert_parquet_partition(
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
) -> None:
    """S10 as partition-scoped MERGE.

    Only partitions present in ``updates`` are read back and rewritten
    (semi-join pushdown on partition values), so cost scales with the
    delta, not the table.
    """
    spark = updates.sparkSession
    try:
        existing = spark.read.parquet(path)
        # Restrict to touched partitions: semi-join on partition values.
        parts = updates.select(*partition_by).distinct()
        existing = existing.join(F.broadcast(parts), list(partition_by), "left_semi")
    except AnalysisException:
        existing = None  # first write
    merged = merge_upsert(existing, updates, keys)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def incremental_new_keys(
    incoming: DataFrame, existing_keys: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """J13/U4: the reference's incremental-ingest anti-join — rows whose
    keys are not yet present (UPDATERS/wyscout-bronze-batch.py:218-226).
    """
    return incoming.join(existing_keys, list(keys), "left_anti")
