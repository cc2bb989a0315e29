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
    deletes: DataFrame | None = None,
) -> DataFrame:
    """MERGE: updates win over existing on key collision; schemas are
    reconciled by name (missing columns → null).

    ``deletes`` is a keyed retraction set (any frame carrying the key
    columns): every matching key is dropped from the result, and a
    delete WINS over an update for the same key — the reference's
    upstream re-fetch returns either fresh rows or a "no data"
    tombstone per key (UPDATERS/wyscout-bronze-batch.py:60-76), so a
    batch never legitimately carries both, and dropping is the
    fail-safe reading when it does. The anti-join shuffles on the
    same keys the MERGE window already partitions by."""
    flagged_new = updates.withColumn(_SRC_FLAG, F.lit(1))
    if existing is None:
        merged = flagged_new
    else:
        merged = existing.withColumn(_SRC_FLAG, F.lit(0)).unionByName(
            flagged_new, allowMissingColumns=True
        )
    out = dedup_keep_best(merged, list(keys), [F.col(_SRC_FLAG).desc()])
    if deletes is not None:
        out = out.join(
            deletes.select(*keys).distinct(), list(keys), "left_anti"
        )
    return out.drop(_SRC_FLAG)


# Hive's escapePathName special set: these bytes are %XX-encoded in
# partition directory names (what Spark itself writes for e.g. ':').
_HIVE_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}


def _partition_dir_value(v: object) -> str:
    """Render one partition value the way Spark names the directory
    (``col=<this>``): Hive path escaping, with NULL as the default
    ``__HIVE_DEFAULT_PARTITION__``."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_ESCAPE else c for c in str(v)
    )


def upsert_parquet_partition(
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
    deletes: DataFrame | None = None,
) -> None:
    """S10 as partition-scoped MERGE, with keyed retraction.

    Only partitions present in ``updates`` — plus, when ``deletes`` is
    given, partitions holding a retracted key — are read back and
    rewritten (semi-join pushdown on partition values), so cost scales
    with the delta, not the table.

    ``deletes`` mirrors the reference's stale-file delete (an upstream
    re-fetch answering "No statistical data" retracts the key —
    UPDATERS/wyscout-bronze-batch.py:60-76): matching rows are dropped
    during the rewrite. Dynamic partition overwrite only replaces
    partitions PRESENT in the written frame, so a partition the
    retraction fully empties would otherwise survive as stale files —
    those directories are removed explicitly through the Hadoop
    FileSystem (the portable spelling of the reference's S3
    delete_object), bounded by the touched-partition count.
    """
    spark = updates.sparkSession
    existing = None
    touched = updates.select(*partition_by).distinct()
    try:
        target = spark.read.parquet(path)
        if deletes is not None:
            # Partitions holding a retracted key are touched too, even
            # when no update lands there.
            del_parts = (
                target.join(
                    F.broadcast(deletes.select(*keys).distinct()),
                    list(keys),
                    "left_semi",
                )
                .select(*partition_by)
                .distinct()
            )
            touched = touched.union(del_parts).distinct()
        # Restrict to touched partitions: semi-join on partition values.
        existing = target.join(
            F.broadcast(touched), list(partition_by), "left_semi"
        )
    except AnalysisException:
        pass  # first write
    merged = merge_upsert(existing, updates, keys, deletes=deletes)
    # Fully-emptied partitions: touched but absent from the rewrite.
    # Computed (collected) BEFORE the overwrite — the plan reads the
    # files the write is about to replace.
    emptied = []
    if deletes is not None and existing is not None:
        emptied = touched.join(
            merged.select(*partition_by).distinct(),
            list(partition_by),
            "left_anti",
        ).collect()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    if not emptied:
        return
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    for row in emptied:
        sub = "/".join(
            f"{col}={_partition_dir_value(row[col])}" for col in partition_by
        )
        p = jvm.org.apache.hadoop.fs.Path(path + "/" + sub)
        if fs.exists(p):
            fs.delete(p, True)


def incremental_new_keys(
    incoming: DataFrame, existing_keys: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """J13/U4: the reference's incremental-ingest anti-join — rows whose
    keys are not yet present (UPDATERS/wyscout-bronze-batch.py:218-226).
    """
    return incoming.join(existing_keys, list(keys), "left_anti")
