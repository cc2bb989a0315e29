"""File-size-targeted compaction sink and the watermarked
stream-stream join."""

import json

from pyspark.sql import functions as F

from traits_data_spark.sinks.compaction import (
    compact_parquet_dir,
    plan_input_bytes,
    repartition_for_target_file_size,
)
from traits_data_spark.streaming.bronze import stream_stream_join


def test_plan_input_bytes_positive(spark, lineitem):
    assert plan_input_bytes(lineitem) > 10_000


def test_repartition_hits_target_partition_count(spark, lineitem):
    total = plan_input_bytes(lineitem)
    target = total // 4 + 1
    out = repartition_for_target_file_size(lineitem, target_bytes=target)
    assert out.rdd.getNumPartitions() == 4


def test_repartition_partitioned_clusters_keys(spark, lineitem):
    out = repartition_for_target_file_size(
        lineitem,
        target_bytes=plan_input_bytes(lineitem) // 4 + 1,
        partition_by=["l_returnflag"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(l_returnflag" in plan


def test_compact_parquet_dir_reduces_files(spark, lineitem, tmp_path):
    frag = str(tmp_path / "frag")
    lineitem.repartition(16).write.parquet(frag)
    import os

    n_before = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_before == 16
    rows_before = spark.read.parquet(frag).count()
    n_after = compact_parquet_dir(spark.read.parquet, frag, target_bytes=1 << 40)
    assert n_after < n_before
    assert spark.read.parquet(frag).count() == rows_before


def test_stream_stream_join_within_lag(spark, tmp_path):
    d = tmp_path / "ss"
    d.mkdir()
    errors = [
        {"ts": "2024-01-01 10:00:00", "user_id": 1, "kind": "error"},
        {"ts": "2024-01-01 12:00:00", "user_id": 2, "kind": "error"},
    ]
    purchases = [
        # 30 min after user 1's error -> matches
        {"ts": "2024-01-01 10:30:00", "user_id": 1, "kind": "purchase"},
        # 3 h after user 2's error -> outside max_lag, no match
        {"ts": "2024-01-01 15:00:00", "user_id": 2, "kind": "purchase"},
    ]
    (d / "err.json").write_text("\n".join(json.dumps(r) for r in errors))
    (d / "pur.json").write_text("\n".join(json.dumps(r) for r in purchases))

    def src(kind):
        return (
            spark.readStream.schema("ts STRING, user_id LONG, kind STRING")
            .json(str(d))
            .withColumn("ts", F.to_timestamp("ts"))
            .filter(F.col("kind") == kind)
        )

    joined = stream_stream_join(
        src("purchase"), src("error"), on=["user_id"], max_lag="1 hour"
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.ts").alias("error_ts"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("SELECT * FROM ssj_out").collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 1
