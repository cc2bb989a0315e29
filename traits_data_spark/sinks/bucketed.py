"""Bucketed-table sink: pre-shuffle once at write time so repeated
joins/aggregations on the bucket key run with NO exchange.

The silver profile table is joined on its keys by every downstream
consumer (gold builds, serving extracts, ad-hoc analysis). Writing it
bucketed moves that shuffle from N read-side jobs to one write-side
job: two tables bucketed on the same key with the same bucket count
sort-merge-join without exchanging either side, and aggregations on
the bucket key skip their exchange too. This is the table-layout
complement to ``F.broadcast`` (small dims) and AQE (runtime fixes).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally lets the sort-merge join skip
    its per-partition sort. Bucket count should match the downstream
    shuffle partitioning (``spark.sql.shuffle.partitions`` or the
    expected parallelism at the target scale) — mismatched bucket
    counts between two tables reintroduce the exchange on one side.

    ``mode="append"`` requires the FULL spec (bucket count, bucket
    cols, AND sort cols) to match the existing table exactly; Spark
    raises AnalysisException otherwise. Managed tables live under the
    session warehouse dir — a stale ``spark-warehouse/<table>`` left
    by a previous session collides with LOCATION_ALREADY_EXISTS even
    though the new catalog has no such table.
    """
    writer = df.write.mode(mode).format(format).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
