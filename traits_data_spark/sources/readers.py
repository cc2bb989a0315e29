"""Source readers (SURVEY.md §2.1 S1-S7).

The reference reads provider JSON with brace-glob partition selection
(ADAPTERS/SILVER-adapter-wyscout.py:225-226), CSVs with inferred schema
(champion notebook cell 7), and hive-partitioned Parquet. Spark's
datasources cover all three; the helpers here add the contracts the
reference enforces around them: explicit schemas where known, filename
→ column extraction, and partition-pruned Parquet scans.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json_files(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | str | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """JSON scan (S1). Pass ``schema`` in production — schema inference
    is a full extra pass over 100 TB; the silver contract schemas are
    known.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", str(multi_line).lower()).json(paths)


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | str | None = None,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan (S2) — header + PERMISSIVE like the champion reader."""
    reader = spark.read.option("header", header).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def with_filename_column(
    df: DataFrame, pattern: str = r".*/(\d+)\.json$", out_col: str = "match_id"
) -> DataFrame:
    """S3: derive a key from the source file path
    (STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171).
    """
    return df.withColumn(
        out_col, F.regexp_extract(F.input_file_name(), pattern, 1)
    )


def from_pandas(
    spark: SparkSession,
    pdf,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S6: pandas→Spark bridge with Arrow transfer (the reference
    builds small dimension frames in pandas then converts —
    ADAPTERS/SILVER-adapter-wyscout.py:359-372). Pass ``schema`` to
    pin types instead of inferring from the first rows."""
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def filter_valid_seasons(
    seasons: DataFrame,
    start_year_col: str = "startYear",
    min_year: int = 2000,
    max_year: int = 2100,
    start_date_col: str | None = None,
    as_of: str | None = None,
) -> DataFrame:
    """C1: season work-list enumeration — keep seasons whose start
    year is in range and (optionally) that already started as of a
    pinned date (ADAPTERS/wyscout-silver-batcher.py:70-77; the
    reference's "today" is parameterized here for determinism)."""
    out = seasons.filter(
        (F.col(start_year_col) >= F.lit(min_year))
        & (F.col(start_year_col) <= F.lit(max_year))
    )
    if start_date_col is not None and as_of is not None:
        out = out.filter(F.col(start_date_col) <= F.lit(as_of))
    return out


def newest_file(
    paths: Sequence[str],
    date_pattern: str = r"(\d{8})",
    date_format: str = "%d%m%Y",
) -> str | None:
    """O3: pick the newest file by a date embedded in the filename
    (DEPRECATED/statsbomb-silver.py:114-119 sorts S3 keys by
    ``%d%m%Y`` and takes the last).

    File listings are driver-side metadata (thousands of entries, not
    data), so plain Python is the right tool — no Spark job needed.
    Files without a parseable date are ignored.
    """
    import re
    from datetime import datetime

    best: tuple[datetime, str] | None = None
    for p in paths:
        m = re.search(date_pattern, p)
        if not m:
            continue
        try:
            d = datetime.strptime(m.group(1), date_format)
        except ValueError:
            continue
        if best is None or d > best[0]:
            best = (d, p)
    return best[1] if best else None


def read_parquet_table(
    spark: SparkSession,
    root: str,
    partition_filters: dict[str, object] | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Parquet scan with partition pruning (S4/S5).

    The reference prunes by constructing paths by hand
    (LOADERS/GOLD-data-loader.py:375-387); here a filter on the
    partition column lets Catalyst prune directories, keeping one
    logical dataset.
    """
    df = spark.read.parquet(root)
    for col, val in (partition_filters or {}).items():
        df = df.filter(F.col(col) == F.lit(val))
    if columns:
        df = df.select(*columns)
    return df
