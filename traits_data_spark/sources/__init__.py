from traits_data_spark.sources.readers import (
    read_csv,
    read_json_files,
    read_parquet_table,
    with_filename_column,
)
from traits_data_spark.sources.tables import TESTDATA_TABLES, load_table, load_tables

__all__ = [
    "read_csv",
    "read_json_files",
    "read_parquet_table",
    "with_filename_column",
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
]
