from traits_data_spark.sinks.parquet import write_partitioned_parquet
from traits_data_spark.sinks.upsert import upsert_parquet_partition

__all__ = ["write_partitioned_parquet", "upsert_parquet_partition"]
