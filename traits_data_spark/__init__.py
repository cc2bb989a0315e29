"""traits_data_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference sports-analytics ETL platform
(TraitsInsights/traits-data, surveyed in SURVEY.md) as an idiomatic
Spark engine: declarative DataFrame/SQL plans, metadata-driven
aggregation (the "feature store"), window-based ranking and
normalization, broadcast dimension joins, partitioned Parquet and
keyed-upsert sinks — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Design stance (SURVEY.md §7.1): zero Python UDFs in the hot path —
every reference semantic compiles to native Spark expressions so
Catalyst/Tungsten own the physical plan.
"""

__version__ = "0.1.0"

from traits_data_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
