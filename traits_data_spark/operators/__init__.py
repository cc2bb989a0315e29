from traits_data_spark.operators.any_union import union_with_coarse_group
from traits_data_spark.operators.flatten import flatten_struct_columns, flattened_columns
from traits_data_spark.operators.windows import (
    cumcount,
    dedup_keep_best,
    last_n_filter,
    with_group_rank,
)
from traits_data_spark.operators.zscore import group_zscores
from traits_data_spark.operators.ratings import WeightsHierarchy

__all__ = [
    "union_with_coarse_group",
    "flatten_struct_columns",
    "flattened_columns",
    "cumcount",
    "dedup_keep_best",
    "last_n_filter",
    "with_group_rank",
    "group_zscores",
    "WeightsHierarchy",
]
