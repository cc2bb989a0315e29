from traits_data_spark.operators.any_union import union_with_coarse_group
from traits_data_spark.operators.flatten import flatten_struct_columns, flattened_columns
from traits_data_spark.operators.incremental import (
    merge_aggregate_states,
    snapshot_diff,
)
from traits_data_spark.operators.layout import write_zordered, zvalue
from traits_data_spark.operators.packing import (
    cdc_chunks,
    chunk_documents,
    pack_contiguous,
)
from traits_data_spark.operators.pivot import pivot_wide, unpivot_long
from traits_data_spark.operators.sampling import (
    deterministic_sample,
    epoch_expand,
    hash_split,
    mixture_plan,
    shuffle_shards,
    stratified_sample,
    temperature_sample,
    temperature_weights,
    token_budget_filter,
)
from traits_data_spark.operators.dedup import (
    substring_dup_profile,
    banded_signatures,
    bloom_decontaminate,
    containment_verify,
    connected_components,
    dedup_clusters,
    incremental_lsh_candidates,
    ngram_decontaminate,
)
from traits_data_spark.operators.similarity import (
    dequantize_int8,
    ivf_topk_hyperplane,
    quantize_int8,
)
from traits_data_spark.operators.similarity import (
    cosine_topk_quantized,
    ivf_topk_kmeans,
    kmeans_clusters,
    kmeans_fit,
    knn_label_eval,
)
from traits_data_spark.operators.text import (
    char_entropy,
    gopher_rules,
    redact_pii,
    repetition_features,
)
from traits_data_spark.operators.analytics import (
    cohort_retention,
    decayed_engagement,
    funnel_steps,
)
from traits_data_spark.operators.sketches import (
    cms_estimate,
    kmv_set_ops,
    count_min_sketch,
    histogram_sketch,
    hll_estimate,
    hll_registers,
    kmv_distinct,
    sampled_quantiles,
)
from traits_data_spark.operators.windows import (
    cumcount,
    dedup_keep_best,
    filter_small_groups,
    last_n_filter,
    rolling_range_agg,
    with_group_rank,
)
from traits_data_spark.operators.selection import (
    dsir_select,
    dsir_select_sampled,
    dsir_weights,
)
from traits_data_spark.operators.zscore import group_zscores
from traits_data_spark.operators.ratings import WeightsHierarchy

__all__ = [
    "union_with_coarse_group",
    "flatten_struct_columns",
    "flattened_columns",
    "merge_aggregate_states",
    "snapshot_diff",
    "write_zordered",
    "zvalue",
    "cdc_chunks",
    "chunk_documents",
    "pack_contiguous",
    "pivot_wide",
    "unpivot_long",
    "deterministic_sample",
    "epoch_expand",
    "hash_split",
    "mixture_plan",
    "shuffle_shards",
    "stratified_sample",
    "temperature_sample",
    "temperature_weights",
    "token_budget_filter",
    "banded_signatures",
    "bloom_decontaminate",
    "containment_verify",
    "connected_components",
    "dedup_clusters",
    "incremental_lsh_candidates",
    "ngram_decontaminate",
    "char_entropy",
    "gopher_rules",
    "dequantize_int8",
    "ivf_topk_hyperplane",
    "cosine_topk_quantized",
    "knn_label_eval",
    "quantize_int8",
    "redact_pii",
    "repetition_features",
    "kmv_distinct",
    "kmv_set_ops",
    "cumcount",
    "dedup_keep_best",
    "filter_small_groups",
    "last_n_filter",
    "rolling_range_agg",
    "with_group_rank",
    "dsir_select",
    "dsir_select_sampled",
    "dsir_weights",
    "group_zscores",
    "WeightsHierarchy",
]
