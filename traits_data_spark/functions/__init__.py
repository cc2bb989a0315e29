from traits_data_spark.functions.feature_store import Feature, FeatureStore
from traits_data_spark.functions.scalars import (
    age_at,
    map_lookup,
    portable_hash64,
    surrogate_key,
)

__all__ = [
    "Feature",
    "FeatureStore",
    "age_at",
    "map_lookup",
    "portable_hash64",
    "surrogate_key",
]
