from traits_data_spark.plans.corpus import clean_corpus
from traits_data_spark.plans.curation import curate_corpus
from traits_data_spark.plans.silver import ProfileSpec, build_profiles
from traits_data_spark.plans.gold import GoldSpec, build_ratings

__all__ = [
    "ProfileSpec",
    "build_profiles",
    "GoldSpec",
    "build_ratings",
    "clean_corpus",
    "curate_corpus",
]
