from traits_data_spark.plans.silver import ProfileSpec, build_profiles
from traits_data_spark.plans.gold import GoldSpec, build_ratings

__all__ = ["ProfileSpec", "build_profiles", "GoldSpec", "build_ratings"]
