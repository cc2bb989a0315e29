from traits_data_spark.streaming.bronze import (
    stream_json_landing,
    upsert_each_batch,
    windowed_event_counts,
)

__all__ = ["stream_json_landing", "upsert_each_batch", "windowed_event_counts"]
