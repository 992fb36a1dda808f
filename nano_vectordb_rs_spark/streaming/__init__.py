from nano_vectordb_rs_spark.streaming.collection_stream import stream_upsert
from nano_vectordb_rs_spark.streaming.events_stream import (
    dedup_counts_stream,
    hourly_counts_stream,
    purchase_click_join_stream,
    read_events_stream,
    run_available_now,
    sessionize_stream,
)

__all__ = [
    "read_events_stream",
    "dedup_counts_stream",
    "hourly_counts_stream",
    "purchase_click_join_stream",
    "sessionize_stream",
    "run_available_now",
    "stream_upsert",
]
