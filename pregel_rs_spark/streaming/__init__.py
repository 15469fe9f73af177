from pregel_rs_spark.streaming.ingest import (
    dedup_content_stream,
    degree_stream,
    dedup_pages_stream,
    run_edges_stream,
    stream_pages,
    stream_pages_to_edges,
    windowed_counts_stream,
    attribution_join_stream,
)
from pregel_rs_spark.streaming.sessions import sessionize_stream

__all__ = [
    "stream_pages",
    "stream_pages_to_edges",
    "dedup_pages_stream",
    "dedup_content_stream",
    "degree_stream",
    "run_edges_stream",
    "sessionize_stream",
    "windowed_counts_stream",
    "attribution_join_stream",
]
