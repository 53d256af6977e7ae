"""Structured Streaming surface (SURVEY.md section 2.9)."""

from fireball_data_processing_spark.streaming.dedup_stream import (
    stream_new_documents,
)
from fireball_data_processing_spark.streaming.heuristics_stream import (
    stream_heuristics,
)

__all__ = ["stream_heuristics", "stream_new_documents"]
