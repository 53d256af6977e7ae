"""Structured Streaming surface (SURVEY.md section 2.9)."""

from fireball_data_processing_spark.streaming.heuristics_stream import (
    stream_heuristics,
)

__all__ = ["stream_heuristics"]
