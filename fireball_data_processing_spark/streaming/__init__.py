"""Structured Streaming surface (SURVEY.md section 2.9)."""

from fireball_data_processing_spark.streaming.dedup_stream import (
    stream_new_documents,
)
from fireball_data_processing_spark.streaming.heuristics_stream import (
    stream_heuristics,
)
from fireball_data_processing_spark.streaming.quality_stream import (
    corpus_lm_index,
    quality_gate,
    score_against_lm,
    stream_quality_gate,
)
from fireball_data_processing_spark.streaming.sources_stream import (
    open_event_stream,
)

__all__ = [
    "corpus_lm_index",
    "open_event_stream",
    "quality_gate",
    "score_against_lm",
    "stream_heuristics",
    "stream_new_documents",
    "stream_quality_gate",
]
