"""Scalar function library (SURVEY.md sections 2.2 and 2.7)."""

from fireball_data_processing_spark.functions import predicates, text, textstats

__all__ = ["predicates", "text", "textstats"]
