"""fireball_data_processing_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference repo ``zhudotexe/FIREBALL-data-processing`` (studied read-only at
``/root/reference``), re-expressed as idiomatic Spark DataFrame plans:

- ``sources``   — gzipped-JSONL event ingestion, parquet tables, sinks,
                  checksum memoization (reference ``dataset/utils.py``).
- ``functions`` — the scalar predicate/string/regex/math function library
                  (SURVEY.md section 2.2 / 2.7).
- ``operators`` — sessionization, as-of/nearest joins, run grouping, window
                  search, sampling, dedup, similarity search, multimodal
                  plumbing (SURVEY.md sections 2.3 / 2.5 / 2.6 + extensions).
- ``plans``     — the heuristics suite as single-pass grouped aggregations
                  (reference ``heuristics/``), the distill pipeline stages,
                  and corpus statistics (SURVEY.md sections 2.4 / 3.2).
- ``streaming`` — Structured Streaming wrappers over the same expressions.

Everything is built on the public PySpark DataFrame API; Python UDFs appear
only at the documented edges (recursive tree stringification, pluggable
model inference) and are Arrow-batched.
"""

from fireball_data_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
