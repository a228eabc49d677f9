"""Structured-Streaming realization of the reference's dataflow
semantics (SURVEY.md §2.1/§2.3): the BatchProcessor facade and the
q_stream_* queries."""

from batchprocessor_spark.streaming import queries  # noqa: F401
