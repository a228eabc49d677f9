"""batchprocessor_spark — a PySpark-native analytics & pipeline engine.

A from-scratch engine with the query and data-processing capabilities of
the reference micro-batching dataflow library (xzchaoo/batchprocessor,
surveyed in /root/repo/SURVEY.md), re-expressed Spark-first:

- Relational/analytic query surface (SURVEY §2.2) as declarative
  DataFrame builders optimized by Catalyst (operators/, functions/).
- The reference's dataflow semantics — micro-batch accumulation, flush
  triggers, concurrency & rate limiting, retry + DLQ, graceful drain
  (SURVEY §2.1 O1–O18) — as a Structured-Streaming-backed
  ``BatchProcessor`` facade (streaming/processor.py).
- LLM-data-pipeline extensions (SURVEY §2.4): dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  multimodal binary columns.

Everything is built on public PySpark 4.x APIs only.
"""

from batchprocessor_spark.session import get_spark
from batchprocessor_spark.plans.registry import REGISTRY, QuerySpec, register

__all__ = ["get_spark", "REGISTRY", "QuerySpec", "register"]

__version__ = "0.1.0"
