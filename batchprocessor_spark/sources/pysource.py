"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-documents generator.

Demonstrates the engine's source extensibility beyond file formats —
the same API surface a proprietary feed/queue connector would use.
Rows are generated per partition from a seeded LCG, so reads are
fully deterministic and embarrassingly parallel (no driver-side data,
each executor generates its own partition).

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 10000).option("partitions", 16).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "data spark table row column scan filter join agg window sort hash "
    "merge batch stream value key query fast slow big small the a part "
    "order line customer vector group"
).split()

_LANGS = ("en", "de", "es", "fr", "zh")


class _Part(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticDocsDataSource(DataSource):
    """Format name: ``synthetic_docs``. Options: rows (default 1000),
    partitions (default 8), seed (default 42), words_min/words_max."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, text STRING, lang STRING, n_words INT"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.words_min = int(options.get("words_min", 20))
        self.words_max = int(options.get("words_max", 200))

    def partitions(self) -> list[_Part]:
        per = -(-self.rows // self.num_partitions)  # ceil div
        return [
            _Part(i, i * per, min((i + 1) * per, self.rows))
            for i in range(self.num_partitions)
            if i * per < self.rows
        ]

    def read(self, partition: _Part):
        # Seeded LCG (numerical recipes constants): deterministic per
        # doc_id regardless of partitioning.
        m = 2**63
        span = self.words_max - self.words_min + 1
        for doc_id in range(partition.start, partition.end):
            state = (self.seed * 6364136223846793005 + doc_id * 1442695040888963407) % m

            def nxt() -> int:
                nonlocal state
                state = (state * 6364136223846793005 + 1442695040888963407) % m
                return state >> 16

            n_words = self.words_min + nxt() % span
            words = [_VOCAB[nxt() % len(_VOCAB)] for _ in range(n_words)]
            lang = _LANGS[nxt() % len(_LANGS)]
            yield (doc_id, " ".join(words), lang, n_words)
