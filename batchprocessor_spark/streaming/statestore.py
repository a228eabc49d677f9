"""State-store backend selection for stateful streaming.

Spark's default state store (HDFSBackedStateStoreProvider) keeps every
operator's keyed state as an in-memory hash map per shuffle partition,
snapshotted to the checkpoint. That is the right default for the
engine's replay harness, but at 100 TB of keys (watermark dedup over
a firehose, large session windows) state becomes executor-MEMORY-bound
long before it is compute-bound.

The production posture for large state is the RocksDB provider that
ships with Spark: state lives off-heap in a local RocksDB instance per
partition (disk-backed, block-cache bounded), changelog-checkpointed
to the same location. Switching providers changes WHERE state lives,
never WHAT the query computes — results must be identical; pinned by
tests/test_stateful_rocksdb.py (oracle parity + the sustained-failure
soak re-run under RocksDB).

The provider class is read when a streaming query STARTS and is then
pinned into its checkpoint, so `rocksdb_state(spark)` wraps query
construction+start; an existing checkpoint keeps its original
provider.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state(spark: SparkSession):
    """Start stateful streaming queries inside this block to back their
    state with RocksDB (disk-backed, bounded memory) instead of the
    default in-memory map. Restores the previous provider on exit."""
    try:
        prev = spark.conf.get(PROVIDER_KEY)
    except Exception:
        prev = None
    spark.conf.set(PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prev)
