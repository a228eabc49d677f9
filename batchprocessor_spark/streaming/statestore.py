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

_BOUNDED_KEY = "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
_MAX_MEM_KEY = "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"


@contextmanager
def rocksdb_state(spark: SparkSession, bounded_memory_mb: int | None = None):
    """Start stateful streaming queries inside this block to back their
    state with RocksDB (disk-backed) instead of the default in-memory
    map. Restores the previous confs on exit.

    ``bounded_memory_mb`` additionally turns on RocksDB's
    write-buffer-manager + shared-block-cache memory cap (Spark's
    ``boundedMemoryUsage``/``maxMemoryUsageMB``): native state memory
    is then HARD-capped per executor no matter how many keys
    accumulate — the knob a 100 TB deployment sets so state growth
    spends disk, not RAM. tests/test_stateful_rocksdb.py measures the
    effect quantitatively against the in-memory provider on an
    identical growing-key workload."""
    prev: dict[str, str | None] = {}
    for key in (PROVIDER_KEY, _BOUNDED_KEY, _MAX_MEM_KEY):
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
    spark.conf.set(PROVIDER_KEY, ROCKSDB_PROVIDER)
    if bounded_memory_mb is not None:
        spark.conf.set(_BOUNDED_KEY, "true")
        spark.conf.set(_MAX_MEM_KEY, str(bounded_memory_mb))
    try:
        yield
    finally:
        for key, value in prev.items():
            if value is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, value)
