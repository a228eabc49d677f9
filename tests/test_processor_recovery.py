"""Processor durability & concurrency tests: checkpoint recovery
across restarts (the capability the reference explicitly lacks — its
README documents a start-race data-loss bug it worked around; we get
recovery from the streaming checkpoint for free) and multi-producer
thread safety (the reference is ProducerType.MULTI)."""

from __future__ import annotations

import threading
import time

from batchprocessor_spark.streaming.processor import BatchProcessor, ProcessorConfig

SCHEMA = "id BIGINT, payload STRING"


class CollectingSink:
    def __init__(self):
        self.ids: list[int] = []
        self._lock = threading.Lock()

    def __call__(self, chunk) -> None:
        with self._lock:
            self.ids.extend(int(x) for x in chunk["id"])


def test_restart_resumes_from_checkpoint_no_duplicates(spark, tmp_path):
    """Stop → new processor on the same workdir → already-flushed
    spool files are NOT re-delivered (file-source checkpoint), new
    items are."""
    workdir = str(tmp_path / "proc")
    sink1 = CollectingSink()
    p1 = BatchProcessor(
        spark, SCHEMA, sink1, ProcessorConfig(batch_size=50, spool_size=100), workdir=workdir
    ).start()
    p1.put_many([(i, "a") for i in range(500)])
    p1.stop()
    assert sorted(sink1.ids) == list(range(500))

    sink2 = CollectingSink()
    p2 = BatchProcessor(
        spark, SCHEMA, sink2, ProcessorConfig(batch_size=50, spool_size=100), workdir=workdir
    ).start()
    p2.put_many([(i, "b") for i in range(500, 800)])
    p2.stop()
    # Only the NEW items arrive — the checkpoint skips consumed spools.
    assert sorted(sink2.ids) == list(range(500, 800)), (
        f"expected 300 new ids, got {len(sink2.ids)} "
        f"(min={min(sink2.ids, default=None)})"
    )
    p2.close()


def test_multi_producer_no_loss(spark):
    """8 producer threads × 500 items each — per-producer FIFO feeds
    one buffer; nothing lost, nothing duplicated (the reference's
    multi-producer ring-buffer contract)."""
    sink = CollectingSink()
    p = BatchProcessor(
        spark, SCHEMA, sink, ProcessorConfig(batch_size=128, spool_size=512)
    ).start()

    def produce(tid: int) -> None:
        for i in range(500):
            p.put((tid * 1000 + i, f"t{tid}"))

    threads = [threading.Thread(target=produce, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stats = p.stop()
    assert stats["accepted"] == 4000
    assert len(sink.ids) == 4000
    assert len(set(sink.ids)) == 4000
    p.close()
