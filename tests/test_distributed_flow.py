"""End-to-end distributed flow control (VERDICT r2 item 5): a real
multi-partition stream driven through foreach_batch_sink(
distributed=True) with a partially-failing sink must dead-letter the
poisoned chunks under per-epoch/partition DLQ subpaths and deliver
everything else — zero loss, no double-delivery, chunk-granular
failure isolation (the executor-side twin of test_retry_then_dlq)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from batchprocessor_spark.streaming.flow import FlowControlConfig

# r13 fast-lane split (VERDICT r12 #2): multi-minute soak/throughput
# semantics — opt-in slow lane, excluded from the default run.
pytestmark = pytest.mark.slow
from batchprocessor_spark.streaming.processor import foreach_batch_sink

N_ROWS = 200


def test_distributed_retry_dlq_zero_loss(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ok_dir = tmp_path / "ok"
    ok_dir.mkdir()
    dlq = str(tmp_path / "dlq")
    ok_path = str(ok_dir)

    pd.DataFrame({"id": range(N_ROWS)}).assign(
        pk=lambda d: d["id"] % 8
    ).to_parquet(src / "input.parquet", index=False)

    def sink(chunk: pd.DataFrame) -> None:
        # Executor-side sink: poison pill on pk==0 rows; successful
        # chunks are persisted so delivery is observable across the
        # python-worker process boundary.
        import uuid

        if (chunk["pk"] == 0).any():
            raise RuntimeError("poisoned chunk")
        chunk.to_parquet(
            os.path.join(ok_path, f"{uuid.uuid4().hex}.parquet"), index=False
        )

    cfg = FlowControlConfig(
        batch_size=16, concurrency=2, max_retry_count=1, retry_delay_s=0.01
    )
    stream = (
        spark.readStream.schema("id BIGINT, pk BIGINT")
        .parquet(str(src))
        .repartition(4, "pk")
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_sink(sink, cfg, dlq_path=dlq, distributed=True)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"

    dlq_files = glob.glob(f"{dlq}/**/*.parquet", recursive=True)
    assert dlq_files, "expected per-partition DLQ parquet files"
    dlq_ids = set(
        pd.concat([pd.read_parquet(f) for f in dlq_files])["id"].tolist()
    )
    ok_files = glob.glob(f"{ok_path}/*.parquet")
    ok_ids = (
        set(pd.concat([pd.read_parquet(f) for f in ok_files])["id"].tolist())
        if ok_files
        else set()
    )

    # Zero loss, no double delivery.
    assert dlq_ids | ok_ids == set(range(N_ROWS))
    assert not (dlq_ids & ok_ids)
    # Every poisoned row is dead-lettered; no poisoned row "succeeds";
    # and the healthy partitions really did deliver.
    poisoned = {i for i in range(N_ROWS) if i % 8 == 0}
    assert poisoned <= dlq_ids
    assert not (poisoned & ok_ids)
    assert ok_ids, "expected at least the pk!=0 partitions to deliver"
    # DLQ provenance: epoch=<n>/partition=<m> subpaths, and the poison
    # pk hashes to exactly one partition.
    rels = [os.path.relpath(f, dlq).split(os.sep) for f in dlq_files]
    assert all(r[0].startswith("epoch=") and r[1].startswith("partition=") for r in rels)
    assert len({r[1] for r in rels}) == 1


def test_distributed_tps_budget_preserves_global_rate(spark, tmp_path):
    """VERDICT r8 #2: distributed mode must honor the GLOBAL tps
    budget, not multiply it by partition count. 120 rows round-robin
    over 4 partitions, global tps=40, batch_size=1 → the per-epoch
    division gives each partition a 10/s bucket pinned to a 1-token
    burst (buckets are rebuilt per micro-batch, so anything larger
    would be re-granted every epoch), so a 30-flush partition needs
    ≥ (30−1)/10 = 2.9 s of wall clock (the reference-style envelope,
    T/DisruptorBatchProcessorTest.java:43). Pre-fix each partition
    ran the full 40/s bucket with a 40-token burst and the epoch
    drained instantly — the wall-clock floor is the signal. The
    per-epoch division is surfaced on the handle as last_budget."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    marks = tmp_path / "marks"
    marks.mkdir()
    marks_path = str(marks)

    pd.DataFrame({"id": range(120)}).to_parquet(src / "input.parquet", index=False)

    def sink(chunk: pd.DataFrame) -> None:
        import time as _t
        import uuid

        with open(
            os.path.join(marks_path, f"{_t.time():.6f}-{uuid.uuid4().hex}.mark"),
            "w",
        ) as fh:
            fh.write(str(len(chunk)))

    cfg = FlowControlConfig(batch_size=1, concurrency=8, tps=40.0)
    handle = foreach_batch_sink(
        sink, cfg, distributed=True, budget="proportional"
    )
    stream = (
        spark.readStream.schema("id BIGINT").parquet(str(src)).repartition(4)
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"
    wall = time.perf_counter() - t0

    files = glob.glob(f"{marks_path}/*.mark")
    assert len(files) == 120  # zero loss, one flush per item
    stamps = sorted(float(os.path.basename(f).split("-")[0]) for f in files)
    span = stamps[-1] - stamps[0]
    # Budget floor: the busiest partition (30 flushes at 10/s with a
    # 1-token burst) cannot finish in under ~2.9 s; allow scheduler
    # slack down to 2.0 s. Pre-fix the whole epoch's marks landed
    # within ~0.1 s.
    assert span >= 2.0, span
    assert wall < 60, wall  # and the budget is applied, not wedged
    # Aggregate rate over the marked window stays near the global
    # budget: 40/s + the 4×1 per-epoch burst amortized over the span.
    agg_rate = (len(files) - 4) / span  # per-epoch burst excluded
    assert agg_rate <= 40 * 1.3, (agg_rate, span)

    b = handle.last_budget
    assert b is not None and b["num_partitions"] == 4
    assert b["mode"] == "work_conserving_proportional"
    # 120 rows round-robin over 4 partitions: equal 30-row shares, so
    # the proportional division reproduces the old static 10/s split.
    assert b["rows_by_partition"] == {0: 30, 1: 30, 2: 30, 3: 30}
    assert set(b["tps_by_partition"].values()) == {10.0}
    assert b["aggregate_tps_bound"] == 40.0
    assert set(b["concurrency_by_partition"].values()) == {2}
    assert b["aggregate_concurrency_bound"] == 8
    assert b["per_epoch_burst_flushes"] == 4
    assert b["per_epoch_burst_items"] == 4  # batch_size=1


def test_distributed_budget_is_work_conserving_under_skew(spark, tmp_path):
    """VERDICT r9 task 4: the global budget must be divided by ROW
    SHARE, not statically by partition count, so a skewed epoch
    finishes at ≈ total/global_rate instead of max_partition/(rate/n).

    120 rows, 4 hash partitions with a 90/10/10/10 skew, global
    tps=40, batch_size=1: proportional shares give the heavy
    partition 30/s → its 90 flushes need ≥ (90−1)/30 ≈ 2.97 s and the
    whole epoch lands near 3 s. The old static split gave it 10/s →
    ≥ (90−1)/10 = 8.9 s with the other three budgets idle after 0.9 s
    — the ≤ 7 s ceiling is what separates the two behaviors. The
    aggregate rate must STILL honor the global cap (reference
    semantics: one shared limiter, V1/MixedLimiter.java:16-43)."""
    import time

    from pyspark.sql import functions as F

    # Find four pk values that hash to four DISTINCT partitions under
    # repartition(4, pk) — Murmur3 is fixed-seed, but probing keeps
    # the test independent of hash internals.
    probe = spark.createDataFrame(
        [(i,) for i in range(64)], "pk BIGINT"
    ).repartition(4, "pk")
    pmap = {
        r.pk: r.p
        for r in probe.select(
            "pk", F.spark_partition_id().alias("p")
        ).collect()
    }
    by_part: dict[int, int] = {}
    for pk, p in sorted(pmap.items()):
        by_part.setdefault(p, pk)
    assert len(by_part) == 4, by_part
    heavy_pk, *light_pks = [by_part[p] for p in sorted(by_part)]

    src = tmp_path / "src"
    src.mkdir()
    marks = tmp_path / "marks"
    marks.mkdir()
    marks_path = str(marks)

    pks = [heavy_pk] * 90 + [pk for pk in light_pks for _ in range(10)]
    pd.DataFrame({"id": range(120), "pk": pks}).to_parquet(
        src / "input.parquet", index=False
    )

    def sink(chunk: pd.DataFrame) -> None:
        import time as _t
        import uuid

        with open(
            os.path.join(
                marks_path, f"{_t.time():.6f}-{uuid.uuid4().hex}.mark"
            ),
            "w",
        ) as fh:
            fh.write(str(len(chunk)))

    cfg = FlowControlConfig(batch_size=1, concurrency=8, tps=40.0)
    handle = foreach_batch_sink(
        sink, cfg, distributed=True, budget="proportional"
    )
    stream = (
        spark.readStream.schema("id BIGINT, pk BIGINT")
        .parquet(str(src))
        .repartition(4, "pk")
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"

    files = glob.glob(f"{marks_path}/*.mark")
    assert len(files) == 120  # zero loss
    stamps = sorted(float(os.path.basename(f).split("-")[0]) for f in files)
    span = stamps[-1] - stamps[0]
    # Work-conserving: heavy partition runs at 30/s, so the epoch
    # clears in ~3 s — the static split's 8.9 s floor must be beaten
    # decisively. Lower bound pins that the budget still throttles.
    assert span <= 7.0, span
    assert span >= 2.4, span
    # Aggregate sustained rate ≤ global cap (+ per-epoch burst slack).
    agg_rate = (len(files) - 4) / span
    assert agg_rate <= 40 * 1.3, (agg_rate, span)

    b = handle.last_budget
    assert b["mode"] == "work_conserving_proportional"
    assert sorted(b["rows_by_partition"].values()) == [10, 10, 10, 90]
    # Σ tps_i = the global rate, exactly.
    assert abs(sum(b["tps_by_partition"].values()) - 40.0) < 1e-9
    # The heavy partition got 3/4 of the budget.
    assert max(b["tps_by_partition"].values()) == 30.0


def test_flow_controller_burst_pins_apply():
    """The distributed-mode burst pins wire through FlowController:
    with tps=10 and tps_burst=1, six 1-row flushes need five refills
    (≥ ~0.5 s) — under the driver-mode default burst they would all
    be free (code-review r9 finding #1)."""
    import time

    from batchprocessor_spark.streaming.flow import FlowController

    done = []
    ctrl = FlowController(
        lambda chunk: done.append(len(chunk)),
        FlowControlConfig(batch_size=1, concurrency=2, tps=10.0, tps_burst=1.0),
    )
    t0 = time.perf_counter()
    ctrl.wait(ctrl.submit_batch(pd.DataFrame({"id": range(6)})))
    dt = time.perf_counter() - t0
    ctrl.shutdown()
    assert sum(done) == 6
    assert dt >= 0.45, dt


def test_distributed_budget_holds_across_epochs(spark, tmp_path):
    """Cross-epoch budget (code-review r9 finding #1, the streaming
    half): two micro-batches (maxFilesPerTrigger=1, two input files)
    each rebuild the per-partition controllers, so with the old
    driver-default burst the second epoch's flushes would again be
    free; with the pinned 1-token burst the TOTAL span must cover
    both epochs' refills minus the reported per-epoch allowance."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    marks = tmp_path / "marks"
    marks.mkdir()
    marks_path = str(marks)

    pd.DataFrame({"id": range(60)}).to_parquet(src / "a.parquet", index=False)
    pd.DataFrame({"id": range(60, 120)}).to_parquet(
        src / "b.parquet", index=False
    )

    def sink(chunk: pd.DataFrame) -> None:
        import time as _t
        import uuid

        with open(
            os.path.join(marks_path, f"{_t.time():.6f}-{uuid.uuid4().hex}.mark"),
            "w",
        ) as fh:
            fh.write(str(len(chunk)))

    cfg = FlowControlConfig(batch_size=1, concurrency=8, tps=40.0)
    handle = foreach_batch_sink(
        sink, cfg, distributed=True, budget="proportional"
    )
    stream = (
        spark.readStream.schema("id BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .repartition(4)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"

    files = glob.glob(f"{marks_path}/*.mark")
    assert len(files) == 120
    stamps = sorted(float(os.path.basename(f).split("-")[0]) for f in files)
    span = stamps[-1] - stamps[0]
    # Per epoch: 15 flushes/partition at 10/s with 1 free token
    # → ≥ 1.4 s each; two epochs ≥ ~2.8 s end to end. The pre-fix
    # default burst (10 tokens/partition/epoch) would let each epoch
    # finish in ~0.5 s.
    assert span >= 2.4, span
    assert handle.last_budget["epoch_id"] >= 1  # really saw 2 epochs
    assert handle.last_budget["per_epoch_burst_flushes"] == 4


def test_token_escrow_reserve_semantics():
    """Pure-python pin of the escrow server/client pair (no Spark):
    Guava-style reservations — balances go negative, each caller
    sleeps its own deficit — so N items through the shared bucket
    take ≥ (N − burst)/rate regardless of who asks, and a second
    client is throttled by the FIRST client's reservations (one
    limiter, reference V1/MixedLimiter.java:16-43 semantics)."""
    import time

    from batchprocessor_spark.streaming.flow import (
        EscrowClient,
        TokenEscrowServer,
    )

    srv = TokenEscrowServer(tps=0.0, ips=100.0, tps_burst=1.0, ips_burst=10.0)
    try:
        # unauthenticated peers are dropped (the bucket is a shared
        # resource on an open port — code-review r11)
        import pytest as _pytest

        rogue = EscrowClient(("127.0.0.1", srv.port), token="wrong")
        with _pytest.raises(ConnectionError):
            rogue.acquire(1, 1)
        assert srv.reservations == 0

        a = EscrowClient(("127.0.0.1", srv.port), srv.token)
        b = EscrowClient(("127.0.0.1", srv.port), srv.token)
        t0 = time.perf_counter()
        a.acquire(1, 10)   # burst covers it — free
        a.acquire(1, 50)
        b.acquire(1, 50)   # second CLIENT pays for a's reservation too
        dt = time.perf_counter() - t0
        # 110 items, 10 free, 100/s -> >= ~1.0 s even split across
        # two clients; the self-paid deficit makes it <= ~2 s.
        assert dt >= 0.9, dt
        assert dt <= 3.0, dt
        assert srv.reservations == 3
    finally:
        srv.close()


def test_escrow_budget_borrows_across_sink_latencies(spark, tmp_path):
    """VERDICT r10 task 2: mid-epoch budget borrowing. Two partitions
    with EQUAL row counts but heterogeneous sink latencies: the slow
    partition is sink-bound (uses ~125 of the 400 ips the row-share
    split would grant it); under the escrow the fast partition must
    absorb the idle budget MID-EPOCH and drain in
    ≈ items / (rate − slow_consumption) ≈ 1000/275 ≈ 3.6 s, where the
    r10 proportional split pinned it at items/(rate/2) = 5 s. Both
    runs must hold the aggregate cap."""
    import time

    from pyspark.sql import functions as F

    # two pk values that land in distinct partitions of repartition(2)
    probe = spark.createDataFrame(
        [(i,) for i in range(32)], "pk BIGINT"
    ).repartition(2, "pk")
    pmap = {
        r.pk: r.p
        for r in probe.select(
            "pk", F.spark_partition_id().alias("p")
        ).collect()
    }
    by_part: dict[int, int] = {}
    for pk, p in sorted(pmap.items()):
        by_part.setdefault(p, pk)
    assert len(by_part) == 2, by_part
    fast_pk, slow_pk = [by_part[p] for p in sorted(by_part)]

    def run(mode: str, sub: str) -> tuple[float, float, int]:
        src = tmp_path / sub / "src"
        src.mkdir(parents=True)
        marks = tmp_path / sub / "marks"
        marks.mkdir()
        marks_path = str(marks)

        pks = [fast_pk] * 1000 + [slow_pk] * 1000
        pd.DataFrame({"id": range(2000), "pk": pks}).to_parquet(
            src / "input.parquet", index=False
        )

        slow = slow_pk

        def sink(chunk: pd.DataFrame) -> None:
            import time as _t
            import uuid

            if int(chunk["pk"].iloc[0]) == slow:
                _t.sleep(0.4)  # slow bulk API: 0.4 s per 50-item call
            tag = "slow" if int(chunk["pk"].iloc[0]) == slow else "fast"
            with open(
                os.path.join(
                    marks_path,
                    f"{_t.time():.6f}-{tag}-{uuid.uuid4().hex}.mark",
                ),
                "w",
            ) as fh:
                fh.write(str(len(chunk)))

        # concurrency 2 -> 1 in-flight flush per partition, so the
        # slow partition's sink floor is 20 × 0.4 = 8 s and its ips
        # consumption is ~125/s of the 400/s global cap.
        cfg = FlowControlConfig(batch_size=50, concurrency=2, ips=400.0)
        handle = foreach_batch_sink(sink, cfg, distributed=True, budget=mode)
        stream = (
            spark.readStream.schema("id BIGINT, pk BIGINT")
            .parquet(str(src))
            .repartition(2, "pk")
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(tmp_path / sub / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not drain"
        if hasattr(handle, "close"):
            handle.close()

        files = glob.glob(f"{marks_path}/*.mark")
        assert len(files) == 40, len(files)  # zero loss: 2000/50
        stamps = sorted(
            (float(os.path.basename(f).split("-")[0]), os.path.basename(f))
            for f in files
        )
        t_first = stamps[0][0]
        fast_done = max(t for t, n in stamps if "-fast-" in n) - t_first
        span = stamps[-1][0] - t_first
        return fast_done, span, len(files)

    fast_escrow, span_e, n_e = run("escrow", "escrow")
    # aggregate cap holds: 2000 items over the span, minus the
    # one-time 50-item burst
    agg = (n_e * 50 - 50) / span_e
    assert agg <= 400 * 1.25, (agg, span_e)
    # borrowing: the fast partition clears at ~275+/s, decisively
    # under the 5 s share-bound wall (ideal ≈ 3.6 s)
    assert fast_escrow <= 4.5, fast_escrow

    fast_prop, span_p, _ = run("proportional", "prop")
    # shares fixed at dispatch: the fast partition is pinned at
    # rate/2 = 200/s -> >= ~4.75 s even with the burst
    assert fast_prop >= 4.5, fast_prop
    # and the two behaviors are separated in the right direction
    assert fast_escrow < fast_prop, (fast_escrow, fast_prop)


def test_escrow_is_default_and_reported(spark, tmp_path):
    """distributed=True defaults to the escrow (the reference's one
    shared limiter); last_budget reports the mode, the address, and
    the once-per-query burst accounting."""
    src = tmp_path / "src"
    src.mkdir()
    seen = []

    pd.DataFrame({"id": range(40)}).to_parquet(
        src / "input.parquet", index=False
    )
    out = tmp_path / "out"
    out.mkdir()
    out_path = str(out)

    def sink(chunk: pd.DataFrame) -> None:
        import uuid

        chunk.to_parquet(
            os.path.join(out_path, f"{uuid.uuid4().hex}.parquet"),
            index=False,
        )

    cfg = FlowControlConfig(batch_size=10, concurrency=4, tps=50.0)
    handle = foreach_batch_sink(sink, cfg, distributed=True)
    q = (
        spark.readStream.schema("id BIGINT")
        .parquet(str(src))
        .repartition(4)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    b = handle.last_budget
    assert b["mode"] == "escrow_shared_limiter"
    assert b["escrow_addr"] is not None
    assert b["per_epoch_burst_flushes"] == 0
    assert b["query_burst_flushes"] == 1
    assert b["aggregate_tps_bound"] == 50.0
    assert handle.escrow_server is not None
    # zero loss through the escrow path
    got = sum(
        len(pd.read_parquet(f)) for f in glob.glob(f"{out_path}/*.parquet")
    )
    assert got == 40
    handle.close()
    assert handle.escrow_server is None


def test_escrow_reply_cache_bounded_across_epochs():
    """VERDICT r11 #1 (soak-shaped): every micro-batch builds fresh
    EscrowClients with new uuids, so an unbounded idempotency cache
    gains one entry per (partition × epoch) for the life of a
    long-running streaming query (~17M entries/day at 200 partitions
    × 1 s epochs). The cache is now LRU-bounded: drive many epochs ×
    partitions through ONE server and assert the dict never exceeds
    its cap while every reservation is still served."""
    from batchprocessor_spark.streaming.flow import (
        EscrowClient,
        TokenEscrowServer,
    )

    srv = TokenEscrowServer(
        tps=1e9, ips=1e9, tps_burst=1e9, ips_burst=1e9, replies_cap=32
    )
    try:
        epochs, partitions = 100, 4
        for _ in range(epochs):
            clients = [
                EscrowClient(("127.0.0.1", srv.port), srv.token)
                for _ in range(partitions)
            ]
            for c in clients:
                c.acquire(1.0, 50.0)
            for c in clients:
                c.close()
            assert len(srv._replies) <= 32
        assert srv.reservations == epochs * partitions
        assert len(srv._replies) <= 32
    finally:
        srv.close()


def test_escrow_replay_with_bounded_cache():
    """A resent (cid, seq) — the write-succeeded/read-failed retry —
    must replay the cached grant instead of double-deducting, and the
    LRU bound must not evict the entry within a normal retry window
    (eviction needs >cap OTHER reservations in between)."""
    import socket

    from batchprocessor_spark.streaming.flow import TokenEscrowServer

    srv = TokenEscrowServer(tps=0.0, ips=10.0, tps_burst=1.0, ips_burst=5.0)
    try:
        conn = socket.create_connection(("127.0.0.1", srv.port))
        rf = conn.makefile("rwb")
        msg = f"{srv.token} clientA 1 1.0 30.0\n".encode()
        rf.write(msg)
        rf.flush()
        first = float(rf.readline())
        # replay the SAME seq on a NEW connection (the client resets
        # its socket before retrying)
        conn2 = socket.create_connection(("127.0.0.1", srv.port))
        rf2 = conn2.makefile("rwb")
        rf2.write(msg)
        rf2.flush()
        second = float(rf2.readline())
        assert srv.reservations == 1  # no re-reserve
        assert second == first  # identical cached grant
        conn.close()
        conn2.close()
    finally:
        srv.close()


def test_escrow_warns_past_measured_ceiling():
    """VERDICT r11 #2: the escrow's reservation ceiling is MEASURED
    (scripts/escrow_bench.py, SCALE.md); configuring a rate whose
    implied request rate exceeds half of it warns and points at
    budget="proportional". Low rates and proportional mode stay
    silent."""
    import warnings

    import pytest

    def sink(chunk):
        pass

    with pytest.warns(RuntimeWarning, match="escrow"):
        foreach_batch_sink(
            sink, FlowControlConfig(tps=5000.0), distributed=True
        )
    # ips-implied request rate: ips / batch_size
    with pytest.warns(RuntimeWarning, match="reservations/sec"):
        foreach_batch_sink(
            sink,
            FlowControlConfig(ips=8_000_000.0, batch_size=1024),
            distributed=True,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        foreach_batch_sink(
            sink, FlowControlConfig(tps=100.0), distributed=True
        )
        foreach_batch_sink(
            sink,
            FlowControlConfig(tps=5000.0),
            distributed=True,
            budget="proportional",
        )
        # tps binds before the huge implied-ips rate: no warning
        foreach_batch_sink(
            sink,
            FlowControlConfig(tps=100.0, ips=8_000_000.0, batch_size=1024),
            distributed=True,
        )


def test_escrow_server_closed_when_handle_dropped():
    """ADVICE r11 #3: a user who drops the handle without close()
    previously leaked the server socket + accept thread for the
    process lifetime. A weakref finalizer now closes the server when
    the handle is garbage-collected (close() remains the contract)."""
    import gc

    from batchprocessor_spark.streaming.processor import _ensure_escrow

    def handle(df, epoch_id):
        pass

    handle.escrow_server = None
    handle.escrow_addr = None

    class _NoSpark:
        @property
        def sparkContext(self):
            raise RuntimeError("no session")

    addr, token = _ensure_escrow(
        handle, FlowControlConfig(tps=10.0), _NoSpark()
    )
    srv = handle.escrow_server
    assert addr is not None and token == srv.token
    assert not srv._closed
    del handle
    gc.collect()
    assert srv._closed
