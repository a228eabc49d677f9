"""Multi-JVM proof lane (VERDICT r9 task 2): run the engine on
``local-cluster[2,4,2048]`` — TWO real executor JVMs launched as
separate processes, the closest sandbox analogue of a cluster — and
verify the things one big JVM can never exercise:

- `materialize` takes the RELIABLE paths (replicated persist without
  a checkpoint dir, `df.checkpoint()` with one) instead of
  `localCheckpoint`, and iterative operators stay oracle-exact under
  them — including the determinism-critical SNM block-id pinning.
- Cloudpickled executor-side sinks (distributed flow control) cross
  a real process boundary with chunk-granular DLQ and zero loss.
- Arrow exchange, broadcasts, and the headline query plans hold
  across JVMs (oracle-exact vs DuckDB at the same SF).

Reference analogue: the reference's v1 test pins behavior across
thread boundaries (T/DisruptorBatchProcessorTest.java:16-44); this
lane pins behavior across PROCESS boundaries, which is what a
1000-executor cluster actually has.

Run standalone (`python -m scripts.local_cluster_probe`) or via the
pytest wrapper (tests/test_local_cluster.py). Prints one JSON line;
exit code 0 iff every check passed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER = "local-cluster[2,4,2048]"

# Headline-shaped sample across the engine's plan families, each
# oracle-compared at sf0.01: scan+agg, broadcast star join, window
# frame, iterative graph (materialize per round), SNM (materialize
# pins nondeterministic block ids), and the repartition-heavy ROUGE
# kernel (pure-catalyst expression work on executors).
PROBE_QUERIES = [
    "q_agg_basic",
    "q_join_multiway",
    "q_win_frame",
    "q_graph_pagerank",
    "q_dedup_sorted_neighborhood",
    "q_text_rouge_l_pairs",
    # r11 (VERDICT r10 task 3): the salted CPU-bound pair join
    # (hot_key_salted_equi_join + REPARTITION_BY_NUM, the r10
    # AQE-coalescing fix), previously exercised on local[32] only.
    # (The RocksDB-stateful streaming family gets its own dedicated
    # check below so the provider conf is pinned for the run.)
    "q_llm_simsearch_neardup_bucketed",
]


def build_session(tmp: str):
    from pyspark.sql import SparkSession

    from batchprocessor_spark.session import engine_confs

    # FINDING (first probe run, recorded in SCALE.md): executor
    # python workers in multi-JVM mode do NOT inherit the driver's
    # sys.path — every cloudpickled callback that references the
    # package (distributed flow-control sinks, pandas-UDF helpers)
    # dies with ModuleNotFoundError, which local[*] can never catch
    # because there the executor IS the driver process. On a real
    # cluster the engine ships as --py-files / a site-package;
    # executorEnv.PYTHONPATH is the same-host analogue.
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    builder = (
        SparkSession.builder.master(MASTER)
        .appName("bp-local-cluster-probe")
        .config("spark.executorEnv.PYTHONPATH", repo_root)
        # worker/executor logs land under SPARK_WORKER_DIR; keep them
        # inside the probe tmp dir instead of polluting the repo
        .config("spark.worker.dir", os.path.join(tmp, "worker"))
        .config("spark.local.dir", os.path.join(tmp, "sparklocal"))
    )
    for k, v in engine_confs(cpus=8, shuffle_partitions=8).items():
        builder = builder.config(k, v)
    # 2048 MB executors: keep Arrow/python workers modest
    builder = builder.config("spark.executor.memory", "2g")
    return builder.getOrCreate()


def check_materialize_fallback(spark) -> str:
    """Before a checkpoint dir exists: cluster master must route to
    replicated persist (NOT localCheckpoint), and the result must be
    correct and reusable."""
    from batchprocessor_spark.session import materialization_mode, materialize

    mode = materialization_mode(spark.sparkContext.master, False)
    if mode != "replicated_persist":
        return f"fail: mode {mode}"
    out = spark.range(1000).selectExpr("id", "id * 3 AS x").transform(
        materialize
    )
    total = out.agg({"x": "sum"}).collect()[0][0]
    if total != 3 * 999 * 1000 // 2:
        return f"fail: sum {total}"
    if out.storageLevel.replication != 2:
        return f"fail: replication {out.storageLevel.replication}"
    out.unpersist()
    return "pass"


def check_materialize_reliable(spark, tmp: str) -> str:
    """With a checkpoint dir: `materialize` must produce a reliable
    checkpoint (lineage truncated to an RDD scan, files on disk)."""
    from batchprocessor_spark.session import materialization_mode, materialize

    spark.sparkContext.setCheckpointDir(os.path.join(tmp, "ckpt"))
    mode = materialization_mode(spark.sparkContext.master, True)
    if mode != "reliable_checkpoint":
        return f"fail: mode {mode}"
    out = spark.range(1000).selectExpr("id", "id * 5 AS x").transform(
        materialize
    )
    total = out.agg({"x": "sum"}).collect()[0][0]
    if total != 5 * 999 * 1000 // 2:
        return f"fail: sum {total}"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    if "LogicalRDD" not in plan and "ExistingRDD" not in plan:
        return f"fail: lineage not truncated: {plan[:200]}"
    files = glob.glob(os.path.join(tmp, "ckpt", "**", "part-*"), recursive=True)
    if not files:
        return "fail: no checkpoint files written"
    return "pass"


def check_snm_deterministic_under_reliable_path(spark, sf_dir: str) -> str:
    """The SNM candidate stage pins nondeterministic block ids via
    materialize; under the reliable path two runs must agree exactly
    (the determinism-critical re-verification VERDICT r9 task 1 asks
    for)."""
    from batchprocessor_spark.plans.registry import load_all

    spec = load_all()["q_dedup_sorted_neighborhood"]
    a = sorted(map(str, spec.builder(spark, sf_dir).collect()))
    b = sorted(map(str, spec.builder(spark, sf_dir).collect()))
    if a != b:
        return "fail: two runs disagree"
    return "pass"


def check_oracle_parity(spark, sf_dir: str) -> dict[str, str]:
    from batchprocessor_spark.plans.registry import load_all
    from tests.oracle import canonical_rows, duckdb_run

    registry = load_all()
    out = {}
    for name in PROBE_QUERIES:
        spec = registry[name]
        try:
            got = canonical_rows(spec.builder(spark, sf_dir).toPandas())
            want = canonical_rows(duckdb_run(spec.oracle, sf_dir))
            out[name] = "pass" if got == want else "fail: value mismatch"
        except Exception as e:  # noqa: BLE001 - report, don't crash the lane
            out[name] = f"fail: {type(e).__name__}: {e}"[:300]
    return out


def check_distributed_dlq(spark, tmp: str) -> str:
    """The executor-side sink path (cloudpickled python callback +
    chunk-granular DLQ) across a REAL process boundary: poisoned
    chunks dead-letter, everything else delivers exactly once."""
    import pandas as pd

    from batchprocessor_spark.streaming.flow import FlowControlConfig
    from batchprocessor_spark.streaming.processor import foreach_batch_sink

    n_rows = 200
    src = os.path.join(tmp, "dlq_src")
    ok_path = os.path.join(tmp, "dlq_ok")
    dlq = os.path.join(tmp, "dlq_dead")
    os.makedirs(src)
    os.makedirs(ok_path)
    pd.DataFrame({"id": range(n_rows)}).assign(
        pk=lambda d: d["id"] % 8
    ).to_parquet(os.path.join(src, "input.parquet"), index=False)

    def sink(chunk: pd.DataFrame) -> None:
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
        .parquet(src)
        .repartition(4, "pk")
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_sink(sink, cfg, dlq_path=dlq, distributed=True)
        )
        .option("checkpointLocation", os.path.join(tmp, "dlq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    ok_ids = set()
    for f in glob.glob(os.path.join(ok_path, "*.parquet")):
        ok_ids.update(pd.read_parquet(f)["id"].tolist())
    dlq_ids = set()
    for f in glob.glob(os.path.join(dlq, "**", "*.parquet"), recursive=True):
        dlq_ids.update(pd.read_parquet(f)["id"].tolist())
    poisoned = {i for i in range(n_rows) if i % 8 == 0}
    if not poisoned <= dlq_ids:
        return f"fail: {len(poisoned - dlq_ids)} poisoned ids not in DLQ"
    if ok_ids & poisoned:
        return "fail: poisoned ids delivered"
    if ok_ids | dlq_ids != set(range(n_rows)):
        return f"fail: lost {len(set(range(n_rows)) - ok_ids - dlq_ids)} ids"
    return "pass"


def check_work_conserving_budget(spark, tmp: str) -> str:
    """The round-10 proportional budget division across REAL executor
    JVMs: a skewed micro-batch (90/10/10/10 over 4 partitions, global
    tps=40, batch_size=1) must drain in ≈ total/rate wall clock — the
    r9 static split needed ≥ (90−1)/10 = 8.9 s — while the aggregate
    rate stays at the cap, and last_budget must report the shares."""
    import glob as _glob
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from batchprocessor_spark.streaming.flow import FlowControlConfig
    from batchprocessor_spark.streaming.processor import foreach_batch_sink

    probe = spark.createDataFrame(
        [(i,) for i in range(64)], "pk BIGINT"
    ).repartition(4, "pk")
    pmap = {
        r.pk: r.p
        for r in probe.select("pk", F.spark_partition_id().alias("p")).collect()
    }
    by_part: dict[int, int] = {}
    for pk, p in sorted(pmap.items()):
        by_part.setdefault(p, pk)
    if len(by_part) != 4:
        return f"fail: probe found {len(by_part)} partitions"
    heavy_pk, *light_pks = [by_part[p] for p in sorted(by_part)]

    src = os.path.join(tmp, "wc_src")
    marks = os.path.join(tmp, "wc_marks")
    os.makedirs(src)
    os.makedirs(marks)
    pks = [heavy_pk] * 90 + [pk for pk in light_pks for _ in range(10)]
    pd.DataFrame({"id": range(120), "pk": pks}).to_parquet(
        os.path.join(src, "input.parquet"), index=False
    )

    def sink(chunk: pd.DataFrame) -> None:
        import time as _t
        import uuid

        with open(
            os.path.join(marks, f"{_t.time():.6f}-{uuid.uuid4().hex}.mark"),
            "w",
        ) as fh:
            fh.write(str(len(chunk)))

    cfg = FlowControlConfig(batch_size=1, concurrency=8, tps=40.0)
    handle = foreach_batch_sink(
        sink, cfg, distributed=True, budget="proportional"
    )
    stream = (
        spark.readStream.schema("id BIGINT, pk BIGINT")
        .parquet(src)
        .repartition(4, "pk")
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(tmp, "wc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    files = _glob.glob(os.path.join(marks, "*.mark"))
    if len(files) != 120:
        return f"fail: {len(files)}/120 flushes delivered"
    stamps = sorted(float(os.path.basename(f).split("-")[0]) for f in files)
    span = stamps[-1] - stamps[0]
    if span > 7.0:
        return f"fail: span {span:.1f}s — static-split behavior"
    if span < 2.0:
        return f"fail: span {span:.1f}s — budget not applied"
    agg_rate = (len(files) - 4) / span
    if agg_rate > 40 * 1.3:
        return f"fail: aggregate rate {agg_rate:.1f}/s exceeds cap"
    b = handle.last_budget
    if b is None or b.get("mode") != "work_conserving_proportional":
        return f"fail: last_budget {b}"
    if sorted(b["rows_by_partition"].values()) != [10, 10, 10, 90]:
        return f"fail: shares {b['rows_by_partition']}"
    return "pass"


def check_rocksdb_stateful_stream(spark, sf_dir: str) -> str:
    """RocksDB-backed stateful streaming dedup across REAL executor
    JVMs (VERDICT r10 task 3): the state store provider runs JNI-side
    inside each executor process — exactly what local[32] can't
    separate from the driver. Oracle-exact vs DuckDB DISTINCT."""
    from batchprocessor_spark.plans.registry import load_all
    from tests.oracle import canonical_rows, duckdb_run

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        spec = load_all()["q_stream_dedup_state"]
        got = canonical_rows(spec.builder(spark, sf_dir).toPandas())
        want = canonical_rows(duckdb_run(spec.oracle, sf_dir))
        if got != want:
            return f"fail: value mismatch ({len(got)} vs {len(want)} rows)"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return "pass"


def check_escrow_budget(spark, tmp: str) -> str:
    """The round-11 escrow (default distributed budget): every
    executor partition reserves from ONE driver-side bucket over TCP.
    On local-cluster the clients dial from REAL separate JVM worker
    processes — the deployment question (can executors reach the
    driver-side escrow?) answered with the same topology a cluster
    has. Zero loss, aggregate rate at the cap, work-conserving under
    the same 90/10/10/10 skew."""
    import glob as _glob

    import pandas as pd
    from pyspark.sql import functions as F

    from batchprocessor_spark.streaming.flow import FlowControlConfig
    from batchprocessor_spark.streaming.processor import foreach_batch_sink

    probe = spark.createDataFrame(
        [(i,) for i in range(64)], "pk BIGINT"
    ).repartition(4, "pk")
    pmap = {
        r.pk: r.p
        for r in probe.select("pk", F.spark_partition_id().alias("p")).collect()
    }
    by_part: dict[int, int] = {}
    for pk, p in sorted(pmap.items()):
        by_part.setdefault(p, pk)
    if len(by_part) != 4:
        return f"fail: probe found {len(by_part)} partitions"
    heavy_pk, *light_pks = [by_part[p] for p in sorted(by_part)]

    src = os.path.join(tmp, "es_src")
    marks = os.path.join(tmp, "es_marks")
    os.makedirs(src)
    os.makedirs(marks)
    pks = [heavy_pk] * 90 + [pk for pk in light_pks for _ in range(10)]
    pd.DataFrame({"id": range(120), "pk": pks}).to_parquet(
        os.path.join(src, "input.parquet"), index=False
    )

    def sink(chunk: pd.DataFrame) -> None:
        import time as _t
        import uuid

        with open(
            os.path.join(marks, f"{_t.time():.6f}-{uuid.uuid4().hex}.mark"),
            "w",
        ) as fh:
            fh.write(str(len(chunk)))

    cfg = FlowControlConfig(batch_size=1, concurrency=8, tps=40.0)
    handle = foreach_batch_sink(sink, cfg, distributed=True)  # escrow default
    q = (
        spark.readStream.schema("id BIGINT, pk BIGINT")
        .parquet(src)
        .repartition(4, "pk")
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(tmp, "es_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if hasattr(handle, "close"):
        handle.close()

    files = _glob.glob(os.path.join(marks, "*.mark"))
    if len(files) != 120:
        return f"fail: {len(files)}/120 flushes delivered"
    stamps = sorted(float(os.path.basename(f).split("-")[0]) for f in files)
    span = stamps[-1] - stamps[0]
    # one shared 40/s bucket, 1-token once-per-query burst: 120
    # flushes need ≥ (120−1)/40 ≈ 3.0 s no matter how they're spread
    if span < 2.6:
        return f"fail: span {span:.1f}s — cap not enforced"
    if span > 9.0:
        return f"fail: span {span:.1f}s — escrow not work-conserving"
    agg_rate = (len(files) - 1) / span
    if agg_rate > 40 * 1.3:
        return f"fail: aggregate rate {agg_rate:.1f}/s exceeds cap"
    b = handle.last_budget
    if b is None or b.get("mode") != "escrow_shared_limiter":
        return f"fail: last_budget {b}"
    return "pass"


_WHEEL_DEPLOY_CHILD = r'''
"""wheel_deploy child: a fresh driver whose ONLY route to the engine
is the built wheel — no repo on sys.path, no executorEnv.PYTHONPATH.
Asserts (a) the driver imports the package from the wheel, (b) real
executor JVMs resolve it from the shipped artifact (never the repo
checkout), (c) a cloudpickled package-referencing sink — the exact
callback class that died with ModuleNotFoundError when the wheel was
only narrated (SCALE.md r10) — runs executor-side with zero loss."""
import json
import os
import sys

WHEEL = sys.argv[1]
TMP = sys.argv[2]
REPO_PKG = sys.argv[3]  # the checkout path executors must NOT use

sys.path.insert(0, WHEEL)
import batchprocessor_spark.streaming.flow as _fl  # noqa: E402

assert _fl.__file__.startswith(WHEEL), _fl.__file__

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .appName("bp-wheel-deploy")
    .config("spark.worker.dir", os.path.join(TMP, "worker"))
    .config("spark.local.dir", os.path.join(TMP, "sparklocal"))
    .config("spark.executor.memory", "2g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
# the programmatic twin of --py-files: spark.submit.pyFiles is only
# read by spark-submit; addPyFile uses the same fetch+PYTHONPATH
# machinery for sessions built in-process. PySpark registers a python
# include only for PACKAGE_EXTENSIONS = (.zip, .egg, .jar) — a .whl
# is fetched but never put on executor sys.path — so the wheel ships
# under a .zip name (byte-identical; the standard practice for
# wheels over --py-files).
import shutil

WHEEL_ZIP = WHEEL + ".zip"
shutil.copyfile(WHEEL, WHEEL_ZIP)
spark.sparkContext.addPyFile(WHEEL_ZIP)
try:
    def probe_import(_it):
        import batchprocessor_spark.streaming.flow as fl
        yield fl.__file__

    paths = (
        spark.sparkContext.parallelize(range(8), 8)
        .mapPartitions(probe_import)
        .collect()
    )
    assert paths and all(not p.startswith(REPO_PKG) for p in paths), paths
    assert all("batchprocessor_spark" in p for p in paths), paths

    # executor-side flow control from the wheel: the cloudpickled
    # sink builds a FlowController inside each partition
    out_dir = os.path.join(TMP, "sink_out")
    os.makedirs(out_dir, exist_ok=True)

    def per_partition(rows):
        import uuid

        import pandas as pd
        from batchprocessor_spark.streaming.flow import (
            FlowControlConfig,
            FlowController,
        )

        pdf = pd.DataFrame([r.asDict() for r in rows])
        if len(pdf) == 0:
            return

        def sink(chunk):
            chunk.to_parquet(
                os.path.join(out_dir, f"{uuid.uuid4().hex}.parquet"),
                index=False,
            )

        ctrl = FlowController(
            sink, FlowControlConfig(batch_size=16, concurrency=2)
        )
        ctrl.wait(ctrl.submit_batch(pdf))
        ctrl.shutdown()

    df = spark.range(200).repartition(4)
    df.rdd.map(lambda r: r).foreachPartition(per_partition)
    import glob as _glob

    import pandas as _pd

    got = sum(
        len(_pd.read_parquet(f))
        for f in _glob.glob(os.path.join(out_dir, "*.parquet"))
    )
    assert got == 200, got
    print(json.dumps({"wheel_deploy": "pass", "executor_path": paths[0]}))
finally:
    spark.stop()
'''


def check_wheel_deploy(tmp: str) -> str:
    """VERDICT r11 #5: ship the engine to real executor JVMs as a
    BUILT wheel over spark.submit.pyFiles — the deployment mechanism a
    real cluster uses — instead of the executorEnv.PYTHONPATH
    workaround (SCALE.md r10 finding). Runs in a subprocess with a
    scrubbed PYTHONPATH and a neutral cwd so the repo checkout cannot
    leak into either driver or executor import paths."""
    import subprocess

    from scripts.build_wheel import build

    wheel = build(os.path.join(tmp, "dist"))
    child = os.path.join(tmp, "wheel_deploy_child.py")
    with open(child, "w") as f:
        f.write(_WHEEL_DEPLOY_CHILD)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    repo_pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "batchprocessor_spark",
    )
    proc = subprocess.run(
        [sys.executable, child, wheel, tmp, repo_pkg],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=tmp,
        env=env,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout)[-280:]
        return f"fail: rc={proc.returncode}: {tail}"
    last = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(last)
    return (
        "pass"
        if rec.get("wheel_deploy") == "pass"
        else f"fail: {last[:280]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scripts.fixture_layout import ensure_multifile

    sf_dir = ensure_multifile(args.sf_dir)
    results: dict[str, str] = {}
    with tempfile.TemporaryDirectory(prefix="bp_lc_") as tmp:
        spark = build_session(tmp)

        def run(name, fn, *a):
            try:
                results[name] = fn(*a)
            except Exception as e:  # noqa: BLE001 - lane must report, not die
                results[name] = f"fail: {type(e).__name__}: {e}"[:300]

        try:
            assert spark.sparkContext.master == MASTER
            run(
                "materialize_fallback_replicated_persist",
                check_materialize_fallback,
                spark,
            )
            run(
                "materialize_reliable_checkpoint",
                check_materialize_reliable,
                spark,
                tmp,
            )
            run(
                "snm_block_ids_deterministic",
                check_snm_deterministic_under_reliable_path,
                spark,
                sf_dir,
            )
            for k, v in check_oracle_parity(spark, sf_dir).items():
                results[f"parity:{k}"] = v
            run("distributed_flow_dlq", check_distributed_dlq, spark, tmp)
            run(
                "work_conserving_budget",
                check_work_conserving_budget,
                spark,
                tmp,
            )
            run("escrow_budget", check_escrow_budget, spark, tmp)
            run(
                "rocksdb_stateful_stream",
                check_rocksdb_stateful_stream,
                spark,
                sf_dir,
            )
        finally:
            spark.stop()
        # after spark.stop(): the wheel lane runs its own subprocess
        # driver (fresh JVM) — two concurrent local-clusters would
        # fight over worker ports/memory
        run("wheel_deploy", check_wheel_deploy, tmp)

    payload = {"master": MASTER, "sf_dir": sf_dir, "checks": results}
    line = json.dumps(payload, sort_keys=True)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if all(v == "pass" for v in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
