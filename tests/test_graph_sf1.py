"""Full-sf1 correctness signals for the graph family (VERDICT r7 #4).

The graph ORACLES are super-linear (the triangle oracle is an edge³
join; PageRank is a 5-round recursive CTE) and infeasible at full sf1,
so r7 excluded the family from sf1 hash parity. Round 8 closes that
two ways:

1. exact hash parity on an sf1-DERIVED induced subsample where the
   oracles are feasible (`PARITY_SF1.json` key ``sf1graph``, built by
   scripts/fixture_layout.ensure_sf1_graph_sample, recorded by the
   standard gen_parity lane) — pinned here as an artifact gate;
2. engine-independent MATHEMATICAL invariants at FULL sf1, live in
   this file: quantities any correct implementation must satisfy
   regardless of engine (PageRank teleport floor + mass conservation
   of the integer formulation; k-core degrees bounded by full-graph
   degrees). These run the real builders over the real 6M-row sf1
   tables — seconds on the engine side.

Skipped wholesale when the repo-local sf1 data is absent."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.testdata_big/sf1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1), reason="repo-local sf1 data not generated"
)

REGISTRY = load_all()

GRAPH_FAMILY = (
    "q_graph_pagerank",
    "q_graph_kcore",
    "q_graph_random_walk",
    "q_graph_link_prediction",
    "q_graph_triangle_count",
)


def test_sf1graph_parity_recorded_and_green():
    """Artifact gate: every graph query carries a green hash-parity
    record on the sf1-derived subgraph, and the exclusion list is the
    two DECLARED O(n²) baselines (the r7 'done' criterion) plus the
    round-10 measured fixture-artifact exclusion (q_llm_tfcos_pairs:
    the caesar-rotated sf1 corpus dilutes df fractions 10×, so the
    corpus-relative stopword cut keeps 2.17e9 candidate pairs — see
    the excluded-entry text in PARITY_SF1.json)."""
    with open(os.path.join(os.path.dirname(__file__), "..", "PARITY_SF1.json")) as f:
        data = json.load(f)
    for name in GRAPH_FAMILY:
        rec = data["queries"].get(name, {}).get("sf1graph")
        assert rec, f"{name} has no sf1graph parity record"
        assert (
            rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        ) and rec["err"] is None, (name, rec)
    assert set(data.get("excluded", {})) == {
        "q_llm_simsearch_neardup",
        "q_llm_simsearch_neardup_lsh",
        "q_llm_tfcos_pairs",
    }, data.get("excluded")


def test_pagerank_mass_conservation_full_sf1(spark):
    """Integer PageRank at full sf1 (≈6M lineitem → the bipartite
    supplier→customer graph): every node keeps at least the teleport
    floor 15%·b, the node set is exactly the graph's vertex set, and
    total mass never exceeds the initial n·b (floor divisions only
    LOSE mass) while losing at most a per-round rounding sliver —
    the conservation law any damping-0.85 implementation must obey,
    checked without any oracle."""
    pr = REGISTRY["q_graph_pagerank"].builder(spark, SF1)
    stats = pr.agg(
        F.count(F.lit(1)).alias("rows"),
        F.min("pr").alias("mn"),
        F.sum("pr").alias("total"),
        F.count_distinct("node").alias("nodes"),
    ).first()

    from batchprocessor_spark.sources.catalog import load_table

    l = load_table(spark, SF1, "lineitem").select(
        (F.col("l_suppkey") * 2 + 1).alias("src"), "l_orderkey"
    )
    o = load_table(spark, SF1, "orders").select(
        "o_orderkey", (F.col("o_custkey") * 2).alias("dst")
    )
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey).select("src", "dst").distinct()
    )
    n = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    b = 10**12 // n
    assert stats.rows == stats.nodes == n, (stats, n)
    assert stats.mn >= (15 * b) // 100, (stats.mn, b)
    assert stats.total <= n * b, (stats.total, n * b)
    # 5 rounds of floor-division drift over ~n nodes + |E| edges is
    # parts-per-million of the 1e12 mass budget; 1% slack is orders of
    # magnitude beyond any legitimate loss.
    assert stats.total >= int(0.99 * n * b), (stats.total, n * b)


def test_kcore_degree_bounds_full_sf1(spark):
    """k-core peel at full sf1 (20k-vector ε-graph): the surviving
    vertices are a subset of the graph's vertices and every reported
    core degree is bounded by that vertex's FULL-graph degree —
    peeling can only remove edges. Degrees come from the engine's own
    ε-edge builder, but the inequality is a mathematical necessity,
    not an engine echo: the builder computing core_deg never sees the
    full-degree table this test joins against."""
    from batchprocessor_spark.operators.graph import _eps_edges

    core = REGISTRY["q_graph_kcore"].builder(spark, SF1)
    edges = _eps_edges(spark, SF1)
    deg = (
        edges.select(F.col("d1").alias("vec_id"))
        .unionAll(edges.select(F.col("d2").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("full_deg"))
    )
    joined = core.join(deg, "vec_id", "left")
    bad = joined.where(
        F.col("full_deg").isNull() | (F.col("core_deg") > F.col("full_deg"))
    ).count()
    assert bad == 0
    stats = joined.agg(
        F.count(F.lit(1)).alias("rows"), F.min("core_deg").alias("mn")
    ).first()
    assert stats.rows > 0
    assert stats.mn >= 1
