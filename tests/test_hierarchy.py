"""Pointer-jumping ancestry kernel (operators/hierarchy.py): must
match a driver-side python walk on arbitrary forests, and must close
DEEP chains in logarithmic rounds (the whole point of path doubling —
naive parent-following would need depth rounds)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from batchprocessor_spark.operators.hierarchy import pointer_jump_ancestry


def _python_ancestry(parent: dict[int, int | None]) -> dict[int, tuple[int, int]]:
    out = {}
    for v in parent:
        depth, cur = 0, v
        while parent[cur] is not None:
            cur = parent[cur]
            depth += 1
        out[v] = (cur, depth)
    return out


def _run(spark, parent: dict[int, int | None]):
    rows = [(v, p) for v, p in parent.items()]
    nodes = spark.createDataFrame(rows, "node BIGINT, parent BIGINT")
    got = {
        r.node: (r.root_id, r.depth)
        for r in pointer_jump_ancestry(nodes).collect()
    }
    assert got == _python_ancestry(parent)


def test_deep_chain_converges_in_log_rounds(spark):
    # 200-deep chain: path doubling needs ceil(log2 200) = 8 jump
    # rounds (+1 to observe the fixpoint); parent-following would
    # need 200. max_rounds=10 fails loudly if doubling regressed.
    parent = {0: None}
    parent.update({v: v - 1 for v in range(1, 201)})
    rows = [(v, p) for v, p in parent.items()]
    nodes = spark.createDataFrame(rows, "node BIGINT, parent BIGINT")
    got = {
        r.node: (r.root_id, r.depth)
        for r in pointer_jump_ancestry(nodes, max_rounds=10).collect()
    }
    assert got == _python_ancestry(parent)


def test_random_forest_matches_python(spark):
    rng = random.Random(7)
    parent: dict[int, int | None] = {v: None for v in range(5)}
    for v in range(5, 300):
        parent[v] = rng.randrange(v)  # parents always lower → acyclic
    _run(spark, parent)


def test_pagerank_invariants(spark):
    """Fixed-point PageRank: mass is conserved up to integer
    truncation (≤ N·(rounds+1) pico-units), every rank is positive,
    and customers (who receive supplier mass + dangling share) hold
    more total mass than suppliers (who only receive the teleport +
    dangling share) on the bipartite sales graph."""
    from batchprocessor_spark.operators.hierarchy import (
        _PR_ROUNDS,
        _PR_SCALE,
        q_graph_pagerank,
    )
    from tests.conftest import SF_ORACLE

    ranks = q_graph_pagerank(spark, SF_ORACLE).collect()
    n = len(ranks)
    total = sum(r.pr for r in ranks)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - n * (_PR_ROUNDS + 1) * 100
    assert all(r.pr > 0 for r in ranks)
    cust = sum(r.pr for r in ranks if r.node % 2 == 0)
    supp = total - cust
    assert cust > supp


def test_hier_paths_survives_non_closed_node_set(spark, tmp_path):
    """r12 (caught by the sf1 twin sweep): q_hier_paths' oracle
    derives every ancestor ARITHMETICALLY (cur // 3), so a document
    whose numeric ancestors are absent from the table still gets its
    full chain — any real hierarchy with deleted intermediate nodes
    has this shape. The old pointer-jumping builder's inner join
    silently dropped exactly those rows (5000 of 50000 at sf1). The
    per-row fold builder must match DuckDB on a deliberately
    non-parent-closed id set."""
    import shutil

    import duckdb
    import pandas as pd

    from batchprocessor_spark.plans.registry import load_all

    sf = tmp_path / "sf"
    shutil.copytree("/root/testdata/sf0.001", sf)
    (sf / "documents.parquet").unlink()
    # ids whose div-3 chains pass through MISSING intermediates,
    # including one deeper than 3^20 (the sf1-shifted-id regime)
    ids = [0, 1, 2, 5, 81, 82, 1_000_000_007, 9_000_000_000_000]
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": ["t"] * len(ids),
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [1] * len(ids),
        }
    ).to_parquet(sf / "documents.parquet", index=False)

    spec = load_all()["q_hier_paths"]
    b = spec.builder(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    o = con.execute(spec.oracle).df()
    bs = sorted(map(str, b[sorted(b.columns)].itertuples(index=False, name=None)))
    os_ = sorted(map(str, o[sorted(o.columns)].itertuples(index=False, name=None)))
    assert len(bs) == len(ids)
    assert bs == os_
