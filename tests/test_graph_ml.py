"""Mechanism pins for the round-4 graph + iterative-ML operators:
hand-checkable fixtures for triangle counting and link prediction,
and model-quality invariants for PCA power iteration and logistic
regression (the oracle parity suite checks cross-engine equality;
these check the ALGORITHMS do what their names claim)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batchprocessor_spark.operators.graph import _oriented
from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_triangle_count_on_handmade_graph(spark):
    """K4 plus a pendant vertex: K4 has 4 triangles, each K4 vertex
    sits on 3 of them, the pendant on none. Exercises orientation,
    wedge join and closure on a graph small enough to check by hand."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "d1 LONG, d2 LONG",
    )
    o = _oriented(edges)
    w = o.alias("o1").join(o.alias("o2"), F.col("o1.dst") == F.col("o2.src")).select(
        F.col("o1.src").alias("a"), F.col("o1.dst").alias("b"), F.col("o2.dst").alias("c")
    )
    t = w.join(
        o.alias("o3"),
        (F.col("a") == F.col("o3.src")) & (F.col("c") == F.col("o3.dst")),
    ).select("a", "b", "c")
    tris = t.collect()
    assert len(tris) == 4, tris  # K4 triangle count; each found once
    per_vertex = {}
    for r in tris:
        for v in (r.a, r.b, r.c):
            per_vertex[v] = per_vertex.get(v, 0) + 1
    assert per_vertex == {1: 3, 2: 3, 3: 3, 4: 3}, per_vertex  # pendant 5 absent


def test_orientation_is_acyclic_and_covers_all_edges(spark):
    """Degree-ordered orientation must keep every edge exactly once and
    admit no 2-cycles (src != dst, each undirected edge one direction)."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "d1 LONG, d2 LONG",
    )
    o = _oriented(edges).collect()
    assert len(o) == 7
    seen = set()
    for r in o:
        assert r.src != r.dst
        key = (min(r.src, r.dst), max(r.src, r.dst))
        assert key not in seen, "edge oriented twice"
        seen.add(key)


def test_link_prediction_pairs_are_nonadjacent_two_hop(spark):
    """Every predicted pair must share >= 1 neighbor and NOT be an
    existing edge; jaccard must respect common/(da+dc-common)."""
    rows = REGISTRY["q_graph_link_prediction"].builder(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 20
    from batchprocessor_spark.operators.graph import _eps_edges

    e = {(r.d1, r.d2) for r in _eps_edges(spark, SF_ORACLE).collect()}
    nbrs: dict[int, set] = {}
    for a, b in e:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        assert (r.v1, r.v2) not in e and (r.v2, r.v1) not in e
        common = nbrs[r.v1] & nbrs[r.v2]
        assert len(common) == r.common and r.common >= 1
        expect = r.common / (len(nbrs[r.v1]) + len(nbrs[r.v2]) - r.common)
        assert abs(r.jaccard - round(expect, 6)) < 1e-9, (r, expect)


def test_pca_power_dominant_direction(spark):
    """The power-iteration component must be unit-norm and explain at
    least as much variance as any single axis (the dominant direction
    beats every axis-aligned one)."""
    import numpy as np

    rows = REGISTRY["q_emb_pca_power"].builder(spark, SF_ORACLE).collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3  # rounded at 6 dp, near-unit
    from batchprocessor_spark.sources.catalog import load_table

    X = np.array(
        [r.v for r in load_table(spark, SF_ORACLE, "embeddings")
         .select(F.col("embedding").cast("array<double>").alias("v")).collect()]
    )
    Xc = X - X.mean(axis=0)
    var_along = float(((Xc @ v) ** 2).sum())
    axis_vars = (Xc ** 2).sum(axis=0)
    assert var_along >= 0.99 * float(axis_vars.max()), (var_along, axis_vars.max())
    # eigval column ≈ ||cov·v|| at the last step — positive and consistent.
    assert rows[0].eigval > 0


def test_logreg_learns_better_than_majority(spark):
    """After 3 GD steps the classifier's training accuracy must be at
    least the majority-class rate (GD from w=0 cannot do worse than
    the p=0.5 start on this fixture) and the weights must be finite."""
    rows = REGISTRY["q_ml_logreg"].builder(spark, SF_ORACLE).collect()
    assert len(rows) == 3
    assert all(math.isfinite(r.weight) for r in rows)
    from batchprocessor_spark.sources.catalog import load_table

    d = load_table(spark, SF_ORACLE, "embeddings").select(
        (F.col("label") % 2).alias("y")
    )
    n = d.count()
    n_pos = d.where(F.col("y") == 1).count()
    majority = max(n_pos, n - n_pos)
    # Random-ish features ⇒ near-majority accuracy; must not be worse
    # than predicting the majority class minus a small slack.
    assert rows[0].n_correct >= majority - max(5, n // 100), (
        rows[0].n_correct,
        majority,
    )


def test_knn_prediction_matches_neighbor_vote(spark):
    """kNN predictions recomputed from the raw top-k neighbor list in
    numpy must match the query's vote exactly."""
    import numpy as np

    rows = {
        r.qid: r for r in REGISTRY["q_ml_knn_classify"].builder(spark, SF_ORACLE).collect()
    }
    from batchprocessor_spark.sources.catalog import load_table

    data = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    ids = np.array([r.vec_id for r in data])
    labels = {r.vec_id: r.label for r in data}
    V = np.array([r.v for r in data])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for qid, row in rows.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = np.round(Vn @ Vn[qi], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-sims[i], ids[i]),
        )[:10]
        votes: dict[str, list] = {}
        for i in order:
            votes.setdefault(labels[ids[i]], []).append(sims[i])
        best = sorted(
            votes.items(), key=lambda kv: (-len(kv[1]), -max(kv[1]), kv[0])
        )[0]
        assert row.pred_label == best[0], (qid, row, best)
        assert row.n_votes == len(best[1])


def test_compare_fast_path_never_hides_mismatches():
    """The vectorized fast path may only short-circuit TRUE equality;
    any difference must fall through to the canonical comparison and
    raise — checked for value, row-order (must pass), float, NaN and
    dtype-nuance cases."""
    import pandas as pd
    import pytest as _pytest

    from tests.oracle import _fast_equal, canonical_rows

    a = pd.DataFrame({"k": [1, 2, 3], "x": [1.5, 2.5, float("nan")]})
    same_reordered = a.iloc[[2, 0, 1]].reset_index(drop=True)
    assert _fast_equal(a, same_reordered) is True
    # value mismatch → not True (falls back)
    b = a.copy(); b.loc[0, "x"] = 1.5000001
    assert _fast_equal(a, b) is not True
    assert canonical_rows(a) != canonical_rows(b)
    # NaN vs value mismatch
    c = a.copy(); c.loc[2, "x"] = 0.0
    assert _fast_equal(a, c) is not True
    # int32 vs int64 harmonized, still equal
    d = a.copy(); d["k"] = d["k"].astype("int32")
    assert _fast_equal(a, d) is True
    # object/array columns always defer to the canonical path
    e = pd.DataFrame({"k": [[1, 2]]})
    assert _fast_equal(e, e.copy()) is None

    class _FakeDF:
        def __init__(self, pdf): self._pdf = pdf
        def toPandas(self): return self._pdf

    from tests.oracle import compare

    with _pytest.raises(AssertionError):
        compare(_FakeDF(a), b, "harness_selftest")


def test_scc_functional_matches_python_walk_reference(spark):
    """The generic pointer-doubling kernel against a pure-python
    walk-based SCC reference on a pseudo-random functional graph
    (affine successor with a contraction, so real rho shapes: tails
    feeding cycles of assorted lengths)."""
    from batchprocessor_spark.operators.graph import scc_functional

    n = 400
    succ = {x: (x * 6 + 11) % n for x in range(n)}

    def walk_scc():
        # For each node, walk until a repeat to find its cycle; the
        # component id is the min node ON that cycle.
        scc_id, on_cycle = {}, {}
        for x0 in range(n):
            seen = {}
            x = x0
            while x not in seen:
                seen[x] = len(seen)
                x = succ[x]
            cyc_start = seen[x]
            cyc = [y for y, i in seen.items() if i >= cyc_start]
            # nodes from x0 up to cyc_start are tail; the walk may
            # re-enter a previously known cycle mid-way — recompute
            # the cycle from its entry node to be safe
            c, cx = [], x
            while True:
                c.append(cx)
                cx = succ[cx]
                if cx == x:
                    break
            m = min(c)
            scc_id[x0] = m
            on_cycle[x0] = 1 if x0 in c else 0
        return scc_id, on_cycle

    ref_id, ref_cyc = walk_scc()
    nodes = spark.createDataFrame(
        [(x, succ[x]) for x in range(n)], "x LONG, succ LONG"
    )
    got = {r.x: (r.scc_id, r.on_cycle) for r in scc_functional(nodes).collect()}
    assert len(got) == n
    for x in range(n):
        assert got[x] == (ref_id[x], ref_cyc[x]), (x, got[x], ref_id[x], ref_cyc[x])
