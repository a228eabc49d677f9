"""q_llm_simsearch_pq companion tests: an independent numpy/stdlib
reimplementation of the WHOLE product-quantization path (1e-6
quantization, per-subspace exact-integer Lloyd training with
truncated-mean updates, encoding, ADC lookup sums, ranking) plus the
recall-vs-exact pin the operator's docstring promises — the same
twin-proofing discipline as tests/test_similarity_sq.py (oracle
parity alone cannot catch a mistake both engines implement
identically)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from batchprocessor_spark.operators.similarity import (
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _PQ_SUBD,
    _N_QUERIES,
    _TOP_K,
)
from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_SMALL

REGISTRY = load_all()


def _trunc_div(s: int, c: int) -> int:
    """Truncation-toward-zero integer division — Spark's DIV and
    DuckDB's // semantics (python's // floors, which differs on
    negative sums, so spell it out)."""
    q = abs(s) // c
    return q if s >= 0 else -q


def _numpy_pq_topk(sf_dir: str):
    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    # Quantize like both engines: round-half-away-from-zero at 1e-6.
    q = np.sign(vecs * 1e6) * np.floor(np.abs(vecs * 1e6) + 0.5)
    q = q.astype(np.int64)
    subs = q.reshape(len(ids), _PQ_M, _PQ_SUBD)  # contiguous slices

    # Init: the _PQ_K lowest vec_ids' subvectors, cid = rank.
    order = np.argsort(ids)[:_PQ_K]
    books = [subs[order, s, :].copy() for s in range(_PQ_M)]

    def assign(s):
        d = ((subs[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes the lowest cid on ties

    for _ in range(_PQ_ITERS):
        for s in range(_PQ_M):
            cid = assign(s)
            new = books[s].copy()
            for c in range(_PQ_K):
                members = subs[cid == c, s, :]
                if len(members):
                    tot = members.sum(axis=0)
                    new[c] = [_trunc_div(int(t), len(members)) for t in tot]
            books[s] = new

    codes = np.stack([assign(s) for s in range(_PQ_M)], axis=1)
    out = {}
    for qi in range(_N_QUERIES):
        qsub = subs[ids == qi][0]
        lut = np.stack(
            [((books[s] - qsub[s][None, :]) ** 2).sum(axis=1) for s in range(_PQ_M)]
        )  # (M, K)
        adist = lut[np.arange(_PQ_M)[None, :], codes].sum(axis=1)
        ranked = sorted(
            (int(d), int(i)) for d, i in zip(adist, ids) if i != qi
        )
        out[qi] = ranked[:_TOP_K]
    return out


def test_pq_matches_numpy_reference(spark):
    """The builder's (qid, vec_id, adist, rnk) equals a stdlib-numpy
    recompute of quantize → per-subspace integer Lloyd → codes → ADC
    → (adist, vec_id) rank — exact integer equality, no tolerance."""
    ref = _numpy_pq_topk(SF_SMALL)
    got: dict[int, list] = {}
    for r in REGISTRY["q_llm_simsearch_pq"].builder(spark, SF_SMALL).collect():
        got.setdefault(int(r["qid"]), []).append(
            (int(r["rnk"]), int(r["adist"]), int(r["vec_id"]))
        )
    assert set(got) == set(ref)
    for qid, rows in got.items():
        rows.sort()
        assert [(d, v) for _, d, v in rows] == ref[qid]


def test_pq_recall_vs_exact_l2_topk(spark):
    """Recall@10 of the trained 1-bit/dim ADC ranking against EXACT
    L2 top-k (PQ's own metric; measured 0.3-0.6 per query, 0.46 mean
    on the fixture — vs ~0.02 for a random ranking over 499
    candidates). Pinned at >= 0.2 per query, >= 0.35 mean so a
    codebook regression (untrained books, wrong LUT axis, symmetric
    distance fed the code table) fails loudly while fixture noise
    does not."""
    emb = pd.read_parquet(
        f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    exact: dict[int, set] = {}
    for qi in range(_N_QUERIES):
        d = ((vecs - vecs[ids == qi][0]) ** 2).sum(axis=1)
        order = sorted((dd, int(i)) for dd, i in zip(d, ids) if i != qi)
        exact[qi] = {i for _, i in order[:_TOP_K]}
    pq: dict[int, set] = {}
    for r in REGISTRY["q_llm_simsearch_pq"].builder(spark, SF_SMALL).collect():
        pq.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    assert set(pq) == set(exact)
    recalls = [
        len(pq[q] & exact[q]) / len(exact[q]) for q in sorted(exact)
    ]
    assert min(recalls) >= 0.2, recalls
    assert sum(recalls) / len(recalls) >= 0.35, recalls
