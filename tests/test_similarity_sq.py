"""q_llm_simsearch_sq companion tests: an independent numpy
reimplementation of the whole SQ4 path (grid, encoding, integer
symmetric distances, ranking) plus the recall-vs-exact pin the
operator's docstring promises — the same twin-proofing discipline as
tests/test_metric_kernels.py (oracle parity alone cannot catch a
mistake both engines implement identically)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_SMALL

REGISTRY = load_all()


def _numpy_sq_topk(sf_dir: str, levels: int = 16, k: int = 10, n_q: int = 5):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    gmin, gmax = vecs.min(), vecs.max()
    codes = np.clip(
        np.floor((vecs - gmin) * levels / (gmax - gmin)), 0, levels - 1
    ).astype(np.int64)
    out = {}
    for qi in range(n_q):
        qrow = codes[ids == qi][0]
        d = ((codes - qrow) ** 2).sum(axis=1)
        order = sorted((int(dd), int(i)) for dd, i in zip(d, ids) if i != qi)
        out[qi] = order[:k]
    return out


def test_sq_matches_numpy_reference(spark):
    """The builder's (qid, vec_id, dist_sq, rnk) equals a stdlib-numpy
    recompute of grid → codes → integer distances → (dist, id) rank."""
    ref = _numpy_sq_topk(SF_SMALL)
    got: dict[int, list] = {}
    for r in REGISTRY["q_llm_simsearch_sq"].builder(spark, SF_SMALL).collect():
        got.setdefault(int(r["qid"]), []).append(
            (int(r["rnk"]), int(r["dist_sq"]), int(r["vec_id"]))
        )
    assert set(got) == set(ref)
    for qid, rows in got.items():
        rows.sort()
        assert [(d, v) for _, d, v in rows] == ref[qid]


def test_sq_recall_vs_exact_topk(spark):
    """Recall@10 of the 4-bit code ranking against exact cosine top-k
    (measured 0.7-0.9 per query on the fixture at both parity SFs);
    pinned at ≥0.5 per query, ≥0.65 mean so a quantizer regression
    (wrong grid, truncated codes, asymmetric distance) fails loudly."""
    exact: dict[int, set] = {}
    for r in REGISTRY["q_llm_simsearch_topk"].builder(spark, SF_SMALL).collect():
        exact.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    sq: dict[int, set] = {}
    for r in REGISTRY["q_llm_simsearch_sq"].builder(spark, SF_SMALL).collect():
        sq.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    recalls = {q: len(exact[q] & sq[q]) / len(exact[q]) for q in exact}
    assert all(rec >= 0.5 for rec in recalls.values()), recalls
    assert sum(recalls.values()) / len(recalls) >= 0.65, recalls
