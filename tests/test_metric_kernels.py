"""Independent reference implementations for the session's
metric/experimentation kernels (AUC, CUPED, k-fold LOO, Mahalanobis,
correlation matrix, BPE merge, forward as-of). The oracle-parity lane
proves Spark == DuckDB; these tests prove the SHARED formulation is
right by checking it against brute force / numpy / pure-python
references that share no code with either side — the only defense
against a mistake both engines implement identically.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_SMALL

REGISTRY = load_all()

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- AUC

def _auc_histogram(pairs):
    """The q_ml_auc formulation: distinct-score histogram, doubled-U."""
    from collections import defaultdict

    npos = defaultdict(int)
    nneg = defaultdict(int)
    for s, y in pairs:
        (npos if y else nneg)[s] += 1
    below = 0
    u2 = 0
    for s in sorted(set(npos) | set(nneg)):
        u2 += npos[s] * (2 * below + nneg[s])
        below += nneg[s]
    return u2


def _auc_bruteforce(pairs):
    """Textbook pairwise definition, doubled to stay integer."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    u2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    return u2


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), min_size=0, max_size=60
    )
)
@SETTINGS
def test_auc_histogram_identity(pairs):
    assert _auc_histogram(pairs) == _auc_bruteforce(pairs)


# ----------------------------------------------------- k-fold LOO CV

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),  # bucket
            st.integers(0, 4),  # fold
            st.booleans(),      # label
        ),
        min_size=1,
        max_size=80,
    )
)
@SETTINGS
def test_kfold_loo_equals_naive_retrain(rows):
    """Leave-one-fold-out sufficient statistics (bucket totals minus
    the fold's own cell) must equal naively retraining on the other
    folds — per (bucket, fold) majority prediction."""
    from collections import defaultdict

    cell_n = defaultdict(int)
    cell_en = defaultdict(int)
    for b, f, y in rows:
        cell_n[(b, f)] += 1
        cell_en[(b, f)] += int(y)
    buckets = {b for b, _, _ in rows}
    folds = {f for _, f, _ in rows}
    for b in buckets:
        tot_n = sum(cell_n[(b, f)] for f in folds)
        tot_en = sum(cell_en[(b, f)] for f in folds)
        for f in folds:
            loo_n = tot_n - cell_n[(b, f)]
            loo_en = tot_en - cell_en[(b, f)]
            naive_n = sum(cell_n[(b, g)] for g in folds if g != f)
            naive_en = sum(cell_en[(b, g)] for g in folds if g != f)
            assert (loo_n, loo_en) == (naive_n, naive_en)
            assert (2 * loo_en > loo_n) == (2 * naive_en > naive_n)


# ------------------------------------------------- Mahalanobis / corr

@given(
    data=st.lists(
        st.tuples(st.integers(1, 50), st.integers(100, 10000)),
        min_size=8,
        max_size=60,
    )
)
@SETTINGS
def test_mahalanobis_closed_form_vs_numpy(data):
    xs = np.array([x for x, _ in data], dtype=float)
    ys = np.array([y for _, y in data], dtype=float)
    n = len(data)
    cxx = float((xs * xs).sum()) / n - (xs.sum() / n) ** 2
    cyy = float((ys * ys).sum()) / n - (ys.sum() / n) ** 2
    cxy = float((xs * ys).sum()) / n - (xs.sum() / n) * (ys.sum() / n)
    det = cxx * cyy - cxy * cxy
    if abs(det) < 1e-9:  # degenerate (collinear) draw — formula undefined
        return
    cov = np.cov(np.vstack([xs, ys]), bias=True)
    inv = np.linalg.inv(cov)
    mx, my = xs.mean(), ys.mean()
    for x, y in data:
        d = np.array([x - mx, y - my])
        ref = float(d @ inv @ d)
        closed = (
            cyy * (x - mx) ** 2 - 2 * cxy * (x - mx) * (y - my) + cxx * (y - my) ** 2
        ) / det
        assert math.isclose(ref, closed, rel_tol=1e-6, abs_tol=1e-9)


@given(
    data=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 1000)),
        min_size=5,
        max_size=60,
    )
)
@SETTINGS
def test_corr_moment_formula_vs_numpy(data):
    xs = np.array([x for x, _ in data], dtype=float)
    ys = np.array([y for _, y in data], dtype=float)
    n = len(data)
    num = n * float((xs * ys).sum()) - xs.sum() * ys.sum()
    dx = n * float((xs * xs).sum()) - xs.sum() ** 2
    dy = n * float((ys * ys).sum()) - ys.sum() ** 2
    if dx <= 0 or dy <= 0:  # constant column — corr undefined
        return
    got = num / (math.sqrt(dx) * math.sqrt(dy))
    ref = float(np.corrcoef(xs, ys)[0, 1])
    assert math.isclose(got, ref, rel_tol=1e-9, abs_tol=1e-9)


# ------------------------------------------------------------- BPE

def _bpe_encode(tokens):
    return " " + "  ".join(tokens) + " "


def _bpe_decode(seq):
    return seq.strip().split("  ")


def _greedy_merge(tokens, a, b):
    """Reference left-to-right non-overlapping merge of (a, b)."""
    out = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@given(
    tokens=st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "_"]), min_size=1, max_size=12
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba"]),
        st.sampled_from(["a", "b", "ab", "ba", "_"]),
    ),
)
@SETTINGS
def test_bpe_double_separator_replace_equals_greedy_merge(tokens, pair):
    """The load-bearing claim of q_llm_bpe_train: on the
    double-separator encoding, ONE string replace() applies a pair
    merge exactly like the greedy left-to-right token scan —
    including consecutive occurrences ('a b a b') and overlapping
    ones ('l l l'), and never matches inside a longer token ('ba  c'
    vs pair (a, c)). str.replace is left-to-right non-overlapping in
    Python, Java (Spark) and DuckDB alike."""
    a, b = pair
    seq = _bpe_encode(tokens)
    merged_seq = seq.replace(f" {a}  {b} ", f" {a + b} ")
    assert _bpe_decode(merged_seq) == _greedy_merge(tokens, a, b)


def _python_bpe_reference(word_freqs, rounds=3):
    """Independent BPE trainer (dict-of-tuples state, no strings)."""
    from collections import Counter

    seqs = {tuple(w) + ("_",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(rounds):
        counts = Counter()
        for toks, f in seqs.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        seqs = {
            tuple(_greedy_merge(list(toks), a, b)): f for toks, f in seqs.items()
        }
    return merges


@pytest.mark.usefixtures("spark")
def test_bpe_trainer_matches_python_reference(spark):
    """End-to-end at sf0.001: the registered trainer's 3 merges equal
    an independent pure-python BPE over the same corpus."""
    import re

    import pyarrow.parquet as pq
    from collections import Counter

    texts = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["text"])
    freqs = Counter()
    for t in texts.column("text").to_pylist():
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                freqs[w] += 1
    expected = _python_bpe_reference(freqs, rounds=3)
    got = [
        (r["tok_a"], r["tok_b"], r["cnt"])
        for r in REGISTRY["q_llm_bpe_train"].builder(spark, SF_SMALL).collect()
    ]
    assert got == expected


# --------------------------------------------- forward as-of / CUPED

def test_asof_tolerance_matches_pandas_bruteforce(spark):
    """End-to-end at sf0.001: the reverse-window forward as-of equals
    a pandas brute-force nearest-forward-within-1h match."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    views = ev[ev.event_type == "view"]
    purch = ev[ev.event_type == "purchase"]
    expected = {}
    for v in views.itertuples():
        cand = purch[
            (purch.user_id == v.user_id)
            & (purch.ts >= v.ts)
            & (purch.ts <= v.ts + pd.Timedelta(hours=1))
        ].sort_values(["ts", "event_id"])
        if len(cand):
            first = cand.iloc[0]
            wait_s = int(
                (first.ts.value // 1000 - v.ts.value // 1000) // 1_000_000
            )
            expected[v.event_id] = (int(first.event_id), wait_s)
        else:
            expected[v.event_id] = (None, None)
    got_rows = (
        REGISTRY["q_join_asof_tolerance"].builder(spark, SF_SMALL).collect()
    )
    got = {
        r["view_id"]: (
            None if r["purchase_id"] is None else int(r["purchase_id"]),
            None if r["wait_s"] is None else int(r["wait_s"]),
        )
        for r in got_rows
    }
    assert got == expected


def test_cuped_matches_numpy_reference(spark):
    """End-to-end at sf0.001: theta / adjusted diff / rho2 equal a
    numpy covariance computation over the same per-user features."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    import hashlib

    def arm(uid):
        return int(hashlib.md5(f"cuped:{uid}".encode()).hexdigest()[:8], 16) % 2

    u = (
        ev.assign(
            x=np.where(ev.event_type == "view", ev.cents, 0),
            y=np.where(ev.event_type == "purchase", ev.cents, 0),
        )
        .groupby("user_id")[["x", "y"]]
        .sum()
        .reset_index()
    )
    u["arm"] = u.user_id.map(arm)
    x, y = u.x.to_numpy(float), u.y.to_numpy(float)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    m = u.groupby("arm")[["x", "y"]].mean()
    adj = ((m.loc[1, "y"] - m.loc[0, "y"]) - theta * (m.loc[1, "x"] - m.loc[0, "x"])) / 100
    row = REGISTRY["q_ab_cuped"].builder(spark, SF_SMALL).collect()[0]
    assert math.isclose(row["theta"], theta, rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(row["adj_diff"], adj, rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(row["var_reduction"], rho2, rel_tol=1e-4, abs_tol=1e-4)
    assert int(row["n_control"]) == int((u.arm == 0).sum())
    assert int(row["n_treatment"]) == int((u.arm == 1).sum())


def test_delta_method_matches_numpy_reference(spark):
    """End-to-end at sf0.001: per-arm ratio and the delta-method z
    equal a numpy computation of var(Y̅/X̅) ≈ (vy − 2Rcxy + R²vx)/(n·x̄²)."""
    import hashlib

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    u = (
        ev.assign(
            x=(ev.event_type == "view").astype(int),
            y=np.where(ev.event_type == "purchase", ev.cents, 0),
        )
        .groupby("user_id")[["x", "y"]]
        .sum()
        .reset_index()
    )
    u["arm"] = u.user_id.map(
        lambda uid: int(
            hashlib.md5(f"cuped:{uid}".encode()).hexdigest()[:8], 16
        )
        % 2
    )

    def arm_stats(a):
        g = u[u.arm == a]
        x, y = g.x.to_numpy(float), g.y.to_numpy(float)
        n = len(g)
        r = y.sum() / x.sum()
        vx, vy = np.var(x), np.var(y)
        cxy = np.cov(x, y, bias=True)[0, 1]
        var = (vy - 2 * r * cxy + r * r * vx) / (n * x.mean() ** 2)
        return r, var

    r0, v0 = arm_stats(0)
    r1, v1 = arm_stats(1)
    row = REGISTRY["q_ab_delta_method"].builder(spark, SF_SMALL).collect()[0]
    assert math.isclose(row["ratio_control"], r0, rel_tol=1e-4)
    assert math.isclose(row["ratio_treatment"], r1, rel_tol=1e-4)
    assert math.isclose(
        row["z_stat"], (r1 - r0) / math.sqrt(v0 + v1), rel_tol=1e-4, abs_tol=1e-4
    )


def test_asof_nearest_matches_pandas_bruteforce(spark):
    """End-to-end at sf0.001: nearest-direction as-of (ties backward,
    then lowest event_id) equals a pandas brute force."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    views = ev[ev.event_type == "view"]
    purch = ev[ev.event_type == "purchase"]
    tol = pd.Timedelta(hours=1)
    expected = {}
    for v in views.itertuples():
        cand = purch[
            (purch.user_id == v.user_id)
            & (purch.ts >= v.ts - tol)
            & (purch.ts <= v.ts + tol)
        ].copy()
        if len(cand):
            cand["dist"] = (cand.ts - v.ts).abs()
            cand["fwd"] = (cand.ts > v.ts).astype(int)  # backward ties first
            cand = cand.sort_values(["dist", "fwd", "event_id"])
            first = cand.iloc[0]
            dist_s = int(abs(first.ts.value - v.ts.value) // 1000 // 1_000_000)
            expected[v.event_id] = (int(first.event_id), dist_s)
        else:
            expected[v.event_id] = (None, None)
    got = {
        r["view_id"]: (
            None if r["purchase_id"] is None else int(r["purchase_id"]),
            None if r["dist_s"] is None else int(r["dist_s"]),
        )
        for r in REGISTRY["q_join_asof_nearest"].builder(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_boosted_stumps_match_python_reference(spark):
    """End-to-end at sf0.001: both boosting rounds equal an
    independent loop-based stump trainer with x3 integer reweighting."""
    import pyarrow.parquet as pq
    from collections import defaultdict

    t = pq.read_table(
        f"{SF_SMALL}/documents.parquet", columns=["n_chars", "lang"]
    )
    cells = defaultdict(lambda: [0, 0])  # bucket -> [w1 (en), w0]
    for n, lang in zip(t.column("n_chars").to_pylist(), t.column("lang").to_pylist()):
        cells[n // 100][0 if lang == "en" else 1] += 0  # init keys
        if lang == "en":
            cells[n // 100][0] += 1
        else:
            cells[n // 100][1] += 1

    def best_stump(c):
        buckets = sorted(c)
        t1 = sum(c[b][0] for b in buckets)
        t0 = sum(c[b][1] for b in buckets)
        cands = []
        c1 = c0 = 0
        for b in buckets:
            c1 += c[b][0]
            c0 += c[b][1]
            cands.append((c0 + (t1 - c1), b, "le", t0 + t1))
            cands.append((c1 + (t0 - c0), b, "gt", t0 + t1))
        werr, thr, pol, wtot = min(cands, key=lambda x: (x[0], x[1], x[2]))
        return thr, pol, werr, wtot

    thr1, pol1, werr1, wtot1 = best_stump(cells)
    cells2 = {}
    for b, (w1, w0) in cells.items():
        pred_en = b <= thr1 if pol1 == "le" else b > thr1
        cells2[b] = [w1 * (1 if pred_en else 3), w0 * (3 if pred_en else 1)]
    thr2, pol2, werr2, wtot2 = best_stump(cells2)

    got = {
        r["round"]: (r["thr"], r["pol"], r["werr"], r["wtot"])
        for r in REGISTRY["q_ml_boosted_stumps"].builder(spark, SF_SMALL).collect()
    }
    assert got[1] == (thr1, pol1, werr1, wtot1)
    assert got[2] == (thr2, pol2, werr2, wtot2)


def test_srm_matches_scipy_style_reference(spark):
    """End-to-end at sf0.001: the SRM chi-square equals the textbook
    two-cell goodness-of-fit statistic computed in numpy over the
    same hash assignment, and the flag equals p<0.05 via the 3.841
    critical value."""
    import hashlib

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    users = sorted(ev.user_id.unique())
    arms = [
        int(hashlib.md5(f"srm:{u}".encode()).hexdigest()[:8], 16) % 2 for u in users
    ]
    n_a = sum(1 for a in arms if a == 0)
    n_b = len(arms) - n_a
    n = n_a + n_b
    exp = n / 2.0
    chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    row = REGISTRY["q_ab_srm"].builder(spark, SF_SMALL).collect()[0]
    assert int(row["n_a"]) == n_a and int(row["n_b"]) == n_b
    assert math.isclose(row["chi2"], chi2, rel_tol=1e-6, abs_tol=1e-6)
    assert int(row["srm_flag"]) == int(chi2 > 3.841)


def test_ks_statistic_matches_numpy_reference(spark):
    """End-to-end at sf0.001: the histogram-lane KS equals the direct
    max |ECDF difference| over the same binned scores in numpy."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    score = (docs.n_chars // 100).to_numpy()
    pos = np.sort(score[docs.lang == "en"])
    neg = np.sort(score[docs.lang != "en"])
    grid = np.unique(score)
    fpos = np.searchsorted(pos, grid, side="right") / len(pos)
    fneg = np.searchsorted(neg, grid, side="right") / len(neg)
    ks = float(np.max(np.abs(fpos - fneg)))
    row = REGISTRY["q_ml_ks_statistic"].builder(spark, SF_SMALL).collect()[0]
    assert int(row["n_pos"]) == len(pos) and int(row["n_neg"]) == len(neg)
    assert math.isclose(row["ks"], ks, rel_tol=1e-6, abs_tol=1e-6)
    assert int(row["ks_num"]) == round(ks * len(pos) * len(neg))


def test_lift_gains_matches_pandas_reference(spark):
    """End-to-end at sf0.001: per-decile counts and cumulative
    gain/lift equal a pandas computation that assigns value-grain
    deciles by the same ⌊10·n_before/n⌋ rule."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    hist = (
        docs.assign(label=(docs.lang == "en").astype(int))
        .groupby("n_chars")
        .agg(n_s=("label", "size"), pos_s=("label", "sum"))
        .sort_index(ascending=False)
        .reset_index()
    )
    n_tot = int(hist.n_s.sum())
    pos_tot = int(hist.pos_s.sum())
    hist["n_before"] = hist.n_s.cumsum().shift(fill_value=0)
    hist["decile"] = (hist.n_before * 10 // n_tot).astype(int)
    dec = hist.groupby("decile").agg(n=("n_s", "sum"), n_pos=("pos_s", "sum"))
    dec["cum_n"] = dec.n.cumsum()
    dec["cum_pos"] = dec.n_pos.cumsum()
    rows = {
        int(r["decile"]): r
        for r in REGISTRY["q_ml_lift_gains"].builder(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(dec.index)
    for d, ref in dec.iterrows():
        got = rows[int(d)]
        assert int(got["n"]) == int(ref.n) and int(got["n_pos"]) == int(ref.n_pos)
        assert int(got["cum_depth_bp"]) == int(ref.cum_n) * 10000 // n_tot
        assert int(got["cum_gain_bp"]) == int(ref.cum_pos) * 10000 // pos_tot
        assert int(got["cum_lift_ppm"]) == (
            int(ref.cum_pos) * n_tot * 1000000 // (int(ref.cum_n) * pos_tot)
        )


def test_pr_auc_matches_sklearn_style_reference(spark):
    """End-to-end at sf0.001: the histogram-lane AP equals the
    step-interpolated average precision computed directly over the
    sorted binned scores (the sklearn average_precision_score
    definition restricted to the same score grain)."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    score = (docs.n_chars // 100).to_numpy()
    label = (docs.lang == "en").astype(int).to_numpy()
    order = np.argsort(-score, kind="stable")
    s, y = score[order], label[order]
    npos = int(y.sum())
    ap = 0.0
    cpos = 0
    i = 0
    n = len(s)
    while i < n:
        j = i
        while j < n and s[j] == s[i]:
            j += 1
        lvl_pos = int(y[i:j].sum())
        cpos += lvl_pos
        if lvl_pos > 0:
            ap += (lvl_pos / npos) * (cpos / j)
        i = j
    row = REGISTRY["q_ml_pr_auc"].builder(spark, SF_SMALL).collect()[0]
    assert int(row["n_pos"]) == npos
    assert math.isclose(row["ap"], ap, rel_tol=1e-6, abs_tol=1e-6)


def test_bleu_pairs_matches_python_reference(spark):
    """End-to-end at sf0.001: micro-averaged clipped precisions equal
    a pure-python counter implementation of modified n-gram
    precision over the same even/odd pairing."""
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    import re

    toks = {
        int(r.doc_id): [w for w in re.split("[^a-z]+", r.text.lower()) if w]
        for r in docs.itertuples()
    }

    def grams(ws, n):
        return Counter(tuple(ws[i : i + n]) for i in range(len(ws) - n + 1))

    tot = {1: 0, 2: 0}
    clip = {1: 0, 2: 0}
    for d in sorted(toks):
        if d % 2 != 0 or (d + 1) not in toks:
            continue
        for n in (1, 2):
            c, r = grams(toks[d], n), grams(toks[d + 1], n)
            tot[n] += sum(c.values())
            clip[n] += sum(min(v, r[g]) for g, v in c.items())
    row = REGISTRY["q_text_bleu_pairs"].builder(spark, SF_SMALL).collect()[0]
    assert int(row["tot1"]) == tot[1] and int(row["clip1"]) == clip[1]
    assert int(row["tot2"]) == tot[2] and int(row["clip2"]) == clip[2]
    assert int(row["p1_ppm"]) == clip[1] * 1000000 // tot[1]
    assert int(row["p2_ppm"]) == clip[2] * 1000000 // tot[2]


def test_zipf_slope_matches_numpy_polyfit(spark):
    """End-to-end at sf0.001: the moment-sum OLS equals numpy's
    least-squares fit of ln(freq) on ln(rank)."""
    import re
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    cnt = Counter(
        w
        for t in docs.text
        for w in re.split("[^a-z]+", t.lower())
        if w
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    row = REGISTRY["q_text_zipf_slope"].builder(spark, SF_SMALL).collect()[0]
    assert int(row["n_vocab"]) == len(ranked)
    assert math.isclose(row["slope"], slope, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(row["intercept"], intercept, rel_tol=1e-5, abs_tol=1e-5)


def test_sax_symbols_match_pandas_reference(spark):
    """End-to-end at sf0.001: segment sums and quartile symbols equal
    a pandas PAA + rank-based quartile assignment with the same
    (mean, segment_id) tie-break."""
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    day_no = (
        orders.o_orderdate.astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    cents = (orders.o_totalprice * 100).round().astype("int64")
    seg_id = (day_no - day_no.min()) // 30
    seg = (
        pd.DataFrame({"segment_id": seg_id, "day_no": day_no, "cents": cents})
        .groupby("segment_id")
        .agg(n_days=("day_no", "nunique"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    seg["mean"] = seg.sum_cents / seg.n_days
    seg = seg.sort_values(["mean", "segment_id"], kind="mergesort").reset_index(
        drop=True
    )
    n = len(seg)
    # ntile(4): first (n % 4) tiles get ceil(n/4) rows
    sizes = [(n + 3 - i) // 4 for i in range(4)]
    symbols = []
    for i, sz in enumerate(sizes):
        symbols += ["abcd"[i]] * sz
    seg["symbol"] = symbols[:n]
    ref = {
        int(r.segment_id): (int(r.n_days), int(r.sum_cents), r.symbol)
        for r in seg.itertuples()
    }
    rows = REGISTRY["q_ts_sax"].builder(spark, SF_SMALL).collect()
    assert len(rows) == n
    for r in rows:
        assert ref[int(r["segment_id"])] == (
            int(r["n_days"]),
            int(r["sum_cents"]),
            r["symbol"],
        ), r


# ------------------------------------------- round-5 session-3 kernels

def test_assoc_rules_match_pandas_bruteforce(spark):
    """End-to-end at sf0.001: support/confidence/lift of every emitted
    rule equal a pandas brute-force basket scan using the textbook
    definitions (integer ppm, floor division)."""
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet", columns=["p_partkey", "p_brand"])
    items = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "p_brand"]
        ]
        .drop_duplicates()
        .rename(columns={"l_orderkey": "basket", "p_brand": "item"})
    )
    n_baskets = items.basket.nunique()
    item_cnt = items.groupby("item").size().to_dict()
    from collections import defaultdict
    from itertools import combinations

    pair_cnt = defaultdict(int)
    for _, grp in items.groupby("basket"):
        for x, y in combinations(sorted(grp.item), 2):
            pair_cnt[(x, y)] += 1
    expected = {}
    for (x, y), n_ab in pair_cnt.items():
        if n_ab < 50:
            continue
        for ant, con in ((x, y), (y, x)):
            expected[(ant, con)] = (
                n_ab,
                item_cnt[ant],
                item_cnt[con],
                n_baskets,
                (1000000 * n_ab) // n_baskets,
                (1000000 * n_ab) // item_cnt[ant],
                (1000000 * n_ab * n_baskets) // (item_cnt[ant] * item_cnt[con]),
            )
    rows = REGISTRY["q_ml_assoc_rules"].builder(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert expected[(r["antecedent"], r["consequent"])] == (
            r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"],
            r["support_ppm"], r["confidence_ppm"], r["lift_ppm"],
        ), r
    # top-20-by-lift really is the global top slice
    lifts = sorted((v[6] for v in expected.values()), reverse=True)
    got_min = min(r["lift_ppm"] for r in rows)
    if len(lifts) > 20:
        assert got_min >= lifts[20]


def test_max_drawdown_matches_numpy_cummax(spark):
    """End-to-end at sf0.001: per-priority drawdown equals numpy's
    running-max formulation over the same integer-cents daily series."""
    import numpy as np

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["day"] = o.o_orderdate.dt.strftime("%Y-%m-%d")
    o["cents"] = np.floor(np.abs(o.o_totalprice.to_numpy() * 100) + 0.5).astype("int64")
    daily = (
        o.groupby(["o_orderpriority", "day"]).cents.sum().reset_index()
    )
    rows = {
        r["priority"]: r
        for r in REGISTRY["q_ts_max_drawdown"].builder(spark, SF_SMALL).collect()
    }
    for prio, grp in daily.groupby("o_orderpriority"):
        grp = grp.sort_values("day")
        rev = grp.cents.to_numpy()
        peak = np.maximum.accumulate(rev)
        dd = peak - rev
        i = int(np.argmax(dd))  # numpy argmax = first max = earliest day
        r = rows[prio]
        assert int(r["max_dd_cents"]) == int(dd[i])
        assert r["trough_day"] == grp.day.iloc[i]
        assert int(r["peak_cents"]) == int(peak[i])
        assert int(r["dd_bp"]) == (10000 * int(dd[i])) // int(peak[i])


def test_hhi_matches_numpy_reference(spark):
    """End-to-end at sf0.001: HHI per nation equals the share-squared
    sum computed in exact python ints."""
    import numpy as np

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{SF_SMALL}/nation.parquet", columns=["n_nationkey", "n_name"])
    o["cents"] = np.floor(np.abs(o.o_totalprice.to_numpy() * 100) + 0.5).astype("int64")
    per_cust = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_nationkey", "o_custkey"]).cents.sum().reset_index()
    )
    rows = {
        r["nation"]: r
        for r in REGISTRY["q_agg_hhi"].builder(spark, SF_SMALL).collect()
    }
    for nk, grp in per_cust.groupby("c_nationkey"):
        xs = [int(v) for v in grp.cents]
        total = sum(xs)
        hhi = (100000000 * sum(x * x for x in xs)) // (total * total)
        name = n.set_index("n_nationkey").loc[nk, "n_name"]
        r = rows[name]
        assert int(r["n_customers"]) == len(xs)
        assert int(r["total_cents"]) == total
        assert int(r["hhi_e8"]) == hhi
        assert int(r["top_share_bp"]) == (10000 * max(xs)) // total
        assert int(r["eff_n_milli"]) == 100000000000 // hhi


def test_ndcg_matches_python_reference(spark):
    """End-to-end at sf0.001: DCG/IDCG/NDCG equal a plain-python
    re-ranking with the same pinned integer discount weights."""
    import numpy as np
    from batchprocessor_spark.operators.mining import _NDCG_W

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    n = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    o["cents"] = np.floor(np.abs(o.o_totalprice.to_numpy() * 100) + 0.5).astype("int64")
    rev = o.groupby("o_custkey").cents.sum().to_dict()
    c["grade"] = [min(3, rev.get(k, 0) // 150000000) for k in c.c_custkey]
    rows = {
        r["nation"]: r for r in REGISTRY["q_ml_ndcg"].builder(spark, SF_SMALL).collect()
    }
    for nk, grp in c.groupby("c_nationkey"):
        by_bal = grp.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        by_grade = grp.sort_values(["grade", "c_custkey"], ascending=[False, True])
        dcg = sum(int(g) * w for g, w in zip(by_bal.grade.head(10), _NDCG_W))
        idcg = sum(int(g) * w for g, w in zip(by_grade.grade.head(10), _NDCG_W))
        name = n.set_index("n_nationkey").loc[nk, "n_name"]
        if idcg == 0:
            assert name not in rows
            continue
        r = rows[name]
        assert (int(r["dcg_micro"]), int(r["idcg_micro"])) == (dcg, idcg)
        assert int(r["ndcg_ppm"]) == (1000000 * dcg) // idcg


def test_cohens_kappa_matches_python_reference(spark):
    """End-to-end at sf0.001: kappa equals the textbook
    (po - pe) / (1 - pe) computed in exact fractions over the same
    two deterministic raters."""
    from fractions import Fraction

    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["text", "n_chars"])
    ra = (d.n_chars >= 300).astype(int)
    rb = (d.text.str.split(" ").str.len() >= 55).astype(int)
    a = int(((ra == 1) & (rb == 1)).sum())
    b = int(((ra == 1) & (rb == 0)).sum())
    cc = int(((ra == 0) & (rb == 1)).sum())
    dd = int(((ra == 0) & (rb == 0)).sum())
    n = a + b + cc + dd
    po = Fraction(a + dd, n)
    pe = Fraction((a + b) * (a + cc) + (cc + dd) * (b + dd), n * n)
    kappa = (po - pe) / (1 - pe)
    sign = 1 if kappa >= 0 else -1
    kappa_bp = sign * ((10000 * abs(kappa.numerator)) // kappa.denominator)
    r = REGISTRY["q_ml_cohens_kappa"].builder(spark, SF_SMALL).collect()[0]
    assert (int(r["a"]), int(r["b"]), int(r["c"]), int(r["d"])) == (a, b, cc, dd)
    assert int(r["po_bp"]) == (10000 * (a + dd)) // n
    assert int(r["kappa_bp"]) == kappa_bp


def test_wav_parser_matches_stdlib_wave():
    """The pure-numpy RIFF parser agrees with python's stdlib `wave`
    module (an entirely independent reader) on every generated file
    shape, and the registered statistics law matches a direct
    recompute from the stdlib-decoded samples."""
    import io
    import wave

    import numpy as np

    from batchprocessor_spark.functions.multimodal import make_wav_bytes, wav_decode

    for doc_id in (0, 1, 2, 7, 123):
        n = 400 + doc_id % 3 * 80
        payload = make_wav_bytes(doc_id, n)
        rate, samples = wav_decode(payload)
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getframerate() == rate == 8000
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            assert w.getnframes() == n
            ref = np.frombuffer(w.readframes(n), dtype="<i2")
        assert np.array_equal(samples, ref)
        law = ((doc_id * 37 + np.arange(n, dtype=np.int64) * 17) % 2001) - 1000
        assert np.array_equal(samples.astype(np.int64), law)


@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=12),
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=12),
)
@SETTINGS
def test_dtw_dp_matches_recursive_definition(xs, ys):
    """The vectorized DP in q_ts_dtw equals the textbook recursive
    DTW definition (memoized) on arbitrary small integer series."""
    import functools

    import numpy as np

    @functools.lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 and j == 0:
            return abs(xs[0] - ys[0])
        if i < 0 or j < 0:
            return float("inf")
        return abs(xs[i] - ys[j]) + min(rec(i - 1, j), rec(i, j - 1), rec(i - 1, j - 1))

    # same DP as the pandas UDF body
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    n, m = len(x), len(y)
    big = np.int64(10**18)
    dp = np.full((n + 1, m + 1), big, dtype=np.int64)
    dp[0, 0] = 0
    cost = np.abs(x[:, None] - y[None, :])
    for i in range(1, n + 1):
        prev, cur, ci = dp[i - 1], dp[i], cost[i - 1]
        for j in range(1, m + 1):
            cur[j] = ci[j - 1] + min(prev[j], cur[j - 1], prev[j - 1])
    assert int(dp[n, m]) == rec(n - 1, m - 1)


def test_dtw_end_to_end_matches_pandas_recompute(spark):
    """q_ts_dtw at sf0.001 equals a pandas groupby + python DP
    recompute of the same quarterly integer-cents series."""
    import numpy as np

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["qi"] = o.o_orderdate.dt.year * 4 + (o.o_orderdate.dt.month - 1) // 3
    o["cents"] = np.floor(np.abs(o.o_totalprice.to_numpy() * 100) + 0.5).astype("int64")
    series = {
        p: grp.groupby("qi").cents.sum().sort_index().to_numpy()
        for p, grp in o.groupby("o_orderpriority")
    }

    def dtw(x, y):
        n, m = len(x), len(y)
        dp = [[10**18] * (m + 1) for _ in range(n + 1)]
        dp[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i][j] = abs(int(x[i - 1]) - int(y[j - 1])) + min(
                    dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
                )
        return dp[n][m]

    rows = REGISTRY["q_ts_dtw"].builder(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        x, y = series[r["prio_a"]], series[r["prio_b"]]
        d = dtw(x, y)
        assert (int(r["n_a"]), int(r["n_b"])) == (len(x), len(y))
        assert int(r["dtw_cents"]) == d
        assert int(r["dtw_per_step_milli"]) == (1000 * d) // (len(x) + len(y))


# ------------------------------------------ round-6 kernel references
# (VERDICT r5 #7: finish the independent-reference sweep so no oracled
# formula relies solely on builder/oracle twin agreement.)

def _md5_bucket(salt: str, key, buckets: int) -> int:
    """Pure-python twin of operators.sampling.hash_bucket — first 8 md5
    hex digits of salt||key, mod buckets."""
    import hashlib

    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16) % buckets


def test_neyman_allocation_matches_numpy_reference(spark):
    """End-to-end at sf0.001: the Neyman weight N_h*sigma_h equals
    numpy's len*std(ddof=0), quotas equal floor(200*w/wmax), and the
    seeded-hash draw (reimplemented with stdlib hashlib, no engine
    code) selects the exact same documents."""
    import numpy as np

    d = pd.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    rows = {
        r["lang"]: r
        for r in REGISTRY["q_sample_neyman"].builder(spark, SF_SMALL).collect()
    }
    # the engine's w = sqrt(N*Sx2 - Sx^2) must equal numpy's N*sigma
    # (population), up to float noise — same quantity, different route
    w_ref = {}
    for lang, grp in d.groupby("lang"):
        x = grp.n_chars.to_numpy(dtype="float64")
        w_ref[lang] = len(x) * np.std(x)  # ddof=0
    wmax = max(w_ref.values())
    for lang, grp in d.groupby("lang"):
        quota = int(np.floor(200.0 * w_ref[lang] / wmax))
        r = rows[lang]
        assert int(r["n_docs"]) == len(grp)
        assert int(r["quota"]) == quota
        # independent draw: rank docs by the md5 bucket, take quota
        ranked = sorted(
            grp.itertuples(),
            key=lambda t: (_md5_bucket("ney:", t.doc_id, 1000000), t.doc_id),
        )[:quota]
        assert int(r["n_selected"]) == len(ranked)
        assert int(r["sel_chars"]) == sum(int(t.n_chars) for t in ranked)
    # sanity of the allocation property itself: the highest-variance
    # stratum gets the max quota (that's the point of Neyman)
    top = max(w_ref, key=w_ref.get)
    assert int(rows[top]["quota"]) == 200


def test_calibration_ece_matches_python_reference(spark):
    """End-to-end at sf0.001: the reliability bins and ECE equal a
    pure-python integer recompute of the histogram classifier
    (train on even doc_ids, score odd, 5 bins, ece = sum n|gap| / N
    in basis points, all floor division on non-negative ints)."""
    d = pd.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    d["bucket"] = d.n_chars // 100
    d["is_en"] = (d.lang == "en").astype(int)
    train = d[d.doc_id % 2 == 0]
    test = d[d.doc_id % 2 == 1]
    pred_bp = {
        int(b): (10000 * int(g.is_en.sum())) // len(g)
        for b, g in train.groupby("bucket")
    }
    prior_bp = (10000 * int(train.is_en.sum())) // len(train)
    bins: dict[int, list] = {}
    for t in test.itertuples():
        p = pred_bp.get(int(t.bucket), prior_bp)
        bins.setdefault(min(p // 2000, 4), []).append((p, t.is_en))
    expect = {}
    for b, items in bins.items():
        n = len(items)
        avg_pred = sum(p for p, _ in items) // n
        obs = (10000 * sum(y for _, y in items)) // n
        expect[b] = (n, avg_pred, obs, avg_pred - obs)
    num = sum(n * abs(gap) for n, _, _, gap in expect.values())
    den = sum(n for n, _, _, _ in expect.values())
    ece = num // den
    out = REGISTRY["q_ml_calibration"].builder(spark, SF_SMALL).collect()
    assert len(out) == len(expect)
    for r in out:
        n, avg_pred, obs, gap = expect[int(r["bin"])]
        assert (
            int(r["n"]),
            int(r["avg_pred_bp"]),
            int(r["obs_bp"]),
            int(r["gap_bp"]),
            int(r["ece_bp"]),
        ) == (n, avg_pred, obs, gap, ece)


# -------------------------------------------- round-6 property checks
# Pure-python, engine-independent properties of the newest kernels —
# the fixture parity proves one dataset; these prove the ALGORITHM.

@given(
    d=st.integers(-10_000, 10_000),
    qx10=st.sampled_from([1, 5, 9]),
)
@SETTINGS
def test_pinball_x10_identity(d, qx10):
    """The integer x10 formulation equals 10x the textbook pinball
    loss max(τ·e, (τ−1)·e), and is non-negative with the documented
    9:1 asymmetry at τ=0.9."""
    l10 = max(qx10 * d, (qx10 - 10) * d)
    tau = qx10 / 10
    textbook = max(tau * d, (tau - 1) * d)
    assert l10 == round(10 * textbook, 6)
    assert l10 >= 0
    if qx10 == 9 and d != 0:
        under, over = max(9 * abs(d), -abs(d)), max(-9 * abs(d), abs(d))
        assert under == 9 * over  # miss-low costs 9x miss-high


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_louvain_gain_numerator_matches_modularity_definition(edges):
    """q_graph_louvain_matching compares gains by the integer
    numerator 2m − k_u·k_v. Check against the modularity DEFINITION:
    for any neighboring pair (u, v), merging the two singleton
    communities changes Q = Σ_c [e_c/m − (d_c/2m)²] by exactly
    (2m·A_uv − k_u·k_v) / (2m²)."""
    m = len(edges)
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    nodes = sorted(deg)

    def q_of(partition: dict[int, int]) -> float:
        comms = set(partition.values())
        q = 0.0
        for c in comms:
            members = {n for n in nodes if partition[n] == c}
            e_c = sum(1 for (u, v) in edges if u in members and v in members)
            d_c = sum(deg[n] for n in members)
            q += e_c / m - (d_c / (2 * m)) ** 2
        return q

    singletons = {n: n for n in nodes}
    base = q_of(singletons)
    for (u, v) in edges:  # neighbors: A_uv = 1
        merged = dict(singletons)
        merged[v] = u
        gain_def = q_of(merged) - base
        gain_num = 2 * m - deg[u] * deg[v]
        assert abs(gain_def - gain_num / (2 * m * m)) < 1e-9


def _scd2_oneshot(events):
    """One-shot SCD2 over (user, ts, eid, state) — the oracle logic."""
    out = []
    by_user: dict[int, list] = {}
    for u, ts, eid, s in sorted(events, key=lambda e: (e[0], e[1], e[2])):
        by_user.setdefault(u, []).append((ts, eid, s))
    for u, evs in by_user.items():
        changes = []
        prev = None
        for ts, eid, s in evs:
            if prev is None or prev != s:
                changes.append((ts, eid, s))
            prev = s
        for i, (ts, eid, s) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.append(
                (u, s, i + 1, ts, nxt if nxt is not None else -1,
                 1 if nxt is None else 0)
            )
    return sorted(out)


def _scd2_incremental(events, boundaries):
    """Mirror of q_stream_scd2_incremental's merge over python data:
    process time-ordered batches, carry open rows across batches."""
    stream = sorted(events, key=lambda e: (e[1], e[2]))  # (ts, eid) order
    dim: list = []  # rows like _scd2_oneshot's
    open_row: dict[int, tuple] = {}  # user -> (state, version, valid_from)
    lo = 0
    for hi in list(boundaries) + [len(stream)]:
        batch = stream[lo:hi]
        lo = hi
        if not batch:
            continue
        by_user: dict[int, list] = {}
        for u, ts, eid, s in sorted(batch, key=lambda e: (e[0], e[1], e[2])):
            by_user.setdefault(u, []).append((ts, eid, s))
        for u, evs in by_user.items():
            prev = open_row.get(u, (None, 0, None))[0]
            version = open_row.get(u, (None, 0, None))[1]
            changes = []
            for ts, eid, s in evs:
                if prev is None or prev != s:
                    changes.append((ts, eid, s))
                prev = s
            if not changes:
                continue
            if u in open_row:
                st_, ver_, vf_ = open_row[u]
                dim.append((u, st_, ver_, vf_, changes[0][0], 0))
            for i, (ts, eid, s) in enumerate(changes):
                if i + 1 < len(changes):
                    dim.append((u, s, version + i + 1, ts, changes[i + 1][0], 0))
                else:
                    open_row[u] = (s, version + len(changes), ts)
    for u, (s, ver, vf) in open_row.items():
        dim.append((u, s, ver, vf, -1, 1))
    return sorted(dim)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),     # user
            st.integers(0, 30),    # ts
            st.integers(0, 10**6), # event_id (uniqueness enforced below)
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda e: e[2],
    ),
    n_batches=st.integers(1, 5),
)
@SETTINGS
def test_scd2_incremental_equals_oneshot(events, n_batches):
    """The incremental-merge algorithm of q_stream_scd2_incremental
    equals the one-shot rebuild for EVERY time-ordered stream and
    EVERY batch segmentation — including batches that split a user's
    burst, same-timestamp ties (event_id order), and users whose
    state never changes across a boundary."""
    step = max(1, len(events) // n_batches)
    boundaries = list(range(step, len(events), step))
    assert _scd2_incremental(events, boundaries) == _scd2_oneshot(events)


# ---------------------------------------------------------------------------
# Holt double exponential smoothing (q_ts_holt): pure-python reference
# fold sharing no code with the Spark F.aggregate lambda or the DuckDB
# recursive CTE. alpha=beta=1/2 makes every step exactly representable
# (halvings are exact in binary floating point when operands are),
# so the comparison is EXACT equality, not approx.
# ---------------------------------------------------------------------------


def _holt_reference(values):
    level, trend = float(values[0]), 0.0
    for y in values[1:]:
        l_new = 0.5 * y + 0.5 * (level + trend)
        trend = 0.5 * (l_new - level) + 0.5 * trend
        level = l_new
    return level, trend


def test_holt_matches_python_reference(spark):
    """The engine's Holt fold must equal the independent python
    recurrence applied to the same per-day cents series, exactly."""
    rows = REGISTRY["q_ts_holt"].builder(spark, SF_SMALL).collect()
    assert rows, "holt output empty"
    # Rebuild each series independently: pandas day-truncate + integer
    # cents, no Spark/DuckDB involved.
    events = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    ts = pd.to_datetime(events["ts"], utc=False)
    events = events.assign(
        day=ts.dt.floor("D"),
        cents=(events["value"] * 100).round().astype("int64"),
    )
    daily = (
        events.groupby(["event_type", "day"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        series = daily[daily["event_type"] == r.event_type]["cents"].tolist()
        assert r.n_days == len(series), r.event_type
        level, trend = _holt_reference(series)
        assert r.level == level, (r.event_type, r.level, level)
        assert r.trend == trend, (r.event_type, r.trend, trend)
        assert r.forecast_next == level + trend


@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40
    )
)
@SETTINGS
def test_holt_reference_properties(values):
    """Sanity properties of the recurrence itself: constant series →
    level equals the constant and trend decays to ~0; exact linear
    ramp → forecast stays within the ramp's convex hull extension."""
    level, trend = _holt_reference([float(v) for v in values])
    if len(set(values)) == 1:
        assert level == values[0] if len(values) == 1 else abs(
            level - values[0]
        ) < abs(values[0]) * 1e-9 + 1e-9
        assert abs(trend) < abs(values[0]) * 1e-9 + 1e-9
    lo, hi = min(values), max(values)
    span = hi - lo
    assert lo - 2 * span - 1e-9 <= level <= hi + 2 * span + 1e-9


def test_snapshot_diff_matches_python_reference(spark):
    """q_merge_snapshot_diff's classification counts re-derived with
    pandas only: state-as-of via sort+groupby-last at the same integer
    cutoffs, then a dict diff."""
    rows = {
        r.change_type: (r.n_users, r.n_states)
        for r in REGISTRY["q_merge_snapshot_diff"].builder(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "event_type", "ts", "event_id"]
    ]
    # normalize to ns first (pandas may read the parquet as
    # datetime64[us]); the diff classification is unit-scale-free, but
    # keep the column honestly µs anyway
    us = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64") // 1000
    )
    ev = ev.assign(us=us)
    mn, mx = int(ev["us"].min()), int(ev["us"].max())
    t1 = mn + (mx - mn) // 3
    t2 = mn + ((mx - mn) * 2) // 3

    def state_at(t):
        sub = ev[ev["us"] <= t].sort_values(["us", "event_id"])
        return sub.groupby("user_id")["event_type"].last().to_dict()

    s1, s2 = state_at(t1), state_at(t2)
    diff = {}
    for u in set(s1) | set(s2):
        if u not in s1:
            kind = "added"
        elif u not in s2:
            kind = "removed"
        elif s1[u] != s2[u]:
            kind = "changed"
        else:
            kind = "unchanged"
        diff.setdefault(kind, [0, set()])
        diff[kind][0] += 1
        if u in s2:
            diff[kind][1].add(s2[u])
    expect = {k: (n, len(states)) for k, (n, states) in diff.items()}
    assert rows == expect


def test_emb_dim_drift_matches_numpy_reference(spark):
    """q_emb_dim_drift's exact integer cross-moment and SMD re-derived
    with numpy from the raw parquet."""
    got = {
        r.dim: (r.n_a, r.n_b, r.diff_num, r.smd)
        for r in REGISTRY["q_emb_dim_drift"].builder(spark, SF_SMALL).collect()
    }
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.vstack(emb["embedding"].to_numpy())
    q = np.round(vecs.astype("float64") * 1_000_000).astype("int64")
    grp = (emb["label"].to_numpy() % 2).astype(bool)  # True = group b
    a, b = q[~grp], q[grp]
    for dim in range(1, q.shape[1] + 1):
        xa, xb = a[:, dim - 1], b[:, dim - 1]
        na, nb = len(xa), len(xb)
        sa, sb = int(xa.sum()), int(xb.sum())
        sqqa = int((xa.astype(object) * xa.astype(object)).sum())
        sqqb = int((xb.astype(object) * xb.astype(object)).sum())
        diff_num = sa * nb - sb * na
        sa_d, sb_d, na_d, nb_d = float(sa), float(sb), float(na), float(nb)
        smd = (sa_d / na_d - sb_d / nb_d) / math.sqrt(
            (
                (float(sqqa) - (sa_d / na_d) * sa_d)
                + (float(sqqb) - (sb_d / nb_d) * sb_d)
            )
            / (na_d + nb_d)
        )
        n_a, n_b, dn, got_smd = got[dim]
        assert (n_a, n_b) == (na, nb)
        assert dn == diff_num, (dim, dn, diff_num)
        assert abs(got_smd - smd) <= 1e-6, (dim, got_smd, smd)


def test_funnel_time_window_matches_bruteforce(spark):
    """q_funnel_time_window's carry-window formulation vs the literal
    EXISTS-over-triples definition, brute-forced per user in python:
    depth 3 iff some view<=click<=purchase chain spans <= T from the
    view; depth 2 iff some view<=click within T; depth 1 iff any view.
    This is the proof the greedy latest-view carry is equivalent to
    EXISTS — the one step the shared window formulation could get
    wrong on both engines at once."""
    from batchprocessor_spark.operators.analytics import _FUNNEL_WINDOW_US

    got = {
        r.depth: r.n_users
        for r in REGISTRY["q_funnel_time_window"].builder(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "event_type", "ts", "event_id"]
    ]
    # normalize to ns BEFORE the integer cast — pandas may surface the
    # parquet timestamps as datetime64[us], where astype(int64) would
    # yield µs and the //1000 below would silently produce ms
    ev = ev.assign(
        us=pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 1000
    )
    T = _FUNNEL_WINDOW_US
    expect: dict[int, int] = {}
    # Chain order is the ENGINE's order: (us, event_id) tuples, not
    # bare timestamps — a view and click sharing a microsecond with
    # the view's event_id larger must NOT chain (the carry windows
    # order by us, event_id on both engines; ADVICE r7). The time
    # budget stays on us alone.
    for _, g in ev.sort_values(["us", "event_id"]).groupby("user_id"):
        views = list(zip(g[g.event_type == "view"]["us"],
                         g[g.event_type == "view"]["event_id"]))
        clicks = list(zip(g[g.event_type == "click"]["us"],
                          g[g.event_type == "click"]["event_id"]))
        buys = list(zip(g[g.event_type == "purchase"]["us"],
                        g[g.event_type == "purchase"]["event_id"]))
        depth = 0
        if views:
            depth = 1
        if any(v <= c and c[0] <= v[0] + T for v in views for c in clicks):
            depth = 2
        if any(
            v <= c <= p and p[0] <= v[0] + T
            for v in views
            for c in clicks
            for p in buys
        ):
            depth = 3
        expect[depth] = expect.get(depth, 0) + 1
    assert got == expect


def test_rolling_active_users_matches_bruteforce(spark):
    """q_events_rolling_active_users vs a literal set-based
    re-derivation: for each day d in range, |union of active-user sets
    over [d-6, d]| — no fan-out trick, just sets."""
    import datetime

    rows = {
        r.day: (r.dau, r.wau_7, r.dau_wau_bp)
        for r in REGISTRY["q_events_rolling_active_users"]
        .builder(spark, SF_SMALL)
        .collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[["user_id", "ts"]]
    days = pd.to_datetime(ev["ts"]).dt.date
    by_day: dict = {}
    for u, d in zip(ev["user_id"], days):
        by_day.setdefault(d, set()).add(int(u))
    lo, hi = min(by_day), max(by_day)
    expect = {}
    d = lo
    while d <= hi:
        active = set()
        for back in range(7):
            active |= by_day.get(d - datetime.timedelta(days=back), set())
        if active:
            dau = len(by_day.get(d, set()))
            expect[d.isoformat()] = (dau, len(active), (10000 * dau) // len(active))
        d += datetime.timedelta(days=1)
    assert rows == expect


def test_power_mde_matches_python_reference(spark):
    """q_ab_power_mde vs a from-scratch python computation over the
    raw cents (statistics.variance-style two-pass, not the moment
    identity) — catches a shared moment-formula mistake."""
    r = REGISTRY["q_ab_power_mde"].builder(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[["event_type", "value"]]
    cents = (ev["value"] * 100).round().astype("int64")
    x1 = cents[ev["event_type"] == "click"].to_numpy(dtype="float64")
    x2 = cents[ev["event_type"] == "purchase"].to_numpy(dtype="float64")
    delta = x2.mean() - x1.mean()
    s2p = (x1.var(ddof=1) + x2.var(ddof=1)) / 2
    z = 1.959963984540054 + 0.8416212335729143
    mde = z * math.sqrt(2 * s2p / min(len(x1), len(x2)))
    n_req = math.ceil(2 * z * z * s2p / (delta * delta))
    assert (r.n1, r.n2) == (len(x1), len(x2))
    assert abs(r.delta_cents - delta) < 1e-6 + abs(delta) * 1e-9
    assert abs(r.mde_cents - mde) < 1e-6 + mde * 1e-9
    # ceil near an integer boundary could legitimately differ by 1
    # between the two-pass and moment formulations; require exact
    # match unless the argument is within 1e-9 of an integer.
    assert abs(r.n_required - n_req) <= (
        1 if abs(2 * z * z * s2p / (delta * delta) % 1) < 1e-9 else 0
    )


def test_winnowing_matches_python_reference(spark):
    """q_llm_winnowing vs a from-scratch python winnowing (explicit
    per-window scan with the rightmost-min tie rule, hashes from
    hashlib.md5 — no Spark/DuckDB expression shared)."""
    import hashlib

    from batchprocessor_spark.functions.text import _WIN_K, _WIN_W

    rows = {
        r.doc_id: (r.n_fp, r.fp_hash_sum, r.fp_min)
        for r in REGISTRY["q_llm_winnowing"].builder(spark, SF_SMALL).collect()
    }
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["doc_id", "text"]]
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = text.split(" ")
        grams = [
            " ".join(ws[i : i + _WIN_K]) for i in range(len(ws) - _WIN_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        fps = set()
        for j in range(len(hs) - _WIN_W + 1):
            window = hs[j : j + _WIN_W]
            m = min(window)
            # rightmost occurrence of the min in this window
            pos = j + max(i for i, h in enumerate(window) if h == m)
            fps.add((m, pos))
        fp_hashes = [h for h, _ in fps]
        if fp_hashes:
            expect[int(doc_id)] = (
                len(fps),
                sum(fp_hashes),
                min(fp_hashes),
            )
    assert rows == expect


def test_winnowing_matching_guarantee(spark):
    """The MOSS guarantee on synthetic data: two documents sharing a
    run of >= _WIN_K + _WIN_W - 1 words MUST share at least one
    fingerprint (h, regardless of position)."""
    import hashlib

    from batchprocessor_spark.functions.text import _WIN_K, _WIN_W

    shared = "alpha beta gamma delta epsilon zeta".split()  # 6 = k+w-1
    assert len(shared) >= _WIN_K + _WIN_W - 1
    d1 = ["x%d" % i for i in range(10)] + shared + ["y%d" % i for i in range(7)]
    d2 = ["p%d" % i for i in range(4)] + shared + ["q%d" % i for i in range(12)]

    def fps(ws):
        grams = [" ".join(ws[i : i + _WIN_K]) for i in range(len(ws) - _WIN_K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        out = set()
        for j in range(len(hs) - _WIN_W + 1):
            out.add(min(hs[j : j + _WIN_W]))
        return out

    assert fps(d1) & fps(d2), "matching guarantee violated"


def test_dup_token_mass_matches_pandas(spark):
    """q_llm_dup_token_mass vs a literal pandas re-derivation: group
    texts by value, histogram token mass by multiplicity, basis
    points by integer division — every column exact."""
    got = {
        r.dup_count: (r.n_groups, r.n_docs, r.token_mass, r.mass_bp)
        for r in REGISTRY["q_llm_dup_token_mass"].builder(spark, SF_SMALL).collect()
    }
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["text"])
    toks = docs["text"].str.split(" ").str.len()
    g = pd.DataFrame({"text": docs["text"], "toks": toks}).groupby("text").agg(
        dup_count=("toks", "size"), toks=("toks", "sum")
    )
    k = g.groupby("dup_count").agg(
        n_groups=("toks", "size"), token_mass=("toks", "sum")
    )
    total = int(k["token_mass"].sum())
    expect = {
        int(dc): (
            int(row.n_groups),
            int(dc) * int(row.n_groups),
            int(row.token_mass),
            (10000 * int(row.token_mass)) // total,
        )
        for dc, row in k.iterrows()
    }
    assert got == expect


def test_normalize_dedup_gain_matches_pandas(spark):
    """q_llm_normalize_dedup_gain vs the same two regex rewrites in
    python: lowercase, [^a-z0-9 ] -> space, collapse runs, trim."""
    import re

    (row,) = REGISTRY["q_llm_normalize_dedup_gain"].builder(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["text"])

    def norm(t: str) -> str:
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()

    n = len(docs)
    distinct_raw = docs["text"].nunique()
    distinct_norm = docs["text"].map(norm).nunique()
    assert row.n_docs == n
    assert row.distinct_raw == distinct_raw
    assert row.distinct_norm == distinct_norm
    assert row.dup_raw == n - distinct_raw
    assert row.dup_norm == n - distinct_norm
    assert row.gain_bp == (10000 * ((n - distinct_norm) - (n - distinct_raw))) // n
    # normalization can only merge texts, never split them
    assert row.distinct_norm <= row.distinct_raw


def test_split_leakage_matches_bruteforce(spark):
    """q_llm_split_leakage vs brute force: exact 3-gram-shingle
    Jaccard over all pairs in python, the md5 split rule from
    q_sample_hash_split re-derived with hashlib."""
    import hashlib
    from itertools import combinations

    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.is_leak)
        for r in REGISTRY["q_llm_split_leakage"].builder(spark, SF_SMALL).collect()
    }
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])

    def shingles(t: str) -> set:
        ws = t.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    sh = {int(r.doc_id): shingles(r.text) for r in docs.itertuples()}
    expect: dict = {}
    for d1, d2 in combinations(sorted(sh), 2):
        a, b = sh[d1], sh[d2]
        inter = len(a & b)
        if inter and inter / (len(a) + len(b) - inter) > 0.5:
            key = tuple(sorted((split_of(d1), split_of(d2))))
            n, _ = expect.get(key, (0, key[0] != key[1]))
            expect[key] = (n + 1, key[0] != key[1])
    assert got == expect


def test_random_projection_matches_numpy_reference(spark):
    """q_emb_random_projection vs numpy: the ±1 matrix re-derived
    from the python sign twin, projections / pair distances / ratio
    recomputed with exact python ints — integer equality, no
    tolerance — plus a distribution sanity pin (median ratio within
    [6000, 16000] bp) that a degenerate sign matrix (the affine-hash
    checkerboard the docstring warns about) fails by orders of
    magnitude."""
    from batchprocessor_spark.operators.similarity import (
        _JL_SCALE,
        _JL_TARGET,
        _jl_sign_py,
    )

    emb = pd.read_parquet(
        f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    scaled = vecs * _JL_SCALE
    q = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    S = np.array(
        [[_jl_sign_py(i, j) for j in range(_JL_TARGET)] for i in range(64)],
        dtype=np.int64,
    )
    y = q @ S
    by_id = {int(v): k for k, v in enumerate(ids)}
    expect = {}
    for vid, row in by_id.items():
        nxt = by_id.get(vid + 1)
        if nxt is None:
            continue
        d_orig = int(((q[row] - q[nxt]) ** 2).sum())
        d_proj = int(((y[row] - y[nxt]) ** 2).sum())
        ratio = (
            (10000 * d_proj) // (_JL_TARGET * d_orig) if d_orig else None
        )
        expect[vid] = (d_orig, d_proj, ratio)
    got = {
        int(r.vec_id): (
            int(r.d_orig),
            int(r.d_proj),
            None if r.ratio_bp is None else int(r.ratio_bp),
        )
        for r in REGISTRY["q_emb_random_projection"]
        .builder(spark, SF_SMALL)
        .collect()
    }
    assert got == expect
    ratios = sorted(v[2] for v in got.values() if v[2] is not None)
    median = ratios[len(ratios) // 2]
    assert 6000 <= median <= 16000, median


def test_lexical_richness_matches_python_counter(spark):
    """q_text_lexical_richness vs a collections.Counter recompute —
    exact integer equality for all five measures per source."""
    from collections import Counter

    docs = pd.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["source", "text"]
    )
    per_src: dict[str, Counter] = {}
    for r in docs.itertuples():
        c = per_src.setdefault(r.source, Counter())
        c.update(w for w in r.text.split(" ") if w)
    expect = {}
    for src, c in per_src.items():
        n = sum(c.values())
        v = len(c)
        hapax = sum(1 for f in c.values() if f == 1)
        s2 = sum(f * (f - 1) for f in c.values())
        expect[src] = (
            n,
            v,
            hapax,
            (10000 * v) // n,
            (1000000 * s2) // (n * (n - 1)) if n > 1 else None,
        )
    got = {
        r.source: (
            int(r.n_tokens),
            int(r.n_types),
            int(r.n_hapax),
            int(r.ttr_bp),
            None if r.simpson_ppm is None else int(r.simpson_ppm),
        )
        for r in REGISTRY["q_text_lexical_richness"]
        .builder(spark, SF_SMALL)
        .collect()
    }
    assert got == expect


def test_readability_matches_python_re(spark):
    """q_text_readability vs a stdlib-re recompute: exact integer
    counts and the identical float formula at 4 dp."""
    import re as _re

    docs = pd.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["source", "text"]
    )
    agg: dict[str, list] = {}
    for r in docs.itertuples():
        words = sum(1 for w in r.text.split(" ") if w)
        sentences = max(1, len(_re.findall(r"[.!?]+", r.text)))
        syllables = len(_re.findall(r"[aeiouy]+", r.text.lower()))
        a = agg.setdefault(r.source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += words
        a[2] += sentences
        a[3] += syllables
    expect = {}
    for src, (d, w, s, y) in agg.items():
        flesch = round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
        expect[src] = (d, w, s, y, flesch)
    got = {
        r.source: (
            int(r.n_docs),
            int(r.n_words),
            int(r.n_sentences),
            int(r.n_syllables),
            float(r.flesch),
        )
        for r in REGISTRY["q_text_readability"].builder(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_tokenizer_fertility_matches_python_re(spark):
    """q_llm_tokenizer_fertility vs a stdlib-re recompute — exact
    integer equality including the basis-point floor divisions."""
    import re as _re

    from batchprocessor_spark.functions.text import _TOKEN_RE

    docs = pd.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["source", "text"]
    )
    agg: dict[str, list] = {}
    for r in docs.itertuples():
        a = agg.setdefault(r.source, [0, 0, 0])
        a[0] += sum(1 for w in r.text.split(" ") if w)
        a[1] += len(_re.findall(_TOKEN_RE, r.text))
        a[2] += len(r.text)
    expect = {
        src: (
            w,
            t,
            c,
            (10000 * t) // w if w else None,
            (10000 * c) // t if t else None,
        )
        for src, (w, t, c) in agg.items()
    }
    got = {
        r.source: (
            int(r.n_words),
            int(r.n_tokens),
            int(r.n_chars),
            None if r.fertility_bp is None else int(r.fertility_bp),
            None if r.chars_per_token_bp is None else int(r.chars_per_token_bp),
        )
        for r in REGISTRY["q_llm_tokenizer_fertility"]
        .builder(spark, SF_SMALL)
        .collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Holt-Winters additive triple smoothing (q_ts_holt_winters): independent
# python fold with an explicitly-indexed seasonal array (the engine and
# oracle carry a pop/append QUEUE instead — a different mechanization of
# s_{t-m}), alpha=beta=gamma=1/2 so every step is an exact halving and
# the comparison is EXACT equality.
# ---------------------------------------------------------------------------


def _holt_winters_reference(values, m=7):
    level, trend = float(values[0]), 0.0
    seasonal = {}  # t -> s_t, consumed at t+m; missing = 0.0
    for t, y in enumerate(values[1:], start=1):
        s_lag = seasonal.get(t - m, 0.0)
        l_new = 0.5 * (y - s_lag) + 0.5 * (level + trend)
        trend = 0.5 * (l_new - level) + 0.5 * trend
        seasonal[t] = 0.5 * (y - l_new) + 0.5 * s_lag
        level = l_new
    t_next = len(values)
    s_next = seasonal.get(t_next - m, 0.0)
    return level, trend, s_next


def test_holt_winters_matches_python_reference(spark):
    """The engine's Holt-Winters queue-state fold must equal the
    independent dict-indexed python recurrence exactly."""
    rows = REGISTRY["q_ts_holt_winters"].builder(spark, SF_SMALL).collect()
    assert rows, "holt-winters output empty"
    events = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    ts = pd.to_datetime(events["ts"], utc=False)
    events = events.assign(
        day=ts.dt.floor("D"),
        cents=(events["value"] * 100).round().astype("int64"),
    )
    daily = (
        events.groupby(["event_type", "day"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        series = [
            float(v)
            for v in daily[daily["event_type"] == r.event_type]["cents"]
        ]
        assert r.n_days == len(series), r.event_type
        level, trend, s_next = _holt_winters_reference(series)
        assert r.level == level, (r.event_type, r.level, level)
        assert r.trend == trend, (r.event_type, r.trend, trend)
        assert r.s_next == s_next, (r.event_type, r.s_next, s_next)
        assert r.forecast_next == level + trend + s_next


@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40
    )
)
@SETTINGS
def test_holt_winters_reference_properties(values):
    """With fewer than m+1 points no seasonal lag is ever populated,
    so Holt-Winters must DEGENERATE to plain Holt exactly; constant
    series keep the level near the constant."""
    vals = [float(v) for v in values]
    level, trend, s_next = _holt_winters_reference(vals)
    if len(vals) <= 7:
        h_level, h_trend = _holt_reference(vals)
        assert level == h_level and trend == h_trend
    if len(set(values)) == 1 and len(vals) > 1:
        assert abs(level - values[0]) < abs(values[0]) * 1e-9 + 1e-9


# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit estimator (q_ml_kaplan_meier): independent
# python implementation over subjects re-derived with pandas (first view,
# first purchase at/after it, censor at last activity), carrying the
# survival product in the SAME integer 1e-12 floor recurrence — the
# declared exactness convention — plus textbook properties.
# ---------------------------------------------------------------------------


def _km_reference(durations, events):
    """[(dur, n_risk, n_events, survival_e12)] for event times only."""
    import collections

    by_dur = collections.defaultdict(lambda: [0, 0])  # dur -> [events, total]
    for d, e in zip(durations, events):
        by_dur[d][0] += int(e)
        by_dur[d][1] += 1
    out, s, at_risk = [], 10**12, len(durations)
    for d in sorted(by_dur):
        ev, tot = by_dur[d]
        if ev > 0:
            s = (s * (at_risk - ev)) // at_risk
            out.append((d, at_risk, ev, s))
        at_risk -= tot
    return out


def test_kaplan_meier_matches_python_reference(spark):
    rows = sorted(
        REGISTRY["q_ml_kaplan_meier"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows, "km output empty"
    events = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "ts", "event_type"]
    ]
    # normalize to int64 MICROseconds regardless of the parquet
    # reader's datetime64 resolution (ns at some pandas/pyarrow
    # versions, us at others)
    events["us"] = (
        pd.to_datetime(events["ts"]).astype("datetime64[us]").astype("int64")
    )
    durs, evts = [], []
    for _, g in events.groupby("user_id"):
        views = g[g["event_type"] == "view"]["us"]
        if views.empty:
            continue
        v0 = views.min()
        purch = g[(g["event_type"] == "purchase") & (g["us"] >= v0)]["us"]
        if purch.empty:
            durs.append((g["us"].max() - v0) // 86_400_000_000)
            evts.append(0)
        else:
            durs.append((purch.min() - v0) // 86_400_000_000)
            evts.append(1)
    ref = _km_reference(durs, evts)
    got = [
        (r.duration_days, r.n_risk, r.n_events, r.survival_e12) for r in rows
    ]
    assert got == ref
    # Textbook properties: survival non-increasing in [0, 1e12]; the
    # risk set strictly shrinks along event times.
    survs = [r.survival_e12 for r in rows]
    assert all(0 <= s <= 10**12 for s in survs)
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    risks = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.booleans(),
        ),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_km_reference_properties(subjects):
    """KM on all-event data equals the empirical survival function
    (the estimator's defining degenerate case), in the same integer
    floor lane."""
    durs = [d for d, _ in subjects]
    out = _km_reference(durs, [1] * len(subjects))
    n = len(durs)
    for d, n_risk, ev, surv in out:
        exact_survivors = sum(1 for x in durs if x > d)
        # with no censoring the product telescopes: S = survivors/n,
        # up to the declared per-step floor (each step loses < 1 unit)
        approx = exact_survivors * 10**12 // n
        assert abs(surv - approx) <= len(out), (d, surv, approx)


# ---------------------------------------------------------------------------
# Fellegi-Sunter linkage weights (q_dedup_fellegi_sunter): pure-python
# re-derivation of blocking pairs, agreement patterns, data-estimated
# u-probabilities, and the staged integer-ppm likelihood products —
# sharing no code with the Spark builder or the DuckDB oracle.
# ---------------------------------------------------------------------------


def _fs_reference(docs):
    """docs: list of (doc_id, lang, source, wbucket, fp3, blk).
    Returns {pattern: (n_pairs, score_ppm, class)}."""
    import collections
    import itertools

    n = len(docs)
    u_den = n * (n - 1)
    m = {"lang": (19, 20), "source": (9, 10), "wbucket": (4, 5), "fp3": (99, 100)}
    fields = ["lang", "source", "wbucket", "fp3"]
    idx = {"lang": 1, "source": 2, "wbucket": 3, "fp3": 4}
    u_num = {}
    for f in fields:
        counts = collections.Counter(d[idx[f]] for d in docs)
        u_num[f] = sum(c * (c - 1) for c in counts.values())
    CAP = 30_000_000  # the declared ratio-30 winsorization
    blocks = collections.defaultdict(list)
    for d in docs:
        blocks[d[5]].append(d)
    pat_counts = collections.Counter()
    for blk in blocks.values():
        blk = sorted(blk)
        for a, b in itertools.combinations(blk, 2):
            pat = tuple(int(a[idx[f]] == b[idx[f]]) for f in fields)
            pat_counts[pat] += 1
    out = {}
    for pat, cnt in pat_counts.items():
        ws = []
        for f, ag in zip(fields, pat):
            mn, md = m[f]
            if ag:
                ws.append(min((1_000_000 * mn * u_den) // (md * u_num[f]), CAP))
            else:
                ws.append(
                    min(
                        (1_000_000 * (md - mn) * u_den)
                        // (md * (u_den - u_num[f])),
                        CAP,
                    )
                )
        score = (((ws[0] * ws[1]) // 1_000_000) * ((ws[2] * ws[3]) // 1_000_000)) // 1_000_000
        cls = (
            "match"
            if score >= 100_000_000
            else "possible" if score >= 1_000_000 else "nonmatch"
        )
        out[pat] = (cnt, score, cls)
    return out


def test_fellegi_sunter_matches_python_reference(spark):
    import hashlib

    rows = REGISTRY["q_dedup_fellegi_sunter"].builder(spark, SF_SMALL).collect()
    assert rows, "fs output empty"
    docs_pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    docs = []
    for r in docs_pdf.itertuples(index=False):
        wbucket = len([w for w in r.text.split(" ") if w != ""]) // 10
        fp3 = hashlib.md5(r.text.encode()).hexdigest()[:3]
        docs.append(
            (int(r.doc_id), r.lang, r.source, wbucket, fp3, int(r.n_chars) // 4)
        )
    ref = _fs_reference(docs)
    got = {
        (r.ag_lang, r.ag_source, r.ag_wbucket, r.ag_fp3): (
            r.n_pairs,
            r.score_ppm,
            r["class"],
        )
        for r in rows
    }
    assert got == ref
    # monotonicity property: flipping any field from disagree to agree
    # must never DECREASE the pattern weight (m/u > (1-m)/(1-u) holds
    # for every field on this corpus)
    for pat, (_, score, _) in got.items():
        for i in range(4):
            if pat[i] == 0:
                flipped = tuple(1 if j == i else pat[j] for j in range(4))
                if flipped in got:
                    assert got[flipped][1] >= score, (pat, flipped)


# ---------------------------------------------------------------------------
# Percentile bootstrap CI (q_ab_bootstrap_ci): pure-python recompute of
# the hash ladder, per-replicate weighted deltas, and the nearest-rank
# selection.
# ---------------------------------------------------------------------------


def test_bootstrap_ci_matches_python_reference(spark):
    import hashlib

    from batchprocessor_spark.operators.analytics import _BCI_R
    from batchprocessor_spark.operators.sampling import _BOOT_T

    row = REGISTRY["q_ab_bootstrap_ci"].builder(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e = e[e["event_type"].isin(["click", "purchase"])]
    cents = (e["value"] * 100).round().astype("int64").to_numpy()
    is1 = (e["event_type"] == "click").to_numpy()
    ids = e["event_id"].astype("int64").to_numpy()

    def mult(rep, eid):
        h = int(hashlib.md5(f"bci{rep}:{eid}".encode()).hexdigest()[:8], 16)
        for k, t in enumerate(_BOOT_T):
            if h < t:
                return k
        return len(_BOOT_T)

    deltas = []
    for rep in range(_BCI_R):
        ks = np.array([mult(rep, i) for i in ids], dtype="int64")
        w1, wc1 = ks[is1].sum(), (ks[is1] * cents[is1]).sum()
        w2, wc2 = ks[~is1].sum(), (ks[~is1] * cents[~is1]).sum()
        deltas.append(wc1 / max(w1, 1) - wc2 / max(w2, 1))
    order = sorted(range(_BCI_R), key=lambda r: (deltas[r], r))
    assert row.n_boot == _BCI_R
    assert row.n_click == int(is1.sum())
    assert row.n_purchase == int((~is1).sum())
    assert row.ci_lo == round(deltas[order[0]], 6)
    assert row.ci_hi == round(deltas[order[_BCI_R - 2]], 6)
    assert row.delta_obs == round(
        cents[is1].sum() / is1.sum() - cents[~is1].sum() / (~is1).sum(), 6
    )
    # and the interval must contain the bulk of the replicate mass
    inside = sum(
        1 for d in deltas if deltas[order[0]] <= d <= deltas[order[_BCI_R - 2]]
    )
    assert inside >= _BCI_R - 2


# ---------------------------------------------------------------------------
# Growth-accounting lifecycle (q_events_lifecycle): pure-python
# re-derivation from per-user purchase-day sets, plus the accounting
# identities the decomposition must satisfy.
# ---------------------------------------------------------------------------


def test_lifecycle_matches_python_reference(spark):
    rows = REGISTRY["q_events_lifecycle"].builder(spark, SF_SMALL).collect()
    got = {
        r.day: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned, r.n_active)
        for r in rows
    }
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e = e[e["event_type"] == "purchase"]
    us = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    days = us // 86_400_000_000
    per_user = {}
    for uid, d in zip(e["user_id"], days):
        per_user.setdefault(int(uid), set()).add(int(d))
    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    max_day = max(max(s) for s in per_user.values())
    for uid, ds in per_user.items():
        first = min(ds)
        for d in ds:
            rec = agg[d]
            if d == first:
                rec[0] += 1
            elif d - 1 in ds:
                rec[1] += 1
            else:
                rec[2] += 1
            rec[4] += 1
            if d + 1 not in ds and d + 1 <= max_day:
                agg[d + 1][3] += 1
    ref = {d: tuple(v) for d, v in agg.items()}
    assert got == ref
    # identities: active = new + retained + resurrected per day; total
    # new == number of users; every churn has a preceding active day
    for d, (n, r, rs, _, a) in got.items():
        assert a == n + r + rs, d
    assert sum(v[0] for v in got.values()) == len(per_user)


# ---------------------------------------------------------------------------
# Page-Hinkley drift detector (q_ts_page_hinkley): independent python
# fold with plain ints.
# ---------------------------------------------------------------------------


def test_page_hinkley_matches_python_reference(spark):
    rows = REGISTRY["q_ts_page_hinkley"].builder(spark, SF_SMALL).collect()
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    us = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    e = e.assign(
        day_no=us // 86_400_000_000,
        cents=(e["value"] * 100).round().astype("int64"),
    )
    daily = (
        e.groupby(["event_type", "day_no"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day_no"])
    )
    for r in rows:
        g = daily[daily["event_type"] == r.event_type]
        series = list(zip(g["day_no"], g["cents"]))
        assert r.n_days == len(series)
        b = sum(c for _, c in series[:7])
        s = mx = 0
        alarm = None
        for day_no, x in series[7:]:
            s = max(0, s + 7 * int(x) - b - b // 10)
            mx = max(mx, s)
            if alarm is None and s > b // 2:
                alarm = int(day_no)
        assert r.baseline_cents == b, r.event_type
        assert r.max_stat == mx, r.event_type
        assert r.alarm_day_no == alarm, r.event_type


# ---------------------------------------------------------------------------
# HITS (q_graph_hits): pure-python mutual-reinforcement rounds with the
# same integer floor-renormalization, re-deriving the edge list with
# pandas.
# ---------------------------------------------------------------------------


def test_hits_matches_python_reference(spark):
    import collections

    rows = REGISTRY["q_graph_hits"].builder(spark, SF_SMALL).collect()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    edges = sorted(
        {(int(s), int(c)) for s, c in zip(m["l_suppkey"], m["o_custkey"])}
    )
    srcs = sorted({s for s, _ in edges})
    SCALE = 10**12
    h = {s: SCALE // len(srcs) for s in srcs}

    def half(scores, forward):
        raw = collections.defaultdict(int)
        for s, d in edges:
            if forward:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        t = sum(raw.values())
        return {n: (v * SCALE) // t for n, v in raw.items()}

    a = half(h, True)
    h = half(a, False)
    a = half(h, True)
    h = half(a, False)
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_a = [(r.node, r.score) for r in rows if r.role == "authority"]
    got_h = [(r.node, r.score) for r in rows if r.role == "hub"]
    assert got_a == top_a
    assert got_h == top_h
    # L1 mass is conserved up to per-node floor loss
    assert SCALE - len(a) <= sum(a.values()) <= SCALE
    assert SCALE - len(h) <= sum(h.values()) <= SCALE


# ---------------------------------------------------------------------------
# Croston intermittent-demand smoothing (q_ts_croston): independent
# python fold over pandas-derived per-part demand events; alpha=1/2 so
# the comparison is EXACT.
# ---------------------------------------------------------------------------


def test_croston_matches_python_reference(spark):
    rows = REGISTRY["q_ts_croston"].builder(spark, SF_SMALL).collect()
    assert rows, "croston output empty"
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
        ["l_partkey", "l_shipdate", "l_quantity"]
    ]
    us = pd.to_datetime(li["l_shipdate"]).astype("datetime64[us]").astype("int64")
    li = li.assign(day=us // 86_400_000_000)
    daily = (
        li.groupby(["l_partkey", "day"], as_index=False)["l_quantity"]
        .sum()
        .sort_values(["l_partkey", "day"])
    )
    daily["qty"] = daily["l_quantity"].round().astype("int64")
    got = {
        r.part: (r.n_events, r.size_est, r.interval_est, r.forecast_per_day)
        for r in rows
    }
    by_part = {
        int(p): list(zip(g["day"], g["qty"]))
        for p, g in daily.groupby("l_partkey")
    }
    for part, ev in by_part.items():
        if len(ev) < 2:
            assert part not in got
            continue
        s, i, prev = float(ev[0][1]), None, ev[0][0]
        for day, qty in ev[1:]:
            gap = float(day - prev)
            i = gap if i is None else 0.5 * gap + 0.5 * i
            s = 0.5 * float(qty) + 0.5 * s
            prev = day
        n, s_got, i_got, f_got = got[part]
        assert n == len(ev) and s_got == s and i_got == i, part
        assert f_got == round(s / i, 6), part
        # sanity: the estimates live inside the observed ranges
        qtys = [q for _, q in ev]
        gaps = [b[0] - a[0] for a, b in zip(ev, ev[1:])]
        assert min(qtys) <= s <= max(qtys)
        assert min(gaps) <= i <= max(gaps)


def _pava(y: list[float]) -> list[float]:
    """Textbook sequential pool-adjacent-violators (nondecreasing,
    L2): merge blocks while the running mean decreases. Shares no
    code with the engine's minimax formulation."""
    blocks: list[tuple[float, int]] = []
    for v in y:
        s, c = float(v), 1
        while blocks and blocks[-1][0] * c >= s * blocks[-1][1]:
            ps, pc = blocks.pop()
            s += ps
            c += pc
        blocks.append((s, c))
    out: list[float] = []
    for s, c in blocks:
        out.extend([s / c] * c)
    return out


def test_isotonic_minimax_equals_pava_on_fixture(spark):
    """q_ml_isotonic computes fitted[i] = max_{j<=i} min_{k>=i}
    mean(y[j..k]) relationally; PAVA is the sequential algorithm the
    identity must reproduce. Checked on the real fixture series."""
    out = (
        REGISTRY["q_ml_isotonic"]
        .builder(spark, SF_SMALL)
        .orderBy("day_no")
        .toPandas()
    )
    ref = _pava(out["cents"].tolist())
    assert len(out) > 100
    got = out["fitted"].tolist()
    assert all(abs(g - round(r, 4)) < 1e-9 for g, r in zip(got, ref)), (
        got[:5],
        ref[:5],
    )
    # and the defining property: monotone nondecreasing
    assert all(a <= b + 1e-9 for a, b in zip(got, got[1:]))


@given(
    ys=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
)
@SETTINGS
def test_isotonic_minimax_identity_equals_pava(ys):
    """Pure-kernel property (no Spark): the minimax identity equals
    PAVA on arbitrary integer series — including constant runs and
    strictly decreasing series (one global pool)."""
    n = len(ys)
    s = [0]
    for v in ys:
        s.append(s[-1] + v)

    def mean(j, k):  # 1-indexed inclusive
        return (s[k] - s[j - 1]) / (k - j + 1)

    fit = [
        max(min(mean(j, k) for k in range(i, n + 1)) for j in range(1, i + 1))
        for i in range(1, n + 1)
    ]
    ref = _pava([float(v) for v in ys])
    assert all(abs(a - b) < 1e-9 for a, b in zip(fit, ref)), (ys, fit, ref)


# ------------------------------------------- Kruskal-Wallis / Tukey HSD

def _daily_cents_by_dow(sf_dir):
    """Exact (dow7 -> [daily cents]) from orders, the shared input of
    the weekday family, rebuilt with pure pandas/python ints."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderdate", "o_totalprice"]]
    us = pd.to_datetime(o["o_orderdate"]).astype("datetime64[us]").astype("int64")
    day_no = us // 86_400_000_000
    cents = np.copysign(
        np.floor(np.abs(o["o_totalprice"].to_numpy() * 100) + 0.5),
        o["o_totalprice"].to_numpy(),
    ).astype("int64")
    daily = {}
    for d, c in zip(day_no, cents):
        daily[int(d)] = daily.get(int(d), 0) + int(c)
    by_dow = {}
    for d, c in daily.items():
        by_dow.setdefault(d % 7, []).append(c)
    return by_dow


def test_kruskal_wallis_matches_python_reference(spark):
    from collections import Counter

    rows = REGISTRY["q_ml_kruskal_wallis"].builder(spark, SF_SMALL).collect()
    assert len(rows) == 7
    by_dow = _daily_cents_by_dow(SF_SMALL)
    cnt = Counter(c for vs in by_dow.values() for c in vs)
    n = sum(cnt.values())
    mr2, cum = {}, 0
    for val in sorted(cnt):
        mr2[val] = 2 * cum + cnt[val] + 1
        cum += cnt[val]
    # engine rank sums are exact integers -> exact equality
    got = {r.dow7: (r.n_days, r.sum_rank2) for r in rows}
    want = {
        g: (len(vs), sum(mr2[v] for v in vs)) for g, vs in by_dow.items()
    }
    assert got == want
    # doubled midranks sum to N(N+1) by construction
    assert sum(r.sum_rank2 for r in rows) == n * (n + 1)
    # H with tie correction, folding groups in dow order like both engines
    sum_hterm = 0.0
    for g in sorted(by_dow):
        r2 = sum(mr2[v] for v in by_dow[g])
        sum_hterm += (float(r2) * float(r2)) / len(by_dow[g])
    h = 3.0 * sum_hterm / (n * (n + 1.0)) - 3.0 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    h /= 1.0 - ties / (n**3 - n)
    assert all(abs(r.h_stat - h) < 1e-6 + 1e-9 * abs(h) for r in rows)


def test_tukey_hsd_matches_python_reference(spark):
    rows = REGISTRY["q_ml_tukey_hsd"].builder(spark, SF_SMALL).collect()
    assert len(rows) == 21
    by_dow = _daily_cents_by_dow(SF_SMALL)
    stats = {
        g: (len(vs), sum(vs), sum(v * v for v in vs))
        for g, vs in by_dow.items()
    }
    n = sum(s[0] for s in stats.values())
    k = len(stats)
    ssw = 0.0
    for g in sorted(stats):
        ng, sg, qg = stats[g]
        ssw += float(ng * qg - sg * sg) / ng
    msw = ssw / (n - k)
    for r in rows:
        na, sa, _ = stats[r.dow_a]
        nb, sb, _ = stats[r.dow_b]
        assert r.n_a == na and r.n_b == nb
        assert r.diff_millicents == abs(1000 * sa // na - 1000 * sb // nb)
        q = abs(sa / na - sb / nb) / math.sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb))
        assert abs(r.q_ratio - q) < 1e-4 + 1e-9 * q
        assert r.significant == int(q > 4.17)


# ------------------------------------------------------ theta forecast

def test_theta_forecast_matches_python_reference(spark):
    rows = REGISTRY["q_ts_theta_forecast"].builder(spark, SF_SMALL).collect()
    assert rows
    events = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    events["day"] = pd.to_datetime(events["ts"]).dt.floor("D")
    cents = np.copysign(
        np.floor(np.abs(events["value"].to_numpy() * 100) + 0.5),
        events["value"].to_numpy(),
    ).astype("int64")
    events["cents"] = cents
    for r in rows:
        g = (
            events[events["event_type"] == r.event_type]
            .groupby("day")["cents"]
            .sum()
            .sort_index()
        )
        ys = [int(v) for v in g.to_numpy()]
        assert r.n_days == len(ys)
        # SES fold, alpha = 1/2, identical operand order -> bit-identical
        level = float(ys[0])
        for y in ys[1:]:
            level = 0.5 * float(y) + 0.5 * level
        assert r.ses_level == level
        # OLS slope from exact integer moments
        nn = len(ys)
        st_ = sum(range(1, nn + 1))
        sy = sum(ys)
        stt = sum(t * t for t in range(1, nn + 1))
        sty = sum(t * y for t, y in zip(range(1, nn + 1), ys))
        den = nn * stt - st_ * st_
        if den == 0:
            assert r.slope is None
            continue
        slope = (nn * sty - st_ * sy) / den
        assert abs(r.slope - slope) < 1e-6 + 1e-9 * abs(slope)
        assert abs(r.forecast_1 - (level + slope / 2.0)) < 2e-4
        assert abs(r.forecast_7 - (level + 7.0 * slope / 2.0)) < 2e-3


# -------------------------------------------------- source divergence

def test_source_divergence_matches_python_reference(spark):
    import re as _re
    from collections import Counter

    rows = REGISTRY["q_text_source_divergence"].builder(spark, SF_SMALL).collect()
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["source", "text"]]
    prof = {}
    for src, text in zip(docs["source"], docs["text"]):
        c = prof.setdefault(src, Counter())
        c.update(t for t in _re.split(r"[^a-z]+", text.lower()) if t)
    # every unordered pair appears exactly once, a < b
    assert len(rows) == len(prof) * (len(prof) - 1) // 2
    for r in rows:
        ca, cb = prof[r.source_a], prof[r.source_b]
        na, nb = sum(ca.values()), sum(cb.values())
        assert (r.n_tokens_a, r.n_tokens_b) == (na, nb)
        union = set(ca) | set(cb)
        shared = set(ca) & set(cb)
        assert (r.shared_types, r.union_types) == (len(shared), len(union))
        tv_num = sum(abs(ca[t] * nb - cb[t] * na) for t in union)
        assert r.tv_ppm == (1_000_000 * tv_num) // (2 * na * nb)
        assert r.vocab_jaccard_ppm == (1_000_000 * len(shared)) // len(union)
        # TV is a metric on distributions: 0 <= tv_ppm <= 1e6
        assert 0 <= r.tv_ppm <= 1_000_000


# ----------------------------------------------- phonetic blocking

def _soundex_simplified(word: str) -> str:
    """Python reimplementation of dedup._soundex_sql's DECLARED
    variant (collapse adjacent equal digit classes on the full
    translated string, no H/W pass-through, drop zeros, pad to 4)."""
    digits = "01230120022455012623010202"
    up = word.upper()
    d = "".join(
        digits[ord(ch) - 65] if "A" <= ch <= "Z" else ch for ch in up
    )
    collapsed = []
    for ch in d:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    tail = "".join(c for c in collapsed[1:] if c != "0")
    return ((up[:1]) + tail + "000")[:4]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_phonetic_block_matches_python_reference(spark):
    rows = REGISTRY["q_dedup_phonetic_block"].builder(spark, SF_SMALL).collect()
    assert rows, "no phonetic candidates on the fixture"
    parts = pd.read_parquet(f"{SF_SMALL}/part.parquet")["p_name"]
    counts = parts.value_counts().to_dict()
    coded = {
        name: _soundex_simplified(name.split(" ")[-1]) for name in counts
    }
    want = set()
    for na in counts:
        for nb in counts:
            if na < nb and coded[na] == coded[nb]:
                want.add((coded[na], na, nb))
    got = {(r.block_code, r.name_a, r.name_b) for r in rows}
    assert got == want
    for r in rows:
        assert r.n_parts_a == counts[r.name_a]
        assert r.n_parts_b == counts[r.name_b]
        lev = _levenshtein(r.name_a, r.name_b)
        assert r.edit_dist == lev
        assert r.is_near == int(lev <= 3)
    # the phonetic family's reason to exist: same-sound blocks group
    # different adjectives over a shared noun — candidates survive
    # that hash blocking on the full name would never pair
    assert any(r.is_near for r in rows)
    assert any(not r.is_near for r in rows)


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=12))
@SETTINGS
def test_soundex_reference_properties(word):
    code = _soundex_simplified(word)
    assert len(code) == 4 or (word == "" and code == "000"[:4] + "")
    if word:
        assert code[0] == word[0].upper()
        assert all(c in "0123456" for c in code[1:])
        # doubling any letter never changes the code (run collapse)
        doubled = "".join(ch * 2 for ch in word)
        assert _soundex_simplified(doubled) == code


# ------------------------------------------ clustering coefficient

def test_clustering_coeff_matches_python_reference(spark):
    rows = REGISTRY["q_graph_clustering_coeff"].builder(spark, SF_SMALL).collect()
    assert rows
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    pts = {
        int(v): (float(e[0]), float(e[1]))
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    eps2 = 0.05 * 0.05
    ids = sorted(pts)
    adj = {v: set() for v in ids}
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1:]:
            xb, yb = pts[b]
            if (xa - xb) ** 2 + (ya - yb) ** 2 < eps2:
                adj[a].add(b)
                adj[b].add(a)
    tri = {}
    for v in ids:
        nbrs = sorted(adj[v])
        t = sum(
            1
            for i, a in enumerate(nbrs)
            for b in nbrs[i + 1:]
            if b in adj[a]
        )
        if adj[v]:
            tri[v] = t
    closed2 = sum(tri.values())
    wedges2 = sum(len(adj[v]) * (len(adj[v]) - 1) for v in tri)
    got = {r.vec_id: r for r in rows}
    assert set(got) == set(tri)
    for v, t in tri.items():
        r = got[v]
        d = len(adj[v])
        assert r.degree == d and r.n_triangles == t
        if d >= 2:
            assert r.local_cc_ppm == (2_000_000 * t) // (d * (d - 1))
        else:
            assert r.local_cc_ppm is None
        assert r.transitivity_ppm == (2_000_000 * closed2) // wedges2


# -------------------------------------------------- Theil between

def test_theil_between_matches_python_reference(spark):
    rows = REGISTRY["q_agg_theil_between"].builder(spark, SF_SMALL).collect()
    assert rows
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    cents = np.copysign(
        np.floor(np.abs(orders["o_totalprice"].to_numpy() * 100) + 0.5),
        orders["o_totalprice"].to_numpy(),
    ).astype("int64")
    rev_by_cust = {}
    for ck, c in zip(orders["o_custkey"], cents):
        rev_by_cust[int(ck)] = rev_by_cust.get(int(ck), 0) + int(c)
    stats = {}
    for ck, nk in zip(cust["c_custkey"], cust["c_nationkey"]):
        n_c, y_c = stats.get(int(nk), (0, 0))
        stats[int(nk)] = (n_c + 1, y_c + rev_by_cust.get(int(ck), 0))
    n_tot = sum(s[0] for s in stats.values())
    y_tot = sum(s[1] for s in stats.values())
    theil = 0.0
    for nk in sorted(stats):
        n_g, y_g = stats[nk]
        if y_g:
            theil += (y_g / y_tot) * math.log((y_g * n_tot) / (y_tot * n_g))
    nation = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    got = {r.n_name: r for r in rows}
    assert set(got) == {names[nk] for nk in stats}
    for nk, (n_g, y_g) in stats.items():
        r = got[names[nk]]
        assert (r.n_customers, r.revenue_cents) == (n_g, y_g)
        assert r.revenue_share_bp == (10_000 * y_g) // y_tot
        assert abs(r.theil_between - theil) < 1e-6 + 1e-9 * abs(theil)
    # Theil-T between is non-negative (Jensen) on any corpus
    assert all(r.theil_between >= -1e-12 for r in rows)


# ----------------------------------------------------- Ljung-Box

def test_ljung_box_matches_python_reference(spark):
    rows = sorted(
        REGISTRY["q_ts_ljung_box"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.lag_d,
    )
    assert len(rows) == 7
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    day = pd.to_datetime(orders["o_orderdate"]).dt.floor("D")
    cents = np.copysign(
        np.floor(np.abs(orders["o_totalprice"].to_numpy() * 100) + 0.5),
        orders["o_totalprice"].to_numpy(),
    ).astype("int64")
    daily = {}
    for d, c in zip(day, cents):
        daily[d] = daily.get(d, 0) + int(c)
    d0, d1 = min(daily), max(daily)
    grid = pd.date_range(d0, d1, freq="D")
    xs = [daily.get(d, 0) for d in grid]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    den = n * n * sxx - n * sx * sx
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
            6: 12.592, 7: 14.067}
    q = 0.0
    for k in range(1, 8):
        sxy = sum(a * b for a, b in zip(xs, xs[k:]))
        shead = sum(xs[: n - k])
        stail = sum(xs[k:])
        num = n * n * sxy - n * sx * (shead + stail) + (n - k) * sx * sx
        acf = float(num) / float(den)
        q = q + acf * acf / (n - k)
        lb = n * (n + 2.0) * q
        r = rows[k - 1]
        assert r.n_days == n
        assert abs(r.acf - acf) < 1e-6
        assert abs(r.lb_q - lb) < 1e-3 + 1e-9 * abs(lb)
        assert r.reject_h0 == int(lb > crit[k])


# ------------------------------------------------------------ aHash

def test_ahash_matches_pixel_law_reference(spark):
    """Recompute the 16-bit average-hash from the GENERATOR's pixel
    law (not the decoder), so decoder and oracle cannot share a
    mistake; also pin the impossibility of an all-ones hash (a cell
    cannot be strictly brighter than an average that includes it
    unless another is dimmer — popcount 16 is unreachable)."""
    rows = REGISTRY["q_llm_multimodal_ahash"].builder(spark, SF_SMALL).collect()
    assert rows
    buckets = {}
    for r in rows:
        d = r.doc_id
        w, h = d % 16 + 4, d % 8 + 4
        m = [[0, 0, 0, 0] for _ in range(4)]
        cnt = [[0, 0, 0, 0] for _ in range(4)]
        sums = [[0, 0, 0, 0] for _ in range(4)]
        for p in range(w * h):
            gx = ((p % w) * 4) // w
            gy = ((p // w) * 4) // h
            gray = (
                (d * 31 + p * 3) % 256
                + (d * 31 + p * 3 + 1) % 256
                + (d * 31 + p * 3 + 2) % 256
            )
            sums[gy][gx] += gray
            cnt[gy][gx] += 1
        for gy in range(4):
            for gx in range(4):
                m[gy][gx] = sums[gy][gx] // cnt[gy][gx]
        total = sum(m[gy][gx] for gy in range(4) for gx in range(4))
        bits = 0
        for gy in range(4):
            for gx in range(4):
                if 16 * m[gy][gx] > total:
                    bits |= 1 << (gy * 4 + gx)
        assert r.ahash == bits, (d, r.ahash, bits)
        assert bin(r.ahash).count("1") < 16
        buckets.setdefault(r.ahash, 0)
        buckets[r.ahash] += 1
    for r in rows:
        assert r.bucket_size == buckets[r.ahash]


# ------------------------------------------------------------- RAKE

def test_rake_matches_python_reference(spark):
    import re as _re
    from collections import Counter, defaultdict

    from batchprocessor_spark.functions.text import _RAKE_STOPWORDS

    rows = sorted(
        REGISTRY["q_llm_keyword_rake"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 15
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")["text"]
    stop = set(_RAKE_STOPWORDS)
    phrase_occ = Counter()
    freq = Counter()
    degree = Counter()
    for text in docs:
        toks = [t for t in _re.split(r"[^a-z]+", text.lower()) if t]
        cur = []
        for t in toks + ["the"]:  # sentinel flushes the last run
            if t in stop:
                if cur:
                    phrase_occ[" ".join(cur)] += 1
                    for w_ in cur:
                        freq[w_] += 1
                        degree[w_] += len(cur)
                    cur = []
            else:
                cur.append(t)
    wscore = {w_: (1_000_000 * degree[w_]) // freq[w_] for w_ in freq}
    scored = {
        ph: sum(wscore[w_] for w_ in ph.split(" ")) for ph in phrase_occ
    }
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r.phrase, r.phrase_score_ppm) for r in rows]
    assert got == want
    for r in rows:
        assert r.n_occurrences == phrase_occ[r.phrase]
        assert r.n_words == len(r.phrase.split(" "))


# --------------------------------------------------- Burrows' Delta

def test_burrows_delta_matches_python_reference(spark):
    import re as _re
    from collections import Counter

    rows = REGISTRY["q_text_burrows_delta"].builder(spark, SF_SMALL).collect()
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["source", "text"]]
    prof = {}
    for src, text in zip(docs["source"], docs["text"]):
        c = prof.setdefault(src, Counter())
        c.update(t for t in _re.split(r"[^a-z]+", text.lower()) if t)
    S = len(prof)
    totals = {s: sum(c.values()) for s, c in prof.items()}
    corpus = Counter()
    for c in prof.values():
        corpus.update(c)
    mfw = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    mfw = [w for w, _ in mfw]
    r_ppb = {
        (s, w_): (1_000_000_000 * prof[s][w_]) // totals[s]
        for s in prof
        for w_ in mfw
    }
    d_w = {}
    for w_ in mfw:
        sr = sum(r_ppb[(s, w_)] for s in prof)
        sr2 = sum(r_ppb[(s, w_)] ** 2 for s in prof)
        d_w[w_] = S * sr2 - sr * sr
    for r in rows:
        acc = 0.0
        used = 0
        for w_ in sorted(mfw):
            dd = d_w[w_]
            if dd > 0:
                used += 1
                acc += abs(
                    r_ppb[(r.source_a, w_)] - r_ppb[(r.source_b, w_)]
                ) / math.sqrt(dd)
        assert r.n_words_used == used
        want = S * acc / 20.0
        assert abs(r.delta - want) < 1e-6 + 1e-9 * want
    assert len(rows) == S * (S - 1) // 2


# ------------------------------------------- harmonic closeness BFS

def test_closeness_bfs_matches_python_reference(spark):
    rows = REGISTRY["q_graph_closeness_bfs"].builder(spark, SF_SMALL).collect()
    assert rows
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    pts = {
        int(v): (float(e[0]), float(e[1]))
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    eps2 = 0.05 * 0.05
    ids = sorted(pts)
    adj = {v: set() for v in ids}
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1:]:
            xb, yb = pts[b]
            if (xa - xb) ** 2 + (ya - yb) ** 2 < eps2:
                adj[a].add(b)
                adj[b].add(a)
    seeds = [v for v in ids if v % 200 == 0]
    assert {r.vec_id for r in rows} == set(seeds)
    for r in rows:
        dist = {r.vec_id: 0}
        frontier = {r.vec_id}
        counts = {}
        for h in range(1, 5):
            nxt = set()
            for v in frontier:
                nxt |= adj[v]
            nxt -= dist.keys()
            for v in nxt:
                dist[v] = h
            counts[h] = len(nxt)
            frontier = nxt
        assert (r.n_h1, r.n_h2, r.n_h3, r.n_h4) == (
            counts[1], counts[2], counts[3], counts[4]
        )
        assert r.n_reached == sum(counts.values())
        assert r.harmonic_x12 == (
            12 * counts[1] + 6 * counts[2] + 4 * counts[3] + 3 * counts[4]
        )


# -------------------------------------------------- A/B effect sizes

def test_effect_size_matches_python_reference(spark):
    rows = REGISTRY["q_ab_effect_size"].builder(spark, SF_SMALL).collect()
    (r,) = rows
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[["event_type", "value"]]
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    cents = np.copysign(
        np.floor(np.abs(ev["value"].to_numpy() * 100) + 0.5),
        ev["value"].to_numpy(),
    ).astype("int64")
    x1 = [int(c) for c, t in zip(cents, ev["event_type"]) if t == "click"]
    x2 = [int(c) for c, t in zip(cents, ev["event_type"]) if t == "purchase"]
    n1, n2 = len(x1), len(x2)
    assert (r.n_click, r.n_purchase) == (n1, n2)
    ssd1 = sum(v * v for v in x1) - sum(x1) ** 2 / n1
    ssd2 = sum(v * v for v in x2) - sum(x2) ** 2 / n2
    sp_ = math.sqrt((ssd1 + ssd2) / (n1 + n2 - 2))
    d = (sum(x1) / n1 - sum(x2) / n2) / sp_
    assert abs(r.cohens_d - d) < 1e-5
    assert abs(r.hedges_g - d * (1 - 3 / (4 * (n1 + n2) - 9))) < 1e-5
    # doubled Mann-Whitney U, exact integers
    u2 = 0
    for v in x1:
        u2 += 2 * sum(1 for w_ in x2 if w_ < v) + sum(1 for w_ in x2 if w_ == v)
    assert r.cles_ppm == (1_000_000 * u2) // (2 * n1 * n2)


# ------------------------------------------------ F1 threshold sweep

def test_f1_threshold_matches_python_reference(spark):
    rows = sorted(
        REGISTRY["q_ml_f1_threshold"].builder(spark, SF_SMALL).collect(),
        key=lambda r: -r.threshold_bp,
    )
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ]
    train = docs[docs["doc_id"] % 2 == 0]
    pred = {
        int(b): (10_000 * int((g["lang"] == "en").sum())) // len(g)
        for b, g in train.groupby(train["n_chars"] // 100)
    }
    prior = (10_000 * int((train["lang"] == "en").sum())) // len(train)
    test = docs[docs["doc_id"] % 2 == 1]
    scored = [
        (pred.get(int(nc) // 100, prior), int(lg == "en"))
        for nc, lg in zip(test["n_chars"], test["lang"])
    ]
    p_tot = sum(y for _, y in scored)
    want = []
    for t in sorted({s for s, _ in scored}, reverse=True):
        tp = sum(y for s, y in scored if s >= t)
        fp = sum(1 - y for s, y in scored if s >= t)
        fn = p_tot - tp
        f1 = (1_000_000 * 2 * tp) // (2 * tp + fp + fn) if 2 * tp + fp + fn else None
        want.append((t, tp, fp, fn, f1))
    got = [(r.threshold_bp, r.tp, r.fp, r.fn, r.f1_ppm) for r in rows]
    assert got == want
    best_f1 = max(f for *_, f in want if f is not None)
    best_t = min(t for t, *_, f in want if f == best_f1)
    for r in rows:
        assert r.best_threshold_bp == best_t
        assert r.is_best == int(r.threshold_bp == best_t)


# ------------------------------------------------------- decay score

def test_decay_score_matches_python_reference(spark):
    rows = REGISTRY["q_events_decay_score"].builder(spark, SF_SMALL).collect()
    assert rows
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "ts", "value"]
    ]
    us = pd.to_datetime(ev["ts"]).astype("datetime64[us]").astype("int64")
    day = us // 86_400_000_000
    cents = np.copysign(
        np.floor(np.abs(ev["value"].to_numpy() * 100) + 0.5),
        ev["value"].to_numpy(),
    ).astype("int64")
    d1 = int(day.max())
    want = {}
    for u, d, c in zip(ev["user_id"], day, cents):
        k = min((d1 - int(d)) // 7, 40)
        n, raw, dec = want.get(int(u), (0, 0, 0))
        # both engines' DIV truncates toward zero; python's >> and //
        # floor — sign-aware reference (code-review r9s2 finding #5)
        step = abs(int(c)) // (1 << k)
        want[int(u)] = (n + 1, raw + int(c), dec + (step if c >= 0 else -step))
    got = {r.user_id: (r.n_events, r.raw_cents, r.decay_cents) for r in rows}
    assert got == want
    # decay never exceeds raw and is positive whenever raw is
    for n, raw, dec in want.values():
        assert 0 <= dec <= raw


# ----------------------------------------- permutation entropy (m=3)

def test_permutation_entropy_matches_python_reference(spark):
    rows = REGISTRY["q_ts_permutation_entropy"].builder(spark, SF_SMALL).collect()
    assert rows
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    day = pd.to_datetime(orders["o_orderdate"]).dt.floor("D")
    cents = np.copysign(
        np.floor(np.abs(orders["o_totalprice"].to_numpy() * 100) + 0.5),
        orders["o_totalprice"].to_numpy(),
    ).astype("int64")
    daily = {}
    for d, c in zip(day, cents):
        daily[d] = daily.get(d, 0) + int(c)
    grid = pd.date_range(min(daily), max(daily), freq="D")
    xs = [daily.get(d, 0) for d in grid]
    from collections import Counter

    pats = Counter(
        4 * (a > b) + 2 * (b > c) + (a > c)
        for a, b, c in zip(xs, xs[1:], xs[2:])
    )
    n = sum(pats.values())
    ent = math.log2(n) - sum(
        c * math.log2(c) for _, c in sorted(pats.items())
    ) / n
    got = {r.code: r for r in rows}
    assert set(got) == set(pats)
    for code, c in pats.items():
        r = got[code]
        assert r.n_windows == c
        assert r.share_ppm == (1_000_000 * c) // n
        assert abs(r.entropy_bits - ent) < 1e-6
        assert abs(r.entropy_norm - ent / math.log2(6)) < 1e-6
    # codes live in the 3-bit lattice; shares sum to 1e6 up to the
    # per-code DIV truncation (< 1 ppm each)
    assert all(0 <= code <= 7 for code in got)
    assert 1_000_000 - len(got) < sum(r.share_ppm for r in rows) <= 1_000_000


# ----------------------------------------- personalized PageRank

def test_ppr_matches_python_reference(spark):
    rows = REGISTRY["q_graph_ppr"].builder(spark, SF_SMALL).collect()
    assert rows
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    directed = {
        (int(s) * 2 + 1, int(c) * 2)
        for s, c in zip(j["l_suppkey"], j["o_custkey"])
    }
    edges = directed | {(d, s) for s, d in directed}
    nodes = sorted({v for e in edges for v in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    seeds = [v for v in nodes if v % 20 == 0]
    base = 10**12 // len(seeds)
    pr = {v: (base if v % 20 == 0 else 0) for v in nodes}
    for _ in range(5):
        dang = sum(pr[v] for v in nodes if v not in out)
        inflow = {v: 0 for v in nodes}
        for s, ds in out.items():
            c = pr[s] // len(ds)
            for d in ds:
                inflow[d] += c
        pr = {
            v: (
                15 * (base if v % 20 == 0 else 0)
                + 85 * inflow[v]
                + ((85 * dang) // len(seeds) if v % 20 == 0 else 0)
            )
            // 100
            for v in nodes
        }
    want = {v: p for v, p in pr.items() if p > 0}
    got = {r.node: r.pr for r in rows}
    assert got == want
    # personalization: every positive-rank node is a seed or within
    # 5 hops of one, and the total mass is bounded by the teleport
    assert sum(got.values()) <= 10**12


# --------------------------------------------------- learning curve

def test_learning_curve_matches_python_reference(spark):
    rows = sorted(
        REGISTRY["q_ml_learning_curve"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.train_frac_8th,
    )
    assert [r.train_frac_8th for r in rows] == [1, 2, 4, 8]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ]
    test = docs[docs["doc_id"] % 2 == 1]
    for r in rows:
        tr = docs[
            (docs["doc_id"] % 2 == 0)
            & ((docs["doc_id"] // 2) % 8 < r.train_frac_8th)
        ]
        assert r.n_train == len(tr)
        pred = {
            int(b): (10_000 * int((g["lang"] == "en").sum())) // len(g)
            for b, g in tr.groupby(tr["n_chars"] // 100)
        }
        prior = (10_000 * int((tr["lang"] == "en").sum())) // len(tr)
        correct = sum(
            int((pred.get(int(nc) // 100, prior) >= 5000) == (lg == "en"))
            for nc, lg in zip(test["n_chars"], test["lang"])
        )
        assert r.n_test == len(test)
        assert r.accuracy_bp == (10_000 * correct) // len(test)
    # nesting invariant: training sets grow monotonically
    assert all(a.n_train < b.n_train for a, b in zip(rows, rows[1:]))


# ---------------------------------------------- group holdout audit

def test_group_holdout_matches_python_reference(spark):
    rows = REGISTRY["q_sample_group_holdout"].builder(spark, SF_SMALL).collect()
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["source", "lang"]]
    n_total = len(docs)
    langs = sorted(docs["lang"].unique())
    for r in rows:
        te = docs[docs["source"] == r.source]
        tr = docs[docs["source"] != r.source]
        assert (r.n_train, r.n_test) == (len(tr), len(te))
        gap = max(
            abs(
                (10_000 * int((tr["lang"] == lg).sum())) // len(tr)
                - (10_000 * int((te["lang"] == lg).sum())) // len(te)
            )
            for lg in langs
        )
        assert r.lang_shift_bp == gap
    assert {r.source for r in rows} == set(docs["source"].unique())


# -------------------------------------------------------- Cramér's V

def test_cramers_v_matches_python_reference(spark):
    rows = REGISTRY["q_agg_cramers_v"].builder(spark, SF_SMALL).collect()
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["lang", "source"]]
    docs = docs.dropna()
    langs = sorted(docs["lang"].unique())
    srcs = sorted(docs["source"].unique())
    obs = {
        (lg, sc): int(((docs["lang"] == lg) & (docs["source"] == sc)).sum())
        for lg in langs
        for sc in srcs
    }
    n = len(docs)
    row_n = {lg: sum(obs[(lg, sc)] for sc in srcs) for lg in langs}
    col_n = {sc: sum(obs[(lg, sc)] for lg in langs) for sc in srcs}
    chi2 = 0.0
    for lg in langs:          # explicit (lang, source) fold order
        for sc in srcs:
            e = row_n[lg] * col_n[sc] / n
            chi2 += (obs[(lg, sc)] - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(langs), len(srcs)) - 1)))
    assert len(rows) == len(langs) * len(srcs)
    for r in rows:
        o = obs[(r.lang, r.source)]
        assert r.o == o
        assert r.e_milli == (1000 * row_n[r.lang] * col_n[r.source]) // n
        e = row_n[r.lang] * col_n[r.source] / n
        assert abs(r.pearson_resid - (o - e) / math.sqrt(e)) < 1e-4
        assert abs(r.cramers_v - v) < 1e-6
    assert 0.0 <= rows[0].cramers_v <= 1.0


# --------------------------------------------------- coverage curve

def test_coverage_curve_matches_python_reference(spark):
    import re as _re
    from collections import Counter

    (r,) = REGISTRY["q_text_coverage_curve"].builder(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")["text"]
    cnt = Counter()
    for text in docs:
        cnt.update(t for t in _re.split(r"[^a-z]+", text.lower()) if t)
    n = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (r.n_tokens, r.vocab_size) == (n, len(cnt))
    cum = 0
    ks = {}
    for rnk, (_, c) in enumerate(ordered, 1):
        cum += c
        for p in (50, 90, 99):
            if p not in ks and 100 * cum >= p * n:
                ks[p] = rnk
    assert (r.k50, r.k90, r.k99) == (ks[50], ks[90], ks[99])
    assert r.top1_share_ppm == (1_000_000 * ordered[0][1]) // n
    assert r.k50 <= r.k90 <= r.k99 <= r.vocab_size


# ----------------------------------------------------- STL strength

def test_stl_strength_matches_python_reference(spark):
    # sf0.001's hourly series is too sparse for the >=18-row trend
    # window (empty result by design); the kernel check runs at sf0.01
    from tests.conftest import SF_ORACLE

    rows = REGISTRY["q_ts_stl_strength"].builder(spark, SF_ORACLE).collect()
    assert rows
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    ev["h"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    cents = np.copysign(
        np.floor(np.abs(ev["value"].to_numpy() * 100) + 0.5),
        ev["value"].to_numpy(),
    ).astype("int64")
    ev["cents"] = cents
    for r in rows:
        g = (
            ev[ev["event_type"] == r.event_type]
            .groupby("h")["cents"]
            .sum()
            .sort_index()
        )
        hours = list(g.index)
        vals = [int(v) for v in g.to_numpy()]
        devs, hods = [], []
        for i, h in enumerate(hours):
            lo, hi = h - pd.Timedelta(hours=12), h + pd.Timedelta(hours=11)
            idx = [j for j, hh in enumerate(hours) if lo <= hh <= hi]
            if len(idx) < 18:
                continue
            trend = sum(vals[j] for j in idx) / len(idx)
            devs.append(vals[i] - trend)
            hods.append((h.hour, vals[i]))
        assert r.n_hours == len(devs)
        s_by_hod = {}
        for hod in {h for h, _ in hods}:
            cell = [d for d, (hh, _) in zip(devs, hods) if hh == hod]
            s_by_hod[hod] = round(sum(cell) / len(cell), 6)
        r_u, sr_u, tr_u = [], [], []
        for d, (hod, cval) in zip(devs, hods):
            s = s_by_hod[hod]
            r_u.append(round((d - s) * 1e6))
            sr_u.append(round(d * 1e6))
            tr_u.append(round((cval - s) * 1e6))

        def _var(xs):
            nn = len(xs)
            return nn * sum(x * x for x in xs) - sum(xs) ** 2

        fs = max(0.0, 1.0 - _var(r_u) / _var(sr_u)) if _var(sr_u) else None
        ft = max(0.0, 1.0 - _var(r_u) / _var(tr_u)) if _var(tr_u) else None
        if fs is None:
            assert r.seasonal_strength is None
        else:
            assert abs(r.seasonal_strength - fs) < 1e-5
        if ft is None:
            assert r.trend_strength is None
        else:
            assert abs(r.trend_strength - ft) < 1e-5
        assert r.seasonal_strength is None or 0 <= r.seasonal_strength <= 1


# ------------------------------------------------- ANN recall audit

def test_ann_recall_audit_matches_python_reference(spark):
    rows = REGISTRY["q_llm_ann_recall_audit"].builder(spark, SF_SMALL).collect()
    assert rows
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {
        int(v): np.asarray(e, dtype="float64")
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    ids = sorted(vecs)
    qids = [v for v in ids if v < 5]
    # exact cosine top-10 (rounded at 6, ties to lower vec_id)
    def top10_exact(q):
        qv = vecs[q]
        qn = math.sqrt(float(qv @ qv))
        scored = sorted(
            (
                (-round(float(qv @ vecs[v]) / (qn * math.sqrt(float(vecs[v] @ vecs[v]))), 6), v)
                for v in ids
                if v != q
            )
        )
        return [v for _, v in scored[:10]]

    # SQ4 integer top-10
    gmin = min(float(x) for v in vecs.values() for x in v)
    gmax = max(float(x) for v in vecs.values() for x in v)
    codes = {
        v: np.clip(
            np.floor((vecs[v] - gmin) * 16.0 / (gmax - gmin)), 0, 15
        ).astype("int64")
        for v in ids
    }
    def top10_sq(q):
        qc = codes[q]
        qcc = int(round(float(qc @ qc)))
        scored = sorted(
            (
                (qcc + int(round(float(codes[v] @ codes[v])))
                 - 2 * int(round(float(qc @ codes[v]))), v)
                for v in ids
                if v != q
            )
        )
        return [v for _, v in scored[:10]]

    want_hits = {
        q: len(set(top10_exact(q)) & set(top10_sq(q))) for q in qids
    }
    got = {r.qid: r for r in rows}
    assert set(got) == set(qids)
    h_tot = sum(want_hits.values())
    for q in qids:
        assert got[q].n_hits == want_hits[q]
        assert got[q].recall_bp == (10_000 * want_hits[q]) // 10
        assert got[q].mean_recall_bp == (10_000 * h_tot) // (10 * len(qids))


# ------------------------------------------------- Nelson-Aalen

def test_nelson_aalen_matches_python_reference(spark):
    rows = sorted(
        REGISTRY["q_ml_nelson_aalen"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows
    events = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "ts", "event_type"]
    ]
    events["us"] = (
        pd.to_datetime(events["ts"]).astype("datetime64[us]").astype("int64")
    )
    durs, evts = [], []
    for _, g in events.groupby("user_id"):
        views = g[g["event_type"] == "view"]["us"]
        if views.empty:
            continue
        v0 = views.min()
        purch = g[(g["event_type"] == "purchase") & (g["us"] >= v0)]["us"]
        if purch.empty:
            durs.append((g["us"].max() - v0) // 86_400_000_000)
            evts.append(0)
        else:
            durs.append((purch.min() - v0) // 86_400_000_000)
            evts.append(1)
    from collections import Counter

    d_at = Counter(d for d, e in zip(durs, evts) if e)
    leave_at = Counter(durs)
    cum = 0
    want = []
    for t in sorted(set(durs)):
        n_risk = sum(c for d, c in leave_at.items() if d >= t)
        if d_at[t]:
            h = (10**12 * d_at[t]) // n_risk
            cum += h
            want.append((t, n_risk, d_at[t], h, cum))
    got = [
        (r.duration_days, r.n_risk, r.n_events, r.hazard_e12,
         r.cum_hazard_e12)
        for r in rows
    ]
    assert got == want
    # additive estimator: the running hazard never decreases
    cums = [r.cum_hazard_e12 for r in rows]
    assert all(a < b for a, b in zip(cums, cums[1:]))
    # same subjects as KM: risk sets match the KM rows at event times
    km = {
        r.duration_days: r.n_risk
        for r in REGISTRY["q_ml_kaplan_meier"].builder(spark, SF_SMALL).collect()
    }
    assert {r.duration_days: r.n_risk for r in rows} == km


# ----------------------------------------------------- Theil-Sen

def test_theil_sen_matches_python_reference(spark):
    (r,) = REGISTRY["q_ts_theil_sen"].builder(spark, SF_SMALL).collect()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    us = pd.to_datetime(orders["o_orderdate"]).astype("datetime64[us]").astype("int64")
    day_no = us // 86_400_000_000
    cents = np.copysign(
        np.floor(np.abs(orders["o_totalprice"].to_numpy() * 100) + 0.5),
        orders["o_totalprice"].to_numpy(),
    ).astype("int64")
    table = {}
    for d, c in zip(day_no, cents):
        table[int(d)] = table.get(int(d), 0) + int(c)
    days = sorted(table)
    slopes = []
    for i, da in enumerate(days):
        for db in days[i + 1:]:
            dy = table[db] - table[da]
            dx = db - da
            s = (1_000_000 * dy) // dx if dy >= 0 else -((1_000_000 * -dy) // dx)
            slopes.append(s)
    slopes.sort()
    n = len(slopes)
    assert (r.n_days, r.n_pairs) == (len(days), n)
    # nearest-rank lower median: smallest s with 2*rank >= n+1
    assert r.ts_slope_micro == slopes[(n + 1) // 2 - 1]


# ----------------------------------------------------- ROUGE-L pairs

def test_rouge_l_matches_python_reference(spark):
    import re as _re

    from batchprocessor_spark.functions.text import ROUGE_TOKEN_CAP

    rows = REGISTRY["q_text_rouge_l_pairs"].builder(spark, SF_SMALL).collect()
    assert rows
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[["doc_id", "text"]]
    toks = {
        int(i): [t for t in _re.split(r"[^a-z]+", x.lower()) if t][
            :ROUGE_TOKEN_CAP
        ]
        for i, x in zip(docs["doc_id"], docs["text"])
    }

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for ca in a:
            cur = [0]
            for j, cb in enumerate(b, 1):
                cur.append(max(prev[j], cur[-1], prev[j - 1] + (ca == cb)))
            prev = cur
        return prev[-1]

    for r in rows:
        a = toks[2 * r.pair_id]
        b = toks[2 * r.pair_id + 1]
        want = lcs(a, b)
        assert (r.len_cand, r.len_ref) == (len(a), len(b))
        assert r.lcs_len == want
        p = (1_000_000 * want) // len(a) if a else None
        rr = (1_000_000 * want) // len(b) if b else None
        assert (r.p_ppm, r.r_ppm) == (p, rr)
        if p is not None and rr is not None and p + rr:
            assert r.f_ppm == (2 * p * rr) // (p + rr)
        # LCS bounds
        assert 0 <= want <= min(len(a), len(b))


# --------------------------------------------------- Goertzel weekly

def test_goertzel_matches_python_reference(spark):
    (r,) = REGISTRY["q_ts_goertzel_weekly"].builder(spark, SF_SMALL).collect()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    day = pd.to_datetime(orders["o_orderdate"]).dt.floor("D")
    cents = np.copysign(
        np.floor(np.abs(orders["o_totalprice"].to_numpy() * 100) + 0.5),
        orders["o_totalprice"].to_numpy(),
    ).astype("int64")
    daily = {}
    for d, c in zip(day, cents):
        daily[d] = daily.get(d, 0) + int(c)
    grid = pd.date_range(min(daily), max(daily), freq="D")
    xs = [daily.get(d, 0) for d in grid]
    n = len(xs)
    assert r.n_days == n

    def power(xs, coef):
        s1 = float(xs[0])
        s2 = 0.0
        for x in xs[1:]:
            s1, s2 = float(x) + coef * s1 - s2, s1
        return s1 * s1 + s2 * s2 - coef * s1 * s2

    c7 = 1.2469796037174672
    c11 = 1.6825070656623622
    ss = (n * sum(x * x for x in xs) - sum(xs) ** 2) / n
    assert abs(r.p7_norm - power(xs, c7) / ss / n) < 1e-5 + 1e-6 * abs(r.p7_norm)
    assert abs(r.p11_norm - power(xs, c11) / ss / n) < 1e-5 + 1e-6 * abs(r.p11_norm)
