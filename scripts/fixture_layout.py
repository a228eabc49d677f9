"""Production-layout mirrors of the single-file driver fixtures.

The driver's ``/root/testdata/sf*`` tables are ONE parquet file each
(read-only). A single file with a handful of row groups scans as one
task no matter the split config, which is why rounds ≤7 carried a
4 MB ``FIXTURE_SPLIT_BYTES`` harness knob — a tuning no production
cluster would use, so every committed bench/plan/parity number was
fixture-shaped (VERDICT r7 "What's missing" #1 / task #3).

This module retires that knob: ``ensure_multifile(sf_dir)`` builds
(once, idempotently) a repo-local mirror under
``<repo>/.testdata/mf/<name>/`` where each table is a DIRECTORY of
part files — the layout a real table has — and returns its path.
Under Spark's production 128m default the scan planner then
self-tunes parallelism via bytesPerCore (files pack into
``max(openCost, totalBytes/defaultParallelism)`` bins), so the same
mirror feeds 8-core test lanes and the 32-core bench without any
split override.

Fidelity: tables are split with pyarrow ``Table.slice`` and written
back with the SAME arrow schema — identical values, identical types
(events.ts stays TIMESTAMP(MICROS)), identical row order across the
concatenation of parts. DuckDB oracles read the same part files via
``read_parquet('<table>.parquet/*.parquet')`` (tests/oracle.py), so
both engines see one dataset. A meta file keyed on the source stats
makes regeneration a no-op unless the source changes; writes go to a
temp dir renamed into place so concurrent callers never see a
half-built mirror.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIRROR_ROOT = os.path.join(REPO, ".testdata", "mf")

# All engine tables (sources/catalog.TABLES, inlined to keep this
# importable without pyspark).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# ~5k rows per part file, at most 64 parts: sf0.1 lineitem (600k rows)
# gets 64 parts, sf0.01 (60k) gets 12, sf0.001 (6k) 2 — enough files
# for bytesPerCore packing to restore full scan parallelism on the big
# tables while small dims stay a couple of files (they broadcast; scan
# parallelism there is irrelevant and tiny files only add footers).
#
# r12 (guide §6): the split is additionally BYTE-aware. A row-count
# rule sized for ~30 B lineitem rows leaves fat-row tables in ONE part
# (sf0.1 documents: 5,000 text rows, one 0.6 MB file → every text
# kernel ran as a single task; embeddings likewise, so the corpus-side
# norm fold of similarity queries ran single-task before its spread).
# A production corpus is always many files wide; splitting by
# max(rows/5k, bytes/64k) restores that shape for the tables whose
# per-row CPU, not row count, is the cost.
ROWS_PER_PART = 5_000
PART_BYTES = 64 * 1024
MAX_PARTS = 64


def _part_count(rows: int, nbytes: int = 0) -> int:
    by_rows = (rows + ROWS_PER_PART - 1) // ROWS_PER_PART
    by_bytes = (nbytes + PART_BYTES - 1) // PART_BYTES
    # Clamp to the row count (ADVICE r12): a byte-derived count can
    # exceed the rows (few fat rows), which would write zero-row part
    # files — footer overhead masquerading as layout realism.
    return max(1, min(MAX_PARTS, rows or 1, max(by_rows, by_bytes)))


def _source_meta(sf_dir: str) -> dict:
    meta = {}
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        meta[t] = {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    return meta


def is_multifile(sf_dir: str) -> bool:
    """True when the layout is already directory-per-table (the repo's
    synthesized sf0.3/sf1 points, or any real warehouse layout)."""
    return os.path.isdir(os.path.join(sf_dir, "lineitem.parquet"))


# Deterministic 1-in-K subsample rules for the sf1 GRAPH parity lane
# (VERDICT r7 #4): the graph ORACLES are super-linear (edge^3 joins,
# 5-round recursive CTEs) and infeasible at full sf1, while the engine
# side runs in seconds. Sampling by key-modulus keeps the sample a
# true INDUCED workload: orders and their lineitems are kept or
# dropped together (consistent join graph), embeddings thin uniformly
# (a valid, sparser eps-graph). The result is an sf1-DERIVED dataset
# at roughly sf0.1 oracle cost where exact hash parity is measurable.
SF1_GRAPH_SAMPLE = {
    "orders": ("o_orderkey", 10),
    "lineitem": ("l_orderkey", 10),
    "embeddings": ("vec_id", 4),
}


def ensure_sf1_graph_sample(sf1_dir: str, out_name: str = "sf1graph") -> str:
    """Build (once) the sf1 graph-parity sample next to ``sf1_dir``:
    sampled orders/lineitem/embeddings written as multi-part table
    directories, every other table symlinked from sf1 — so the dir is
    a complete sf layout the normal parity machinery (gen_parity,
    duckdb_run, load_table) consumes unchanged."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sf1_dir = sf1_dir.rstrip("/")
    out = os.path.join(os.path.dirname(sf1_dir), out_name)
    meta_path = os.path.join(out, "_sample_meta.json")
    # Source size/mtime stats ride in the meta (the ensure_multifile
    # discipline): without them a REGENERATED sf1 would silently keep
    # the stale subsample while the symlinked tables point at the new
    # data — a mixed dataset whose parity would check the wrong rows.
    want = {
        "source": sf1_dir,
        "tables": _source_meta(sf1_dir),
        "rules": {k: list(v) for k, v in SF1_GRAPH_SAMPLE.items()},
    }
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == want:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    tmp = tempfile.mkdtemp(prefix=f".{out_name}.", dir=os.path.dirname(sf1_dir))
    try:
        for t in TABLES:
            src = os.path.join(sf1_dir, f"{t}.parquet")
            dst = os.path.join(tmp, f"{t}.parquet")
            if t not in SF1_GRAPH_SAMPLE:
                os.symlink(src, dst)
                continue
            key, mod = SF1_GRAPH_SAMPLE[t]
            if os.path.isdir(src):
                tbl = pq.ParquetDataset(src).read()
            else:
                tbl = pq.read_table(src)
            keep = pc.equal(
                pc.subtract(
                    tbl[key], pc.multiply(pc.divide(tbl[key], mod), mod)
                ),
                0,
            )
            tbl = tbl.filter(keep)
            n = _part_count(tbl.num_rows)
            os.makedirs(dst)
            base, extra = tbl.num_rows // n, tbl.num_rows % n
            off = 0
            for i in range(n):
                length = base + (1 if i < extra else 0)
                pq.write_table(
                    tbl.slice(off, length),
                    os.path.join(dst, f"part-{i:05d}.parquet"),
                )
                off += length
        with open(os.path.join(tmp, "_sample_meta.json"), "w") as f:
            json.dump(want, f, indent=1)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def ensure_multifile(sf_dir: str) -> str:
    """Return a directory-per-table view of ``sf_dir``: the dir itself
    when it already is one, else a (cached) repo-local mirror."""
    sf_dir = sf_dir.rstrip("/")
    if is_multifile(sf_dir):
        return sf_dir
    name = os.path.basename(sf_dir)
    out = os.path.join(MIRROR_ROOT, name)
    meta_path = os.path.join(out, "_mirror_meta.json")
    want = {"source": sf_dir, "tables": _source_meta(sf_dir),
            "rows_per_part": ROWS_PER_PART, "max_parts": MAX_PARTS,
            "part_bytes": PART_BYTES}
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == want:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    import pyarrow.parquet as pq  # heavy import deferred

    os.makedirs(MIRROR_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{name}.", dir=MIRROR_ROOT)
    try:
        for t in TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            tbl = pq.read_table(src)
            # On-disk (compressed) source bytes: the conservative width
            # signal — arrow in-memory nbytes would over-split narrow
            # tables whose scan is already cheap.
            n = _part_count(tbl.num_rows, os.stat(src).st_size)
            tdir = os.path.join(tmp, f"{t}.parquet")
            os.makedirs(tdir)
            base = tbl.num_rows // n
            extra = tbl.num_rows % n
            off = 0
            for i in range(n):
                length = base + (1 if i < extra else 0)
                pq.write_table(
                    tbl.slice(off, length),
                    os.path.join(tdir, f"part-{i:05d}.parquet"),
                )
                off += length
            assert off == tbl.num_rows
        with open(os.path.join(tmp, "_mirror_meta.json"), "w") as f:
            json.dump(want, f, indent=1)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return out
