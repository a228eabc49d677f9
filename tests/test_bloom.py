"""Bloom-filter decontamination guarantees (q_llm_decontaminate_bloom).

The oracle-parity test proves Spark and DuckDB build the identical
filter; these pin the properties that make the Bloom variant USABLE as
a decontamination gate:

1. no false negatives — every document the exact shingle-overlap
   report flags is also flagged by the Bloom probe, with at least as
   many hit shingles (a Bloom filter never misses a real member);
2. bounded per-probe false positives — every corpus shingle is one
   probe, and the fraction of probes that hit without a real overlap
   must stay small at the fixture's fill factor (m = 2^17 bits, k=2).
"""

from __future__ import annotations

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def _hits(spark, name: str) -> dict[int, int]:
    return {
        r.doc_id: r[1]
        for r in REGISTRY[name].builder(spark, SF_ORACLE).collect()
    }


def test_bloom_flags_are_superset_of_exact(spark):
    exact = _hits(spark, "q_llm_decontaminate")
    bloom = _hits(spark, "q_llm_decontaminate_bloom")
    assert exact, "fixture should produce contaminated documents"
    missed = set(exact) - set(bloom)
    assert not missed, f"Bloom filter missed truly-contaminated docs: {missed}"
    undercount = {d for d, n in exact.items() if bloom[d] < n}
    assert not undercount, (
        f"Bloom hit counts below exact overlap counts for: {undercount}"
    )


def test_bloom_per_probe_false_positive_rate_bounded(spark):
    """FP probes = maybe-hits beyond the exact overlap count, summed
    over all docs; probe count = total distinct corpus shingles. The
    128 Kbit filter must keep the ratio under 1%."""
    from batchprocessor_spark.operators.dedup import _DECON_MOD, shingles

    exact = _hits(spark, "q_llm_decontaminate")
    bloom = _hits(spark, "q_llm_decontaminate_bloom")
    fp_probes = sum(n - exact.get(d, 0) for d, n in bloom.items())
    n_probes = (
        shingles(load_table(spark, SF_ORACLE, "documents"))
        .where(f"doc_id % {_DECON_MOD} != 0")
        .count()
    )
    assert fp_probes >= 0
    assert fp_probes / n_probes < 0.01, (
        f"Bloom per-probe FP rate {fp_probes}/{n_probes} exceeds 1%"
    )
