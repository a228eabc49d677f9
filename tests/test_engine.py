"""Engine facade + format IO tests."""

from __future__ import annotations

import os

import pytest

from batchprocessor_spark.engine import Engine
from batchprocessor_spark.sources import io
from tests.conftest import SF_SMALL


@pytest.fixture()
def engine(spark):
    return Engine(spark=spark, sf_dir=SF_SMALL)


def test_table_and_sql(engine):
    assert engine.table("region").count() == 5
    row = engine.sql(
        "SELECT count(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]
    assert row.n > 0


def test_query_and_explain(engine):
    df = engine.query("q_agg_basic")
    assert df.count() > 0
    plan = engine.explain("q_join_inner_broadcast")
    assert "BroadcastHashJoin" in plan


def test_io_roundtrip(engine, spark, tmp_path):
    df = engine.table("nation")
    for fmt in ("parquet", "csv", "json", "orc"):
        path = os.path.join(str(tmp_path), fmt)
        io.write(df, path, fmt)
        back = io.read(
            spark,
            path,
            fmt,
            schema=df.schema if fmt in ("csv", "json") else None,
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_requires_schema(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        io.read(spark, "/nonexistent", "csv")


def test_partitioned_write_prunes(engine, spark, tmp_path):
    """Partitioned layout must enable partition pruning downstream."""
    path = str(tmp_path / "orders_by_status")
    io.write(engine.table("orders"), path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).where("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_queries_filtering_and_describe(engine):
    """Registry ergonomics (VERDICT r5 #8): category/search filtering
    and the describe card."""
    cats = engine.categories()
    assert sum(cats.values()) == len(engine.queries())
    for cat, n in cats.items():
        assert len(engine.queries(category=cat)) == n
    assert engine.queries(category="nope") == []
    # search hits name OR registered doc, case-insensitive
    by_name = engine.queries(search="MINHASH")
    assert "q_llm_dedup_minhash" in by_name
    by_doc = engine.queries(search="Neyman")
    assert "q_sample_neyman" in by_doc
    card = engine.describe("q_sample_neyman")
    assert card.splitlines()[0].startswith("q_sample_neyman  [sampling]")
    assert "defined in batchprocessor_spark.operators.sampling" in card
    assert "oracle SQL:" in card
    with pytest.raises(KeyError):
        engine.describe("q_no_such_query")


def test_readme_discovery_snippet(engine):
    """Execute the README's 'Discovering the query surface' python
    block verbatim — a freshness gate so the documented examples can
    never drift from the API (same policy as test_artifact_freshness)."""
    import re
    from pathlib import Path

    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    m = re.search(
        r"## Discovering the query surface.*?```python\n(.*?)```", readme, re.S
    )
    assert m, "README lost its discovery snippet"
    code = m.group(1).replace(
        'Engine(spark, sf_dir="/root/testdata/sf0.001")',
        'Engine(spark, sf_dir=SF_SMALL)',
    )
    exec(compile(code, "README.md", "exec"),
         {"spark": engine.spark, "SF_SMALL": SF_SMALL})


def test_cli_list_filter_and_describe(capsys):
    """The CLI twins of the discovery surface (no SparkSession)."""
    from batchprocessor_spark.__main__ import main

    assert main(["list", "--category", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "q_llm_dedup_minhash" in out and "q_agg_basic" not in out
    assert main(["list", "--search", "neyman"]) == 0
    assert "q_sample_neyman" in capsys.readouterr().out
    assert main(["describe", "q_llm_dedup_minhash"]) == 0
    out = capsys.readouterr().out
    assert "oracle SQL:" in out and "[dedup]" in out
    assert main(["describe", "q_nope"]) == 2


def test_readme_quickstart_snippet(engine):
    """Execute the README's quick-start block verbatim (VERDICT r8
    #7): a relational query through BOTH front ends, an LLM dedup, and
    a processor pipeline, all on ONE Engine instance — the first thing
    a new user runs, guaranteed runnable by CI."""
    import re
    from pathlib import Path

    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    m = re.search(
        r"## Quick start: one Engine, three surfaces.*?```python\n(.*?)```",
        readme,
        re.S,
    )
    assert m, "README lost its quick-start snippet"
    code = m.group(1).replace(
        'Engine(spark, sf_dir="/root/testdata/sf0.001")',
        "Engine(spark, sf_dir=SF_SMALL)",
    )
    exec(
        compile(code, "README.md", "exec"),
        {"spark": engine.spark, "SF_SMALL": SF_SMALL},
    )
