"""End-to-end corpus-curation pipeline — the engine's operators
composed the way a real pre-training data pipeline chains them:

    raw corpus → quality gate → near-dup canonical drop →
    benchmark decontamination → per-language curation report

Each stage exists standalone (functions/text.py quality filter,
operators/dedup.py canonical selection + decontamination); this
module registers the COMPOSITION as one declarative plan, proving the
stages fuse into a single Catalyst query (shared scans, broadcast
drop-lists) instead of materializing intermediate corpora — at 100 TB
the difference between one pass and four.

The reference has no pipeline composition surface (its unit is one
batching processor, batchprocessor-core/src/main/java/.../v2/
BatchProcessor.java:24); this is the engine extension the LLM-data
operators exist FOR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.operators.dedup import (
    _DECON_MOD,
    _JACCARD_THRESHOLD,
    _jaccard_pairs,
    connected_components,
    shingles,
)
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table

_CURATION_ORACLE = f"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio,
             length(replace(text, ' ', ''))::DOUBLE
               / len(string_split(text, ' ')) AS awl
      FROM documents),
    corpus AS (SELECT * FROM scored WHERE doc_id % {_DECON_MOD} <> 0),
    quality AS (
      SELECT doc_id FROM corpus
      WHERE n_chars BETWEEN 100 AND 20000 AND n_words >= 20
        AND punct_ratio < 0.1 AND awl BETWEEN 2 AND 12),
    words AS (
      SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
    sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      QUALIFY shingle IS NOT NULL),
    bench_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {_DECON_MOD} = 0),
    qsh AS (SELECT s.* FROM sh s JOIN quality q USING (doc_id)),
    jp AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM qsh a JOIN qsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sizes AS (SELECT doc_id, count(*) AS n FROM qsh GROUP BY 1),
    pairs AS (
      SELECT d1, d2
      FROM jp JOIN sizes s1 ON jp.d1 = s1.doc_id
              JOIN sizes s2 ON jp.d2 = s2.doc_id
      WHERE inter::DOUBLE / (s1.n + s2.n - inter) > {_JACCARD_THRESHOLD}),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION ALL SELECT d2, d1 FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
    clusters AS (
      SELECT node AS doc_id, min(label)::BIGINT AS cluster_id
      FROM walk GROUP BY node),
    ranked AS (
      SELECT c.doc_id,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d USING (doc_id)),
    dups AS (SELECT doc_id FROM ranked WHERE rn > 1),
    contam AS (
      SELECT DISTINCT s.doc_id FROM qsh s JOIN bench_sh b USING (shingle)),
    flags AS (
      SELECT c.doc_id, c.lang, c.n_chars,
             (CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS q_pass,
             (CASE WHEN dp.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS is_dup,
             (CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS contaminated
      FROM corpus c
      LEFT JOIN quality q ON c.doc_id = q.doc_id
      LEFT JOIN dups dp ON c.doc_id = dp.doc_id
      LEFT JOIN contam ct ON c.doc_id = ct.doc_id)
    SELECT lang,
           count(*)::BIGINT AS n_corpus,
           sum(q_pass)::BIGINT AS n_quality,
           sum(CASE WHEN q_pass = 1 AND is_dup = 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_dup_drop,
           sum(CASE WHEN q_pass = 1 AND is_dup = 0 AND contaminated = 1
                    THEN 1 ELSE 0 END)::BIGINT AS n_contam_drop,
           sum(CASE WHEN q_pass = 1 AND is_dup = 0 AND contaminated = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN q_pass = 1 AND is_dup = 0 AND contaminated = 0
                    THEN n_chars ELSE 0 END)::BIGINT AS chars_kept
    FROM flags GROUP BY lang
"""


@register("q_llm_curation_pipeline", oracle=_CURATION_ORACLE, category="pipeline")
def q_llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel as ONE query: documents outside the
    benchmark slice pass the heuristic quality gate, quality survivors
    lose non-canonical near-dup cluster members (keep-the-richest,
    q_llm_dedup_canonical's policy), survivors overlapping any
    benchmark shingle are decontaminated away, and the report rolls up
    per language: input/quality/dedup-drop/decon-drop/kept counts plus
    kept characters — the per-stage yield table every data team tracks
    per corpus release.

    Scale posture: the drop lists (duplicate members, contaminated
    ids) are proportional to the AFFECTED subset, so both attach to
    the corpus scan as broadcast left joins — the corpus shuffles only
    inside the pair-graph kernel, which itself runs on the
    quality-surviving subset, and the final rollup is
    language-cardinality. No intermediate corpus is materialized; the
    stages fuse into one plan.

    r13, evaluated and REJECTED (measured, VERDICT r12 #4): sharing
    ONE materialized shingle table across the lanes — the r12
    jaccard-prefix pattern. Two variants, both interleaved ×5 at
    sf0.1 vs this shape: (a) corpus-wide shingles + per-lane
    semi-joins LOST outright (shingles ~2× the documents, one extra
    semi-join per consumer); (b) quality-subset shingles
    (materialize(shingles(quality)), the 4-consumer subtree) was a
    WASH — 6.750 s old vs 6.847 s new medians, split reps. Unlike
    jaccard-prefix (whose candidates+verify re-read the table 7×
    around a pair blow-up), here Spark's ReusedExchange already
    covers the repeated aggregate-side subtrees, so the checkpoint
    barrier only adds a write. Kept the fused single-plan shape.
    """
    full = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    punct = F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    awl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    corpus = full.where(F.col("doc_id") % _DECON_MOD != 0).withColumn(
        "q_pass",
        (
            F.col("n_chars").between(100, 20000)
            & (n_words >= 20)
            & (punct < 0.1)
            & awl.between(2, 12)
        ).cast("int"),
    )
    quality = corpus.where(F.col("q_pass") == 1).select("doc_id", "text", "n_chars")

    pairs = (
        _jaccard_pairs(quality)
        .where(F.col("jaccard") > _JACCARD_THRESHOLD)
        .select("d1", "d2")
    )
    member = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    dups = (
        member.join(full.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id")
    )

    bench_sh = (
        shingles(full.where(F.col("doc_id") % _DECON_MOD == 0))
        .select("shingle")
        .distinct()
    )
    contam = (
        shingles(quality)
        .join(F.broadcast(bench_sh), "shingle")
        .select("doc_id")
        .distinct()
    )

    # The dup and contamination sets are corpus FRACTIONS whose size
    # is data-dependent (a crawl can be 20-30% duplicated), so these
    # joins carry no broadcast hint — AQE broadcasts them while they
    # are actually small and shuffles when they are not (VERDICT r7 #7
    # broadcast audit: a forced hint is never demoted).
    flagged = (
        corpus.select("doc_id", "lang", "n_chars", "q_pass")
        .join(dups.withColumn("is_dup", F.lit(1)), "doc_id", "left")
        .join(
            contam.withColumn("contaminated", F.lit(1)),
            "doc_id",
            "left",
        )
        .fillna(0, ["is_dup", "contaminated"])
    )
    kept = (
        (F.col("q_pass") == 1)
        & (F.col("is_dup") == 0)
        & (F.col("contaminated") == 0)
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.sum("q_pass").alias("n_quality"),
        F.sum(
            F.when((F.col("q_pass") == 1) & (F.col("is_dup") == 1), 1).otherwise(0)
        ).alias("n_dup_drop"),
        F.sum(
            F.when(
                (F.col("q_pass") == 1)
                & (F.col("is_dup") == 0)
                & (F.col("contaminated") == 1),
                1,
            ).otherwise(0)
        ).alias("n_contam_drop"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("chars_kept"),
    )
