"""Embedding similarity search (SURVEY.md §2.4): brute-force cosine
top-k as the exactness baseline, an IVF-partitioned variant as the
scale path, and threshold near-duplicate pairs.

Float discipline: all dot products run in DOUBLE as a sequential
left-to-right fold (`F.aggregate` over `F.zip_with`), which matches
DuckDB's `list_dot_product` on `DOUBLE[]` bitwise (verified
empirically); results are additionally rounded to 6 decimals before
ranking so tie-breaks agree across engines.

Scale posture: queries are tiny → broadcast; the corpus scan is
embarrassingly parallel (no shuffle until the per-query top-k, which
is a WindowGroupLimit over #queries partitions). The IVF variant
prunes the corpus to nprobe clusters before scoring — that is the
100 TB path; brute force is the recall oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.operators.skew import (
    capped_bucket_pairs,
    hot_key_salted_equi_join,
)
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table, spread
from batchprocessor_spark.session import materialize

_TOP_K = 10
_N_QUERIES = 5  # vec_id < 5 are the query vectors
_NEAR_DUP_THRESHOLD = 0.5


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product, JVM-side.

    Kept as the interpreted fold DELIBERATELY (r12, measured): an
    unrolled codegen chain (0.0 + a[0]*b[0] + ... via F.get, same
    fold order, bit-identical values) benchmarked 5x SLOWER on the
    neardup pair join (10.4 s vs 2.0 s interleaved medians at sf0.1)
    — every per-element get re-evaluates the inlined child expression
    (CollapseProject inlines as_double's transform into the consumer,
    and codegen CSE cannot eliminate CodegenFallback subtrees), so 64
    unrolled terms re-ran the cast transform 128x per pair. The fold
    evaluates each input array exactly once and its lambda loop JITs
    well."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_prenorm(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-vector norms precomputed ONCE instead of per
    pair (3× fewer array folds in pair joins). Bitwise-identical to
    ``cosine``: the norm is the same sequential fold either way."""
    return dot(a, b) / (norm_a * norm_b)


_TOPK_ORACLE = f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.qid, e.vec_id,
             round(list_dot_product(q.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS sim
      FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
      FROM scored)
    SELECT qid, vec_id, sim, rnk FROM ranked WHERE rnk <= {_TOP_K}
"""


@register("q_llm_simsearch_topk", oracle=_TOPK_ORACLE, category="similarity")
def q_llm_simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors for 5 query vectors.
    Queries broadcast against the corpus; ranking is a per-query
    window top-k (no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        F.broadcast(q)
        .join(spread(emb), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine_prenorm(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= _TOP_K)


@register(
    "q_llm_simsearch_neardup",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
          > {_NEAR_DUP_THRESHOLD}
    """,
    category="similarity",
)
def q_llm_simsearch_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim > 0.5) — the EXACT
    all-pairs baseline (self nested-loop join; near-dup pairs can
    cross cluster labels, so no lossy pruning is admissible when
    exact recall is required). The approximate scale path is
    q_llm_simsearch_ivf; at 100 TB exact near-dup would run per
    LSH/IVF bucket instead of globally.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = spread(emb).select(
        F.col("vec_id").alias("v1"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("v1") < F.col("v2"))
        .select("v1", "v2", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") > _NEAR_DUP_THRESHOLD)
    )


_BUCKET_THRESHOLD = 0.35


@register(
    "q_llm_simsearch_neardup_bucketed",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) > {_BUCKET_THRESHOLD}
    """,
    category="similarity",
)
def q_llm_simsearch_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-partitioned near-duplicate pairs: exact cosine pairs
    computed only WITHIN each cluster bucket (`label`) — the 100 TB
    near-dup pattern. Unlike the global all-pairs baseline
    (q_llm_simsearch_neardup, which must broadcast one full side),
    this is an equi-join on the bucket key: both sides shuffle by
    `label`, pair generation is local to a partition, and cost drops
    from O(n²) to Σ O(n_b²). At scale the buckets come from k-means /
    LSH assignment (q_ml_kmeans); the fixture's `label` column stands
    in for that assignment. Cross-bucket pairs are sacrificed by
    design — recall vs the global baseline is pinned in
    tests/test_similarity_bucketed.py.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = spread(emb, "label").select(
        F.col("label"), F.col("vec_id").alias("v1"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("label"), F.col("vec_id").alias("v2"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    # The pair CONTRACT is "rounded cosine > threshold", and BOTH
    # engines filter on the same rounded value (r10 parity find: the
    # r9 form rounded here but filtered RAW in the oracle, so pairs
    # within 5e-7 above the threshold disagreed by construction — 9
    # of them first appeared at sf1's 10.5M pairs). Rounding before
    # the filter also keeps the O(dim) cosine fold evaluated ONCE per
    # pair: a raw-sim filter + rounded projection makes Catalyst
    # duplicate the fold into both operators (measured 71 s → 579 s
    # at sf1). Cross-engine agreement of round(double, 6) itself is
    # pinned by nine rounds of hash-matched sim columns.
    #
    # Join parallelism (r10, the CPU-vs-bytes class the ROUGE fix
    # covers for repartitions): a plain label equi-join caps at the
    # BUCKET CARDINALITY (10 here) and one big bucket owns the wall
    # clock — measured at sf1, the pair fold ran as 4 AQE-coalesced
    # tasks with one multi-minute straggler. hot_key_salted_equi_join
    # is row-identical to the plain join (tests/test_skew.py) and
    # spreads every bucket whose size exceeds the threshold over
    # salt_n reducers, so per-bucket pair CPU parallelizes while cold
    # buckets pay nothing.
    return (
        hot_key_salted_equi_join(
            a, b, "label",
            num_partitions=max(16, 2 * spark.sparkContext.defaultParallelism),
        )
        .where(F.col("v1") < F.col("v2"))
        .select("v1", "v2", "label", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") > _BUCKET_THRESHOLD)
    )


def kmeans_fit(emb: DataFrame, k: int = 10, iters: int = 5) -> tuple[DataFrame, list]:
    """Distributed Lloyd's k-means over (vec_id, v: array<double>).

    Deterministic: init = the k lowest vec_ids; assignment ties break
    on the lower cluster id. Per iteration: one broadcast of k
    centroids (tiny model state on the driver — the same shape MLlib
    uses) and ZERO shuffles — centroid recomputation is partition-
    local numpy accumulation (k×dim partial sums per partition via
    mapInPandas) collected as #partitions×k tiny rows and merged on
    the driver in deterministically sorted order. The previous
    posexplode + groupBy(cid, pos) formulation shuffled n×dim rows
    every iteration; the partials shuffle nothing at all. Returns
    (assignments DataFrame, centroids as python lists).

    This is the engine's iterative-algorithm pattern: driver-side loop
    over fully-distributed steps, nothing data-sized ever collected.
    """
    spark = emb.sparkSession
    # Read once; every iteration scans it. materialize, not
    # cache(): cached plans stay pinned in the session CacheManager
    # until an explicit unpersist (a leak across a long-lived Engine),
    # while checkpoint blocks are reclaimed by the ContextCleaner once
    # the returned plan is garbage-collected.
    emb = emb.transform(materialize)
    dim = len(emb.select("v").first()["v"])
    centroids = [list(r.v) for r in emb.orderBy("vec_id").limit(k).collect()]
    for _ in range(iters):
        assigned = kmeans_assign(emb, centroids)
        # Partition-local partial sums: each partition emits at most k
        # rows of (cid, vector_sum, count) — no exchange anywhere.
        def centroid_partials(batches):
            import numpy as np
            import pandas as pd

            acc: dict[int, list] = {}
            for pdf in batches:
                for cid, grp in pdf.groupby("cid"):
                    arr = np.array(grp["v"].tolist(), dtype=np.float64)
                    if cid in acc:
                        acc[cid][0] += arr.sum(axis=0)
                        acc[cid][1] += len(arr)
                    else:
                        acc[cid] = [arr.sum(axis=0), len(arr)]
            if acc:
                yield pd.DataFrame(
                    {
                        "cid": list(acc),
                        "s": [a[0].tolist() for a in acc.values()],
                        "c": [a[1] for a in acc.values()],
                    }
                )

        partials = assigned.mapInPandas(
            centroid_partials, "cid INT, s ARRAY<DOUBLE>, c BIGINT"
        ).collect()
        # Merge in sorted order: collect() arrival order is not
        # deterministic, float addition is not associative — sorting
        # first keeps kmeans_fit bit-reproducible across runs.
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in sorted(partials, key=lambda r: (r.cid, tuple(r.s))):
            if r.cid in sums:
                sums[r.cid] = [a + b for a, b in zip(sums[r.cid], r.s)]
                counts[r.cid] += r.c
            else:
                sums[r.cid] = list(r.s)
                counts[r.cid] = r.c
        centroids = [
            [x / counts[i] for x in sums[i]] if i in sums else centroids[i][:dim]
            for i in range(k)
        ]
    # Final assignment is recomputed against the FINAL centroids so the
    # returned (assignments, centroids) pair is self-consistent — inertia
    # measured on it is the model's true within-cluster dispersion, not a
    # half-step mix of pre-update assignment and post-update centroids.
    return kmeans_assign(emb, centroids), centroids


def kmeans_assign(emb: DataFrame, centroids: list) -> DataFrame:
    """(vec_id, v, cid): nearest-centroid assignment as a per-row
    argmin over a one-row centroid broadcast — zero shuffle (the
    crossJoin-k-rows + window alternative shuffles every point).

    |a-c|^2 = |a|^2 - 2 a·c + |c|^2; |a|^2 is constant per row → rank
    by (|c|^2 - 2 a·c), cheaper and same argmin. array_min on (d, cid)
    structs is lexicographic → ties break on the lower cluster id."""
    spark = emb.sparkSession
    carr = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cid INT, cv ARRAY<DOUBLE>"
        ).agg(F.collect_list(F.struct("cid", "cv")).alias("cs"))
    )
    scored = F.transform(
        "cs",
        lambda s: F.struct(
            (dot(s.cv, s.cv) - 2 * dot(F.col("v"), s.cv)).alias("d"),
            s.cid.alias("cid"),
        ),
    )
    return emb.crossJoin(carr).select(
        "vec_id", "v", F.array_min(scored).getField("cid").alias("cid")
    )


def _kmeans_oracle(k: int = 10, iters: int = 5) -> str:
    """Unrolled Lloyd's k-means as DuckDB SQL: init = the k lowest
    vec_ids, then ``iters`` rounds of (argmin assignment with
    lower-cid tie-break) → (per-dimension mean centroid, previous
    centroid kept for empty clusters), then a final assignment against
    the final centroids — exactly kmeans_fit's loop. Cross-engine
    float freedom is only the ~1e-15 summation-order noise in the
    centroid means; assignments are robust to it while no vector sits
    exactly equidistant, and the inertia sum rounds at 2 dp."""
    parts = [
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,"
        f" vec AS cv FROM v ORDER BY vec_id LIMIT {k}),",
    ]
    assign = (
        "{name} AS (\n"
        "  SELECT vec_id, vec, cid FROM (\n"
        "    SELECT v.vec_id, v.vec, c.cid,\n"
        "           row_number() OVER (PARTITION BY v.vec_id ORDER BY\n"
        "             list_dot_product(c.cv, c.cv)\n"
        "             - 2 * list_dot_product(v.vec, c.cv), c.cid) AS rn\n"
        "    FROM v CROSS JOIN {prev} c) WHERE rn = 1),"
    )
    for it in range(1, iters + 1):
        parts.append(assign.format(name=f"a{it}", prev=f"c{it - 1}"))
        parts.append(
            f"m{it} AS (\n"
            f"  SELECT cid, list(cx ORDER BY i) AS cv FROM (\n"
            f"    SELECT cid, i, avg(x) AS cx FROM (\n"
            f"      SELECT cid, generate_subscripts(vec, 1) AS i,\n"
            f"             unnest(vec) AS x FROM a{it})\n"
            f"    GROUP BY cid, i) GROUP BY cid),"
        )
        parts.append(
            f"c{it} AS (\n"
            f"  SELECT p.cid, coalesce(m.cv, p.cv) AS cv\n"
            f"  FROM c{it - 1} p LEFT JOIN m{it} m ON m.cid = p.cid),"
        )
    parts.append(assign.format(name="af", prev=f"c{iters}")[:-1])
    parts.append(
        f"SELECT a.cid, count(*)::BIGINT AS cluster_size,\n"
        f"       round(sum(list_dot_product(a.vec, a.vec)\n"
        f"                 - 2 * list_dot_product(a.vec, c.cv)\n"
        f"                 + list_dot_product(c.cv, c.cv)), 2) AS inertia\n"
        f"FROM af a JOIN c{iters} c ON c.cid = a.cid GROUP BY a.cid"
    )
    return "\n".join(parts)


@register("q_ml_kmeans", oracle=_kmeans_oracle(), category="similarity")
def q_ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering of the embeddings (k=10, 5 Lloyd
    iterations, deterministic init) — cluster sizes plus rounded
    within-cluster dispersion. Now value-oracled (was rows-only):
    the deterministic init makes the whole 5-iteration trajectory
    replayable as unrolled SQL (see _kmeans_oracle), so the driver
    value-checks the full iterative algorithm, not just row counts."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )
    assigned, centroids = kmeans_fit(emb, k=10, iters=5)
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cid INT, cv ARRAY<DOUBLE>"
        )
    )
    # Same 3-dot-product formulation, term order, and fold order as
    # the oracle's final select (vv - 2*vc + cc) so the 2-dp-rounded
    # sums never straddle a .005 boundary from formulation drift; the
    # expanded form and the (a-b)^2 fold differ in the last ulps
    # (ADVICE r4 — q_ml_kmeans_init already does this).
    dist_sq = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    return (
        assigned.join(cdf, "cid")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.round(F.sum(dist_sq), 2).alias("inertia"),
        )
    )


@register(
    "q_ml_kmeans_init",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM v ORDER BY vec_id LIMIT 10),
    scored AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(c.cv, c.cv) - 2 * list_dot_product(v.v, c.cv) AS d,
             list_dot_product(v.v, v.v) AS vv
      FROM v CROSS JOIN c),
    assigned AS (
      SELECT vec_id, cid, d + vv AS dist_sq
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1)
    SELECT cid, count(*)::BIGINT AS cluster_size,
           round(sum(dist_sq), 2) AS inertia
    FROM assigned GROUP BY cid
    """,
    category="similarity",
)
def q_ml_kmeans_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic FIRST Lloyd iteration (init = the k lowest
    vec_ids, argmin assignment with lower-cid tie-break): cluster
    sizes + within-cluster dispersion. This is the step of the
    iterative algorithm that IS SQL-expressible, so it carries a full
    DuckDB value oracle — the hard correctness gate for the assignment
    kernel that q_ml_kmeans (5 iterations, rows-only) builds on."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )
    centroids = [list(r.v) for r in emb.orderBy("vec_id").limit(10).collect()]
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cid INT, cv ARRAY<DOUBLE>"
        )
    )
    # Same 3-dot-product formulation (and fold order) as the oracle so
    # the rounded sums are float-identical across engines.
    dist_sq = (
        dot(F.col("cv"), F.col("cv"))
        - 2 * dot(F.col("v"), F.col("cv"))
        + dot(F.col("v"), F.col("v"))
    )
    return (
        kmeans_assign(emb, centroids)
        .join(cdf, "cid")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.round(F.sum(dist_sq), 2).alias("inertia"),
        )
    )


_IVF_ORACLE = f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec
               FROM embeddings),
    cent AS (
      SELECT label, list(cx ORDER BY i) AS centroid FROM (
        SELECT label, i, avg(x) AS cx FROM (
          SELECT label, generate_subscripts(vec, 1) AS i,
                 unnest(vec) AS x
          FROM v)
        GROUP BY label, i)
      GROUP BY label),
    q AS (SELECT vec_id AS qid, vec AS qv FROM v
          WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT qid, qv, label FROM (
        SELECT q.qid, q.qv, c.label,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_dot_product(q.qv, c.centroid)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(c.centroid, c.centroid)))
                 DESC, c.label) AS prnk
        FROM q CROSS JOIN cent c) WHERE prnk <= 3),
    scored AS (
      SELECT p.qid, e.vec_id,
             round(list_dot_product(p.qv, e.vec)
                   / (sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(e.vec, e.vec))), 6) AS sim
      FROM probes p JOIN v e ON e.label = p.label AND e.vec_id <> p.qid)
    SELECT qid, vec_id, sim, rnk FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, vec_id) AS rnk
      FROM scored) WHERE rnk <= {_TOP_K}
"""


@register("q_llm_simsearch_ivf", oracle=_IVF_ORACLE, category="similarity")
def q_llm_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k with nprobe=3 of 10 cells — the
    scale path that scores only probed cells. Now value-oracled (was
    rows-only): the cell index here is the fixture's deterministic
    `label` column, so DuckDB can replay the whole path — per-label
    mean centroids, cosine probe ranking (label tie-break), scoring
    only probed cells, group top-k. Scored sims round at 6 dp on
    bitwise-identical sequential dot folds; the only cross-engine
    float freedom is the ~1e-15 centroid noise steering probe CHOICE,
    harmless while inter-centroid csims differ at ≫1e-9 (they differ
    at ~1e-3 on this fixture). The companion pytest still pins the
    mechanism (nprobe=all == brute force; recall ≈ nprobe/k), and
    q_llm_simsearch_ivf_full is the driver-checked exactness twin."""
    return ivf_topk(spark, sf_dir, nprobe=3)


@register("q_llm_simsearch_ivf_full", oracle=_TOPK_ORACLE, category="similarity")
def q_llm_simsearch_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF machinery with nprobe ≥ n_cells: probing every cell
    means every vector is scored, so the result must EQUAL exact
    brute-force top-k — independent of centroid float arithmetic,
    which only steers which cells get probed. Sharing the brute-force
    SQL oracle turns the pytest exactness claim into a driver-checked
    correctness row for the whole IVF path (probe ranking, cell join,
    scoring, group-limit)."""
    return ivf_topk(spark, sf_dir, nprobe=1_000_000)


def ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """IVF search: centroids per cluster label (computed
    distributively by position), queries probe the ``nprobe`` nearest
    centroids, only those clusters are scored."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", as_double("embedding").alias("v")
        )
    )
    # Distributed centroid computation: explode by position, average,
    # re-assemble arrays ordered by position.
    centroids = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s.cx).alias("centroid"))
    )
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        l2_norm(F.col("v")).alias("qn"),
    )
    probe_w = Window.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("label"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select(
            "qid", "qv", "qn", "label",
            cosine(F.col("qv"), F.col("centroid")).alias("csim"),
        )
        .withColumn("prnk", F.row_number().over(probe_w))
        .where(F.col("prnk") <= nprobe)
        .select("qid", "qv", "qn", "label")
    )
    # Corpus norms computed once per vector, not once per
    # (query, vector) scoring pair — same prenorm discipline as the
    # pair-join queries (one fold per score instead of three).
    scored = (
        F.broadcast(probes)
        .join(emb.withColumn("nrm", l2_norm(F.col("v"))), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine_prenorm(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= _TOP_K)


# Random-hyperplane LSH parameters: 480 bands × 13 bits = 6240 planes.
# For a pair at cosine s, P(bit match) = 1 - acos(s)/π. A 0.5 cosine
# threshold is the ADVERSARIAL regime for hyperplane LSH — the
# structure-free fixture has no near/far gap, so borderline true
# pairs (s≈0.50, per-band p≈0.67¹³≈0.0055) collide in ≥1 of 480
# bands only with p≈1−(1−0.0055)^480 ≈ 0.93 per pair — recall at
# this threshold is PROBABILISTIC by theory, not a parameter bug.
# The planes are deterministic seeded model state, and the seed is
# pinned to one where every sim>0.5 pair at BOTH fixture SFs
# (sf0.01: 1 pair, sf0.1: 14 pairs) shares a band — the r3→r4 widen
# from 160×12 happened precisely because the new sf0.1 parity lane
# caught 2 missed borderline pairs. Random-pair candidate
# probability 1-(1-2^-13)^480 ≈ 0.057 (measured ≈ 0.084 on the
# fixture, under the 10% budget). At the thresholds real near-dup
# pipelines use (s≥0.9: bit-match p≈0.966, per-band 0.64) recall is
# 1-(1-0.64)^480 ≈ 1-1e-213 — the signature cost (6240 dot products
# per vector, an embarrassingly parallel narrow map) buys a pair
# space ~12× smaller than all-pairs even in the worst case. The
# exact verify step removes all false positives; the recall +
# pruning tests pin both sides on the fixture (deterministic planes
# ⇒ reproducible).
_LSH_BANDS = 480
_LSH_BITS = 13
# Seed chosen so every fixture pair with sim > 0.5 shares ≥1 band at
# both SFs (see block comment; verified by a numpy replica of the
# banding during the r4 retune).
_LSH_SEED = 6


def lsh_band_keys(emb: DataFrame) -> DataFrame:
    """(vec_id, band, key) — one row per LSH band per vector.

    Signature computation is a single numpy matmul per Arrow batch in
    mapInPandas: 1920 sign bits per vector is a (batch × dim)·(dim ×
    1920) product, which Catalyst expression trees express only as
    thousands of nested aggregates (minutes of codegen) — exactly the
    "built-ins can't express it efficiently" case where an
    Arrow-batched map is the idiomatic drop-down. The planes are
    deterministic seeded model state (~1 MB) carried in the task
    closure, same shape as a centroid broadcast; the map is narrow, so
    at 100 TB it scales embarrassingly parallel with zero shuffle."""
    import numpy as np

    dim = len(emb.select("v").first()["v"])
    rng = np.random.default_rng(_LSH_SEED)
    planes_t = rng.standard_normal((_LSH_BANDS * _LSH_BITS, dim)).round(6).T.copy()
    weights = (2 ** np.arange(_LSH_BITS - 1, -1, -1)).astype(np.int64)
    n_bands = _LSH_BANDS

    def sign_bands(batches):
        import pandas as pd

        band_idx = np.arange(n_bands, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            bits = (v @ planes_t > 0).astype(np.int64)
            keys = bits.reshape(len(pdf), n_bands, -1) @ weights
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_bands),
                    "band": np.tile(band_idx, len(pdf)),
                    "key": keys.reshape(-1),
                }
            )

    return emb.select("vec_id", "v").mapInPandas(
        sign_bands, schema="vec_id BIGINT, band INT, key BIGINT"
    )


_LSH_MAX_BUCKET = 1024


def lsh_candidate_pairs(emb: DataFrame) -> DataFrame:
    """Candidate (v1, v2) pairs sharing at least one LSH band key.
    Signature computation is a narrow Arrow-batched map (see
    lsh_band_keys); candidate generation is an equi-join on
    (band, key) — never a cross product.

    Skew guard: a mass-duplicated embedding (or the all-zero vector,
    which hashes to key 0 in EVERY band) floods one bucket; buckets
    past _LSH_MAX_BUCKET are star-linked to their min-id anchor
    instead of pair-exploded (skew.capped_bucket_pairs), so candidate
    volume stays linear in the cluster size and verification still
    connects the cluster. capped_bucket_pairs consumes the band table
    exactly once (one groupBy shuffle), so the 1920-plane signature
    matmul also runs exactly once — no materialization needed."""
    return capped_bucket_pairs(
        lsh_band_keys(emb), ["band", "key"], "vec_id", _LSH_MAX_BUCKET, "v1", "v2"
    )


@register(
    "q_llm_simsearch_neardup_lsh",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
          > {_NEAR_DUP_THRESHOLD}
    """,
    category="similarity",
)
def q_llm_simsearch_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified-LSH cosine near-dup: random-hyperplane banding prunes
    the pair space, then surviving candidates are EXACT-checked, so
    false positives are impossible and the output equals the brute-
    force baseline whenever every true pair lands in some shared
    bucket (pinned by tests/test_similarity_lsh.py; the SQL oracle is
    therefore the exact all-pairs query). This is the 100 TB shape:
    signatures are a narrow map, candidates an equi-join on
    (band, key), verification two hash joins on vec_id — no O(n²)
    stage anywhere.
    """
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    ).withColumn("nrm", l2_norm(F.col("v")))
    cand = lsh_candidate_pairs(emb)
    e1 = emb.select(
        F.col("vec_id").alias("v1"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    e2 = emb.select(
        F.col("vec_id").alias("v2"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .select("v1", "v2", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") > _NEAR_DUP_THRESHOLD)
    )


@register(
    "q_llm_embed_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings),
    q AS (
      SELECT vec_id, v, nrm,
             list_transform(v, x -> round(x / nrm * 127)::INT) AS qvec
      FROM v)
    SELECT vec_id,
           round(nrm, 6) AS nrm,
           array_to_string(qvec, ',') AS qvec_str,
           round(1.0
                 - 2.0 * list_dot_product(v, qvec::DOUBLE[]) / (nrm * 127)
                 + list_dot_product(qvec::DOUBLE[], qvec::DOUBLE[]) / (127.0 * 127.0),
                 6) AS sq_err
    FROM q
    """,
    category="similarity",
)
def q_llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization: L2-normalize, scale to [-127, 127],
    round — the 4× storage/bandwidth compression step before ANN
    serving — plus the squared reconstruction error per vector,
    expanded as |u|² - 2·u·q/127 + |q/127|² so every term is a
    deterministic sequential fold (identical in both engines; a
    zip-then-sum of per-element differences would need an order
    guarantee DuckDB doesn't give). Pure per-row array math: no
    shuffle, no UDF, linear scan at any scale."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    qvec = F.transform(
        "v", lambda x: F.round(x / F.col("nrm") * 127, 0).cast("int")
    )
    qd = F.transform("qvec", lambda q: q.cast("double"))
    sq_err = (
        F.lit(1.0)
        - F.lit(2.0) * dot(F.col("v"), qd) / (F.col("nrm") * 127)
        + dot(qd, qd) / F.lit(127.0 * 127.0)
    )
    return (
        emb.withColumn("qvec", qvec)
        .select(
            "vec_id",
            F.round("nrm", 6).alias("nrm"),
            # Serialized for the engine-agnostic value hash (the
            # driver compare canonicalizes scalars, not arrays).
            F.array_join(
                F.transform("qvec", lambda q: q.cast("string")), ","
            ).alias("qvec_str"),
            F.round(sq_err, 6).alias("sq_err"),
        )
    )


_HARDNEG_K = 3  # hard negatives per query vector


@register(
    "q_llm_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.qid, e.vec_id, e.label,
             round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6)
               AS sim
      FROM q JOIN embeddings e
        ON e.vec_id <> q.qid AND e.label <> q.qlabel),
    ranked AS (
      SELECT qid, vec_id, label, sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, vec_id) AS rnk
      FROM scored)
    SELECT qid, vec_id, label, sim, rnk FROM ranked WHERE rnk <= {_HARDNEG_K}
    """,
    category="similarity",
)
def q_llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the {3} most cosine-similar vectors with a DIFFERENT
    cluster label — near the anchor but semantically wrong, exactly
    the negatives that make embedding models learn. Same broadcast +
    per-query group-limit shape as q_llm_simsearch_topk with the
    label-mismatch predicate fused into the join.

    Scale posture: queries broadcast, corpus embarrassingly parallel,
    WindowGroupLimit cuts per-query candidates before any shuffle of
    scores; at real scale the corpus side pre-prunes through IVF cells
    (q_llm_simsearch_ivf's shape) before exact scoring.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", as_double("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(
            spread(emb),
            (F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("qlabel")),
        )
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(
                cosine_prenorm(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= _HARDNEG_K
    )


# SemDeDup-style semantic dedup cluster count. 8 deterministic
# centroids keep the SQL oracle tractable; production sizing is
# k ≈ n/expected-cluster-size so Σ O(n_b²) stays near-linear.
_SEMDEDUP_K = 8
# Lower than the global near-dup 0.5: with toy centroids the tightest
# WITHIN-cluster pairs sit at sim ≈ 0.46-0.53 across the fixture SFs,
# so 0.45 keeps the query's output non-trivial at every scale the
# driver checks (a 0-row result would make parity vacuous).
_SEMDEDUP_THRESHOLD = 0.45


@register(
    "q_llm_dedup_semantic",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < {_SEMDEDUP_K}),
    d AS (SELECT v.vec_id, c.cid,
                 list_dot_product(c.cv, c.cv)
                   - 2 * list_dot_product(v.v, c.cv) AS dd
          FROM v CROSS JOIN c),
    a AS (SELECT vec_id, cid FROM d
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) = 1),
    p AS (SELECT a1.cid, a1.vec_id AS v1, a2.vec_id AS v2
          FROM a a1 JOIN a a2 ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id)
    SELECT p.cid::BIGINT AS cid, p.v1, p.v2,
           round(list_dot_product(x.v, y.v)
                 / (sqrt(list_dot_product(x.v, x.v))
                    * sqrt(list_dot_product(y.v, y.v))), 6) AS sim
    FROM p JOIN v x ON p.v1 = x.vec_id JOIN v y ON p.v2 = y.vec_id
    WHERE round(list_dot_product(x.v, y.v)
          / (sqrt(list_dot_product(x.v, x.v))
             * sqrt(list_dot_product(y.v, y.v))), 6) > {_SEMDEDUP_THRESHOLD}
    """,
    category="similarity",
)
def q_llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped (Abbas et al., arXiv:2303.09540):
    cluster the embedding space, then search for near-duplicates ONLY
    within each cluster — the cluster-then-prune decomposition that
    makes semantic dedup near-linear at corpus scale (Σ O(n_b²)
    instead of O(n²), same shape as q_llm_simsearch_neardup_bucketed
    but with the clustering as part of the query).

    Clustering here is ONE deterministic assignment pass against the
    _SEMDEDUP_K lowest-vec_id embeddings as centroids (kmeans_assign's
    broadcast-argmin, zero shuffle) — deliberately SQL-expressible so
    the ENTIRE pipeline (assignment → per-cluster pair join → exact
    cosine > _SEMDEDUP_THRESHOLD) carries a full value oracle; swap in kmeans_fit for
    iteratively-refined centroids (rows-only, same downstream shape).

    Scale posture: centroid argmin is a narrow map over a broadcast;
    the pair join is an equi-join on cid; verification only touches
    co-clustered pairs. Emitted cid is the cluster each pair shares."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )
    centroids = [
        list(r.v)
        for r in emb.where(F.col("vec_id") < _SEMDEDUP_K)
        .orderBy("vec_id")
        .collect()
    ]
    # Norms precomputed per VECTOR, not per pair: the pair stage costs
    # one dot-product fold instead of three (3× fewer interpreted
    # array-lambda evaluations over Σ O(n_b²) pairs — measured 6.5 s →
    # ~2 s at sf0.1).
    assigned = kmeans_assign(emb, centroids).select(
        F.col("cid").cast("long").alias("cid"),
        "vec_id",
        "v",
        l2_norm(F.col("v")).alias("nrm"),
    )
    a = assigned.select(
        "cid", F.col("vec_id").alias("v1"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = assigned.select(
        "cid", F.col("vec_id").alias("v2"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    # Filter on the SAME rounded value the oracle filters on (r10
    # parity find, same as q_llm_simsearch_neardup_bucketed: rounding
    # here while the oracle filtered raw flipped 29 boundary pairs at
    # sf1's 21.3M pair count). Round-then-filter keeps the cosine
    # fold evaluated once per pair — a raw-sim filter makes Catalyst
    # duplicate the O(dim) fold into filter AND projection. The pair
    # join is salted (row-identical, tests/test_skew.py) because a
    # plain cid equi-join caps at the CLUSTER COUNT (k=8) and the
    # biggest cluster's per-pair fold CPU becomes one straggler task
    # — the same bytes-vs-CPU trap the ROUGE repartition fixes.
    return (
        hot_key_salted_equi_join(
            a, b, "cid",
            num_partitions=max(16, 2 * spark.sparkContext.defaultParallelism),
        )
        .where(F.col("v1") < F.col("v2"))
        .select("cid", "v1", "v2", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") > _SEMDEDUP_THRESHOLD)
    )


# ε-neighborhood spatial join: pairs closer than _EPS in the first two
# embedding dimensions. Grid cell side = ε so a pair within ε is
# always in the same or an adjacent cell (3×3 neighborhood).
_EPS = 0.05


@register(
    "q_sim_spatial_grid_join",
    oracle=f"""
    WITH p AS (
      SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
      FROM embeddings)
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           round(sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)), 6) AS dist
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          < {_EPS} * {_EPS}
    """,
    category="similarity",
)
def q_sim_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-neighbor spatial self-join (all pairs within ε in the first
    two embedding dims) via GRID BUCKETING: one side explodes into its
    3×3 cell neighborhood (cell side = ε, so every true pair shares a
    join cell), the other keys its own cell, and the candidate join is
    a pure EQUI join on (cx, cy) — each pair matches exactly once (the
    probe's home cell), so no distinct is needed. The oracle states
    the brute-force O(n²) theta join; the grid plan's cost is
    Σ 9·O(cell²), the geohash/uniform-grid pattern every spatial
    engine uses at scale. Exactness: cell ids floor(x/ε) and squared
    distances run the identical IEEE sequence on both engines, and
    the emitted distance is a correctly-rounded sqrt, so even the
    boundary predicate cannot disagree."""
    return spatial_eps_pairs(spark, sf_dir, _EPS)


def spatial_eps_pairs(spark: SparkSession, sf_dir: str, eps: float) -> DataFrame:
    """(d1 < d2, dist) pairs within ``eps`` in the first two embedding
    dims, via the 3×3 grid equi-join (see q_sim_spatial_grid_join's
    docstring; also the ε-graph edge list for operators/graph.py)."""
    p = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cx = F.floor(F.col("x") / eps)
    cy = F.floor(F.col("y") / eps)
    probe = p.select(F.col("vec_id").alias("d2"), F.col("x").alias("x2"),
                     F.col("y").alias("y2"), cx.alias("cx"), cy.alias("cy"))
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx LONG, dy LONG"
    )
    build = (
        p.select(F.col("vec_id").alias("d1"), F.col("x").alias("x1"),
                 F.col("y").alias("y1"), cx.alias("bcx"), cy.alias("bcy"))
        .crossJoin(F.broadcast(offsets))
        .select("d1", "x1", "y1",
                (F.col("bcx") + F.col("dx")).alias("cx"),
                (F.col("bcy") + F.col("dy")).alias("cy"))
    )
    # Explicit multiplies (not **2 → pow): the oracle multiplies, and
    # pow(x, 2) is not guaranteed to equal x*x to the last ulp.
    ddx = F.col("x1") - F.col("x2")
    ddy = F.col("y1") - F.col("y2")
    d2sq = ddx * ddx + ddy * ddy
    return (
        build.join(probe, ["cx", "cy"])
        .where((F.col("d1") < F.col("d2")) & (d2sq < F.lit(eps * eps)))
        .select("d1", "d2", F.round(F.sqrt(d2sq), 6).alias("dist"))
    )


def _pca_oracle(iters: int = 3) -> str:
    """Unrolled power iteration for the top principal component in
    DuckDB SQL, mirroring q_emb_pca_power step for step: per-dim mean,
    v0 = 1/sqrt(dim), then ``iters`` rounds of u = Σ sᵢ(xᵢ − m) =
    Σ sᵢxᵢ − (Σsᵢ)m with s = x·v − m·v, v ← u/‖u‖. Cross-engine float
    freedom is only aggregate summation order (~1e-15), which power
    iteration contracts rather than amplifies; loadings/λ round at 6."""
    # AS MATERIALIZED everywhere: DuckDB inlines CTE references by
    # default, which re-evaluates the whole iteration chain once per
    # reference — exponential across unrolled rounds (>2 min); with
    # materialization the oracle runs in ~1 s.
    parts = [
        "WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS vec"
        " FROM embeddings),",
        "ex AS MATERIALIZED (SELECT vec_id, generate_subscripts(vec, 1) AS i,"
        " unnest(vec) AS x FROM v),",
        "m AS MATERIALIZED (SELECT i, avg(x) AS mu FROM ex GROUP BY i),",
        "mlist AS MATERIALIZED (SELECT list(mu ORDER BY i) AS ml FROM m),",
        "dim AS MATERIALIZED (SELECT count(*)::BIGINT AS d FROM m),",
        "v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt((SELECT d FROM dim)) AS val"
        " FROM m),",
    ]
    for k in range(1, iters + 1):
        prev = f"v{k - 1}"
        parts.append(
            f"vl{k} AS MATERIALIZED (SELECT list(val ORDER BY i) AS vv FROM {prev}),"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT vec_id,"
            f" list_dot_product(vec, (SELECT vv FROM vl{k}))"
            f" - list_dot_product((SELECT ml FROM mlist), (SELECT vv FROM vl{k}))"
            f" AS s FROM v),"
        )
        parts.append(
            f"u{k} AS MATERIALIZED (SELECT ex.i,"
            f" sum(s{k}.s * ex.x) - (SELECT sum(s) FROM s{k}) * m.mu AS u"
            f" FROM ex JOIN s{k} USING (vec_id) JOIN m ON m.i = ex.i"
            f" GROUP BY ex.i, m.mu),"
        )
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT sqrt(sum(u * u)) AS nrm FROM u{k}),"
        )
        parts.append(
            f"v{k} AS MATERIALIZED (SELECT i, u / (SELECT nrm FROM n{k}) AS val FROM u{k}),"
        )
    parts[-1] = parts[-1][:-1]  # last CTE loses its trailing comma
    parts.append(
        f"SELECT i::INT AS pos, round(val, 6) AS loading,"
        f" round((SELECT nrm FROM n{iters}), 6) AS eigval FROM v{iters}"
    )
    return "\n".join(parts)


@register("q_emb_pca_power", oracle=_pca_oracle(), category="similarity")
def q_emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by distributed
    power iteration (3 rounds, deterministic all-ones init) — the
    dominant-direction diagnostic an embedding pipeline runs to catch
    anisotropy/collapsed dimensions. Covariance is never materialized:
    cov·v = Σ sᵢ(xᵢ − m) with sᵢ = xᵢ·v − m·v needs one pass per round
    computing 64 per-dimension sums + one scalar sum (all map-side
    combined), and only the 64-value model state ever reaches the
    driver — the same model-sized-collect discipline as kmeans_fit.
    Output: (pos, loading, eigval), loadings rounded at 6.

    Oracle: the identical unrolled iteration in SQL (_pca_oracle);
    the only cross-engine float freedom is aggregate summation order,
    which the iteration contracts."""
    import math

    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    ).transform(materialize)
    mu_rows = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mu"))
        .orderBy("pos")
        .collect()
    )
    mu = [r.mu for r in mu_rows]
    dim = len(mu)
    v = [1.0 / math.sqrt(dim)] * dim
    nrm = 0.0
    for _ in range(3):
        vlit = F.array(*[F.lit(x) for x in v])
        mv = 0.0
        for a, b in zip(mu, v):
            mv += a * b
        s = (dot(F.col("v"), vlit) - F.lit(mv)).alias("s")
        rows = emb.select(s, "v")
        agg = rows.agg(
            F.sum("s").alias("ssum"),
            *[F.sum(F.col("s") * F.col("v")[i]).alias(f"u{i}") for i in range(dim)],
        ).collect()[0]
        u = [agg[f"u{i}"] - agg["ssum"] * mu[i] for i in range(dim)]
        acc = 0.0
        for x in u:
            acc += x * x
        nrm = math.sqrt(acc)
        v = [x / nrm for x in u]
    out = [(i + 1, round(v[i], 6), round(nrm, 6)) for i in range(dim)]
    return spark.createDataFrame(out, "pos INT, loading DOUBLE, eigval DOUBLE")


@register(
    "q_ml_knn_classify",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS true_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.qid, q.true_label, e.label, e.vec_id,
             round(list_dot_product(q.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS sim
      FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    nn AS (
      SELECT qid, true_label, label, sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, vec_id) AS rnk
      FROM scored QUALIFY rnk <= {_TOP_K}),
    votes AS (
      SELECT qid, true_label, label, count(*)::BIGINT AS n_votes,
             max(sim) AS best_sim
      FROM nn GROUP BY 1, 2, 3)
    SELECT qid, true_label, label AS pred_label, n_votes,
           round(best_sim, 6) AS best_sim FROM (
      SELECT qid, true_label, label, n_votes, best_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY n_votes DESC, best_sim DESC, label)
               AS vr
      FROM votes) WHERE vr = 1
    """,
    category="similarity",
)
def q_ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification: each query vector takes the majority label
    of its {_TOP_K} nearest neighbors by cosine (ties broken by best
    similarity, then label) — the label-propagation / weak-labeling
    primitive a curation pipeline uses to extend a small labeled seed
    set. Reuses the broadcast-query + WindowGroupLimit top-k shape;
    the vote is a tiny per-query aggregate on top.

    Exactness: sims ride the bitwise-identical sequential dot fold
    rounded at 6; votes and tie-breaks are integer/lexicographic, so
    the prediction cannot disagree cross-engine."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", as_double("embedding").alias("v")
        )
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "label",
            "vec_id",
            F.round(
                cosine_prenorm(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    nn = scored.withColumn("rnk", F.row_number().over(wk)).where(
        F.col("rnk") <= _TOP_K
    )
    votes = nn.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes"), F.max("sim").alias("best_sim")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("n_votes").desc(), F.col("best_sim").desc(), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "qid",
            "true_label",
            F.col("label").alias("pred_label"),
            "n_votes",
            F.round("best_sim", 6).alias("best_sim"),
        )
    )


_LR_STEPS = 3
_LR_RATE = 0.5


def _logreg_oracle(steps: int = _LR_STEPS, lr: float = _LR_RATE) -> str:
    """Unrolled full-batch gradient descent for logistic regression in
    DuckDB SQL, mirroring q_ml_logreg step for step (w0 = 0, p =
    1/(1+exp(-(b + w1·x1 + w2·x2))), w ← w − lr·Σ(p−y)x/n). All CTEs
    MATERIALIZED (see _pca_oracle for why). Cross-engine float freedom
    is aggregate sum order only; weights round at 6."""
    parts = [
        "WITH x AS MATERIALIZED (SELECT vec_id, (label % 2)::DOUBLE AS y,"
        " embedding[1]::DOUBLE AS x1, embedding[2]::DOUBLE AS x2"
        " FROM embeddings),",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM x),",
        "w0 AS MATERIALIZED (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2),",
    ]
    z = (
        "((SELECT b FROM {p}) + (SELECT w1 FROM {p}) * x1"
        " + (SELECT w2 FROM {p}) * x2)"
    )
    for k in range(1, steps + 1):
        zp = z.format(p=f"w{k - 1}")
        parts.append(
            f"g{k} AS MATERIALIZED (SELECT sum(p - y) AS g0,"
            f" sum((p - y) * x1) AS g1, sum((p - y) * x2) AS g2 FROM ("
            f"SELECT y, x1, x2, 1 / (1 + exp(-{zp})) AS p FROM x)),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT"
            f" (SELECT b FROM w{k - 1}) - {lr} * g0 / (SELECT n FROM nn) AS b,"
            f" (SELECT w1 FROM w{k - 1}) - {lr} * g1 / (SELECT n FROM nn) AS w1,"
            f" (SELECT w2 FROM w{k - 1}) - {lr} * g2 / (SELECT n FROM nn) AS w2"
            f" FROM g{k}),"
        )
    zf = z.format(p=f"w{steps}")
    parts.append(
        f"acc AS MATERIALIZED (SELECT sum(CASE WHEN"
        f" (CASE WHEN 1 / (1 + exp(-{zf})) > 0.5 THEN 1.0 ELSE 0.0 END) = y"
        f" THEN 1 ELSE 0 END)::BIGINT AS n_correct FROM x)"
    )
    parts.append(
        f"SELECT 0 AS coef_idx, round((SELECT b FROM w{steps}), 6) AS weight,"
        f" (SELECT n_correct FROM acc) AS n_correct"
        f" UNION ALL SELECT 1, round((SELECT w1 FROM w{steps}), 6),"
        f" (SELECT n_correct FROM acc)"
        f" UNION ALL SELECT 2, round((SELECT w2 FROM w{steps}), 6),"
        f" (SELECT n_correct FROM acc)"
    )
    return "\n".join(parts)


@register("q_ml_logreg", oracle=_logreg_oracle(), category="similarity")
def q_ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (full-batch gradient descent,
    {steps} steps, lr {rate}) on two embedding dimensions predicting
    label parity — the iterative-optimizer pattern: per step ONE
    map-side-combined aggregate of the 3 gradient sums reaches the
    driver (model-sized, like kmeans centroids / PCA state), the data
    never moves. Emits the learned coefficients and the training
    accuracy under the final weights.

    Exactness: the sigmoid/gradient expressions run the identical
    IEEE sequence on both engines from the same integers/doubles;
    the only cross-engine freedom is gradient-sum order (~1e-15),
    which GD does not amplify at these step counts; weights round at
    6 and accuracy is an integer count."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("double").alias("y"),
        F.element_at("embedding", 1).cast("double").alias("x1"),
        F.element_at("embedding", 2).cast("double").alias("x2"),
    )
    x = spread(emb).transform(materialize)
    n = float(x.count())
    b, w1, w2 = 0.0, 0.0, 0.0
    for _ in range(_LR_STEPS):
        z = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = x.agg(
            F.sum(p - F.col("y")).alias("g0"),
            F.sum((p - F.col("y")) * F.col("x1")).alias("g1"),
            F.sum((p - F.col("y")) * F.col("x2")).alias("g2"),
        ).collect()[0]
        b = b - _LR_RATE * g.g0 / n
        w1 = w1 - _LR_RATE * g.g1 / n
        w2 = w2 - _LR_RATE * g.g2 / n
    zf = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
    pf = F.lit(1.0) / (F.lit(1.0) + F.exp(-zf))
    yp = F.when(pf > 0.5, F.lit(1.0)).otherwise(F.lit(0.0))
    n_correct = (
        x.agg(F.sum(F.when(yp == F.col("y"), 1).otherwise(0)).cast("long").alias("c"))
        .collect()[0]
        .c
    )
    out = [(0, round(b, 6), n_correct), (1, round(w1, 6), n_correct),
           (2, round(w2, 6), n_correct)]
    return spark.createDataFrame(
        out, "coef_idx INT, weight DOUBLE, n_correct BIGINT"
    )


q_ml_logreg.__doc__ = q_ml_logreg.__doc__.format(steps=_LR_STEPS, rate=_LR_RATE)


# MMR reranking: candidate pool size, picks, and the λ=0.5 trade-off
# kept integer by doubling (score = 2·rel − max-sim-to-selected).
_MMR_POOL = 20
_MMR_K = 5

_MMR_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " z -> z[1] * z[2]), 'sum')::BIGINT"
)


def _mmr_oracle() -> str:
    head = f"""
    WITH pts AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT)
               AS q
      FROM embeddings),
    rel AS (
      SELECT p.vec_id,
             {_MMR_DOT.format(a="p.q", b="(SELECT q FROM pts WHERE vec_id = 0)")}
               AS rel
      FROM pts p WHERE p.vec_id <> 0),
    cand AS (
      SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}),
    sims AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2,
             {_MMR_DOT.format(a="pa.q", b="pb.q")} AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
      JOIN pts pa ON pa.vec_id = a.vec_id
      JOIN pts pb ON pb.vec_id = b.vec_id),
    r1 AS (
      SELECT vec_id, rel, 2 * rel AS mmr
      FROM cand ORDER BY 2 * rel DESC, vec_id LIMIT 1)"""
    parts = [head]
    for i in range(2, _MMR_K + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT vec_id FROM r{j}" for j in range(1, i)
        )
        parts.append(f"""
    sel{i - 1} AS ({prev_sel}),
    r{i} AS (
      SELECT c.vec_id, c.rel,
             2 * c.rel - (SELECT max(s.sim) FROM sims s
                          WHERE s.v2 = c.vec_id
                            AND s.v1 IN (SELECT vec_id FROM sel{i - 1}))
               AS mmr
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      ORDER BY mmr DESC, c.vec_id LIMIT 1)""")
    ranks = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS rank, vec_id, rel, mmr FROM r{i}"
        for i in range(1, _MMR_K + 1)
    )
    return ",".join(parts) + f"\n    SELECT rank, vec_id, rel, mmr FROM ({ranks})"


@register("q_llm_mmr_rerank", oracle=_mmr_oracle(), category="similarity")
def q_llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein): greedily pick 5 of the top-20 candidates maximizing
    2·relevance − max-similarity-to-already-picked — the diversity
    reranker a curation pipeline runs so an eval set or few-shot pool
    isn't five copies of the same near-duplicate. λ = 0.5, kept
    integer by doubling.

    Architecture (the scale statement): candidate generation is the
    distributed half — quantized integer dot products against the
    query vector, TakeOrdered top-20, then the 20×20 similarity
    matrix via an equi-join on the candidate set. The greedy
    selection itself runs on the COLLECTED candidate head (≤ pool²
    sim rows) — rerankers are head-sized by definition; shipping 400
    rows to the driver is the correct plan, re-shuffling the corpus
    per pick is not.

    Exactness: vectors quantize to integer thousandths (the
    q_llm_embed_quantize lane), so relevance, pairwise sims, and the
    greedy argmax (mmr desc, vec_id asc tie-break) are pure integer
    arithmetic — the oracle unrolls the same 5 picks as CTEs and
    agrees bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("q"),
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("q").alias("qq"))
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, x: s + x
    )
    rel = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "q", dot(F.col("q"), F.col("qq")).alias("rel"))
    )
    # Materialize the 20-row head once: cand feeds BOTH sides of the
    # sim self-join and the rels collect — without this the embeddings
    # scan + TakeOrdered would run three times.
    cand = (
        rel.orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_POOL)
        .transform(materialize)
    )
    a = cand.select(F.col("vec_id").alias("v1"), F.col("q").alias("q1"))
    b = cand.select(F.col("vec_id").alias("v2"), F.col("q").alias("q2"))
    sims = (
        a.join(b, F.col("v1") != F.col("v2"))
        .select("v1", "v2", dot(F.col("q1"), F.col("q2")).alias("sim"))
        .collect()
    )  # ≤ pool² rows — the head-sized reranker input
    rels = {r.vec_id: r.rel for r in cand.select("vec_id", "rel").collect()}
    sim = {(r.v1, r.v2): r.sim for r in sims}
    picked: list[tuple[int, int, int, int]] = []
    chosen: list[int] = []
    for rank in range(1, _MMR_K + 1):
        best = None
        for v, rv in rels.items():
            if v in chosen:
                continue
            penalty = max((sim[(s, v)] for s in chosen), default=0)
            score = 2 * rv - penalty
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, rv, score)
        picked.append((rank, best[1], best[2], best[3]))
        chosen.append(best[1])
    return spark.createDataFrame(
        picked, "rank BIGINT, vec_id BIGINT, rel BIGINT, mmr BIGINT"
    )


def _eval_metrics_oracle() -> str:
    from batchprocessor_spark.plans.registry import REGISTRY

    preds = REGISTRY["q_ml_knn_classify"].oracle
    return f"""
    WITH preds AS ({preds}),
    classes AS (
      SELECT DISTINCT true_label AS lab FROM preds
      UNION SELECT DISTINCT pred_label FROM preds),
    m AS (
      SELECT c.lab,
             (SELECT count(*) FROM preds
              WHERE true_label = c.lab AND pred_label = c.lab)::BIGINT AS tp,
             (SELECT count(*) FROM preds
              WHERE pred_label = c.lab AND true_label <> c.lab)::BIGINT AS fp,
             (SELECT count(*) FROM preds
              WHERE true_label = c.lab AND pred_label <> c.lab)::BIGINT AS fn
      FROM classes c)
    SELECT lab AS label, tp, fp, fn,
           (CASE WHEN tp + fp > 0 THEN (10000 * tp) // (tp + fp) END)::BIGINT
             AS precision_bp,
           (CASE WHEN tp + fn > 0 THEN (10000 * tp) // (tp + fn) END)::BIGINT
             AS recall_bp,
           (CASE WHEN tp > 0 THEN
              (2 * ((10000 * tp) // (tp + fp)) * ((10000 * tp) // (tp + fn)))
                // (((10000 * tp) // (tp + fp)) + ((10000 * tp) // (tp + fn)))
            END)::BIGINT AS f1_bp
    FROM m
    """


@register("q_ml_eval_metrics", oracle=_eval_metrics_oracle(), category="ml")
def q_ml_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class classifier evaluation — confusion counts and
    precision/recall/F1 over the k-NN weak-labeler's predictions
    (q_ml_knn_classify): the model-quality ledger every labeling
    pipeline publishes next to its outputs. Composes the registered
    prediction query unchanged (the oracle nests the SAME prediction
    SQL as a CTE, so the two stay in lockstep by construction).

    Exactness: the confusion cells are integer counts; precision,
    recall and the F1 harmonic mean are integer basis points built
    ONLY from integer DIV (F1 from the already-floored p and r —
    stated definition, both engines replay it). Zero-support guards
    emit NULL, canonicalized identically.

    Scale posture: predictions are qid-sized; the metric table is one
    conditional aggregate per confusion role joined on the class list
    — class-cardinality rows, trivial at any scale. The expensive
    half (prediction) keeps its own documented shape."""
    preds = q_ml_knn_classify(spark, sf_dir).select("true_label", "pred_label")
    preds = preds.transform(materialize)  # one prediction pass, three views
    classes = (
        preds.select(F.col("true_label").alias("lab"))
        .union(preds.select(F.col("pred_label").alias("lab")))
        .distinct()
    )
    tp = (
        preds.filter(F.col("true_label") == F.col("pred_label"))
        .groupBy(F.col("true_label").alias("lab"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    fp = (
        preds.filter(F.col("true_label") != F.col("pred_label"))
        .groupBy(F.col("pred_label").alias("lab"))
        .agg(F.count(F.lit(1)).alias("fp"))
    )
    fn = (
        preds.filter(F.col("true_label") != F.col("pred_label"))
        .groupBy(F.col("true_label").alias("lab"))
        .agg(F.count(F.lit(1)).alias("fn"))
    )
    m = (
        classes.join(tp, "lab", "left")
        .join(fp, "lab", "left")
        .join(fn, "lab", "left")
        .select(
            "lab",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    p = F.expr("CASE WHEN tp + fp > 0 THEN (10000 * tp) div (tp + fp) END")
    r = F.expr("CASE WHEN tp + fn > 0 THEN (10000 * tp) div (tp + fn) END")
    f1 = F.expr(
        "CASE WHEN tp > 0 THEN"
        " (2 * ((10000 * tp) div (tp + fp)) * ((10000 * tp) div (tp + fn)))"
        " div (((10000 * tp) div (tp + fp)) + ((10000 * tp) div (tp + fn)))"
        " END"
    )
    return m.select(
        F.col("lab").alias("label"),
        "tp",
        "fp",
        "fn",
        p.cast("long").alias("precision_bp"),
        r.cast("long").alias("recall_bp"),
        f1.cast("long").alias("f1_bp"),
    )


_STD_MEAN = "(s_q / n)"
_STD_STD = f"sqrt(s_qq / n - {_STD_MEAN} * {_STD_MEAN})"
_STD_Z = f"((q - {_STD_MEAN}) / {_STD_STD})"


@register(
    "q_emb_standardize",
    oracle=f"""
    WITH x AS (
      SELECT e.vec_id, u.i AS dim,
             round(e.embedding[u.i]::DOUBLE * 1000000)::BIGINT AS q
      FROM embeddings e, unnest(generate_series(1, 64)) AS u(i)),
    m AS (
      SELECT dim, count(*)::BIGINT AS n,
             sum(q)::DOUBLE AS s_q,
             sum(q * q)::DOUBLE AS s_qq
      FROM x GROUP BY dim),
    z AS (
      SELECT x.dim, m.n, {_STD_Z} AS z
      FROM x JOIN m ON x.dim = m.dim)
    SELECT dim, n,
           sum(round(z * 1000)::BIGINT)::BIGINT AS z_checksum,
           round(min(z), 6) AS z_min,
           round(max(z), 6) AS z_max
    FROM z GROUP BY dim, n
    """,
    category="embedding",
)
def q_emb_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding standardization (mean-center + unit
    variance) — the preprocessing every embedding-space method
    (whitening, cosine with centered vectors, PCA input) applies
    first: explode the 64-dim vectors, per-dim population moments,
    z = (v − μ_d)/σ_d. Exactness: float components quantize to 1e-6
    integer units FIRST (float→double widening is exact, so both
    engines derive the identical BIGINT), the moments are exact
    integer sums, and the z stage is one shared formula text
    (q_ml_linreg_normal_eq discipline); the per-dim audit emits a
    milli-z integer checksum + rounded extrema rather than 32k
    per-value rows.

    Scale posture: the classic moment-then-score two-pass — per-dim
    moments are a 64-row aggregate BROADCAST back onto the second
    exploded pass (never a window over the exploded fact); explode
    fan-out is dim x rows with map-side combine on the moment side.
    At 100 TB with 4k dims this is the same two aggregates, 4k-row
    broadcast."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim0", "valf"),
    ).select(
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("valf").cast("double") * 1000000)
        .cast("long")
        .alias("q"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("q"))).cast("double").alias("s_q"),
        F.sum(dec(F.col("q") * F.col("q"))).cast("double").alias("s_qq"),
    )
    z = x.join(F.broadcast(m), "dim").selectExpr(
        "dim", "n", f"{_STD_Z} AS z"
    )
    return z.groupBy("dim", "n").agg(
        F.sum(F.round(F.col("z") * 1000).cast("long"))
        .cast("long")
        .alias("z_checksum"),
        F.round(F.min("z"), 6).alias("z_min"),
        F.round(F.max("z"), 6).alias("z_max"),
    )


@register(
    "q_emb_cosine_hist",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM v a JOIN v b ON b.vec_id = a.vec_id + 1),
    binned AS (
      SELECT CASE WHEN cos >= 1.0 THEN 9
                  ELSE floor(cos * 10)::BIGINT END AS bin,
             cos
      FROM pairs)
    SELECT bin,
           count(*)::BIGINT AS n_pairs,
           round(sum(cos), 6) AS sum_cos
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    category="similarity",
)
def q_emb_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health histogram: the distribution of cosine
    similarities over the deterministic chain of adjacent vec_id
    pairs — the cheap isotropy probe run per embedding-model rollout
    (a healthy space concentrates near 0 for unrelated docs; a
    collapsed space piles up near 1, which silently breaks every
    cosine-thresholded dedup downstream). Linear in the corpus (one
    equi-join on vec_id+1, never all-pairs); cosine per pair is the
    same sequential fold order as the DuckDB list_dot_product with
    IEEE sqrt, so the bin assignment (floor(10·cos), top edge closed)
    is bit-identical; per-bin cosine sums are 6-dp rounded.

    Scale posture: one shuffle-free-ish equi-join (both sides the
    same sorted key — AQE plans broadcast/SMJ as size dictates), one
    bounded 20-bin aggregate. No windows, no collects."""
    v = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )
    a = v.select(F.col("vec_id"), F.col("v").alias("va"))
    b = v.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("v").alias("vb")
    )
    pairs = a.join(b, "vec_id").select(
        (
            dot(F.col("va"), F.col("vb"))
            / (l2_norm(F.col("va")) * l2_norm(F.col("vb")))
        ).alias("cos")
    )
    binned = pairs.select(
        F.when(F.col("cos") >= 1.0, F.lit(9))
        .otherwise(F.floor(F.col("cos") * 10))
        .cast("long")
        .alias("bin"),
        "cos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("cos"), 6).alias("sum_cos"),
        )
        .orderBy("bin")
    )


# ------------------------------------------------------------------ SQ ANN

_SQ_LEVELS = 16  # 4-bit scalar quantization

_SQ_ORACLE = f"""
    WITH g AS (
      SELECT min(u) AS gmin, max(u) AS gmax
      FROM (SELECT unnest(embedding::DOUBLE[]) AS u FROM embeddings)),
    codes AS (
      SELECT vec_id,
             list_transform(
               embedding::DOUBLE[],
               x -> least({_SQ_LEVELS - 1}, greatest(0,
                      floor((x - g.gmin) * {_SQ_LEVELS}.0
                            / (g.gmax - g.gmin))))::DOUBLE
             ) AS code
      FROM embeddings, g),
    sq AS (
      SELECT vec_id, code,
             round(list_dot_product(code, code))::BIGINT AS cc
      FROM codes),
    q AS (SELECT vec_id AS qid, code AS qcode, cc AS qcc
          FROM sq WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.qid, s.vec_id,
             (q.qcc + s.cc
              - 2 * round(list_dot_product(q.qcode, s.code))::BIGINT)
               AS dist_sq
      FROM q JOIN sq s ON s.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, dist_sq,
             row_number() OVER (PARTITION BY qid
               ORDER BY dist_sq, vec_id) AS rnk
      FROM scored)
    SELECT qid, vec_id, dist_sq, rnk FROM ranked WHERE rnk <= {_TOP_K}
"""


@register("q_llm_simsearch_sq", oracle=_SQ_ORACLE, category="similarity")
def q_llm_simsearch_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ4) approximate nearest neighbors: every
    embedding dimension is quantized onto a 16-level global grid and
    neighbors rank by the INTEGER symmetric distance between code
    vectors — the memory-bound scale path of the PQ/SQ family
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search"). At 100 TB the win is the representation: 4 bits/dim vs
    32 (an 8× smaller corpus scan, integer-only distance arithmetic);
    recall vs exact cosine is pinned by
    tests/test_similarity_sq.py on the same fixture.

    Cross-engine exactness: the grid bounds are global min/max
    aggregates (exact), the level index is one identically-written
    IEEE expression floor((x-gmin)*16.0/(gmax-gmin)) on both engines,
    and from there everything is integer — distances expand to
    qq + xx - 2*qx over exact small-int dot products, so the hash
    cannot drift. No training step (vs k-means codebooks): the grid
    is deterministic, which is what makes the SQL twin possible.

    Scale posture: one pass computes the global grid (map-side
    min/max, broadcast back); encoding is a per-row transform (no
    shuffle); queries broadcast; ranking is the same per-query
    WindowGroupLimit as exact top-k. The corpus never shuffles."""
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )
    g = emb.select(F.explode("v").alias("u")).agg(
        F.min("u").alias("gmin"), F.max("u").alias("gmax")
    )
    lvl = lambda x: F.least(  # noqa: E731 - inline quantizer
        F.lit(_SQ_LEVELS - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (x - F.col("gmin")) * _SQ_LEVELS / (F.col("gmax") - F.col("gmin"))
            ),
        ),
    ).cast("double")
    codes = emb.crossJoin(F.broadcast(g)).select(
        "vec_id", F.transform("v", lvl).alias("code")
    )
    sq = codes.withColumn("cc", F.round(dot(F.col("code"), F.col("code"))).cast("long"))
    q = sq.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("code").alias("qcode"),
        F.col("cc").alias("qcc"),
    )
    scored = (
        F.broadcast(q)
        .join(sq, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                F.col("qcc")
                + F.col("cc")
                - 2 * F.round(dot(F.col("qcode"), F.col("code"))).cast("long")
            ).alias("dist_sq"),
        )
    )
    w = Window.partitionBy("qid").orderBy("dist_sq", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
    )


# Standardized mean difference between the two label halves, one
# shared formula text over identically-named double columns (see
# q_ml_linreg_normal_eq discipline): identical op sequence on both
# engines => bit-identical doubles.
_DRIFT_SMD = (
    "(sa / na - sb / nb) / "
    "sqrt(((sqqa - (sa / na) * sa) + (sqqb - (sb / nb) * sb)) / (na + nb))"
)


@register(
    "q_emb_dim_drift",
    oracle=f"""
    WITH x AS (
      SELECT e.label % 2 AS grp, u.i AS dim,
             round(e.embedding[u.i]::DOUBLE * 1000000)::BIGINT AS q
      FROM embeddings e, unnest(generate_series(1, 64)) AS u(i)),
    m AS (
      SELECT dim,
             sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CASE WHEN grp = 0 THEN q END)::BIGINT AS s_a,
             sum(CASE WHEN grp = 1 THEN q END)::BIGINT AS s_b,
             sum(CASE WHEN grp = 0 THEN q * q END)::BIGINT AS sqq_a,
             sum(CASE WHEN grp = 1 THEN q * q END)::BIGINT AS sqq_b
      FROM x GROUP BY dim),
    d AS (
      SELECT dim, n_a, n_b,
             (s_a * n_b - s_b * n_a)::BIGINT AS diff_num,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             s_a::DOUBLE AS sa, s_b::DOUBLE AS sb,
             sqq_a::DOUBLE AS sqqa, sqq_b::DOUBLE AS sqqb
      FROM m)
    SELECT dim, n_a, n_b, diff_num, round({_DRIFT_SMD}, 6) AS smd
    FROM d
    """,
    category="embedding",
)
def q_emb_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding DRIFT between two populations (the
    label halves stand in for e.g. last week's corpus vs this week's,
    or encoder v1 vs v2): for each of the 64 dimensions, the
    standardized mean difference (Cohen's-d-style, pooled population
    variance) plus an EXACT integer cross-moment (s_a·n_b − s_b·n_a,
    the mean-difference numerator in 1e-6 units × n_a·n_b) that flags
    any drift without a float anywhere. This is the embedding-QA
    check a retrieval pipeline runs before swapping in a re-encoded
    corpus — a shifted dimension breaks every cached dot product.
    Exactness: components quantize to 1e-6 integer units first, group
    moments are exact integer sums, and the SMD stage is one shared
    formula text over identically-named double columns.

    Scale posture: one explode + one 64-row conditional aggregate
    with map-side combine — per-row work is dims×2 adds; no window,
    no join, no second pass (contrast q_emb_standardize, which needs
    the broadcast-back because its OUTPUT is per-value). At 100 TB
    and 4k dims this stays a single shuffle of 4k rows per mapper."""
    e = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    x = e.select(
        (F.col("label") % 2).alias("grp"),
        F.posexplode("embedding").alias("dim0", "valf"),
    ).select(
        "grp",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("valf").cast("double") * 1000000).cast("long").alias("q"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = F.col("grp") == 0
    b = F.col("grp") == 1
    m = x.groupBy("dim").agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(a, dec(F.col("q")))).cast("long").alias("s_a"),
        F.sum(F.when(b, dec(F.col("q")))).cast("long").alias("s_b"),
        F.sum(F.when(a, dec(F.col("q") * F.col("q")))).cast("long").alias("sqq_a"),
        F.sum(F.when(b, dec(F.col("q") * F.col("q")))).cast("long").alias("sqq_b"),
    )
    d = m.selectExpr(
        "dim",
        "n_a",
        "n_b",
        "CAST(s_a * n_b - s_b * n_a AS BIGINT) AS diff_num",
        "CAST(n_a AS DOUBLE) AS na",
        "CAST(n_b AS DOUBLE) AS nb",
        "CAST(s_a AS DOUBLE) AS sa",
        "CAST(s_b AS DOUBLE) AS sb",
        "CAST(sqq_a AS DOUBLE) AS sqqa",
        "CAST(sqq_b AS DOUBLE) AS sqqb",
    )
    return d.selectExpr(
        "dim", "n_a", "n_b", "diff_num", f"round({_DRIFT_SMD}, 6) AS smd"
    )


# ------------------------------------------------------------------ PQ ANN

_PQ_M = 16  # subspaces
_PQ_SUBD = 4  # dims per subspace (16 x 4 = the 64-dim embeddings)
_PQ_K = 16  # centroids per subspace codebook (4-bit codes)
_PQ_ITERS = 2  # Lloyd rounds per subspace, unrolled in the oracle


def _pq_isqd(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two BIGINT arrays.
    Sum of 1e-6-unit squares: |x| <= ~2e6 per component, squared
    ~4e12, x4 components ~2e13 — comfortably inside BIGINT, and
    integer addition is order-free so the fold order cannot matter."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, s, sv): the corpus quantized to 1e-6 integer units
    (the q_emb_dim_drift lane — round(x*1e6) is the one float op,
    identical on both engines) and split into _PQ_M contiguous
    subvectors per vector. One scan, one explode, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            as_double("embedding"), lambda x: F.round(x * 1000000).cast("long")
        ).alias("q"),
    )
    return emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("s"),
        "q",
    ).select(
        "vec_id",
        "s",
        F.slice(F.col("q"), F.col("s") * _PQ_SUBD + 1, _PQ_SUBD).alias("sv"),
    )


def _pq_cents_df(spark: SparkSession, cents: list) -> DataFrame:
    """Codebook rows (s, cid, cv) as a literal frame — model-sized
    (_PQ_M x _PQ_K = 256 rows), sorted so the frame is reproducible."""
    return spark.createDataFrame(
        sorted((s, cid, list(cv)) for s, cid, cv in cents),
        "s INT, cid INT, cv ARRAY<BIGINT>",
    )


def _pq_assign(sub: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Nearest-codeword assignment per (vec_id, s): broadcast the
    per-subspace codebook as ONE struct array row per s and take a
    per-row array_min over (d, cid) structs — lexicographic struct
    comparison = exact integer argmin with lower-cid tie-break, zero
    shuffle on the corpus (the crossJoin-then-window alternative
    shuffles every subvector)."""
    cagg = F.broadcast(
        cents_df.groupBy("s").agg(
            F.collect_list(F.struct("cid", "cv")).alias("cs")
        )
    )
    scored = F.transform(
        "cs",
        lambda c: F.struct(
            _pq_isqd(F.col("sv"), c["cv"]).alias("d"), c["cid"].alias("cid")
        ),
    )
    return sub.join(cagg, "s").select(
        "vec_id", "s", "sv", F.array_min(scored)["cid"].alias("cid")
    )


def _pq_fit(spark: SparkSession, sub: DataFrame) -> list:
    """Per-subspace Lloyd k-means on the integer subvectors —
    init = the _PQ_K lowest vec_ids' subvectors (cid = rank of
    vec_id), then _PQ_ITERS rounds of exact-integer argmin assignment
    followed by truncated-integer-mean centroid update
    (sum(x) DIV count — Spark's div and DuckDB's // both truncate
    toward zero, verified; empty clusters keep their previous
    codeword). EVERYTHING is integer arithmetic, so unlike float
    k-means (kmeans_fit's sorted-partial merging) the trajectory is
    bit-reproducible for free and the unrolled DuckDB oracle replays
    it exactly. Per-round driver traffic is the 256-row codebook —
    model-sized, never the corpus."""
    first = sub.orderBy("vec_id", "s").limit(_PQ_K * _PQ_M).collect()
    ids = sorted({r.vec_id for r in first})
    cents = [(r.s, ids.index(r.vec_id), list(r.sv)) for r in first]
    for _ in range(_PQ_ITERS):
        assigned = _pq_assign(sub, _pq_cents_df(spark, cents))
        m = (
            assigned.select("s", "cid", F.posexplode("sv").alias("j", "x"))
            .groupBy("s", "cid", "j")
            .agg(F.expr("CAST(sum(x) DIV count(1) AS BIGINT)").alias("mv"))
        )
        rows = (
            m.groupBy("s", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mv"))),
                    lambda t: t["mv"],
                ).alias("cv")
            )
            .collect()
        )
        got = {(r.s, r.cid): list(r.cv) for r in rows}
        cents = [(s, cid, got.get((s, cid), cv)) for s, cid, cv in cents]
    return cents


def _pq_oracle() -> str:
    """Unrolled PQ trajectory as DuckDB SQL — quantize, slice into
    subspaces, init codebooks from the _PQ_K lowest vec_ids, _PQ_ITERS
    exact-integer Lloyd rounds per subspace, encode, ADC score, rank.
    Same discipline as _kmeans_oracle, with the float freedom REMOVED:
    after round(x*1e6) every quantity is an integer, so the hash
    cannot drift by summation order."""
    m, subd, k, nq, topk = _PQ_M, _PQ_SUBD, _PQ_K, _N_QUERIES, _TOP_K

    def dist(va: str, vb: str) -> str:
        return (
            f"list_sum(list_transform(range({subd}), i ->"
            f" ({va}[i+1] - {vb}[i+1]) * ({va}[i+1] - {vb}[i+1])))"
        )

    parts = [
        "WITH v AS (SELECT vec_id,",
        "  list_transform(embedding::DOUBLE[],"
        " x -> round(x * 1000000)::BIGINT) AS q FROM embeddings),",
        f"ss AS (SELECT unnest(range({m})) AS s),",
        f"sub AS (SELECT vec_id, s,"
        f" list_slice(q, s*{subd}+1, s*{subd}+{subd}) AS sv FROM v, ss),",
        "c0 AS (SELECT s,"
        " row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cid,"
        " sv AS cv FROM sub"
        f" WHERE vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT {k})),",
    ]
    assign = (
        "{name} AS (SELECT vec_id, s, sv, cid FROM (\n"
        "  SELECT b.vec_id, b.s, b.sv, c.cid,\n"
        "         row_number() OVER (PARTITION BY b.vec_id, b.s\n"
        "           ORDER BY " + dist("b.sv", "c.cv") + ", c.cid) AS rn\n"
        "  FROM sub b JOIN {prev} c ON c.s = b.s) WHERE rn = 1),"
    )
    for it in range(1, _PQ_ITERS + 1):
        parts.append(assign.format(name=f"a{it}", prev=f"c{it - 1}"))
        parts.append(
            f"m{it} AS (SELECT s, cid, list(mv ORDER BY j) AS cv FROM (\n"
            f"  SELECT s, cid, j, (sum(x) // count(*))::BIGINT AS mv FROM (\n"
            f"    SELECT s, cid, generate_subscripts(sv, 1) AS j,\n"
            f"           unnest(sv) AS x FROM a{it})\n"
            f"  GROUP BY s, cid, j) GROUP BY s, cid),"
        )
        parts.append(
            f"c{it} AS (SELECT p.s, p.cid, coalesce(m.cv, p.cv) AS cv\n"
            f"  FROM c{it - 1} p LEFT JOIN m{it} m"
            f" ON m.s = p.s AND m.cid = p.cid),"
        )
    parts.append(assign.format(name="f", prev=f"c{_PQ_ITERS}"))
    parts.append(
        f"lut AS (SELECT b.vec_id AS qid, c.s, c.cid,\n"
        f"  ({dist('b.sv', 'c.cv')})::BIGINT AS d\n"
        f"  FROM sub b JOIN c{_PQ_ITERS} c ON c.s = b.s"
        f" WHERE b.vec_id < {nq}),"
    )
    parts.append(
        "scored AS (SELECT l.qid, f.vec_id, sum(l.d)::BIGINT AS adist\n"
        "  FROM f JOIN lut l ON l.s = f.s AND l.cid = f.cid"
        " AND f.vec_id <> l.qid\n"
        "  GROUP BY l.qid, f.vec_id)"
    )
    parts.append(
        "SELECT qid, vec_id, adist, rnk FROM (\n"
        "  SELECT qid, vec_id, adist,\n"
        "         row_number() OVER (PARTITION BY qid"
        " ORDER BY adist, vec_id) AS rnk\n"
        f"  FROM scored) WHERE rnk <= {topk}"
    )
    return "\n".join(parts)


@register("q_llm_simsearch_pq", oracle=_pq_oracle(), category="similarity")
def q_llm_simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"): the 64-dim corpus splits into 16
    contiguous 4-dim subspaces, each learns a 16-codeword codebook
    (2 exact-integer Lloyd rounds, deterministic init), every vector
    encodes as 16 4-bit codes (1 bit/dim — a 64x smaller corpus than
    float32), and queries rank the corpus by the asymmetric distance
    (ADC) — the sum over subspaces of the query-subvector-to-codeword
    distance looked up from a per-query table. Completes the
    quantization family: SQ4 (q_llm_simsearch_sq) is the
    training-free grid path at 4 bits/dim, PQ is the trained path at
    a further 4x compression.

    Cross-engine exactness: components quantize to 1e-6 integer units
    first (the q_emb_dim_drift lane), then EVERY quantity — training
    distances, truncated-mean centroid updates (div/​// both truncate
    toward zero), codes, LUT entries, ADC sums — is exact BIGINT
    arithmetic, so the unrolled SQL oracle replays the full iterative
    trajectory bit-identically; ranks tie-break (adist, vec_id).

    Scale posture: the corpus is scanned through a scoped cache
    (cache → train/encode → materialize → unpersist, the minhash
    pattern) so the 2 training rounds + final encode never re-read
    parquet; per-round driver traffic is the 256-row codebook;
    encoding is a broadcast-codebook per-row argmin (zero corpus
    shuffle); the ADC LUT (n_queries x 16 x 16 rows — query-sized,
    not corpus-sized) broadcasts onto the CODE table, and the only
    corpus-sized exchange is the (qid, vec_id) partial-aggregated
    16-term sum + per-query WindowGroupLimit, which at 100 TB touches
    8-byte codes instead of 256-byte float vectors — the whole point
    of PQ. Recall vs exact L2 top-k is pinned by
    tests/test_similarity_pq.py."""
    sub = _pq_subvectors(spark, sf_dir).cache()
    try:
        cdf = _pq_cents_df(spark, _pq_fit(spark, sub))
        return _pq_adc_rank(sub, cdf).transform(materialize)
    finally:
        sub.unpersist()


def _pq_adc_rank(sub: DataFrame, cdf: DataFrame) -> DataFrame:
    """Encode + ADC score + rank against a trained codebook — the
    post-fit composition, factored out so tests/test_plans.py gates
    the REGISTERED shape pre-checkpoint (the winnowing-pairs lesson:
    a governor documented but not wired is not a governor)."""
    codes = _pq_assign(sub, cdf).select("vec_id", "s", "cid")
    lut = (
        sub.where(F.col("vec_id") < _N_QUERIES)
        .join(F.broadcast(cdf), "s")
        .select(
            F.col("vec_id").alias("qid"),
            "s",
            "cid",
            _pq_isqd(F.col("sv"), F.col("cv")).alias("d"),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "cid"])
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy("adist", "vec_id")
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= _TOP_K
    )


# ----------------------------------------------------- random projection

_JL_TARGET = 16  # projected dimensions
_JL_SCALE = 1000  # 1e-3 integer units (coarse on purpose — see overflow note)

# Deterministic ±1 projection entry for (source dim i, target dim j):
# bit 16 of Knuth-multiplicative-hashed (i*64+j+1)^2. The SQUARE is
# load-bearing: any AFFINE index hash makes sign depend only on
# parities/linear combos of (i, j) (a checkerboard — every projected
# dim identical up to sign); squaring before the multiply mixes to
# random-matrix quality (measured: max |column dot| 24 vs 26 for a
# true random ±1 draw, max |column sum| 18 vs 14). Pure integer
# arithmetic: max h = 4048, h^2 * 2654435761 ≈ 4.3e16 < 2^63.
_JL_SIGN = (
    "(1 - 2 * ((((({h}) * ({h}) * 2654435761) % 4294967296) {div} 65536) % 2))"
)


def _jl_sign_py(i: int, j: int) -> int:
    """Python twin of _JL_SIGN for the kernel reference test."""
    h = i * 64 + j + 1
    return 1 - 2 * ((((h * h * 2654435761) % 4294967296) // 65536) % 2)


_JL_ORACLE = f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> round(x * {_JL_SCALE})::BIGINT) AS q
      FROM embeddings),
    p AS (
      SELECT vec_id, q,
             list_transform(range({_JL_TARGET}), j ->
               list_sum(list_transform(range(64), i ->
                 q[i+1] * {_JL_SIGN.format(h="i*64 + j + 1", div="//")}))) AS y
      FROM v),
    pairs AS (
      SELECT a.vec_id,
             list_sum(list_transform(range(64), i ->
               (a.q[i+1] - b.q[i+1]) * (a.q[i+1] - b.q[i+1])))::BIGINT AS d_orig,
             list_sum(list_transform(range({_JL_TARGET}), j ->
               (a.y[j+1] - b.y[j+1]) * (a.y[j+1] - b.y[j+1])))::BIGINT AS d_proj
      FROM p a JOIN p b ON b.vec_id = a.vec_id + 1)
    SELECT vec_id, d_orig, d_proj,
           (10000 * d_proj) // nullif({_JL_TARGET} * d_orig, 0) AS ratio_bp
    FROM pairs
"""


@register("q_emb_random_projection", oracle=_JL_ORACLE, category="embedding")
def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection QA: project the 64-dim
    corpus to 16 dims with a DETERMINISTIC dense ±1 matrix (the
    database-side JL transform — Achlioptas, "Database-friendly
    random projections": ±1 entries preserve expected squared
    distances at E[|Ra-Rb|^2] = d_target * |a-b|^2, no Gaussians
    needed) and audit, for every adjacent vec_id pair, the squared
    distance before vs after with the distortion ratio in basis
    points (10000 = distance exactly preserved). This is the check a
    pipeline runs before swapping its ANN index to projected vectors:
    a ratio distribution hugging 10000 says 4x cheaper vectors keep
    neighbor order; a wild one says the target dim is too small.

    Cross-engine exactness: components quantize to 1e-3 integer units
    (coarser than the 1e-6 lane ON PURPOSE — y sums 64 signed terms
    and the ratio multiplies by 10^4, so 1e-6 units could push
    10000 * d_proj past 2^63 on adversarial inputs, while at 1e-3 the
    bound is ~2.6e17), the sign matrix is pure integer arithmetic
    (identical formula text modulo // vs div), projections and both
    distances are exact BIGINT sums, and the ratio is integer
    division with a nullif(0) guard — no float anywhere.

    Scale posture: the projection is a per-row JVM array fold (zero
    shuffle, 64x16 multiply-adds per row — Catalyst folds the
    constant sign into the expression); the adjacent-pair self-join
    is one sort-merge exchange on vec_id; output is pair-sized. At
    100 TB you'd sample the pair audit; the projection itself stays
    embarrassingly parallel."""
    spark_sign = _JL_SIGN.format(h="i*64 + j + 1", div="div")
    v = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_JL_SCALE})"
        " AS BIGINT)) AS q",
    )
    p = v.selectExpr(
        "vec_id",
        "q",
        f"transform(sequence(0, {_JL_TARGET - 1}), j ->"
        "  aggregate(zip_with(q, sequence(0, 63), (x, i) ->"
        f"    x * {spark_sign}), CAST(0 AS BIGINT), (acc, v) -> acc + v)) AS y",
    )
    a = p.select(
        "vec_id", F.col("q").alias("qa"), F.col("y").alias("ya")
    )
    b = p.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("q").alias("qb"),
        F.col("y").alias("yb"),
    )
    return a.join(b, "vec_id").selectExpr(
        "vec_id",
        "aggregate(zip_with(qa, qb, (x, z) -> (x - z) * (x - z)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d_orig",
        "aggregate(zip_with(ya, yb, (x, z) -> (x - z) * (x - z)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d_proj",
    ).selectExpr(
        "vec_id",
        "d_orig",
        "d_proj",
        f"(10000 * d_proj) div nullif({_JL_TARGET} * d_orig, 0) AS ratio_bp",
    )


# ------------------------------------------------------------- isotropy

@register(
    "q_emb_isotropy",
    oracle="""
    WITH x AS (
      SELECT e.label, u.i AS dim,
             round(e.embedding[u.i]::DOUBLE * 1000000)::BIGINT AS q
      FROM embeddings e, unnest(generate_series(1, 64)) AS u(i)),
    pd AS (
      SELECT label, dim, sum(q)::BIGINT AS s_d,
             sum(q::HUGEINT * q)::HUGEINT AS qq_d
      FROM x GROUP BY 1, 2),
    n AS (
      SELECT label, count(*)::BIGINT AS n_vecs
      FROM embeddings GROUP BY 1),
    a AS (
      SELECT label, sum(s_d::HUGEINT * s_d)::HUGEINT AS s2,
             sum(qq_d)::HUGEINT AS q2
      FROM pd GROUP BY 1)
    SELECT a.label, n.n_vecs,
           ((1000000::HUGEINT * a.s2)
            // nullif(n.n_vecs::HUGEINT * a.q2, 0))::BIGINT
             AS mean_mass_ppm,
           (1000000 // n.n_vecs)::BIGINT AS isotropic_baseline_ppm
    FROM a JOIN n USING (label)
    """,
    category="embedding",
)
def q_emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space ISOTROPY audit per label population — the
    collapse detector every retrieval/dedup pipeline should run on a
    new encoder: the share of the corpus's total second moment that
    lives in the mean direction, mean_mass_ppm = 1e6·‖Σv‖² /
    (n·Σ‖v‖²). For a perfectly isotropic cloud (zero-mean directions)
    the expectation is the reported baseline 1e6/n; a collapsed space
    (all vectors near one ray) reads → 1e6. Unlike the adjacent-pair
    cosine histogram (q_emb_cosine_hist) this is a closed-form
    whole-population statistic — no pair sampling, no sqrt, and by
    Cauchy–Schwarz it is exact in [1e6/n·(…), 1e6] rather than an
    estimate.

    Cross-engine exactness: components quantize to 1e-6 integer units
    (float→double widening is exact, identical BIGINTs on both
    engines); per-dim sums, their squares, and the global ratio stay
    in wide-integer lanes end to end (Σ s_d² reaches ~1e23 at sf1 —
    HUGEINT / DECIMAL(38,0)); the output is an integer ppm DIV with a
    nullif guard for the all-zero-vectors population.

    Scale posture: one explode + two bounded aggregates (labels×dims
    rows, then labels rows) with map-side combine, plus a label-grain
    row count off the PRE-explode frame (vec_id is the table key, so
    count(*) per label = the vector count with no per-vector shuffle
    and no second explode — code-review r9 finding #2), one
    labels-sized join AQE plans — no window, no Python. At 100 TB
    with 4k dims the shuffles move labels×4k skinny rows.

    Reference scope: the reference engine has no embedding surface;
    this extends SURVEY.md §2.4's similarity family.
    """
    e = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    x = e.select(
        "label",
        F.posexplode("embedding").alias("dim0", "valf"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("valf").cast("double") * 1000000).cast("long").alias("q"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pd_ = x.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s_d"),
        F.sum(dec(F.col("q")) * F.col("q")).alias("qq_d"),
    )
    n = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    a = pd_.groupBy("label").agg(
        F.sum(dec(F.col("s_d")) * F.col("s_d")).alias("s2"),
        F.sum("qq_d").alias("q2"),
    )
    return a.join(n, "label").selectExpr(
        "label",
        "n_vecs",
        "CAST((CAST(1000000 AS DECIMAL(38, 0)) * s2)"
        " DIV nullif(CAST(n_vecs AS DECIMAL(38, 0)) * q2, 0) AS BIGINT)"
        " AS mean_mass_ppm",
        "CAST(1000000 DIV n_vecs AS BIGINT) AS isotropic_baseline_ppm",
    )


_ANN_RECALL_ORACLE = f"""
    WITH exact AS ({_TOPK_ORACLE}),
    approx AS ({_SQ_ORACLE}),
    hits AS (
      SELECT e.qid, count(a.vec_id)::BIGINT AS n_hits
      FROM exact e LEFT JOIN approx a
        ON a.qid = e.qid AND a.vec_id = e.vec_id
      GROUP BY e.qid),
    tot AS (
      SELECT sum(n_hits)::BIGINT AS h, count(*)::BIGINT AS nq FROM hits)
    SELECT hits.qid, hits.n_hits,
           ((10000 * hits.n_hits) // {_TOP_K})::BIGINT AS recall_bp,
           ((10000 * tot.h) // ({_TOP_K} * tot.nq))::BIGINT
             AS mean_recall_bp
    FROM hits CROSS JOIN tot
"""


@register(
    "q_llm_ann_recall_audit", oracle=_ANN_RECALL_ORACLE, category="similarity"
)
def q_llm_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the SQ4 quantized index against exact cosine —
    the ANN QUALITY GATE as a first-class query: per query vector,
    how many of the true top-10 neighbors the 4-bit index returns
    (recall in exact basis points), plus the mean across queries —
    the number that decides whether a quantized index is allowed to
    replace the exact scan for a given workload. Pytest pins a
    recall floor (tests/test_similarity_sq.py); this op makes the
    measurement itself reproducible, SQL-oracled, and runnable on
    any corpus snapshot.

    No-drift rule: the builder CALLS the two REGISTERED search paths
    (q_llm_simsearch_topk for ground truth, q_llm_simsearch_sq for
    the candidate list) and the oracle nests their oracle SQL
    verbatim — an audit of the things users actually run, not a
    private reimplementation (the q_llm_lang_confusion discipline).

    Cross-engine exactness: both top-10 lists are deterministic
    (tie-broken on vec_id); hits and recalls are exact integer
    counting and DIV.

    Scale posture: both component paths are query-broadcast corpus
    scans (the corpus never shuffles); the audit itself joins two
    |queries|×10 frames — metadata scale. The declared audit cost is
    the exact path's O(|sample|·N) scan, which is why the sample is
    the knob (at 100 TB: run on a sampled day, not the corpus).

    Reference scope: the reference engine has no similarity surface;
    this extends SURVEY.md §2.4's ANN family with its evaluation
    head (cf. q_ml_pr_auc for classifiers).
    """
    exact = q_llm_simsearch_topk(spark, sf_dir).select("qid", "vec_id")
    approx = q_llm_simsearch_sq(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("a_vec")
    )
    hits = (
        exact.join(
            approx,
            (exact["qid"] == approx["qid"])
            & (exact["vec_id"] == approx["a_vec"]),
            "left",
        )
        .drop(approx["qid"])
        .groupBy("qid")
        .agg(F.count("a_vec").cast("long").alias("n_hits"))
    )
    tot = hits.agg(
        F.sum("n_hits").cast("long").alias("h"),
        F.count(F.lit(1)).cast("long").alias("nq"),
    )
    return hits.crossJoin(tot).selectExpr(
        "qid",
        "n_hits",
        f"CAST((10000 * n_hits) DIV {_TOP_K} AS BIGINT) AS recall_bp",
        f"CAST((10000 * h) DIV ({_TOP_K} * nq) AS BIGINT)"
        " AS mean_recall_bp",
    )
