"""Deterministic sampling & dataset-split operators — the
training-data-pipeline primitives the reference never had (its only
"sampling" is backpressure drop, V2/Worker.java:290-292; BASELINE.json's
north_star mandates LLM-pipeline data ops as first-class).

Random `TABLESAMPLE` / `df.sample()` is the WRONG tool for training
pipelines: it is not reproducible across engines/runs/partitionings,
and membership can't be audited later. The idiom here is
**content-hash gating**: a row is selected iff a deterministic hash of
its stable key lands under a threshold. Properties that matter at
100 TB:

- **Shuffle-free**: selection is a per-row predicate — a narrow map
  over the scan, no exchange anywhere, trivially parallel on 1000
  executors.
- **Reproducible & auditable**: membership is a pure function of the
  key, so reruns, backfills, and a different engine (the DuckDB
  oracle!) agree row-for-row.
- **Stable under growth**: adding new rows never flips old rows'
  split assignment (the classic hash-split guarantee for train/test
  hygiene).

Hash = first 8 hex digits of md5 (engine-agnostic, verified parity
with DuckDB), salted per use-case so the split hash and the sampling
hash are independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import to_units
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table
from batchprocessor_spark.session import materialize


def hash_bucket(key: Column, salt: str, buckets: int) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 md5 hex
    digits of ``salt || key`` as an integer, mod buckets. 32 bits of
    hash over ≤ 2^20 buckets keeps modulo bias < 0.03%."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def _oracle_bucket(key_sql: str, salt: str, buckets: int) -> str:
    return (
        f"('0x' || substring(md5('{salt}' || ({key_sql})::VARCHAR), 1, 8))::BIGINT"
        f" % {buckets}"
    )


_SPLIT_BUCKET = _oracle_bucket("doc_id", "split:", 100)

@register(
    "q_sample_hash_split",
    oracle=f"""
    SELECT CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
    category="sampling",
)
def q_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by hash of ``doc_id`` —
    deterministic, shuffle-free (the CASE is a narrow projection; the
    only exchange is the tiny per-(split,lang) count agg). New rows
    never move old rows between splits."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split:", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# Language-rebalanced mixture: downsample over-represented languages.
# per-mille keep rates; absent key = keep everything.
_LANG_RATES = {"en": 250, "zh": 500}
_DEFAULT_RATE = 1000


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(_LANG_RATES.items())
    )
    return f"CASE {whens} ELSE {_DEFAULT_RATE} END"


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {_oracle_bucket("doc_id", "samp:", 1000)} < {_rate_case_sql()}
    """,
    category="sampling",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (language-rebalanced) deterministic sample: keep
    25% of `en`, 50% of `zh`, 100% of everything else — the mixture-
    reweighting step of a pre-training pipeline. Pure per-row
    predicate on (hash(doc_id), lang): no shuffle, no RNG state, and
    membership is auditable after the fact. Emits the sampled rows
    themselves (row-level parity with the oracle, not just counts)."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for k, v in sorted(_LANG_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    keep = hash_bucket(F.col("doc_id"), "samp:", 1000) < rate
    return d.where(keep).select("doc_id", "source", "lang")


@register(
    "q_sample_reservoir_pergroup",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             {_oracle_bucket("doc_id", "resv:", 1000000)} AS rk
      FROM documents),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY rk, doc_id) AS rnk
      FROM keyed)
    SELECT doc_id, source, n_chars, rnk FROM ranked WHERE rnk <= 5
    """,
    category="sampling",
)
def q_sample_reservoir_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-group sample (5 docs per source) via hash-rank —
    the deterministic analogue of per-group reservoir sampling.
    Ranking by hash(doc_id) is a uniform random order that both
    engines reproduce exactly. Catalyst plans the rnk<=5 filter as a
    WindowGroupLimit: partial top-5 per partition BEFORE the shuffle,
    so only k·groups rows ever move — the same trick as q_topk_per_group."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    keyed = d.select(
        "doc_id", "source", "n_chars",
        hash_bucket(F.col("doc_id"), "resv:", 1000000).alias("rk"),
    )
    w = Window.partitionBy("source").orderBy("rk", "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "source", "n_chars", "rnk")
    )


_PACK_WINDOW = 4096  # chars per packed training sequence


@register(
    "q_llm_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             {_oracle_bucket("doc_id", "pack:", 1000000)} AS rk
      FROM documents),
    c AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY rk, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, n_chars,
           ((cum - n_chars) // {_PACK_WINDOW})::BIGINT AS bin,
           ((cum - 1) // {_PACK_WINDOW}
              != (cum - n_chars) // {_PACK_WINDOW}) AS crosses
    FROM c
    """,
    category="sampling",
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): deterministically shuffle
    the corpus by hash, concatenate, and cut fixed 4096-char training
    windows — each doc gets the bin where it starts plus a flag when
    it straddles a boundary.

    The naive formulation is a GLOBAL running sum — a single-partition
    window that serializes 100 TB through one task. This is instead
    the distributed two-phase prefix sum: range-partition on the order
    key, partition-LOCAL running sums, then add per-partition offsets
    (a #partitions-sized driver cumsum, carried into the closure). The
    local cumsum runs in mapInPandas rather than a Window over the
    partition id: a window would make Catalyst insert a SECOND
    full-data hash Exchange on pid to satisfy its clustering
    requirement, while mapInPandas consumes partitions exactly as the
    range exchange left them — one shuffle total, and this is
    precisely the "built-ins can't express partition-local scan-order
    semantics" case where dropping to an Arrow-batched map is right.
    The oracle states the same result as the naive global window,
    which DuckDB can afford at fixture scale — results are identical,
    only the plan differs.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", hash_bucket(F.col("doc_id"), "pack:", 1000000).alias("rk")
    )
    return pack_by_cumsum(d, max(2, spark.sparkContext.defaultParallelism // 2))


def pack_by_cumsum(d: DataFrame, nparts: int) -> DataFrame:
    """Two-phase distributed prefix sum over (rk, doc_id) order; the
    result is a pure function of the data — tests pin invariance to
    ``nparts`` (a different cluster size must produce identical bins).
    """
    parted = (
        d.repartitionByRange(nparts, "rk", "doc_id")
        .sortWithinPartitions("rk", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # Range partitioning is sampling-based, so two evaluations of `parted`
    # (phase-1 totals job, phase-2 mapInPandas job) could assign rows to
    # different partition ids and silently corrupt the prefix sum. Pin the
    # assignment once; both phases then read the same materialized blocks.
    parted = parted.transform(materialize)
    # Phase 1: per-partition totals — a map-side partial agg whose
    # exchange moves ONE row per partition; the driver sees only
    # model-sized state (the offset table).
    totals = {
        r.pid: r.total
        for r in parted.groupBy("pid").agg(F.sum("n_chars").alias("total")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    # Phase 2: partition-local running sum, seeded with the partition's
    # offset; Arrow batches arrive in the sorted partition order and
    # the carry threads across batches.
    def add_cum(batches):
        import pandas as pd  # noqa: F401 (arrow batch type)

        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = offsets.get(int(pdf["pid"].iloc[0]), 0)
            cums = pdf["n_chars"].cumsum() + carry
            carry = int(cums.iloc[-1])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_chars": pdf["n_chars"], "cum": cums}
            )

    return (
        parted.mapInPandas(add_cum, schema="doc_id BIGINT, n_chars BIGINT, cum BIGINT")
        .select(
            "doc_id",
            "n_chars",
            F.floor((F.col("cum") - F.col("n_chars")) / _PACK_WINDOW)
            .cast("long")
            .alias("bin"),
            (
                F.floor((F.col("cum") - 1) / _PACK_WINDOW)
                != F.floor((F.col("cum") - F.col("n_chars")) / _PACK_WINDOW)
            ).alias("crosses"),
        )
    )


# Temperature-based mixture flattening: keep probability per language
# p_l = (c_min / c_l)^(1-ALPHA) — the smallest language is kept whole
# and larger ones are downsampled so kept sizes scale as c_l^ALPHA
# (multinomial temperature sampling with T = 1/ALPHA, anchored at the
# smallest source so no source is upsampled). min() is used rather
# than a sum normalizer because min is order-independent — a
# float-summed normalizer could round differently across engines.
_TEMP_ALPHA = 0.5
_TEMP_BUCKETS = 1_000_000


@register(
    "q_llm_sample_temperature",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY lang),
    th AS (
      SELECT lang,
             round({_TEMP_BUCKETS} * sqrt((SELECT min(c) FROM counts)::DOUBLE / c))
               ::BIGINT AS pm
      FROM counts)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN th USING (lang)
    WHERE {_oracle_bucket("doc_id", "temp:", _TEMP_BUCKETS)} < th.pm
    """,
    category="sampling",
)
def q_llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted language mixture (T = 2): deterministic
    per-row hash gate against a per-language integer threshold, so the
    sample is reproducible and auditable — no RNG state, rerunning on
    a grown corpus only moves rows whose language rate changed.

    Scale: the per-language count table is tiny -> broadcast back onto
    the corpus; the gate itself is a narrow projection (md5 + integer
    compare). The threshold is rounded to an INTEGER number of hash
    buckets before the compare, so engines never compare floats.
    sqrt(c_min/c) is a single IEEE-exact op per language, identical in
    Spark and DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    th = (
        counts.crossJoin(F.broadcast(counts.agg(F.min("c").alias("cmin"))))
        .select(
            "lang",
            F.round(
                _TEMP_BUCKETS
                * F.sqrt(F.col("cmin").cast("double") / F.col("c"))
            )
            .cast("long")
            .alias("pm"),
        )
    )
    gate = hash_bucket(F.col("doc_id"), "temp:", _TEMP_BUCKETS) < F.col("pm")
    return (
        d.join(F.broadcast(th), "lang")
        .where(gate)
        .select("doc_id", "lang", "source")
    )


_SHUF_SHARDS = 8
_SHUF_SEED = "epoch1:"


@register(
    "q_llm_shuffle_epoch",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substring(md5('{_SHUF_SEED}' || doc_id::VARCHAR), 1, 15))
               ::BIGINT AS h
      FROM documents)
    SELECT doc_id,
           (h % {_SHUF_SHARDS})::INT AS shard,
           row_number() OVER (PARTITION BY h % {_SHUF_SHARDS}
                              ORDER BY h, doc_id)::BIGINT AS pos
    FROM h
    """,
    category="sampling",
)
def q_llm_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document gets a (shard, pos)
    training order from a seeded 60-bit md5 hash — rerunning with the
    same seed reproduces the exact order, changing the seed string
    reshuffles. This is the global-shuffle a training pipeline needs
    WITHOUT a global sort: hash-partition into shards, sort only
    within each shard.

    Scale posture: one shuffle on `shard` (the partitioner at 100 TB;
    shards = files the trainer reads), then a per-shard sort — Spark
    evaluates the row_number window as exactly that. No total order is
    ever materialized, and no RNG state exists to coordinate across
    executors. Ties are impossible at 60 bits in practice but doc_id
    breaks them deterministically anyway.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(_SHUF_SEED), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"))
        .withColumn("shard", (F.col("h") % _SHUF_SHARDS).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


_WSAMPLE_K = 100  # weighted sample size
_WSAMPLE_SALT = "wsample:"


@register(
    "q_llm_sample_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             n_chars::DOUBLE /
               ((('0x' || substring(md5('{_WSAMPLE_SALT}' || doc_id::VARCHAR),
                                    1, 8))::BIGINT + 1) / 4294967296.0)
               AS priority
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, n_chars, priority,
             row_number() OVER (ORDER BY priority DESC, doc_id) AS rk
      FROM keyed)
    SELECT doc_id, lang, n_chars, rk
    FROM ranked WHERE rk <= {_WSAMPLE_K}
    """,
    category="sampling",
)
def q_llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield–Lund–Thorup): each document draws a seeded
    uniform u ∈ (0,1] from an md5 hash and gets priority w/u with
    w = n_chars; the k highest priorities are the sample. Longer
    documents are proportionally more likely to be kept, yet the
    sample is reproducible run-to-run and incremental — new documents
    never change the priorities of old ones (unlike quota sampling).

    Scale posture: the priority is a narrow per-row projection (hash +
    one divide, no state); global top-k plans as TakeOrderedAndProject
    — per-partition heaps then a k-row driver merge, NO global sort,
    no shuffle of the corpus. u is derived from md5 exactly as the
    oracle derives it, and w/u is a single IEEE divide, so ranks agree
    across engines (doc_id breaks exact ties).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_WSAMPLE_SALT), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)
    keyed = d.withColumn("priority", F.col("n_chars").cast("double") / u)
    topk = keyed.orderBy(F.col("priority").desc(), F.col("doc_id")).limit(_WSAMPLE_K)
    # rank assignment AFTER the k-row cut: the window runs on k rows,
    # not the corpus (single in-memory partition, no skew concern).
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id"))
    return topk.select(
        "doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk")
    )


_NEG_K = 4  # uniform negatives drawn per document
_NEG_SALT = "negsample:"


@register(
    "q_llm_sample_negatives",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs, min(doc_id) AS id0 FROM documents),
    draws AS (
      SELECT d.doc_id, k.k,
             (SELECT id0 FROM n)
             + ((d.doc_id - (SELECT id0 FROM n)) + 1
                + ('0x' || substring(md5('{_NEG_SALT}'
                                         || d.doc_id::VARCHAR || ':'
                                         || k.k::VARCHAR), 1, 8))::BIGINT
                  % ((SELECT n_docs FROM n) - 1))
               % (SELECT n_docs FROM n) AS neg_id
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_NEG_K})) AS k) k)
    SELECT doc_id, k::INT AS k, neg_id
    FROM draws
    """,
    category="sampling",
)
def q_llm_sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform negative sampling for contrastive/ranking training:
    every document draws {4} deterministic pseudo-random OTHER
    documents as negatives. The draw is an offset construction —
    neg = id0 + (rank + 1 + hash mod (n-1)) mod n over the dense id
    space — which is self-avoiding BY ALGEBRA (offset ∈ [1, n-1]
    can never map a document to itself), so no rejection/retry loop
    exists to make the sample size data-dependent.

    Scale posture: a narrow per-row projection (one md5 + integer
    arithmetic) after an explode of {4} constants — no join against
    the corpus, no shuffle; the two corpus-level scalars (count, min
    id) are a 1-row broadcast. Reproducible run-to-run and stable
    as shards are reprocessed independently — the property negative
    sampling needs for resumable training-data builds.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("id0")
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("k")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_NEG_SALT),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("k").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    neg = F.col("id0") + (
        (F.col("doc_id") - F.col("id0")) + 1 + h % (F.col("n_docs") - 1)
    ) % F.col("n_docs")
    return (
        d.select("doc_id", ks)
        .crossJoin(F.broadcast(n))
        .select("doc_id", F.col("k").cast("int").alias("k"), neg.alias("neg_id"))
    )


# Token budget for the mixture-allocation query (α = 0.5 temperature).
_BUDGET_TOKENS = 1_000_000


@register(
    "q_llm_budget_allocation",
    oracle=f"""
    WITH src AS (
      SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_tokens, sqrt(n_tokens::DOUBLE) AS wt FROM src),
    tot AS (
      SELECT source, n_tokens, wt,
             max(run) OVER () AS total
      FROM (SELECT source, n_tokens, wt,
                   sum(wt) OVER (ORDER BY source
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS run
            FROM w)),
    shares AS (
      SELECT source, n_tokens,
             floor({_BUDGET_TOKENS} * wt / total)::BIGINT AS base,
             {_BUDGET_TOKENS} * wt / total
               - floor({_BUDGET_TOKENS} * wt / total) AS frac
      FROM tot),
    awarded AS (
      SELECT source, n_tokens, base, frac,
             {_BUDGET_TOKENS} - sum(base) OVER () AS deficit,
             row_number() OVER (ORDER BY frac DESC, source ASC) AS rn
      FROM shares)
    SELECT source, n_tokens,
           (base + CASE WHEN rn <= deficit THEN 1 ELSE 0 END)::BIGINT AS quota
    FROM awarded
    """,
    category="sampling",
)
def q_llm_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token-budget allocation: each source gets a
    quota ∝ sqrt(its token mass) (α=0.5 temperature) out of a fixed
    1M-token budget, with LARGEST-REMAINDER rounding so the integer
    quotas sum to the budget EXACTLY — the allocation step between
    temperature weighting (q_llm_sample_temperature decides which
    rows) and packing (q_llm_pack_sequences decides how they fit).

    Determinism: the weight total is accumulated over sources in NAME
    order via an ordered running-sum window — a plain sum() would let
    each engine add the ~20 doubles in a different order and diverge
    in the last ulp, which floor() then amplifies to ±1 whole token;
    the ordered accumulation makes every float identical cross-engine
    BEFORE floor, so quotas need no rounding at all. All tables here
    are source-cardinality (tiny); the only corpus-scale work is the
    token-count aggregate."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens")
    )
    w = src.select("source", "n_tokens", F.sqrt(F.col("n_tokens").cast("double")).alias("wt"))
    run_w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    all_w = Window.partitionBy()
    tot = w.select(
        "source", "n_tokens", "wt", F.sum("wt").over(run_w).alias("run")
    ).select("source", "n_tokens", "wt", F.max("run").over(all_w).alias("total"))
    share = (F.lit(_BUDGET_TOKENS) * F.col("wt") / F.col("total"))
    shares = tot.select(
        "source",
        "n_tokens",
        F.floor(share).cast("long").alias("base"),
        (share - F.floor(share)).alias("frac"),
    )
    awarded = shares.select(
        "source",
        "n_tokens",
        "base",
        (F.lit(_BUDGET_TOKENS) - F.sum("base").over(all_w)).alias("deficit"),
        F.row_number()
        .over(Window.orderBy(F.col("frac").desc(), F.col("source").asc()))
        .alias("rn"),
    )
    return awarded.select(
        "source",
        "n_tokens",
        (
            F.col("base") + F.when(F.col("rn") <= F.col("deficit"), 1).otherwise(0)
        ).cast("long").alias("quota"),
    )


_LB_GRID = 32     # length buckets: round n_words up to a multiple of 32
_LB_BATCH = 16    # docs per training batch inside a bucket
_LB_SEED = "lbb1:"


@register(
    "q_llm_length_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_words
      FROM documents),
    bucketed AS (
      SELECT doc_id, n_words,
             ((n_words + {_LB_GRID} - 1) // {_LB_GRID}) * {_LB_GRID} AS bucket,
             row_number() OVER (
               PARTITION BY ((n_words + {_LB_GRID} - 1) // {_LB_GRID}) * {_LB_GRID}
               ORDER BY md5('{_LB_SEED}' || doc_id::VARCHAR), doc_id) AS rn
      FROM d),
    batches AS (
      SELECT bucket, (rn - 1) // {_LB_BATCH} AS batch_id,
             count(*)::BIGINT AS batch_n,
             max(n_words)::BIGINT AS batch_max,
             sum(n_words)::BIGINT AS batch_tokens
      FROM bucketed GROUP BY 1, 2)
    SELECT bucket, count(*)::BIGINT AS n_batches,
           sum(batch_n)::BIGINT AS n_docs,
           sum(batch_tokens)::BIGINT AS real_tokens,
           sum(batch_n * batch_max)::BIGINT AS padded_tokens,
           round(sum(batch_tokens)::DOUBLE / sum(batch_n * batch_max), 6)
             AS efficiency
    FROM batches GROUP BY bucket
    """,
    category="sampling",
)
def q_llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing: documents bucketed by word count
    (rounded up to the 32-token grid), deterministically shuffled
    within each bucket (seeded md5 order), cut into 16-doc batches,
    and each batch padded to its own max length — the padding-
    efficiency layout every training data loader uses. Emits per
    bucket: batch count, doc count, real vs padded token totals and
    the efficiency ratio — the number you tune bucket width against.

    Shape: ONE shuffle (window by bucket), integer everything (the
    efficiency ratio is the only divide, rounded at 6); at 100 TB the
    per-bucket window is the standard skew-safe layout because bucket
    populations are balanced by construction."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_words")
    )
    bucket = (
        (F.col("n_words") + _LB_GRID - 1).cast("long") / _LB_GRID
    ).cast("long") * _LB_GRID
    shuffled = d.select(
        "doc_id",
        "n_words",
        bucket.alias("bucket"),
        F.md5(F.concat(F.lit(_LB_SEED), F.col("doc_id").cast("string"))).alias("hk"),
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy("hk", "doc_id")
    )
    batches = (
        shuffled.withColumn("rn", rn)
        .groupBy("bucket", ((F.col("rn") - 1) / _LB_BATCH).cast("long").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_n"),
            F.max("n_words").alias("batch_max"),
            F.sum("n_words").alias("batch_tokens"),
        )
    )
    return batches.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("batch_n").alias("n_docs"),
        F.sum("batch_tokens").alias("real_tokens"),
        F.sum(F.col("batch_n") * F.col("batch_max")).alias("padded_tokens"),
        F.round(
            F.sum("batch_tokens").cast("double")
            / F.sum(F.col("batch_n") * F.col("batch_max")),
            6,
        ).alias("efficiency"),
    )


_IL_SEED = "ilv1:"
_IL_TAKE = 200


@register(
    "q_llm_dataset_interleave",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('{_IL_SEED}' || doc_id::VARCHAR), doc_id) AS rn
      FROM documents)
    SELECT pos, source, doc_id FROM (
      SELECT doc_id, source, rn,
             row_number() OVER (ORDER BY rn, source, doc_id) AS pos
      FROM d) WHERE pos <= {_IL_TAKE}
    """,
    category="sampling",
)
def q_llm_dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-source interleave: each source's documents
    get a seeded within-source shuffle order, and the global training
    order round-robins across sources by that per-source position
    (ties across sources break on source name) — the mixture
    scheduler that feeds a trainer a stable, resumable blend instead
    of source-contiguous runs. Emits the first {_IL_TAKE} positions.

    Shape: one window per source (balanced partitions), then a global
    top-{_IL_TAKE} by (rn, source) via orderBy+limit —
    TakeOrderedAndProject (per-partition heaps, {_IL_TAKE}-row driver
    merge), NEVER a global-order window (which would drag the whole
    corpus to one partition); positions are then numbered on the
    {_IL_TAKE}-row result. The schedule is reproducible from
    (seed, doc_id) alone, so a resumed epoch continues exactly where
    it stopped."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(_IL_SEED), F.col("doc_id").cast("string"))).alias("hk"),
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy("hk", "doc_id"))
    head = (
        d.withColumn("rn", rn)
        .orderBy("rn", "source", "doc_id")
        .limit(_IL_TAKE)
    )
    pos = F.row_number().over(Window.orderBy("rn", "source", "doc_id"))
    return head.withColumn("pos", pos).select("pos", "source", "doc_id")


@register(
    "q_llm_preference_pairs",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' '))
                   * least(n_chars, 400), 6) AS score
      FROM documents),
    ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS r_top,
             row_number() OVER (PARTITION BY source
                                ORDER BY score ASC, doc_id) AS r_bot
      FROM scored)
    SELECT t.source,
           t.doc_id AS chosen_doc, b.doc_id AS rejected_doc,
           t.score AS chosen_score, b.score AS rejected_score,
           round(t.score - b.score, 6) AS margin
    FROM (SELECT * FROM ranked WHERE r_top = 1) t
    JOIN (SELECT * FROM ranked WHERE r_bot = 1) b USING (source)
    """,
    category="sampling",
)
def q_llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF data-prep shape):
    within each source, pair the highest-scoring document (chosen)
    with the lowest-scoring one (rejected) under a deterministic
    quality score (distinct-word fraction × clamped length) and
    report the margin — the contrastive pair builder that turns a
    scored corpus into preference training data.

    Shape: score is a narrow projection; both rankings share ONE
    source exchange (two windows, same partitioning); the final join
    is #sources-sized. Exactness: the score divides integers and
    rounds at 6; ranks tie-break on doc_id, so pair choice is
    deterministic cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    score = F.round(
        F.size(F.array_distinct(words)).cast("double")
        / F.size(words)
        * F.least(F.col("n_chars"), F.lit(400)),
        6,
    )
    scored = d.select("doc_id", "source", score.alias("score"))
    w_top = Window.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    w_bot = Window.partitionBy("source").orderBy(F.col("score").asc(), "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(w_top).alias("r_top"),
        F.row_number().over(w_bot).alias("r_bot"),
    )
    t = ranked.where(F.col("r_top") == 1).select(
        "source", F.col("doc_id").alias("chosen_doc"), F.col("score").alias("chosen_score")
    )
    b = ranked.where(F.col("r_bot") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return t.join(b, "source").select(
        "source",
        "chosen_doc",
        "rejected_doc",
        "chosen_score",
        "rejected_score",
        F.round(F.col("chosen_score") - F.col("rejected_score"), 6).alias("margin"),
    )


# Poisson(1) CDF thresholds scaled to 2^32 (k = 0..5, multiplicities
# capped at 6): round(cum_k * 2^32), precomputed so the draw is a pure
# INTEGER threshold ladder — no float exp/CDF evaluated in either
# engine, no tie ambiguity at any boundary.
_BOOT_T = (1580030169, 3160060337, 3950075422, 4213413783, 4279248374, 4292415292)
_BOOT_R = 3  # bootstrap replicates


def _boot_k_sql(r: int) -> str:
    h = f"('0x' || substring(md5('boot{r}:' || o_orderkey::VARCHAR), 1, 8))::BIGINT"
    ladder = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"CASE {ladder} ELSE {len(_BOOT_T)} END"


@register(
    "q_sample_poisson_bootstrap",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    reps AS (
      {" UNION ALL ".join(
        f"SELECT {r} AS rep, ({_boot_k_sql(r)})::BIGINT AS k, cents FROM o"
        for r in range(_BOOT_R)
      )})
    SELECT rep,
           sum(k)::BIGINT AS resampled_rows,
           sum(k * cents)::BIGINT AS resampled_cents,
           ((sum(k * cents)) // greatest(sum(k), 1))::BIGINT AS mean_cents
    FROM reps GROUP BY rep
    """,
    category="sampling",
)
def q_sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online Poisson bootstrap (Oza–Russell): each of 3 replicates
    assigns every order a DETERMINISTIC Poisson(1) multiplicity from
    a seeded hash, and the replicate totals estimate the sampling
    distribution of the revenue mean — the one-pass bootstrap that
    replaces with-replacement resampling at scale (a true resample
    needs global coordination; Poisson multiplicities need only the
    row itself, so the whole thing is map-side arithmetic + one
    aggregate).

    Exactness: the Poisson draw is an integer threshold ladder over
    the 32-bit seeded hash (pre-computed CDF constants, multiplicity
    capped at 6 ≈ the 1-in-2.6M tail), so both engines assign
    identical multiplicities to every row; sums and the mean are
    integer cents with DIV.

    Scale posture: replicates explode map-side from one scan (3
    struct cells per row — the count-min shape), combine to 3 rows
    before the shuffle. B replicates cost B columns of integer math,
    not B passes; at 100 TB this is how you put a confidence interval
    on any pipeline metric for one extra aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", to_units(F.col("o_totalprice"), 100).alias("cents")
    )
    def k_col(r: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"boot{r}:"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        expr = F.lit(len(_BOOT_T))
        for k in range(len(_BOOT_T) - 1, -1, -1):
            expr = F.when(h < _BOOT_T[k], k).otherwise(expr)
        return expr.cast("long")

    cells = F.array(
        *[
            F.struct(F.lit(r).cast("int").alias("rep"), k_col(r).alias("k"))
            for r in range(_BOOT_R)
        ]
    )
    reps = o.select("cents", F.explode(cells).alias("c")).select(
        F.col("c.rep").alias("rep"), F.col("c.k").alias("k"), "cents"
    )
    return reps.groupBy("rep").agg(
        F.sum("k").alias("resampled_rows"),
        F.sum(F.col("k") * F.col("cents")).alias("resampled_cents"),
        F.expr(
            "(sum(k * cents)) div greatest(sum(k), 1)"
        ).cast("long").alias("mean_cents"),
    )


@register(
    "q_sample_balanced_classes",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5('bal:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT AS h
      FROM documents),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM d),
    m AS (
      SELECT min(cnt)::BIGINT AS m
      FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang))
    SELECT lang,
           count(*)::BIGINT AS n_kept,
           sum(doc_id)::BIGINT AS docid_sum
    FROM ranked, m WHERE rn <= m.m GROUP BY lang
    """,
    category="sampling",
)
def q_sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT class-balanced downsampling: every language is cut to the
    minority class's count by keeping the first m rows of a seeded
    md5-hash order (deterministic tie-break on doc_id) — the
    undersampling step a training pipeline runs before fitting on
    skewed labels, where approximate fraction-based sampling
    (sample(m/n)) would leave classes unequal. The per-class checksum
    (doc_id sum) pins WHICH rows survive, not just how many.

    Scale posture: the class-count table is tiny (one aggregate), its
    min broadcasts as a 1-row join; the rank is a per-class window —
    fine for many-label corpora, a documented skew risk for
    few-label ones at 100 TB (same caveat as q_agg_spearman; the
    remedy there — histogram ranks over the per-(class, hash-bucket)
    count table — applies verbatim since the hash is uniform)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    ranked = d.withColumn("rn", F.row_number().over(w))
    m = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").cast("long").alias("m"))
    )
    kept = ranked.crossJoin(F.broadcast(m)).where(F.col("rn") <= F.col("m"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
    )


_HT_BUCKET = _oracle_bucket("doc_id", "ht:", 1000)


@register(
    "q_sample_ht_estimator",
    oracle=f"""
    WITH d AS (
      SELECT lang, n_chars,
             {_HT_BUCKET} AS b,
             CASE WHEN lang = 'en' THEN 100 ELSE 500 END AS keep
      FROM documents)
    SELECT lang,
           count(*)::BIGINT AS n_total,
           sum(CASE WHEN b < keep THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
           (10 * max(keep))::BIGINT AS p_bp,
           sum(n_chars)::BIGINT AS exact_chars,
           sum(CASE WHEN b < keep THEN n_chars * 1000 // keep
                    ELSE 0 END)::BIGINT AS ht_chars,
           ((10000 * abs(sum(CASE WHEN b < keep THEN n_chars * 1000 // keep
                                  ELSE 0 END)
                         - sum(n_chars)))
              // sum(n_chars))::BIGINT AS err_bp
    FROM d GROUP BY lang
    """,
    category="sampling",
)
def q_sample_ht_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation from an UNEQUAL-probability
    deterministic sample — the audit a pipeline runs to check that a
    downsampled corpus still represents the full one: English docs
    keep with p = 10% (the over-represented stratum), every other
    language with p = 50%, membership decided by the engine's seeded
    md5 bucket (reproducible, no RNG); each sampled doc is
    inverse-probability weighted (x1000/keep, exact integer since
    keep divides 1000) and the per-stratum HT total is compared to
    the exact total in integer basis points. The |error| is the
    design's sampling noise made visible — the quantity a
    quality-of-sample dashboard tracks.

    Scale posture: ONE scan, one conditional aggregate per stratum —
    the sample is never materialized to estimate it (that is the HT
    point); everything stays in BIGINT (keep ∈ {{100, 500}} divides
    the 1000-bucket space exactly, so weights are whole numbers and
    floor-division is exact, not rounding)."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        hash_bucket(F.col("doc_id"), "ht:", 1000).alias("b"),
        F.when(F.col("lang") == "en", 100).otherwise(500).alias("keep"),
    )
    in_sample = F.col("b") < F.col("keep")
    ht = F.sum(
        F.when(in_sample, F.expr("n_chars * 1000 DIV keep")).otherwise(0)
    )
    exact = F.sum("n_chars")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long").alias("n_sampled"),
        (10 * F.max("keep")).cast("long").alias("p_bp"),
        exact.cast("long").alias("exact_chars"),
        ht.cast("long").alias("ht_chars"),
        F.expr(
            "(10000 * abs(sum(CASE WHEN b < keep THEN n_chars * 1000 DIV keep"
            " ELSE 0 END) - sum(n_chars))) DIV sum(n_chars)"
        )
        .cast("long")
        .alias("err_bp"),
    )


_NEY_HASH = _oracle_bucket("doc_id", "ney:", 1000000)


@register(
    "q_sample_neyman",
    oracle=f"""
    WITH mom AS (
      SELECT lang, count(*)::BIGINT AS n_docs,
             sum(n_chars)::BIGINT AS sx,
             sum(n_chars * n_chars)::BIGINT AS sx2
      FROM documents GROUP BY lang),
    wt AS (
      SELECT lang, n_docs,
             sqrt((n_docs * sx2 - sx * sx)::DOUBLE) AS w
      FROM mom),
    q AS (
      SELECT lang, n_docs,
             floor(200.0 * w / (SELECT max(w) FROM wt))::BIGINT AS quota
      FROM wt),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY {_NEY_HASH}, doc_id) AS r
      FROM documents)
    SELECT q.lang, q.n_docs, q.quota,
           count(*)::BIGINT AS n_selected,
           sum(ranked.n_chars)::BIGINT AS sel_chars
    FROM q JOIN ranked ON ranked.lang = q.lang AND ranked.r <= q.quota
    GROUP BY q.lang, q.n_docs, q.quota
    ORDER BY q.lang
    """,
    category="sampling",
)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling — the survey-sampling
    optimum (allocate ∝ N_h·σ_h, so volatile strata get more budget
    than proportional allocation gives them), the right sampler for
    corpus quality audits where some languages vary far more than
    others. The stratum weight N_h·σ_h collapses to
    sqrt(N_h·Σx² − (Σx)²) over EXACT integer moments — one IEEE sqrt
    of an exact integer, bit-identical cross-engine — and quotas are
    taken RELATIVE TO THE MAX-WEIGHT stratum (max is order-
    independent, unlike a sum), so quota = ⌊200·w_h/w_max⌋ is
    deterministic on both engines. The draw itself is the seeded-hash
    rank idiom (q_sample_balanced_classes): reproducible, coordinated
    across engines, per-stratum.

    Scale posture: moments are one map-side-combinable aggregate to
    |strata| rows; the rank window partitions BY STRATUM (parallel
    across strata; within-stratum order by a uniform hash — for a
    mega-stratum the two-phase prefix-sum rank of
    q_agg_gini_concentration swaps in); quotas broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    mom = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sx2"),
    )
    wt = mom.select(
        "lang",
        "n_docs",
        F.sqrt(
            (F.col("n_docs") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("w"),
    )
    wmax = wt.agg(F.max("w").alias("wmax"))
    q = wt.crossJoin(F.broadcast(wmax)).select(
        "lang",
        "n_docs",
        F.floor(F.lit(200.0) * F.col("w") / F.col("wmax"))
        .cast("long")
        .alias("quota"),
    )
    wr = Window.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id"), "ney:", 1000000), F.col("doc_id")
    )
    ranked = d.select(
        "lang", "doc_id", "n_chars", F.row_number().over(wr).alias("r")
    )
    return (
        ranked.join(F.broadcast(q), "lang")
        .where(F.col("r") <= F.col("quota"))
        .groupBy("lang", "n_docs", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_chars").cast("long").alias("sel_chars"),
        )
        .orderBy("lang")
    )


_DSIR_TARGET = "src18"  # largest source in the fixture = the "trusted" corpus
_DSIR_QUOTA = 200
_DSIR_PPM = 1_000_000


@register(
    "q_llm_importance_resampling",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, lang,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ws
      FROM documents),
    w AS (SELECT doc_id, source, lang, unnest(ws) AS w FROM d),
    ct AS (SELECT w, count(*)::BIGINT AS c FROM w
           WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
    cs AS (SELECT w, count(*)::BIGINT AS c FROM w GROUP BY 1),
    scoredw AS (
      SELECT w.doc_id, w.source, w.lang,
             (((coalesce(ct.c, 0) + 1) * {_DSIR_PPM}) // (cs.c + 1))::BIGINT AS s
      FROM w JOIN cs ON w.w = cs.w
      LEFT JOIN ct ON w.w = ct.w
      WHERE w.source <> '{_DSIR_TARGET}'),
    docs AS (
      SELECT doc_id, source, lang,
             count(*)::BIGINT AS n_words,
             sum(s)::BIGINT AS ratio_score
      FROM scoredw GROUP BY 1, 2, 3),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY ratio_score DESC, doc_id) AS rnk
      FROM docs)
    SELECT doc_id, source, lang, n_words, ratio_score, rnk
    FROM ranked WHERE rnk <= {_DSIR_QUOTA}
    """,
    category="sampling",
)
def q_llm_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score every candidate
    document by how much its word distribution resembles a trusted
    target corpus (here: the fixture's largest source) relative to the
    raw pool, and keep the top quota. The per-word importance ratio
    (target count + 1)/(corpus count + 1) is carried as an EXACT
    integer in parts-per-million — ``(ct+1)*1e6 DIV (cs+1)`` — and the
    document score is the sum over its words, so unlike a float
    log-ratio the cross-engine hash cannot drift and selection
    boundaries cannot flip (same integer-ppm discipline as the
    hard-negatives ranker). The model-based sibling of
    q_llm_sample_temperature (which reweights by source, not content).

    Scale posture: both word models are VOCABULARY-sized aggregates
    (map-side combined, ≪ corpus) and broadcast onto the candidate
    word stream — the corpus shuffles once, on doc_id, for the
    per-document sum; selection is TakeOrderedAndProject over the
    quota (no global sort), and the rank window runs over the already-
    selected ≤200 rows. A hot function word is one model row, not an
    output blowup."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
        ).alias("ws"),
    )
    w = d.select("doc_id", "source", "lang", F.explode("ws").alias("w"))
    ct = (
        w.where(F.col("source") == _DSIR_TARGET)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    cs = w.groupBy("w").agg(F.count(F.lit(1)).alias("cs"))
    scored = (
        w.where(F.col("source") != _DSIR_TARGET)
        .join(F.broadcast(cs), "w")
        .join(F.broadcast(ct), "w", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            F.expr(
                f"((coalesce(ct, 0) + 1) * {_DSIR_PPM}) DIV (cs + 1)"
            ).alias("s"),
        )
    )
    docs = scored.groupBy("doc_id", "source", "lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("s").cast("long").alias("ratio_score"),
    )
    top = docs.orderBy(F.col("ratio_score").desc(), "doc_id").limit(_DSIR_QUOTA)
    rank_w = Window.orderBy(F.col("ratio_score").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(rank_w))
