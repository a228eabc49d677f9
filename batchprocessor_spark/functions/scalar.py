"""Scalar function families (SURVEY.md §2.2 q_fn_*): string, date,
math/conditional, array, and JSON expressions.

All expressions are built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen. No Python UDFs anywhere in this module.

Oracle parity notes baked into each query:
- ceil/floor return BIGINT in Spark but DOUBLE in DuckDB → cast.
- Spark timestamps are emitted as dates/strings/epoch ints, never raw.
- split() arrays are reduced to scalars (size / element) for hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import to_units
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substr(p_name, 1, 8) AS name_prefix,
           trim(p_name) AS name_trim,
           length(p_name)::BIGINT AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           len(string_split(p_type, ' '))::INT AS type_words,
           (p_type LIKE '%BRASS%') AS is_brass,
           starts_with(p_name, 'a') AS starts_a
    FROM part
    """,
    category="function",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over `part`: case, substring, trim,
    length, concat, replace, regexp_extract, split, LIKE, prefix."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_type", " ")).alias("type_words"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("starts_a"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           extract(year FROM o_orderdate)::INT AS order_year,
           extract(month FROM o_orderdate)::INT AS order_mon,
           extract(dow FROM o_orderdate)::INT AS order_dow,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01')::INT AS days_to_2002,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day_str,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end
    FROM orders
    """,
    category="function",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function family over `orders`: truncation, extraction,
    interval arithmetic, differences, formatting. DOW convention:
    both engines emit 0=Sunday..6=Saturday (Spark dayofweek is 1-based
    → subtract 1). Date results are emitted as ISO strings so the
    oracle compare is dtype-proof (DATE vs TIMESTAMP ambiguity)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day_str"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           abs(l_discount - 0.05) AS disc_dev,
           ceil(l_quantity)::BIGINT AS qty_ceil,
           floor(l_quantity)::BIGINT AS qty_floor,
           round(pow(l_quantity, 2), 4) AS qty_sq,
           round(ln(l_extendedprice), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           l_quantity % 7 AS qty_mod,
           greatest(l_discount, l_tax) AS max_rate,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_class,
           sign(l_discount - l_tax)::DOUBLE AS rate_sign
    FROM lineitem
    """,
    category="function",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional family over `lineitem`: round/abs/ceil/floor,
    pow/ln/sqrt, modulo, greatest, CASE WHEN, sign."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # 4 decimals: the product of two 2-decimal inputs has exactly
        # ≤4 true decimals, so round-4 never sits on a rounding-mode
        # boundary (round-3 does, and the engines' modes differ).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity") % 7).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_class"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_elem,
           round(list_aggregate(embedding::DOUBLE[], 'sum'), 4) AS vec_sum,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 6) AS vec_max,
           round(list_aggregate(embedding::DOUBLE[], 'min'), 6) AS vec_min,
           round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                                'sum'), 4) AS vec_sq_sum,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))::INT AS n_positive,
           round(list_aggregate(embedding[1:8]::DOUBLE[], 'sum'), 4) AS head_sum
    FROM embeddings
    """,
    category="function",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over `embeddings.embedding`: size,
    element access, fold (sum), max/min, transform+fold, filter,
    slice. All higher-order functions run JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_elem"),
        F.round(fold_sum(v), 4).alias("vec_sum"),
        F.round(F.array_max(v), 6).alias("vec_max"),
        F.round(F.array_min(v), 6).alias("vec_min"),
        F.round(fold_sum(F.transform(v, lambda x: x * x)), 4).alias("vec_sq_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(fold_sum(F.slice(v, 1, 8)), 4).alias("head_sum"),
    )


@register(
    "q_fn_misc",
    oracle="""
    WITH j AS (
      SELECT c_custkey, c_acctbal, c_mktsegment, o_totalprice
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey)
    SELECT c_custkey,
           coalesce(o_totalprice, -1.0) AS price_or_neg1,
           nullif(c_mktsegment, 'BUILDING') AS seg_nullif,
           (o_totalprice IS NULL) AS no_order,
           CASE WHEN o_totalprice IS NULL THEN 'none'
                ELSE 'some' END AS nvl2_like,
           (c_custkey & 255)::BIGINT AS key_and,
           (c_custkey | 1)::BIGINT AS key_or,
           xor(c_custkey, 42)::BIGINT AS key_xor,
           (c_custkey << 2)::BIGINT AS key_shl,
           least(c_acctbal, coalesce(o_totalprice, c_acctbal)) AS least_val
    FROM j
    """,
    category="function",
)
def q_fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling (coalesce/nullif/IS NULL/nvl2-style CASE) and
    bitwise ops over a null-producing outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_acctbal", "c_mktsegment", "o_totalprice"
    )
    return j.select(
        "c_custkey",
        F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_or_neg1"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullif"),
        F.col("o_totalprice").isNull().alias("no_order"),
        F.when(F.col("o_totalprice").isNull(), "none").otherwise("some").alias("nvl2_like"),
        F.col("c_custkey").bitwiseAND(F.lit(255)).alias("key_and"),
        F.col("c_custkey").bitwiseOR(F.lit(1)).alias("key_or"),
        F.col("c_custkey").bitwiseXOR(F.lit(42)).alias("key_xor"),
        F.shiftleft(F.col("c_custkey"), 2).alias("key_shl"),
        F.least("c_acctbal", F.coalesce("o_totalprice", "c_acctbal")).alias("least_val"),
    )


@register(
    "q_fn_struct",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             struct_pack(cust := o_custkey, price := o_totalprice,
                         status := o_orderstatus) AS info
      FROM orders)
    SELECT o_orderkey,
           info.cust AS cust,
           round(info.price * 1.1, 4) AS uplifted,
           (info.status = 'F') AS is_final
    FROM s
    """,
    category="function",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct construction + field access (struct columns are
    emitted back as scalars for the engine-agnostic compare)."""
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("info"),
    )
    return s.select(
        "o_orderkey",
        F.col("info.cust").alias("cust"),
        F.round(F.col("info.price") * 1.1, 4).alias("uplifted"),
        (F.col("info.status") == "F").alias("is_final"),
    )


@register(
    "q_fn_explode",
    oracle="""
    WITH flat AS (
      SELECT vec_id,
             unnest(range(len(embedding)))::INT AS pos,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings)
    SELECT pos,
           count(*)::BIGINT AS n,
           round(avg(x), 6) AS avg_x,
           round(max(x), 6) AS max_x
    FROM flat
    GROUP BY pos
    """,
    category="function",
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (table-valued): flatten every embedding to
    (vec_id, pos, x) rows, then aggregate per position — the column-
    statistics pattern over array columns."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "x"
        ),
    )
    return flat.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 6).alias("avg_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k_value,
           (json_extract(props, '$.k')::INT % 10) AS k_bucket,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null
    FROM events
    """,
    category="function",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the `events.props` string column via
    json_tuple — ONE parse per row extracting all paths (measured
    ~2-3× faster than per-path get_json_object and than from_json's
    struct materialization); missing keys surface as nulls."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", F.json_tuple("props", "k", "missing").alias("k", "missing"))
        .select(
            "event_id",
            F.col("k").cast("int").alias("k_value"),
            (F.col("k").cast("int") % 10).alias("k_bucket"),
            F.col("missing").isNull().alias("missing_is_null"),
        )
    )


@register(
    "q_fn_map",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*)::BIGINT AS cnt
      FROM documents GROUP BY source, lang)
    SELECT source,
           count(*)::INT AS n_langs,
           string_agg(lang, ',' ORDER BY lang) AS langs,
           coalesce(sum(cnt) FILTER (lang = 'en'), 0)::BIGINT AS en_docs,
           sum(cnt)::BIGINT AS total_docs
    FROM c GROUP BY source
    """,
    category="function",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§1.2): per-source lang→count maps built with
    map_from_entries, then consumed via map_keys / map_values /
    element_at / size — the full construct-access-fold cycle. Output
    is flattened to scalars (sorted key list, one lookup, a fold over
    values) so the oracle can state the same result with plain
    conditional aggregation — DuckDB's map extraction semantics differ
    and never need to be invoked."""
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = per_lang.groupBy("source").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("lang", "cnt")))
        ).alias("m")
    )
    return mapped.select(
        "source",
        F.size("m").alias("n_langs"),
        F.array_join(F.map_keys("m"), ",").alias("langs"),
        F.coalesce(F.element_at("m", F.lit("en")), F.lit(0).cast("long")).alias("en_docs"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_docs"),
    )


@register(
    "q_fn_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(
                   list_transform(list_zip(embedding, list_reverse(embedding)),
                                  p -> p[1]::DOUBLE * p[2]::DOUBLE),
                   'sum'), 4) AS rev_dot,
           (len(list_filter(embedding, x -> x > 0.9)) > 0)::INT AS any_big,
           (len(list_filter(embedding, x -> x > -2)) = len(embedding))::INT
             AS all_gt_neg2,
           list_aggregate(list_transform(embedding, x -> (x > 0)::BIGINT),
                          'sum')::BIGINT AS n_pos,
           round(list_aggregate(
                   list_concat(embedding[1:4]::DOUBLE[],
                               list_reverse(embedding)[1:4]::DOUBLE[]),
                   'sum'), 4) AS ends_sum
    FROM embeddings
    """,
    category="function",
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function family beyond q_fn_array: zip_with
    (pairwise product against the reversed vector — a self
    convolution kernel), exists / forall predicates, a
    transform-count, and concat+slice composition. All JVM-side
    lambda expressions inside whole-stage codegen — the functions a
    feature-engineering pipeline leans on before ever reaching a UDF.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rev = F.reverse(v)

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    return e.select(
        "vec_id",
        F.round(fold_sum(F.zip_with(v, rev, lambda a, b: a * b)), 4).alias("rev_dot"),
        F.exists(v, lambda x: x > 0.9).cast("int").alias("any_big"),
        F.forall(v, lambda x: x > -2).cast("int").alias("all_gt_neg2"),
        fold_sum(F.transform(v, lambda x: (x > 0).cast("bigint")))
        .cast("long")
        .alias("n_pos"),
        F.round(fold_sum(F.concat(F.slice(v, 1, 4), F.slice(rev, 1, 4))), 4).alias(
            "ends_sum"
        ),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_sum,
           min(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_min,
           max(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_max
    FROM events
    WHERE json_extract(props, '$.k')::BIGINT % 2 = 1
    GROUP BY event_type
    """,
    category="function",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json() turns the `props` string into a binary variant ONCE
    per row, variant_get() extracts a typed path with no re-parse —
    the open-schema column pattern (one VARIANT column instead of a
    rigid struct) that replaces repeated get_json_object string
    parsing. Odd-k events filtered, aggregated per type.

    Scale posture: variant parse + typed extraction are JVM
    codegen'd expressions on the scan projection; the aggregate is
    the usual partial+final shuffle. At 100 TB the win over JSON
    strings is parse-once + shredded storage-ready encoding. Oracle:
    DuckDB's native JSON extraction states the same semantics."""
    e = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k") % 2 == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "q_fn_regexp",
    oracle="""
    SELECT p_partkey,
           len(regexp_extract_all(p_name, '[aeiou]+'))::BIGINT AS vowel_runs,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_type, '^(STANDARD|ECONOMY)') AS is_std_eco,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           len(regexp_extract_all(p_brand, '[0-9]'))::BIGINT AS brand_digits
    FROM part
    """,
    category="function",
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: regexp_count, global regexp_replace,
    anchored regexp_like, group extraction, and token counting — the
    pattern surface a curation pipeline leans on for PII masks and
    format checks (q_llm_pii_scrub is the applied version; this pins
    the primitives).

    Parity note: patterns here stay in the RE2-compatible subset
    (classes, anchors, alternation, groups — no backreferences or
    lookaround) so Java regex (Spark) and RE2 (DuckDB) agree;
    Spark's regexp_replace is global by default while DuckDB needs
    the explicit 'g' flag — the oracle states it.

    Scale posture: per-row JVM expressions inside whole-stage
    codegen; no shuffle, no Python."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]+")).cast("long").alias("vowel_runs"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^(STANDARD|ECONOMY)").alias("is_std_eco"),
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_count("p_brand", F.lit("[0-9]")).cast("long").alias("brand_digits"),
    )


@register(
    "q_fn_try",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * 100)::BIGINT / nullif(
             (o_orderkey % 3)::BIGINT, 0) AS per_unit,
           TRY_CAST(o_orderpriority AS BIGINT) AS prio_num,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
           CASE WHEN 9223372036854775807 - round(o_totalprice*100)::BIGINT
                     >= round(o_totalprice*100)::BIGINT
                THEN 2 * round(o_totalprice*100)::BIGINT END AS dbl_cents
    FROM orders
    """,
    category="function",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* family: try_divide (NULL on zero divisor, never
    a runtime error or an Inf), try_cast (NULL on malformed input —
    '1-URGENT' fails as a whole, its first digit parses), try_multiply (NULL on
    64-bit overflow). This is the error-containment surface a 100 TB
    job needs: under ANSI mode one poisoned row kills a 6-hour stage;
    the try_ forms quarantine it as a NULL you can route to a DLQ
    filter instead (the batch twin of the streaming retry→DLQ path,
    O12).

    The oracle states the same semantics with guards DuckDB evaluates
    identically (nullif divisor, TRY_CAST, an explicit overflow-bound
    CASE); the fixture's cents never overflow, so dbl_cents also pins
    that try_multiply does NOT null healthy rows."""
    o = load_table(spark, sf_dir, "orders")
    cents = to_units(F.col("o_totalprice"), 100)
    return o.select(
        "o_orderkey",
        F.try_divide(cents, (F.col("o_orderkey") % 3).cast("long")).alias("per_unit"),
        F.col("o_orderpriority").try_cast("long").alias("prio_num"),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("prio_digit"),
        F.try_multiply(F.lit(2).cast("long"), cents).alias("dbl_cents"),
    )


@register(
    "q_fn_observe",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_nonpositive,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents,
           min(o_custkey)::BIGINT AS min_cust,
           max(o_custkey)::BIGINT AS max_cust
    FROM orders WHERE o_orderstatus = 'O'
    """,
    category="function",
)
def q_fn_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``DataFrame.observe`` — the batch
    analogue of the reference's stat() tree (SURVEY §2.1 O16,
    V2/Stat.java): named metrics (row count, DQ violation count,
    exact-cents total, distinct customers) are accumulated ON the
    executors as the query runs and surface through the observation
    listener after ONE action — no second pass, no separate
    validation job. This is how a production pipeline gets its
    rows-in/rows-out/violations ledger for free on every stage
    (Spark's AccumulatorV2 mechanism underneath).

    The observed metrics are returned as the result row, so the
    oracle (the same aggregates stated declaratively) pins that the
    observation path loses nothing relative to a real aggregate —
    including under AQE re-splits, since every metric here is an
    associative-commutative accumulator."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    obs = Observation("dq_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpositive"
        ),
        F.sum(to_units(F.col("o_totalprice"), 100)).alias("cents"),
        # DISTINCT aggregates are rejected by CollectMetrics (they are
        # not accumulator-mergeable); key BOUNDS carry the same
        # sanity-check role and merge associatively.
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
    )
    observed.write.format("noop").mode("overwrite").save()  # one pass, no sink cost
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_nonpositive"], m["cents"], m["min_cust"], m["max_cust"])],
        "n_rows BIGINT, n_nonpositive BIGINT, cents BIGINT, "
        "min_cust BIGINT, max_cust BIGINT",
    )


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT 'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars AS url,
             doc_id, source, lang, n_chars
      FROM documents)
    SELECT source || '.example.com' AS host,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT lang)::BIGINT AS n_langs,
           sum(n_chars)::BIGINT AS total_chars,
           min('/docs/' || doc_id) AS min_path,
           sum(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END)::BIGINT
             AS n_https
    FROM u GROUP BY host
    """,
    category="function",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + per-domain rollup — the web-corpus curation
    primitive (Common-Crawl-style pipelines aggregate quality stats
    per registered domain before sampling). The fixture has no URL
    column, so deterministic URLs are CONSTRUCTED from (source,
    doc_id, lang, n_chars) and then every extracted field comes from
    parse_url() against the assembled string — HOST, PATH, protocol,
    and a QUERY parameter — while the oracle recomputes the same
    fields from the base columns directly. Parity therefore proves
    parse_url inverts the construction exactly (a wrong
    host/path/query split changes group counts or min_path).

    Scale posture: parse_url is a JVM intrinsic inside whole-stage
    codegen (plan-gated: no Python eval nodes); one scan, one
    aggregate on the extracted host."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        "n_chars",
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("q_lang")).alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("path").alias("min_path"),
        F.sum(F.when(F.col("proto") == "https", 1).otherwise(0))
        .cast("long")
        .alias("n_https"),
    )


@register(
    "q_fn_datetime_ext",
    oracle="""
    WITH d AS (
      SELECT o_orderdate::DATE AS dt, quarter(o_orderdate::DATE) AS qtr
      FROM orders)
    SELECT qtr::INT AS qtr,
           count(*)::BIGINT AS n,
           min(strftime(last_day(dt), '%Y-%m-%d')) AS min_last_day,
           max(strftime(date_trunc('week', dt)::DATE, '%Y-%m-%d'))
             AS max_week_start,
           sum(dayofyear(dt))::BIGINT AS sum_doy,
           sum(weekofyear(dt))::BIGINT AS sum_iso_week,
           min(strftime((dt + INTERVAL 3 MONTH)::DATE, '%Y-%m-%d'))
             AS min_plus3m
    FROM d GROUP BY qtr
    """,
    category="function",
)
def q_fn_datetime_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended calendar-function family beyond q_fn_date: last_day
    (month-end), date_trunc to ISO week (Monday), dayofyear, ISO
    weekofyear, and add_months with its END-OF-MONTH CLAMP (Jan 31 +
    3 months = Apr 30 on BOTH engines — DuckDB's date + INTERVAL
    clamps identically, which this query pins; a naive +90 days would
    not). Grouped by quarter so every month/season boundary in the
    6.5-year fixture range exercises the conventions; dates emitted
    as ISO strings (the repo's timestamp-hashing discipline).

    Parity notes: weekofyear is ISO-8601 on both engines (week 1 =
    first week with ≥4 January days); date_trunc('week') is
    Monday-anchored on both. Shape: one scan, one partial+final
    aggregate — all functions are codegen-able JVM intrinsics."""
    d = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("dt"),
        F.quarter("o_orderdate").alias("qtr"),
    )
    return d.groupBy("qtr").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.date_format(F.last_day("dt"), "yyyy-MM-dd")).alias(
            "min_last_day"
        ),
        F.max(
            F.date_format(F.date_trunc("week", F.col("dt")), "yyyy-MM-dd")
        ).alias("max_week_start"),
        F.sum(F.dayofyear("dt")).cast("long").alias("sum_doy"),
        F.sum(F.weekofyear("dt")).cast("long").alias("sum_iso_week"),
        F.min(
            F.date_format(F.add_months(F.col("dt"), 3), "yyyy-MM-dd")
        ).alias("min_plus3m"),
    )


@register(
    "q_fn_bits",
    oracle="""
    WITH b AS (
      SELECT event_id,
             bit_count(event_id)::BIGINT AS pops,
             (event_id << 3)::BIGINT AS shl,
             (event_id >> 2)::BIGINT AS shr,
             xor(event_id, 2863311530)::BIGINT AS xored,
             (event_id & 255)::BIGINT AS low_byte,
             (event_id | 4096)::BIGINT AS with_flag
      FROM events)
    SELECT (event_id % 8)::BIGINT AS grp,
           count(*)::BIGINT AS n,
           sum(pops)::BIGINT AS pops_sum,
           sum(shl)::BIGINT AS shl_sum,
           sum(shr)::BIGINT AS shr_sum,
           sum(xored)::BIGINT AS xor_sum,
           sum(low_byte)::BIGINT AS lowbyte_sum,
           min(with_flag)::BIGINT AS flag_min
    FROM b GROUP BY grp
    """,
    category="function",
)
def q_fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit-manipulation family (complementing q_agg_bitwise's
    aggregates): population count, shifts, xor/and/or masking — the
    ops behind bitmap indexes, feature flags, and hash mixing.
    Everything is exact integer arithmetic, so the grouped checksums
    are hash-identical cross-engine by construction; shifts stay in
    BIGINT (event_id << 3 is far from the sign bit at any fixture
    SF). Spark spells xor as ^, DuckDB as xor() — same bits.

    Shape: one scan, pure codegen projection, one partial+final
    aggregate on the 8-way id residue."""
    e = load_table(spark, sf_dir, "events").select("event_id")
    b = e.select(
        "event_id",
        F.bit_count("event_id").cast("long").alias("pops"),
        F.expr("event_id << 3").cast("long").alias("shl"),
        F.expr("event_id >> 2").cast("long").alias("shr"),
        F.expr("event_id ^ 2863311530").cast("long").alias("xored"),
        F.expr("event_id & 255").cast("long").alias("low_byte"),
        F.expr("event_id | 4096").cast("long").alias("with_flag"),
    )
    return b.groupBy((F.col("event_id") % 8).cast("long").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pops").cast("long").alias("pops_sum"),
        F.sum("shl").cast("long").alias("shl_sum"),
        F.sum("shr").cast("long").alias("shr_sum"),
        F.sum("xored").cast("long").alias("xor_sum"),
        F.sum("low_byte").cast("long").alias("lowbyte_sum"),
        F.min("with_flag").cast("long").alias("flag_min"),
    )


@register(
    "q_fn_binary",
    oracle="""
    WITH b AS (
      SELECT lang,
             base64(substr(text, 1, 8)::BLOB) AS b64,
             hex(substr(text, 1, 4)) AS hx,
             (from_base64(base64(substr(text, 1, 8)::BLOB))::VARCHAR
                = substr(text, 1, 8)) AS rt_ok,
             octet_length(text::BLOB)::BIGINT AS nbytes,
             md5(text) AS digest
      FROM documents)
    SELECT lang,
           count(*)::BIGINT AS n,
           min(b64) AS min_b64,
           min(hx) AS min_hex,
           bool_and(rt_ok) AS all_roundtrip,
           sum(nbytes)::BIGINT AS bytes_sum,
           min(digest) AS min_digest
    FROM b GROUP BY lang
    """,
    category="function",
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding family — base64 / hex / md5 and the
    string↔bytes boundary (encode/octet_length): the plumbing every
    payload-bearing pipeline touches (checksums, wire encodings,
    cache keys). The per-row round-trip flag
    from_base64(base64(x)) == x folds to ONE bool_and per group, and
    the per-lang minima of the encoded forms pin the exact encoding
    conventions (alphabet, padding, hex case) cross-engine — the
    fixture being pure ASCII makes octet_length == length a
    deliberate second invariant (see the multimodal ASCII fixture
    pin).

    Shape: one scan, codegen projection, one aggregate."""
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    head8 = F.substring("text", 1, 8)
    b = d.select(
        "lang",
        F.base64(F.encode(head8, "utf-8")).alias("b64"),
        F.hex(F.encode(F.substring("text", 1, 4), "utf-8")).alias("hx"),
        (
            F.decode(F.unbase64(F.base64(F.encode(head8, "utf-8"))), "utf-8")
            == head8
        ).alias("rt_ok"),
        F.octet_length(F.encode(F.col("text"), "utf-8"))
        .cast("long")
        .alias("nbytes"),
        F.md5(F.encode(F.col("text"), "utf-8")).alias("digest"),
    )
    return b.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("b64").alias("min_b64"),
        F.min("hx").alias("min_hex"),
        F.bool_and("rt_ok").alias("all_roundtrip"),
        F.sum("nbytes").cast("long").alias("bytes_sum"),
        F.min("digest").alias("min_digest"),
    )


@register(
    "q_fn_xml",
    oracle="""
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_n,
           min(source) AS min_src,
           sum(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END)::BIGINT AS n_long
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    category="function",
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML extraction function family (xpath_string / xpath_int /
    xpath_boolean) — the feed-ingestion surface for the XML sitemaps
    and API payloads web pipelines still receive. The fixture has no
    XML column, so a document envelope is CONSTRUCTED
    (`<doc id=..><lang>..</lang><n>..</n><src>..</src></doc>`) and
    every output column is extracted back via xpath against the
    assembled string; the oracle recomputes the same rollup from the
    base columns directly, so parity proves the xpath extraction
    inverts the construction exactly (fixture lang/source values are
    markup-free tokens, so no entity escaping is involved).

    Scale posture: xpath evaluators are JVM expressions (no Python
    nodes — gated); one scan, one aggregate on the extracted lang."""
    d = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<doc id="'),
        F.col("doc_id"),
        F.lit('"><lang>'),
        F.col("lang"),
        F.lit("</lang><n>"),
        F.col("n_chars"),
        F.lit("</n><src>"),
        F.col("source"),
        F.lit("</src></doc>"),
    )
    parsed = d.select(
        F.xpath_string(xml, F.lit("doc/lang/text()")).alias("lang"),
        F.xpath_int(xml, F.lit("doc/n/text()")).alias("n"),
        F.xpath_string(xml, F.lit("doc/src/text()")).alias("src"),
        F.xpath_boolean(xml, F.lit("doc/n > 500")).alias("is_long"),
    )
    return (
        parsed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("total_n"),
            F.min("src").alias("min_src"),
            F.sum(F.when(F.col("is_long"), 1).otherwise(0))
            .cast("long")
            .alias("n_long"),
        )
        .orderBy("lang")
    )
