"""Text analysis for LLM data pipelines (SURVEY.md §2.4): token
counting, quality scoring, language ID, and document fingerprinting
over the `documents` table.

Everything is built-in JVM expressions (regexp_*, split, md5) — these
run inside whole-stage codegen over billions of documents with zero
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.operators.skew import capped_bucket_pairs
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table
from batchprocessor_spark.session import materialize

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols.
_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID (public-knowledge common words).
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}


@register(
    "q_llm_text_stats",
    oracle="""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars_calc,
           len(string_split(text, ' '))::INT AS n_words,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::INT
             AS n_tokens,
           round(length(replace(text, ' ', ''))::DOUBLE
                 / len(string_split(text, ' ')), 6) AS avg_word_len,
           len(regexp_extract_all(text, '[.!?]'))::INT AS n_sentences,
           (length(text) - length(replace(text, 'e', '')))::BIGINT AS n_letter_e
    FROM documents
    """,
    category="text",
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics: char/word/token counts (whitespace and
    BPE-ish regex tokenizations), average word length, sentence count,
    single-char frequency."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(words).alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(_TOKEN_RE)).alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(words),
            6,
        ).alias("avg_word_len"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]")).alias("n_sentences"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit("e"), F.lit("")))
        ).cast("long").alias("n_letter_e"),
    )


@register(
    "q_llm_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio,
             length(replace(text, ' ', ''))::DOUBLE
               / len(string_split(text, ' ')) AS avg_word_len
      FROM documents)
    SELECT doc_id, lang, source, n_chars, n_words::INT AS n_words,
           round(punct_ratio, 6) AS punct_ratio,
           round(avg_word_len, 6) AS avg_word_len
    FROM scored
    WHERE n_chars BETWEEN 100 AND 20000
      AND n_words >= 20
      AND punct_ratio < 0.1
      AND avg_word_len BETWEEN 2 AND 12
    """,
    category="text",
)
def q_llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (length, word count, punctuation ratio,
    average word length) — the standard pre-training corpus filter
    shape. Pure predicate pushdown-friendly scan."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    punct_ratio = F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]")).cast(
        "double"
    ) / F.greatest(F.length("text"), F.lit(1))
    avg_word_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    )
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            n_words.alias("n_words"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(avg_word_len, 6).alias("avg_word_len"),
        )
        .where(
            F.col("n_chars").between(100, 20000)
            & (F.col("n_words") >= 20)
            & (F.col("punct_ratio") < 0.1)
            & F.col("avg_word_len").between(2, 12)
        )
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{words}], w)))"
    )


@register(
    "q_llm_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS sc_en,
             {_lang_score_sql('de')} AS sc_de,
             {_lang_score_sql('es')} AS sc_es,
             {_lang_score_sql('fr')} AS sc_fr
      FROM documents)
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN greatest(sc_en, sc_de, sc_es, sc_fr) = 0 THEN 'und'
                WHEN sc_en >= greatest(sc_de, sc_es, sc_fr) THEN 'en'
                WHEN sc_de >= greatest(sc_es, sc_fr) THEN 'de'
                WHEN sc_es >= sc_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           sc_en::INT AS sc_en
    FROM scored
    """,
    category="text",
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: count per-language stopword hits and
    pick the max (ties broken by a fixed language priority, 'und' when
    no stopword appears). A real pipeline plugs fastText here; the
    Spark plumbing — tokenized votes, argmax — is identical."""
    d = load_table(spark, sf_dir, "documents")
    lw = F.split(F.lower(F.col("text")), " ")

    def score(lang: str):
        stops = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(lw, lambda w: F.array_contains(stops, w)))

    scored = d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        score("en").alias("sc_en_raw"),
        score("de").alias("sc_de"),
        score("es").alias("sc_es"),
        score("fr").alias("sc_fr"),
    )
    return scored.select(
        "doc_id",
        "lang_actual",
        F.when(F.greatest("sc_en_raw", "sc_de", "sc_es", "sc_fr") == 0, "und")
        .when(F.col("sc_en_raw") >= F.greatest("sc_de", "sc_es", "sc_fr"), "en")
        .when(F.col("sc_de") >= F.greatest("sc_es", "sc_fr"), "de")
        .when(F.col("sc_es") >= F.col("sc_fr"), "es")
        .otherwise("fr")
        .alias("lang_pred"),
        F.col("sc_en_raw").cast("int").alias("sc_en"),
    )


@register(
    "q_llm_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(7::BIGINT,
                          list_transform(string_split(text, ''),
                                         c -> ord(c)::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 2147483647
           ) AS rolling_hash
    FROM documents
    """,
    category="text",
)
def q_llm_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint:
    h = fold(chars, h0=7, h*31 + code mod 2^31-1) — deterministic and
    engine-agnostic (same integer fold in Spark and DuckDB), unlike
    md5/xxhash which differ per engine. The modulo keeps every
    intermediate < 2^36, so ANSI overflow checking never trips."""
    d = load_table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    rolling = F.aggregate(
        chars,
        F.lit(7).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(2147483647).cast("long"),
    )
    return d.select("doc_id", rolling.alias("rolling_hash"))


@register(
    "q_llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fingerprint,
           count(*) OVER (PARTITION BY
             md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))))::BIGINT
             AS dup_count
    FROM documents
    """,
    category="text",
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint (md5 of lowercased alphanumerics) —
    catches whitespace/punctuation-only duplicates that exact-match
    dedup misses, with the per-fingerprint duplicate count."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]", "")))
    from pyspark.sql import Window

    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1)).over(Window.partitionBy(fp)).alias("dup_count"),
    )


_VOCAB_TOP_K = 100
_BIGRAM_TOP_K = 50


@register(
    "q_llm_vocab_topk",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents),
    counted AS (
      SELECT token, count(*)::BIGINT AS cnt
      FROM w WHERE token <> ''
      GROUP BY token),
    ranked AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM counted)
    SELECT token, cnt, rnk FROM ranked WHERE rnk <= {_VOCAB_TOP_K}
    """,
    category="text",
)
def q_llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 lowercase word types by frequency —
    the vocabulary-building pass of a tokenizer-training pipeline.
    Shape at scale: explode is a narrow map, the count is one shuffle
    partially aggregated map-side (token space ≪ corpus size), and
    the global top-k is a TakeOrdered over the counted types (vocab
    cardinality, NOT corpus cardinality). Tie-break on token keeps
    the cut deterministic."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    token = F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token")
    counted = (
        d.select(token)
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # TakeOrderedAndProject computes the cut distributed (per-partition
    # top-100 → merge); the single-partition rank window then touches
    # only the 100 surviving rows, never the full vocabulary.
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counted.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(_VOCAB_TOP_K)
        .withColumn("rnk", F.row_number().over(w))
    )


@register(
    "q_llm_ngram_bigrams",
    oracle=f"""
    WITH w AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ws
      FROM documents),
    b AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w),
    counted AS (
      SELECT bigram, count(*)::BIGINT AS cnt FROM b GROUP BY bigram),
    ranked AS (
      SELECT bigram, cnt,
             row_number() OVER (ORDER BY cnt DESC, bigram) AS rnk
      FROM counted)
    SELECT bigram, cnt, rnk FROM ranked WHERE rnk <= {_BIGRAM_TOP_K}
    """,
    category="text",
)
def q_llm_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams across the corpus (n-gram statistics for
    tokenizer/LM diagnostics). Bigram construction is pure array math
    per document — zip_with over two shifted slices, no self-join, no
    UDF; then the same count + deterministic top-k shape as the
    vocabulary query."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Same distributed-cut shape as q_llm_vocab_topk: TakeOrdered for
    # the top-50, rank window only over the survivors.
    w = Window.orderBy(F.col("cnt").desc(), F.col("bigram"))
    return (
        counted.orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(_BIGRAM_TOP_K)
        .withColumn("rnk", F.row_number().over(w))
    )


_BOILERPLATE_TOP_N = 10


@register(
    "q_llm_boilerplate_filter",
    oracle=f"""
    WITH counted AS (
      SELECT token, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    top AS (
      SELECT token FROM counted
      ORDER BY cnt DESC, token LIMIT {_BOILERPLATE_TOP_N}),
    toplist AS (SELECT list(token) AS toks FROM top),
    cleaned AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         w -> NOT list_contains(toks, w)) AS ws,
             len(string_split(text, ' '))::BIGINT AS n_before
      FROM documents, toplist)
    SELECT doc_id, n_before, len(ws)::BIGINT AS n_after,
           md5(array_to_string(ws, ' ')) AS cleaned_fp
    FROM cleaned
    """,
    category="text",
)
def q_llm_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate removal: compute the 10 globally most
    frequent tokens (deterministic tie-break), then strip them from
    every document — the stopword/boilerplate pass that precedes
    TF-IDF or quality scoring. The two-phase shape is the one that
    scales: a token-count aggregate reduces 100 TB to a vocab-sized
    table, the top-N (model-sized, like k-means centroids) broadcasts
    back, and removal is a per-row array filter with no further
    shuffle. Emits before/after counts plus an md5 of the cleaned
    text so the full transformation is value-checked."""
    d = load_table(spark, sf_dir, "documents")
    counted = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = [
        r.token
        for r in counted.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(_BOILERPLATE_TOP_N)
        .collect()
    ]
    words = F.split(F.col("text"), " ")
    cleaned = F.filter(words, lambda w: ~w.isin(*top))
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_before"),
        F.size(cleaned).cast("long").alias("n_after"),
        F.md5(F.array_join(cleaned, " ")).alias("cleaned_fp"),
    )


_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "q_llm_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))::INT AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}'))::INT AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM aug
    """,
    category="text",
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: detect and replace email addresses and phone
    numbers with placeholder tags, reporting per-doc redaction counts
    and a fingerprint of the scrubbed text. The fixture corpus is
    synthetic word-soup, so a deterministic email+phone is injected
    per doc first — the scrub path is then exercised for real (every
    row redacts ≥1 of each) and remains value-checked end-to-end.
    Pure regexp expressions in whole-stage codegen; at 100 TB this is
    a narrow map with zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_fp"),
    )


_TFIDF_TOP_K = 3


@register(
    "q_llm_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf
      FROM tok GROUP BY doc_id, token),
    df AS (
      SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY token),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (token), n),
    ranked AS (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rnk
      FROM scored)
    SELECT doc_id, token, tfidf, rnk FROM ranked WHERE rnk <= {_TFIDF_TOP_K}
    """,
    category="text",
)
def q_llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic corpus-weighted
    relevance scoring (smoothed idf = ln((N+1)/(df+1))). Ranking uses
    the ROUNDED score so cross-engine float noise below 1e-6 cannot
    flip the cut.

    Shuffle accounting (the scale shape): ONE full-data exchange —
    documents repartition by doc_id BEFORE the explode (docs cross the
    wire, not the ~20× larger token stream), and that single hash
    partitioning then satisfies the tf aggregate's clustering (subset
    of its keys), the final per-doc window, AND lets AQE reuse the
    exchange for the df branch. Document frequency derives from the tf
    table (its rows ARE the distinct (doc, token) pairs), so there is
    no second scan or countDistinct expansion; its exchange moves only
    vocab-sized partials. The per-doc top-k is a WindowGroupLimit."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.repartition("doc_id").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # one scalar; the oracle's CTE twin
    tfidf = F.round(
        F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        tf.join(F.broadcast(df), "token")
        .select("doc_id", "token", tfidf.alias("tfidf"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TFIDF_TOP_K)
    )


_REP_ORACLE = """
    WITH g AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS nw,
             list_transform(range(1, len(string_split(text, ' '))),
                            i -> string_split(text, ' ')[i] || ' ' ||
                                 string_split(text, ' ')[i+1]) AS bg,
             list_transform(range(1, len(string_split(text, ' ')) - 1),
                            i -> string_split(text, ' ')[i] || ' ' ||
                                 string_split(text, ' ')[i+1] || ' ' ||
                                 string_split(text, ' ')[i+2]) AS tg
      FROM documents)
    SELECT doc_id, nw::INT AS n_words,
           round(len(list_distinct(ws))::DOUBLE / nw, 6) AS distinct_word_frac,
           CASE WHEN len(bg) = 0 THEN 0.0 ELSE
             round(list_max(list_transform(list_distinct(bg),
                     b -> len(list_filter(bg, x -> x = b))))::DOUBLE / len(bg), 6)
           END AS top_bigram_frac,
           CASE WHEN len(tg) = 0 THEN 0.0 ELSE
             round(1 - len(list_distinct(tg))::DOUBLE / len(tg), 6)
           END AS dup_trigram_frac
    FROM g
"""


def _grams(words, width: int):
    """Non-distinct word n-gram list as a per-row array expression.

    r12 (guide §1.2/§4): built with ``zip_with`` over shifted slices,
    NOT ``transform(sequence(...), i -> slice(words, i, width))``.
    Higher-order functions are interpreted (CodegenFallback) and their
    lambda bodies get no common-subexpression elimination, so a lambda
    that references the raw ``split(text, ' ')`` expression re-runs
    the split for EVERY element — O(words²) per document (the same
    defect class as dedup._words_spread, measured as the bulk of
    q_llm_repetition_stats' runtime at sf0.1: 7.7 s → 1.6 s). In
    ``zip_with`` the arrays are ARGUMENTS, evaluated once per row; the
    lambda touches only its element variables."""
    n = F.size(words)
    cnt = F.greatest(n - (width - 1), F.lit(0))
    zipped = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    for off in range(3, width + 1):
        zipped = F.zip_with(
            zipped,
            F.slice(words, off, F.greatest(n - (off - 1), F.lit(0))),
            lambda p, c: F.concat(p, F.lit(" "), c),
        )
    # zip_with pads the shorter side with null (concat → null); the
    # trailing width−1 null entries are sliced off. NULL input words
    # (split of NULL text) yield [] — not NULL — preserving the pre-r12
    # contract that downstream size(...) == 0 guards rely on
    # (size(NULL) is -1, which would silently skip them; ADVICE r12).
    return F.coalesce(
        F.slice(zipped, 1, cnt), F.array().cast("array<string>")
    )


@register("q_llm_repetition_stats", oracle=_REP_ORACLE, category="text")
def q_llm_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    quality heuristics): distinct-word fraction, fraction of bigram
    occurrences taken by the single most frequent bigram, and the
    duplicate-trigram fraction. High repetition marks boilerplate,
    SEO spam, and decoding loops.

    All three signals are per-row array folds — a narrow map with NO
    shuffle and no Python. The top-bigram count is the max run length
    over the SORTED bigram array (equal grams are adjacent after
    array_sort, so max multiplicity = longest run): O(n log n) per
    document. r12 (guide §2.4): this replaces the explode +
    two-aggregate + join formulation — same values, but the per-doc
    max never needed a corpus-wide shuffle; the whole query is now a
    single codegen'd scan+project (plan evidence
    plans/r12/q_llm_repetition_stats_{before,after}.txt, 7.7 s →
    1.6 s at sf0.1). The r3 per-row transform×filter scan stays
    rejected — it was O(n²) per document; the sorted-run fold is not."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    bg, tg = _grams(words, 2), _grams(words, 3)
    n_bg = F.size(bg)
    # Max bigram multiplicity via sorted-run fold: state carries the
    # previous gram, current run length, and best run seen.
    top_bg = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda st, x: F.struct(
            x.alias("prev"),
            F.when(x == st.prev, st.run + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                st.best,
                F.when(x == st.prev, st.run + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda st: st.best,
    )
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.round(
            F.size(F.array_distinct(words)).cast("double") / F.size(words), 6
        ).alias("distinct_word_frac"),
        F.when(n_bg == 0, F.lit(0.0))
        .otherwise(F.round(top_bg.cast("double") / n_bg, 6))
        .alias("top_bigram_frac"),
        F.when(F.size(tg) == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1) - F.size(F.array_distinct(tg)).cast("double") / F.size(tg), 6
            )
        )
        .alias("dup_trigram_frac"),
    )


_BPE_TOP_K = 20  # merge candidates reported per BPE iteration


@register(
    "q_llm_bpe_pairs",
    oracle=f"""
    WITH w AS (
      SELECT token, count(*)::BIGINT AS cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents)
      WHERE length(token) >= 2 GROUP BY token),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(token) - 1),
                                   i -> substring(token, i, 2))) AS pair,
             cnt
      FROM w),
    counted AS (
      SELECT pair, sum(cnt)::BIGINT AS freq FROM pairs GROUP BY pair),
    ranked AS (
      SELECT pair, freq,
             row_number() OVER (ORDER BY freq DESC, pair) AS rnk
      FROM counted)
    SELECT pair, freq, rnk FROM ranked WHERE rnk <= {_BPE_TOP_K}
    """,
    category="text",
)
def q_llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration: corpus-weighted adjacent character
    pair counts. Tokenizer training's inner loop is exactly this —
    count every adjacent symbol pair across the vocabulary weighted
    by word frequency, then merge the argmax; the query emits the
    top-{_BPE_TOP_K} merge candidates (deterministic tie-break on
    the pair).

    Scale posture: pair counting runs on the WORD-FREQUENCY table
    (vocabulary-sized, built with one map-side-combined shuffle),
    not the corpus — the 100 TB corpus is touched once to count
    words; every subsequent BPE iteration would re-explode only the
    vocab. Top-k is TakeOrdered over pair space (<= 26^2 here).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    token = F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token")
    vocab = (
        d.select(token)
        .where(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("token") - 1),
            lambda i: F.col("token").substr(i, F.lit(2)),
        )
    ).alias("pair")
    counted = (
        vocab.select(pair, "cnt").groupBy("pair").agg(F.sum("cnt").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("pair"))
    return (
        counted.orderBy(F.col("freq").desc(), F.col("pair"))
        .limit(_BPE_TOP_K)
        .withColumn("rnk", F.row_number().over(w))
    )


_ADAPTIVE_Q = 0.25  # corpus quantile below which documents are dropped


@register(
    "q_llm_adaptive_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words
      FROM documents),
    th AS (SELECT quantile_cont(n_words, {_ADAPTIVE_Q}) AS thr FROM s)
    SELECT lang,
           count(*)::BIGINT AS kept,
           (SELECT thr FROM th) AS thr_words
    FROM s WHERE n_words > (SELECT thr FROM th)
    GROUP BY lang
    """,
    category="text",
)
def q_llm_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: instead of a fixed word-count floor
    (q_llm_quality_filter), the threshold is the CORPUS's own 25th
    percentile, so the filter tracks the data distribution as the
    corpus evolves — the percentile-pinned variant of pre-training
    quality filtering. Emits survivors per language plus the threshold
    that was applied.

    Scale posture: the quantile reduces the corpus to ONE number via
    an exact percentile over integer word counts (at 100 TB swap in
    approx_percentile — the query shape is unchanged); that scalar is
    broadcast back (crossJoin of a 1-row frame, Catalyst plans a
    BroadcastNestedLoopJoin with a 1-row build side) so the corpus
    scan itself is filtered without a shuffle, and the survivor count
    is a tiny per-language aggregate.
    """
    s = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_words")
    )
    th = s.agg(F.percentile("n_words", F.lit(_ADAPTIVE_Q)).alias("thr_words"))
    return (
        s.crossJoin(F.broadcast(th))
        .where(F.col("n_words") > F.col("thr_words"))
        .groupBy("lang", "thr_words")
        .agg(F.count(F.lit(1)).alias("kept"))
        .select("lang", "kept", "thr_words")
    )


@register(
    "q_llm_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents),
    toks AS (SELECT doc_id, token FROM w WHERE token <> ''),
    counted AS (
      SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
    vocab AS (
      SELECT token FROM (
        SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
        FROM counted) WHERE rnk <= {_VOCAB_TOP_K}),
    per_doc AS (
      SELECT t.doc_id,
             count(*)::BIGINT AS n_tokens,
             sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
      FROM toks t LEFT JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id)
    SELECT d.lang,
           count(*)::BIGINT AS n_docs,
           sum(p.n_tokens)::BIGINT AS tokens,
           sum(p.n_oov)::BIGINT AS oov,
           round(sum(p.n_oov)::DOUBLE / sum(p.n_tokens), 6) AS oov_rate
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
    category="text",
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage diagnostic: build the top-{100} word vocab
    (q_llm_vocab_topk's cut) and measure per-language out-of-vocab
    token rates — the coverage table a tokenizer team reads before
    freezing a vocab, and the first place under-served languages show
    up.

    Scale posture: the vocab is vocab-cardinality (a TakeOrdered over
    counted types) and broadcasts back onto the token stream — the
    corpus-side explode joins a {100}-row build side, no shuffle of
    tokens for the membership test; per-doc and per-lang rollups are
    map-side-combined aggregates. OOV rate divides two exact BIGINTs
    once per language.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    counted = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counted.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(_VOCAB_TOP_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("n_oov").alias("oov"),
            F.round(F.sum("n_oov") / F.sum("n_tokens"), 6).alias("oov_rate"),
        )
    )


@register(
    "q_llm_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS token
      FROM documents),
    cnt AS (
      SELECT doc_id, token, count(*)::BIGINT AS c
      FROM tok GROUP BY 1, 2),
    agg AS (
      SELECT doc_id,
             sum(c)::BIGINT AS n_tokens,
             count(*)::BIGINT AS n_types,
             sum(c::DOUBLE * log2(c::DOUBLE)) AS sum_clogc
      FROM cnt GROUP BY 1)
    SELECT doc_id, n_tokens, n_types,
           n_types::DOUBLE / n_tokens AS type_token_ratio,
           round(log2(n_tokens::DOUBLE) - sum_clogc / n_tokens, 6) AS entropy_bits
    FROM agg
    """,
    category="text",
)
def q_llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy (bits/token) and type-token ratio —
    the information-density diagnostics a corpus-quality pipeline uses
    to flag degenerate/templated text (low entropy) next to the
    repetition and boilerplate detectors.

    Shape: explode to (doc, token) → count → per-doc aggregate: two
    shuffles, the first on (doc_id, token) with map-side combine, the
    second moving only one row per (doc, partial) — deliberately NOT a
    single doc_id repartition, which would shuffle every raw token
    occurrence uncombined. Entropy uses the algebraic form
    log2(N) − Σ c·log2(c) / N so only ONE pass over the count table is
    needed (no per-row p=c/N materialization). type_token_ratio is a
    single IEEE divide of exact integers (bit-identical cross-engine);
    entropy sums doubles whose order differs between engines, so it is
    rounded to 6 dp."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("token"),
    )
    cnt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias("sum_clogc"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / F.col("n_tokens")).alias("type_token_ratio"),
        F.round(
            F.log2(F.col("n_tokens").cast("double")) - F.col("sum_clogc") / F.col("n_tokens"), 6
        ).alias("entropy_bits"),
    )


# Chunking: 50-word chunks, stride 40 (10-word overlap) — the
# fixed-context packing a RAG / training tokenization stage uses.
_CHUNK_WORDS = 50
_CHUNK_STRIDE = 40


@register(
    "q_llm_chunk_documents",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    starts AS (
      SELECT doc_id, ws, unnest(range(1, len(ws) + 1, {_CHUNK_STRIDE})) AS start
      FROM d)
    SELECT doc_id,
           ((start - 1) // {_CHUNK_STRIDE})::INT AS chunk_id,
           least({_CHUNK_WORDS}, len(ws) - start + 1)::INT AS n_chunk_words,
           array_to_string(list_slice(ws, start, start + {_CHUNK_WORDS} - 1), ' ')
             AS chunk_text
    FROM starts
    """,
    category="text",
)
def q_llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: each document split into
    50-word chunks with a 10-word overlap (stride 40) — the
    context-window packing step before embedding or tokenizing a
    corpus. Works entirely in JVM array expressions (split → sequence
    of starts → slice per start → explode): no Python, no shuffle at
    all — chunking is embarrassingly parallel.

    r12 (guide §1.2/§4): the word split is materialized as a column
    in a Project BELOW the Generate. The transform lambda's body
    references the word array, and interpreted lambda evaluation has
    no common-subexpression elimination — with the split inline the
    lambda re-split the text for every chunk, O(words²/stride) per
    document. A Generate does not collapse into its child Project, so
    the split now runs exactly once per row (plan evidence
    plans/r12/q_llm_chunk_documents_{before,after}.txt: ``split``
    appears once, below the Generate; measured 1.6 s → 0.26 s at
    sf0.01 on the shared prototype session)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.col("__ws")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(ws), F.lit(_CHUNK_STRIDE)),
        lambda start: F.struct(
            ((start - 1) / F.lit(_CHUNK_STRIDE)).cast("int").alias("chunk_id"),
            F.least(F.lit(_CHUNK_WORDS), F.size(ws) - start + 1)
            .cast("int")
            .alias("n_chunk_words"),
            F.array_join(F.slice(ws, start, _CHUNK_WORDS), " ").alias("chunk_text"),
        ),
    )
    return (
        d.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.n_chunk_words", "c.chunk_text")
    )


# A passage repeated across this many documents is "boilerplate" at
# fixture scale; production sets this orders of magnitude higher.
_PASSAGE_MIN_DOCS = 2
_PASSAGE_WIDTH = 5


@register(
    "q_llm_dup_passages",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS i FROM d),
    sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
               || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win
               AS passage
      FROM w
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      QUALIFY passage IS NOT NULL)
    SELECT passage, count(*)::BIGINT AS n_docs
    FROM sh GROUP BY 1 HAVING count(*) >= {_PASSAGE_MIN_DOCS}
    """,
    category="dedup",
)
def q_llm_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-passage detection: word-5-gram passages
    that appear in ≥_PASSAGE_MIN_DOCS (2) distinct documents — the
    passage-granularity
    exact-substring dedup signal (memorization risk / boilerplate)
    that document-level dedup cannot see.

    Shape: per-doc DISTINCT passages via array expressions (no
    n²-explode), one count shuffle on the passage key, HAVING filter.
    A hot passage is exactly ONE reducer row here (count only), so
    unlike the pair-emitting joins this needs no salting at 100 TB —
    map-side partial counts absorb the skew."""
    from batchprocessor_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    return (
        shingles(docs, width=_PASSAGE_WIDTH)
        .withColumnRenamed("shingle", "passage")
        .groupBy("passage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= _PASSAGE_MIN_DOCS)
    )


@register(
    "q_llm_lm_perplexity",
    oracle="""
    WITH d AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS ws
      FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM d, unnest(range(1, len(ws))) AS t(i)),
    c12 AS (SELECT w1, w2, count(*)::BIGINT AS c FROM big GROUP BY 1, 2),
    c1 AS (
      SELECT w, count(*)::BIGINT AS c
      FROM (SELECT unnest(ws) AS w FROM d) GROUP BY 1),
    v AS (SELECT count(*)::BIGINT AS v FROM c1),
    scored AS (
      SELECT b.doc_id,
             -log2((c12.c + 1)::DOUBLE / (c1.c + (SELECT v FROM v))) AS nll
      FROM big b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w)
    SELECT doc_id,
           count(*)::BIGINT AS n_bigrams,
           round(avg(nll), 6) AS avg_nll_bits,
           round(pow(2, avg(nll)), 2) AS ppl
    FROM scored GROUP BY doc_id
    """,
    category="text",
)
def q_llm_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical quality scoring via corpus bigram-LM perplexity —
    the CCNet-style filter: train add-one-smoothed bigram counts over
    the corpus itself, score each document by its average per-bigram
    negative log-likelihood (bits) and perplexity 2^avg. Outlier-high
    perplexity = text unlike the corpus; outlier-low = degenerate
    repetition. The model-based sibling of the heuristic quality
    filters (q_llm_quality_filter, q_llm_adaptive_quality).

    Shape: doc bigrams via array expressions (one explode, no
    self-join), then two equi joins onto the model tables — the
    bigram-count join shuffles on (w1, w2), the history-count join on
    w1; both model tables are vocabulary-sized (≪ corpus). V arrives
    as a broadcast 1-row literal. At 100 TB the model tables are
    exactly the n-gram LM sharding used at web scale; a hot function
    word is one shuffle key with map-side-combined counts, not an
    output blowup. Floats: per-doc NLL sums vary in order between
    engines ⇒ round(6); ppl exponentiates the already-agreed average
    ⇒ round(2)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
    docs = d.select("doc_id", ws.alias("ws"))
    big = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = docs.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c1")
    )
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll_bits"),
        F.round(F.pow(F.lit(2.0), F.avg("nll")), 2).alias("ppl"),
    )


_SPAN_LEN = 3     # masked span length in words
_SPAN_STRIDE = 20  # one span per 20-word block, offset varies per doc


@register(
    "q_llm_span_corruption",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' '))::BIGINT AS n_words,
             doc_id % {_SPAN_STRIDE} AS off
      FROM documents),
    masked AS (
      SELECT doc_id, n_words,
             array_to_string(
               list_filter(
                 list_transform(range(1, n_words::INT + 1),
                   i -> CASE WHEN ((i - 1 - off) % {_SPAN_STRIDE} + {_SPAN_STRIDE})
                                  % {_SPAN_STRIDE} >= {_SPAN_LEN}
                             THEN ws[i] END),
                 x -> x IS NOT NULL), ' ') AS corrupted,
             len(list_filter(
                 list_transform(range(1, n_words::INT + 1),
                   i -> CASE WHEN ((i - 1 - off) % {_SPAN_STRIDE} + {_SPAN_STRIDE})
                                  % {_SPAN_STRIDE} < {_SPAN_LEN}
                             THEN 1 END),
                 x -> x IS NOT NULL))::BIGINT AS n_masked
      FROM d)
    SELECT doc_id, n_words, n_masked, md5(corrupted) AS corrupt_md5
    FROM masked
    """,
    category="text",
)
def q_llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (deterministic): every {_SPAN_STRIDE}-
    word block loses a {_SPAN_LEN}-word span whose offset rotates per
    document (doc_id mod {_SPAN_STRIDE}) — the denoising-objective
    preprocessing that turns a corpus into (corrupted, target) pairs.
    Emits per doc the masked token count and an md5 of the corrupted
    text, so the oracle checks the actual output sequence, not just
    counts.

    Shape: a pure narrow projection (array transform + filter inside
    whole-stage codegen; position logic is modular arithmetic on the
    word index) — zero shuffles, embarrassingly parallel at any
    scale. Exactness: the mask decision is integer arithmetic; the
    md5 ties the reconstructed string bit-for-bit cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    off = F.col("doc_id") % _SPAN_STRIDE
    in_span = lambda i: (  # noqa: E731 - i is the 0-based word index
        (i - off) % _SPAN_STRIDE + _SPAN_STRIDE
    ) % _SPAN_STRIDE < _SPAN_LEN
    kept = F.filter(words, lambda x, i: ~in_span(i))
    n_masked = F.size(words) - F.size(kept)
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_masked.cast("long").alias("n_masked"),
        F.md5(F.array_join(kept, " ")).alias("corrupt_md5"),
    )


@register(
    "q_llm_ngram_novelty",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS i FROM d),
    sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
      FROM w
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      QUALIFY g IS NOT NULL),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
    per AS (
      SELECT s.doc_id,
             count(*)::BIGINT AS n_ngrams,
             sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT
               AS novel_ngrams
      FROM sh s JOIN firsts f ON f.g = s.g
      GROUP BY 1)
    SELECT doc_id, n_ngrams, novel_ngrams,
           ((10000 * novel_ngrams) // n_ngrams)::BIGINT AS novelty_bp
    FROM per
    """,
    category="text",
)
def q_llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against the already-ingested corpus:
    for each document, the fraction (basis points) of its distinct
    word-3-grams whose FIRST holder (minimum doc_id — ingestion order)
    is this document. Low novelty = the document is mostly re-treading
    earlier text; the curation signal used to demote scraped mirrors
    and boilerplate-stuffed pages that exact/near dedup keeps (they
    are not duplicates of any ONE document).

    Shape: the dup-passages shingle core (array n-grams, no explode
    of positions) → min(doc_id) per n-gram (count-style shuffle,
    skew-immune: a hot n-gram is one reducer ROW) → join the
    doc-level distinct shingle list back to its firsts and aggregate.
    Integer counts and a DIV ratio — exact oracle, no rounding.

    Scale posture: two shuffles on the n-gram key, one on doc_id;
    min(doc_id) is associative (map-side partials). For a streaming
    corpus the `firsts` table is the persistent state and novelty of
    a new batch is one anti-join against it (q_dedup_incremental's
    admit pattern at n-gram granularity)."""
    from batchprocessor_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs, width=3)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel_ngrams"),
        )
    )
    return per.select(
        "doc_id",
        "n_ngrams",
        "novel_ngrams",
        F.expr("(10000 * novel_ngrams) div n_ngrams").cast("long").alias("novelty_bp"),
    )


# Hashing-trick geometry: 16 feature buckets, sign from an independent
# hash bit (Weinberger et al. 2009 — the sign makes collision noise
# zero-mean instead of additive).
_FHASH_B = 16


@register(
    "q_llm_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
      WHERE length(w) >= 3),
    hashed AS (
      SELECT doc_id,
             ('0x' || substring(md5('fh:' || w), 1, 8))::BIGINT % {_FHASH_B}
               AS bucket,
             CASE WHEN ('0x' || substring(md5('fs:' || w), 1, 8))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks)
    SELECT doc_id, bucket,
           count(*)::BIGINT AS n_tokens,
           sum(sgn)::BIGINT AS feature_val
    FROM hashed GROUP BY 1, 2
    """,
    category="text",
)
def q_llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al.): every
    token maps to one of 16 feature buckets by a seeded hash, with a
    SIGN drawn from an independent hash bit so colliding tokens cancel
    in expectation instead of stacking — the constant-memory
    featurizer that turns unbounded vocabularies into fixed-width
    model inputs with NO vocabulary table, no fit step, and no
    train/serve skew (the hash IS the vocabulary). Output is the
    long-form sparse vector (doc, bucket, signed value + raw token
    count).

    Exactness: both hashes are the engine-agnostic md5 idiom
    (dedup.py:984), counts and signed sums are integers — the oracle
    replays the featurizer bit-for-bit.

    Scale posture: tokenize → hash → ONE map-side-combined aggregate
    on (doc, bucket); state per doc is ≤16 cells regardless of
    vocabulary, the same bounded-state argument as the count-min grid
    (q_sketch_countmin) applied per-row-group. No vocabulary
    broadcast, no OOV handling, ever."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .filter(F.length("w") >= 3)
    )
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(salt), F.col("w"))), 1, 8), 16, 10
    ).cast("long")
    hashed = toks.select(
        "doc_id",
        (h("fh:") % _FHASH_B).alias("bucket"),
        F.when(h("fs:") % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    return hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("sgn").alias("feature_val"),
    )


_COLLOC_MIN_CNT = 5
_COLLOC_TOP_K = 20


@register(
    "q_text_collocation_lift",
    oracle=f"""
    WITH w AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ws
      FROM documents),
    uni AS (
      SELECT token, count(*)::BIGINT AS c1
      FROM (SELECT unnest(ws) AS token FROM w) GROUP BY token),
    tot AS (SELECT sum(c1)::BIGINT AS nt FROM uni),
    big AS (
      SELECT bigram, count(*)::BIGINT AS cxy FROM (
        SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM w) GROUP BY bigram
      HAVING count(*) >= {_COLLOC_MIN_CNT}),
    btot AS (
      SELECT sum(len(ws) - 1)::BIGINT AS nb FROM w WHERE len(ws) >= 2),
    lifted AS (
      SELECT b.bigram, b.cxy,
             ((b.cxy::HUGEINT * t.nt::HUGEINT * t.nt::HUGEINT * 10000)
              // (bt.nb::HUGEINT * u1.c1::HUGEINT * u2.c1::HUGEINT))::BIGINT
               AS lift_bp
      FROM big b
      JOIN uni u1 ON u1.token = split_part(b.bigram, ' ', 1)
      JOIN uni u2 ON u2.token = split_part(b.bigram, ' ', 2)
      CROSS JOIN tot t CROSS JOIN btot bt),
    ranked AS (
      SELECT bigram, cxy, lift_bp,
             row_number() OVER (ORDER BY lift_bp DESC, bigram) AS rnk
      FROM lifted)
    SELECT bigram, cxy, lift_bp, rnk FROM ranked WHERE rnk <= {_COLLOC_TOP_K}
    """,
    category="text",
)
def q_text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top-{20} word bigrams by LIFT —
    P(xy) / (P(x)·P(y)), the association strength behind phrase
    detection (PMI's exponent, kept in INTEGER basis points so both
    engines truncate identically instead of comparing drifting logs).
    Bigrams below {5} occurrences are pruned BEFORE any join — the
    standard support threshold that also bounds the join input.

    Scale posture: exactly TWO corpus scans (gated) — one for
    unigram counts, one for bigram counts; both count tables are
    vocab-sized aggregate state and are materialized once
    (materialize, the same partial-materialization pattern as
    q_agg_bitmap_distinct), so the corpus totals Nt = Σc1 and
    Nb = Σcxy-unfiltered derive from the MATERIALIZED counts with no
    re-scan. The lift join touches only the support-filtered bigrams
    against broadcast unigram counts. The hot numerator uses
    decimal(38) (HUGEINT on the oracle side) — cxy·Nt²·10⁴ overflows
    int64 at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
    docs = d.select(ws.alias("ws"))
    uni = (
        docs.select(F.explode("ws").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
        .transform(materialize)
    )
    tot = uni.agg(F.sum("c1").cast("long").alias("nt"))
    n = F.size(F.col("ws"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("ws"), 1, n - 1),
            F.slice(F.col("ws"), 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigall = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .transform(materialize)
    )
    big = bigall.where(F.col("cxy") >= _COLLOC_MIN_CNT)
    # Nb = Σ(len(ws)−1) over len≥2 docs ≡ the unfiltered bigram count
    # total — derived from the materialized counts, not a third scan.
    btot = bigall.agg(F.sum("cxy").cast("long").alias("nb"))
    u1 = uni.select(F.col("token").alias("t1"), F.col("c1").alias("c1_1"))
    u2 = uni.select(F.col("token").alias("t2"), F.col("c1").alias("c1_2"))
    lifted = (
        big.withColumn("t1", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn("t2", F.expr("split_part(bigram, ' ', 2)"))
        .join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "bigram",
            "cxy",
            F.expr(
                "CAST((CAST(cxy AS DECIMAL(38,0)) * nt * nt * 10000)"
                " DIV (CAST(nb AS DECIMAL(38,0)) * c1_1 * c1_2) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("lift_bp").desc(), F.col("bigram"))
    return (
        lifted.orderBy(F.col("lift_bp").desc(), F.col("bigram"))
        .limit(_COLLOC_TOP_K)
        .withColumn("rnk", F.row_number().over(w))
    )


_BPE_SEQ0_DUCK = (
    "' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || '  _ '"
)
_BPE_PAIRS_DUCK = (
    "SELECT freq, unnest(list_transform("
    "generate_series(1, len(string_split(trim(seq), '  ')) - 1), "
    "i -> string_split(trim(seq), '  ')[i] || '  ' "
    "|| string_split(trim(seq), '  ')[i + 1])) AS pair FROM {src}"
)


def _bpe_oracle(rounds: int = 3) -> str:
    ctes = [
        """words AS (
      SELECT w, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
      WHERE w <> '' GROUP BY w)""",
        f"s0 AS (SELECT freq, {_BPE_SEQ0_DUCK} AS seq FROM words)",
    ]
    outs = []
    for r in range(rounds):
        ctes.append(
            f"p{r} AS (SELECT pair, sum(freq)::BIGINT AS cnt FROM ("
            + _BPE_PAIRS_DUCK.format(src=f"s{r}")
            + ") GROUP BY pair)"
        )
        ctes.append(
            f"b{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{r + 1} AS (SELECT freq, replace(seq, ' ' || b{r}.pair || ' ', "
            f"' ' || replace(b{r}.pair, '  ', '') || ' ') AS seq "
            f"FROM s{r}, b{r})"
        )
        outs.append(
            f"SELECT {r + 1}::BIGINT AS round, "
            f"string_split(pair, '  ')[1] AS tok_a, "
            f"string_split(pair, '  ')[2] AS tok_b, cnt FROM b{r}"
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(outs)


@register("q_llm_bpe_train", oracle=_bpe_oracle(), category="text")
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding TRAINER — 3 greedy merge rounds of the
    Sennrich et al. algorithm (the kernel inside every BPE/WordPiece
    tokenizer build): corpus → weighted word vocabulary → each word a
    token sequence of characters + '_' end marker → per round, count
    adjacent token pairs (frequency-weighted, position-based), merge
    the globally best pair (ties broken lexicographically) into every
    sequence, repeat. Emits (round, tok_a, tok_b, count) — the merge
    table a tokenizer ships. Sequences use the DOUBLE-SEPARATOR
    encoding (' a  b  c '): a single replace() then merges
    consecutive pair occurrences exactly like the greedy
    left-to-right scan (the shared boundary space that would break
    single-space encoding is never consumed), and token-boundary
    anchoring is structural, so Spark and DuckDB apply bit-identical
    merges. q_llm_bpe_pairs covers round-0 pair statistics; this is
    the iterated trainer.

    Scale posture: pair counting and merging run on the DISTINCT-word
    vocabulary weighted by corpus frequency (the standard trick —
    vocab-sized state, corpus-sized only in the initial word count);
    per round ONE aggregate + ONE 1-row driver collect (the merge
    decision — model-sized, same discipline as k-means centroids),
    and the merge itself is a map-side replace. At 100 TB rounds are
    bounded by vocab size, never corpus size."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace("w", "(.)", "$1  ")),
            F.lit("  _ "),
        ).alias("seq"),
    ).transform(materialize)  # corpus-sized work happens ONCE; the three
    # merge rounds (pair count + replace) run over this vocab-sized
    # materialization, which is the claim the docstring makes.
    pair_expr = (
        "transform(sequence(1, size(split(trim(seq), '  ')) - 1), "
        "i -> concat(element_at(split(trim(seq), '  '), i), '  ', "
        "element_at(split(trim(seq), '  '), i + 1)))"
    )
    out_rows = []
    cur = seqs
    for r in range(3):
        pairs = cur.select("freq", F.explode(F.expr(pair_expr)).alias("pair"))
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()[0]  # model-sized: ONE merge decision per round
        )
        tok_a, tok_b = best["pair"].split("  ")
        out_rows.append((r + 1, tok_a, tok_b, best["cnt"]))
        merged = tok_a + tok_b
        cur = cur.select(
            "freq",
            F.expr(
                f"replace(seq, ' {best['pair']} ', ' {merged} ')"
            ).alias("seq"),
        )
    return spark.createDataFrame(
        out_rows, "round BIGINT, tok_a STRING, tok_b STRING, cnt BIGINT"
    )


@register(
    "q_llm_distinctive_terms",
    oracle="""
    WITH w AS (
      SELECT source,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents),
    wc AS (
      SELECT source, token, count(*)::BIGINT AS a
      FROM w WHERE token <> '' GROUP BY source, token),
    tot AS (
      SELECT source, sum(a)::BIGINT AS src_total FROM wc GROUP BY source),
    gw AS (
      SELECT token, sum(a)::BIGINT AS g FROM wc GROUP BY token),
    gt AS (SELECT sum(a)::BIGINT AS grand FROM wc),
    cells AS (
      SELECT wc.source, wc.token, wc.a,
             gw.g - wc.a AS b,
             tot.src_total - wc.a AS c,
             gt.grand - gw.g - (tot.src_total - wc.a) AS d
      FROM wc JOIN gw ON wc.token = gw.token
              JOIN tot ON wc.source = tot.source
              CROSS JOIN gt),
    keyed AS (
      SELECT source, token, a,
             ((a + 1) * (d + 1) * 1000000
                // ((b + 1) * (c + 1)))::BIGINT AS odds_ppm
      FROM cells),
    ranked AS (
      SELECT source, token, a, odds_ppm,
             row_number() OVER (PARTITION BY source
                                ORDER BY odds_ppm DESC, token) AS rnk
      FROM keyed)
    SELECT source, token, a AS cnt, odds_ppm, rnk
    FROM ranked WHERE rnk <= 3
    """,
    category="text",
)
def q_llm_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source — the Monroe-et-al
    'fightin' words' analysis a curation pipeline runs to
    characterize (and spot contamination in) each data source: for
    every (source, token), the 2x2 contingency odds ratio
    (a+1)(d+1) / ((b+1)(c+1)) with add-one smoothing, top-3 tokens
    per source. The INSIGHT for cross-engine exactness: ranking by
    log-odds equals ranking by the odds ratio (log is monotone), and
    the smoothed ratio scaled to integer parts-per-million via DIV
    is an exact BIGINT ordering key — no logarithm, no float, no
    tie that can flip between engines (cnt ~ 1e5 per cell keeps
    (a+1)(d+1)*1e6 far inside BIGINT at fixture SFs; decimal(38)
    holds it at any SF).

    Scale posture: all state is vocabulary-sized ((source, token)
    cells, token totals, source totals, one grand total) — counts
    aggregate with map-side combine off ONE corpus scan lineage,
    the joins are count-table-sized (broadcast-able), and the top-3
    is WindowGroupLimit per source over the cell table."""
    w = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    wc = w.groupBy("source", "token").agg(F.count(F.lit(1)).alias("a"))
    wc = wc.transform(materialize)  # count tables feed 3 aggregates + the join
    tot = wc.groupBy("source").agg(F.sum("a").cast("long").alias("src_total"))
    gw = wc.groupBy("token").agg(F.sum("a").cast("long").alias("g"))
    gt = wc.agg(F.sum("a").cast("long").alias("grand"))
    cells = (
        wc.join(F.broadcast(gw), "token")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "token",
            "a",
            (F.col("g") - F.col("a")).alias("b"),
            (F.col("src_total") - F.col("a")).alias("c"),
            (
                F.col("grand") - F.col("g") - (F.col("src_total") - F.col("a"))
            ).alias("d"),
        )
    )
    keyed = cells.select(
        "source",
        "token",
        "a",
        F.expr(
            "CAST((a + 1) * (d + 1) * 1000000 DIV ((b + 1) * (c + 1)) AS BIGINT)"
        ).alias("odds_ppm"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("odds_ppm").desc(), F.col("token")
    )
    return (
        keyed.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 3)
        .select("source", "token", F.col("a").alias("cnt"), "odds_ppm", "rnk")
    )


@register(
    "q_text_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> x <> '')) AS token
      FROM documents),
    vocab AS (
      SELECT token, count(*)::BIGINT AS freq FROM tok GROUP BY token),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, token) AS rnk
      FROM vocab),
    pts AS (
      SELECT ln(rnk::DOUBLE) AS x, ln(freq::DOUBLE) AS y FROM ranked),
    m AS (
      SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts)
    SELECT n AS n_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM m
    """,
    category="text",
)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank) — the classic corpus-health diagnostic
    (natural language sits near slope −1; templated/synthetic text
    flattens or steepens the curve, so pipelines trend this number
    per crawl snapshot). Per-row logs are taken of EXACT integers
    (rank from a deterministic freq-desc/token-asc order, frequency
    from the corpus count), the closed-form slope/intercept come from
    the five moment sums, and both outputs are rounded to 6 dp (the
    q_llm_token_entropy float discipline: bit-identical per-row
    terms, order-dependent only in the final ulps).

    Scale posture: one (token) aggregate with map-side combine to the
    VOCAB-sized table; the rank window and the moment fold both run
    over that bounded table, never the corpus. The fact scan is
    touched once."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    wr = Window.orderBy(F.col("freq").desc(), F.col("token"))
    pts = vocab.select(
        F.log(F.row_number().over(wr).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_vocab"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "q_text_bleu_pairs",
    oracle="""
    WITH pairs AS (
      SELECT (doc_id // 2)::BIGINT AS pair_id,
             CASE WHEN doc_id % 2 = 0 THEN 'cand' ELSE 'ref' END AS side,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ws
      FROM documents),
    uni AS (
      SELECT pair_id, side, unnest(ws) AS gram FROM pairs),
    bi AS (
      SELECT pair_id, side,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS gram
      FROM pairs),
    u_cnt AS (
      SELECT pair_id, gram,
             sum(CASE WHEN side = 'cand' THEN 1 ELSE 0 END)::BIGINT AS c_cand,
             sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)::BIGINT AS c_ref
      FROM uni GROUP BY pair_id, gram),
    b_cnt AS (
      SELECT pair_id, gram,
             sum(CASE WHEN side = 'cand' THEN 1 ELSE 0 END)::BIGINT AS c_cand,
             sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)::BIGINT AS c_ref
      FROM bi GROUP BY pair_id, gram),
    agg AS (
      SELECT (SELECT count(DISTINCT pair_id) FROM u_cnt)::BIGINT AS n_pairs,
             (SELECT sum(c_cand) FROM u_cnt)::BIGINT AS tot1,
             (SELECT sum(least(c_cand, c_ref)) FROM u_cnt)::BIGINT AS clip1,
             (SELECT sum(c_cand) FROM b_cnt)::BIGINT AS tot2,
             (SELECT sum(least(c_cand, c_ref)) FROM b_cnt)::BIGINT AS clip2)
    SELECT n_pairs, tot1, clip1, tot2, clip2,
           (clip1 * 1000000 // tot1)::BIGINT AS p1_ppm,
           (clip2 * 1000000 // tot2)::BIGINT AS p2_ppm,
           floor(sqrt(((clip1 * 1000000 // tot1)
                       * (clip2 * 1000000 // tot2))::DOUBLE))::BIGINT
             AS bleu2_ppm
    FROM agg
    """,
    category="text",
)
def q_text_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 style n-gram overlap between paired
    documents (candidate = even doc_id, reference = the next odd
    doc_id) — the eval-harness primitive for machine-translation /
    summarization scoring and a near-duplication probe between two
    corpus snapshots. Modified (clipped) precision per BLEU: each
    candidate n-gram counts at most as often as it appears in the
    reference — Σ min(c_cand, c_ref) / Σ c_cand, micro-averaged over
    all pairs. Precisions are exact integer ppm via floor division;
    the BLEU-2 geometric mean is floor(sqrt(p1·p2)) — IEEE sqrt is
    correctly rounded, so the composite stays bit-identical
    cross-engine.

    Scale posture: n-gram construction is per-row array math (slice +
    zip_with, no self-join); the clip needs cand and ref counts of
    the SAME gram together, which is one (pair_id, gram) aggregate —
    an equi-shuffle with map-side combine, the natural key layout.
    Final fold collapses to one row; no windows, no collects."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = d.select(
        F.expr("doc_id DIV 2").cast("long").alias("pair_id"),
        F.when(F.col("doc_id") % 2 == 0, "cand").otherwise("ref").alias("side"),
        ws.alias("uni"),
        bigrams.alias("bi"),
    )

    def clipped(col: str):
        cnt = (
            base.select("pair_id", "side", F.explode(col).alias("gram"))
            .groupBy("pair_id", "gram")
            .agg(
                F.sum(F.when(F.col("side") == "cand", 1).otherwise(0))
                .cast("long")
                .alias("c_cand"),
                F.sum(F.when(F.col("side") == "ref", 1).otherwise(0))
                .cast("long")
                .alias("c_ref"),
            )
        )
        return cnt.agg(
            F.count_distinct(F.col("pair_id")).alias("n_pairs"),
            F.sum("c_cand").cast("long").alias("tot"),
            F.sum(F.least(F.col("c_cand"), F.col("c_ref")))
            .cast("long")
            .alias("clip"),
        )

    u = clipped("uni").select(
        "n_pairs", F.col("tot").alias("tot1"), F.col("clip").alias("clip1")
    )
    b = clipped("bi").select(F.col("tot").alias("tot2"), F.col("clip").alias("clip2"))
    joined = u.crossJoin(F.broadcast(b))
    p1 = F.expr("(clip1 * 1000000) DIV tot1").cast("long")
    p2 = F.expr("(clip2 * 1000000) DIV tot2").cast("long")
    return joined.select(
        "n_pairs",
        "tot1",
        "clip1",
        "tot2",
        "clip2",
        p1.alias("p1_ppm"),
        p2.alias("p2_ppm"),
        F.floor(F.sqrt((p1 * p2).cast("double"))).cast("long").alias("bleu2_ppm"),
    )


def _bpe_apply_oracle(rounds: int = 3) -> str:
    ctes = [
        """words AS (
      SELECT w, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
      WHERE w <> '' GROUP BY w)""",
        f"s0 AS (SELECT w, freq, {_BPE_SEQ0_DUCK} AS seq FROM words)",
    ]
    for r in range(rounds):
        ctes.append(
            f"p{r} AS (SELECT pair, sum(freq)::BIGINT AS cnt FROM ("
            + _BPE_PAIRS_DUCK.format(src=f"s{r}")
            + ") GROUP BY pair)"
        )
        ctes.append(
            f"b{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{r + 1} AS (SELECT w, freq, replace(seq, ' ' || b{r}.pair || ' ', "
            f"' ' || replace(b{r}.pair, '  ', '') || ' ') AS seq "
            f"FROM s{r}, b{r})"
        )
    ctes.append(
        f"enc AS (SELECT w, len(string_split(trim(seq), '  '))::BIGINT AS n_tok "
        f"FROM s{rounds})"
    )
    ctes.append(
        """docw AS (
      SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
      FROM documents)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT d.lang,
           count(*)::BIGINT AS n_words,
           sum(length(d.w) + 1)::BIGINT AS n_tokens_char,
           sum(e.n_tok)::BIGINT AS n_tokens_bpe,
           ((10000 * sum(e.n_tok)) // sum(length(d.w) + 1))::BIGINT
             AS compression_bp
    FROM docw d JOIN enc e ON d.w = e.w
    WHERE d.w <> ''
    GROUP BY d.lang
    ORDER BY d.lang"""
    )


@register("q_llm_bpe_apply", oracle=_bpe_apply_oracle(), category="text")
def q_llm_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding APPLY — the other half of the tokenizer
    lifecycle q_llm_bpe_train starts: train the 3-round merge table,
    ENCODE the corpus with it, and report per-language token counts
    (character-baseline vs post-merge) with the compression ratio in
    exact basis points. This is the token-count estimator every
    training-data budget runs (how many tokens does this corpus cost
    under the tokenizer), and the train→apply parity proves the merge
    table actually reproduces on the corpus it was learned from. The
    encode reuses the double-separator merge idiom, so Spark and the
    oracle's re-derived merge chain apply bit-identical rewrites.

    Scale posture: training state and the encode table are both
    VOCAB-sized (distinct words), built once and broadcast onto the
    exploded corpus for the final count — the corpus is touched twice
    (vocab build, token count), each a keyed aggregate; merges apply
    map-side; the only collects are the three 1-row merge decisions."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select(
        "w",
        "freq",
        F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace("w", "(.)", "$1  ")),
            F.lit("  _ "),
        ).alias("seq"),
    ).transform(materialize)
    pair_expr = (
        "transform(sequence(1, size(split(trim(seq), '  ')) - 1), "
        "i -> concat(element_at(split(trim(seq), '  '), i), '  ', "
        "element_at(split(trim(seq), '  '), i + 1)))"
    )
    cur = seqs
    for _ in range(3):
        pairs = cur.select("freq", F.explode(F.expr(pair_expr)).alias("pair"))
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()[0]  # model-sized: ONE merge decision per round
        )
        merged = best["pair"].replace("  ", "")
        cur = cur.select(
            "w",
            "freq",
            F.expr(f"replace(seq, ' {best['pair']} ', ' {merged} ')").alias("seq"),
        )
    enc = cur.select(
        "w",
        F.size(F.split(F.trim(F.col("seq")), "  ")).cast("long").alias("n_tok"),
    )
    docw = d.select(
        "lang", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.col("w") != "")
    return (
        docw.join(F.broadcast(enc), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w") + 1).cast("long").alias("n_tokens_char"),
            F.sum("n_tok").cast("long").alias("n_tokens_bpe"),
            F.expr("(10000 * sum(n_tok)) DIV sum(length(w) + 1)")
            .cast("long")
            .alias("compression_bp"),
        )
        .orderBy("lang")
    )


# Winnowing parameters: k-gram size (words) and window size (number of
# consecutive k-gram hashes per window). Guarantee: any shared run of
# _WIN_K + _WIN_W - 1 words between two documents yields at least one
# shared fingerprint (the MOSS matching guarantee).
_WIN_K = 3
_WIN_W = 4
# position tie-break packing: key = hash * 2^20 + (2^20 - 1 - pos);
# min(key) = smallest hash, rightmost position on ties (the original
# winnowing rule, which bounds fingerprint density). Caps documents
# at 2^20 k-grams — chunk longer docs first (q_llm_chunk_documents).
_WIN_POS_MOD = 1 << 20


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, skey) winnowing fingerprint selection for a
    (doc_id, text) frame, skey = hash*2^20 + tie — the shared kernel
    of q_llm_winnowing (per-doc audit over (hash, position) selections,
    skey granularity) and q_llm_winnowing_pairs (MOSS matching over
    distinct hashes, skey div 2^20). One doc_id window pass; see
    q_llm_winnowing's docstring for the algorithm and caps."""
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    g = (
        words.select(
            "doc_id",
            "pos",
            "w",
            F.lead("w", 1).over(win).alias("w1"),
            F.lead("w", 2).over(win).alias("w2"),
        )
        # concat_ws skips nulls, so trailing positions would produce
        # short grams instead of NULL — require the full k words
        # (filter on the materialized column; windows can't sit in
        # WHERE).
        .where(F.col("w2").isNotNull())
        .select("doc_id", "pos", F.concat_ws(" ", "w", "w1", "w2").alias("gram"))
    )
    key = (
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
        * F.lit(_WIN_POS_MOD)
        + (F.lit(_WIN_POS_MOD - 1) - F.col("pos"))
    )
    k = g.select("doc_id", "pos", key.alias("key"))
    wsel = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    sel = k.select(
        "doc_id",
        F.min("key").over(wsel).alias("skey"),
        F.count(F.lit(1)).over(wsel).alias("wn"),
    )
    return sel.where(F.col("wn") == _WIN_W).select("doc_id", "skey").distinct()


@register(
    "q_llm_winnowing",
    oracle=f"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    words AS (SELECT doc_id, unnest(ws) AS w,
                     unnest(range(len(ws))) AS pos FROM docs),
    g AS (
      SELECT doc_id, pos,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
               AS gram
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY gram IS NOT NULL),
    k AS (
      SELECT doc_id, pos,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT * {_WIN_POS_MOD}
               + ({_WIN_POS_MOD - 1} - pos) AS key
      FROM g),
    sel AS (
      SELECT doc_id,
             min(key) OVER w AS skey,
             count(*) OVER w AS wn
      FROM k
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)),
    fp AS (SELECT DISTINCT doc_id, skey FROM sel WHERE wn = {_WIN_W})
    SELECT doc_id, count(*)::BIGINT AS n_fp,
           sum(skey // {_WIN_POS_MOD})::BIGINT AS fp_hash_sum,
           min(skey // {_WIN_POS_MOD})::BIGINT AS fp_min
    FROM fp GROUP BY doc_id
    """,
    category="text",
)
def q_llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every word 3-gram, slide a 4-hash window,
    keep each window's minimum (rightmost on ties), dedupe — a
    guaranteed-density fingerprint set where any shared ≥6-word run
    between documents produces at least one shared fingerprint.
    Complements q_llm_fingerprint_rolling (one hash per whole doc:
    exact-dup only) with the local fingerprints plagiarism/clone
    detection joins on. Per-doc audit output: fingerprint count, hash
    checksum, minimum — a changed selection rule or window shifts all
    three. Exactness: md5-hex-prefix hashes (identical on both
    engines, unlike xxhash) and the tie-break packed into one BIGINT
    key so min() implements argmin.

    Scale posture: explode to k-grams, ONE doc_id window evaluating
    lead/min/count in a single pass (all frames share the
    partitioning+sort), distinct + aggregate — no joins; at 100 TB
    the follow-up near-dup join is fingerprint-equality (bounded
    buckets, the q_llm_dup_passages shape), never doc×doc. Documents
    are capped at 2^20 k-grams by the tie-break packing — chunk
    longer inputs first (q_llm_chunk_documents)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = winnowing_fingerprints(docs)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.sum(F.expr(f"skey div {_WIN_POS_MOD}")).cast("long").alias("fp_hash_sum"),
        F.expr(f"min(skey) div {_WIN_POS_MOD}").cast("long").alias("fp_min"),
    )


# Minimum shared distinct fingerprint hashes for a reported match.
_WIN_MIN_SHARED = 3

# Hot-fingerprint governor: fingerprint classes held by more than this
# many documents (mass-duplicated boilerplate — winnowing hashes are
# near-uniform otherwise) emit an anchor star instead of all C(k,2)
# pairs, exactly like the minhash LSH buckets (_MAX_BUCKET_DOCS in
# operators/dedup.py). Fixture class maxima are ~20 docs, so capped
# and uncapped outputs coincide on every parity lane; the adversarial
# regime is pinned in tests/test_skew.py against THIS registered
# builder.
_WIN_MAX_BUCKET = 1024


def winnowing_distinct_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, h) distinct winnowing fingerprint HASHES (position
    tie-break stripped) — the representation the MOSS pair matching
    joins on. Split out of q_llm_winnowing_pairs so the plan gate can
    inspect the un-checkpointed pipeline."""
    return (
        winnowing_fingerprints(docs)
        .select("doc_id", F.expr(f"skey div {_WIN_POS_MOD}").alias("h"))
        .distinct()
    )


def winnowing_pair_matches(
    fp: DataFrame, cap: int | None = None
) -> DataFrame:
    """MOSS pair scoring over a distinct (doc_id, h) fingerprint frame:
    pairs sharing >= _WIN_MIN_SHARED fingerprint classes with a
    containment score (shared / smaller set, basis points).

    Shape: pair generation goes through skew.capped_bucket_pairs
    (dedupe=False — fp is distinct per (doc_id, h), so the per-pair
    row count IS the shared-class count), which is ONE shuffle
    (groupBy h → sorted member array → in-array pair expansion) with
    the hot-bucket star governor; then one count aggregate and two
    plain equi-joins against the per-doc sizes. No broadcast hints:
    sizes is corpus-cardinality (one row per doc), so a forced
    broadcast would OOM the driver at 10^9 docs — AQE picks broadcast
    when (and only when) the table is actually small."""
    if cap is None:
        cap = _WIN_MAX_BUCKET
    sizes = fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    shared = (
        capped_bucket_pairs(fp, ["h"], "doc_id", cap, dedupe=False)
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= _WIN_MIN_SHARED)
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_fp").alias("n2"))
    return (
        shared.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "n_shared",
            F.expr("(10000 * n_shared) div least(n1, n2)")
            .cast("long")
            .alias("containment_bp"),
        )
    )


@register(
    "q_llm_winnowing_pairs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    words AS (SELECT doc_id, unnest(ws) AS w,
                     unnest(range(len(ws))) AS pos FROM docs),
    g AS (
      SELECT doc_id, pos,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
               AS gram
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY gram IS NOT NULL),
    k AS (
      SELECT doc_id, pos,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT * {_WIN_POS_MOD}
               + ({_WIN_POS_MOD - 1} - pos) AS key
      FROM g),
    sel AS (
      SELECT doc_id,
             min(key) OVER w AS skey,
             count(*) OVER w AS wn
      FROM k
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)),
    fp AS (
      SELECT DISTINCT doc_id, skey // {_WIN_POS_MOD} AS h
      FROM sel WHERE wn = {_WIN_W}),
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n_fp FROM fp GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*)::BIGINT AS n_shared
      FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_WIN_MIN_SHARED})
    SELECT s.d1, s.d2, s.n_shared,
           ((10000 * s.n_shared) // least(s1.n_fp, s2.n_fp))::BIGINT
             AS containment_bp
    FROM shared s
    JOIN sizes s1 ON s1.doc_id = s.d1
    JOIN sizes s2 ON s2.doc_id = s.d2
    """,
    category="text",
)
def q_llm_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS matching: document pairs sharing >= 3 (_WIN_MIN_SHARED)
    distinct winnowing fingerprint hashes, with a containment score
    (shared / smaller fingerprint set, basis points) — the clone /
    plagiarism / boilerplate-overlap report built on
    q_llm_winnowing's fingerprints. By the winnowing guarantee a
    reported pair shares at least one ≥6-word run per shared
    fingerprint class; unlike the MinHash candidates (probabilistic),
    this is a deterministic exact-set intersection on an already
    ~10×-compressed representation.

    Scale posture: pair generation runs through
    operators/skew.capped_bucket_pairs — one shuffle on the
    fingerprint hash, hot classes (mass-duplicated boilerplate)
    star-capped at _WIN_MAX_BUCKET exactly like the minhash LSH path
    (dedup.py minhash_candidates), never doc×doc. The fingerprint
    frame feeds pair generation AND the per-doc sizes, so it is
    scope-cached (cache → materialize the small pair output →
    unpersist in finally, the _minhash_pipeline pattern — nothing
    stays pinned after return, tests/test_no_cache_leak.py) instead
    of re-running the explode+window subtree per consumer. The sizes
    joins carry NO broadcast hint: sizes is corpus-cardinality, and a
    forced broadcast is never demoted by AQE — at 10^9 documents it
    would OOM the driver; AQE broadcasts it only while it is actually
    small. Plan-gated in tests/test_plans.py; governor behavior of
    THIS builder pinned in tests/test_skew.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = winnowing_distinct_fingerprints(docs).cache()
    try:
        return winnowing_pair_matches(fp).transform(materialize)
    finally:
        fp.unpersist()


# ------------------------------------------------------------ lexical richness

@register(
    "q_text_lexical_richness",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
    f AS (
      SELECT source, w, count(*)::BIGINT AS c
      FROM w WHERE w <> '' GROUP BY source, w)
    SELECT source,
           sum(c)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_types,
           sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
           ((10000 * count(*)) // sum(c))::BIGINT AS ttr_bp,
           ((1000000 * sum(c * (c - 1)))
              // nullif(sum(c) * (sum(c) - 1), 0))::BIGINT AS simpson_ppm
    FROM f GROUP BY source
    """,
    category="text",
)
def q_text_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness scorecard — the vocabulary-health
    audit a corpus-mixing pipeline runs per data source: token count,
    type (distinct-word) count, hapax legomena (words seen once —
    high hapax mass = productive vocabulary, near-zero = boilerplate
    or template spam), type/token ratio in basis points, and
    Simpson's repeat-concentration index sum(f(f-1))/(N(N-1)) in ppm
    (the probability two sampled tokens are the SAME word — the
    lexical analogue of q_agg_hhi's market concentration).

    Cross-engine exactness: whitespace tokens (empty strings from
    runs filtered identically), then every output is an exact integer
    count or an integer floor-division of exact counts — no floats.
    Overflow note: sum(c*(c-1)) and N(N-1) square per-source token
    mass; the 1e6 scaling keeps headroom to N ~ 3e9 tokens per
    source, past which the ppm lane would move to DECIMAL(38,0) —
    documented rather than silently truncated.

    Scale posture: explode -> ONE (source, word) pre-aggregate with
    map-side combine (the corpus collapses to vocab-sized rows at the
    first shuffle — the hot-word reducer row carries a count, never
    the occurrences) -> one enum-sized (source) aggregate. No joins,
    no windows, nothing row-at-a-time."""
    w = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    f = w.groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return f.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("CAST((10000 * count(1)) DIV sum(c) AS BIGINT)").alias("ttr_bp"),
        F.expr(
            "CAST((1000000 * sum(c * (c - 1)))"
            " DIV nullif(sum(c) * (sum(c) - 1), 0) AS BIGINT)"
        ).alias("simpson_ppm"),
    )


# ---------------------------------------------------------------- readability

# Shared Flesch formula text over identically-named double columns
# (the q_ml_linreg_normal_eq discipline): identical op sequence on
# both engines => bit-identical doubles before the 4 dp round.
_FLESCH = (
    "206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)"
)


@register(
    "q_text_readability",
    oracle=f"""
    WITH d AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
               AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
               AS n_syllables
      FROM documents),
    s AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(n_words)::BIGINT AS n_words,
             sum(n_sentences)::BIGINT AS n_sentences,
             sum(n_syllables)::BIGINT AS n_syllables
      FROM d GROUP BY source),
    x AS (
      SELECT source, n_docs, n_words, n_sentences, n_syllables,
             n_words::DOUBLE AS words, n_sentences::DOUBLE AS sentences,
             n_syllables::DOUBLE AS syllables
      FROM s)
    SELECT source, n_docs, n_words, n_sentences, n_syllables,
           round({_FLESCH}, 4) AS flesch
    FROM x
    """,
    category="text",
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease estimate: exact word counts
    (whitespace tokens, empty runs filtered), sentence counts
    (runs of terminal punctuation, floored at 1 per document so
    punctuation-free text — like this fixture's word-soup documents —
    degrades to words-per-document instead of dividing by zero), and
    the classic vowel-group syllable heuristic (maximal [aeiouy]+
    runs in lowercased text — the standard cheap estimator; a
    two-vowel-group word like "data" counts 2). Readability scoring
    is a stock quality-filter feature (e.g. alongside
    q_llm_quality_filter's length/stopword ratios) for corpus
    curation.

    Cross-engine exactness: the three counts are exact integers from
    identical regex/split semantics (non-overlapping leftmost
    matches in both engines); the Flesch score is ONE shared formula
    text over identically-named double columns computed from
    source-level integer sums, rounded at 4 dp.

    Scale posture: one scan, per-row regexp counting inside
    whole-stage codegen, one enum-sized (source) aggregate with
    map-side combine. No joins, no windows, no Python."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_words"),
        F.greatest(
            F.lit(1),
            F.regexp_count("text", F.lit("[.!?]+")),
        )
        .cast("long")
        .alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syllables"),
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_sentences").cast("long").alias("n_sentences"),
        F.sum("n_syllables").cast("long").alias("n_syllables"),
    )
    x = s.selectExpr(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        "CAST(n_words AS DOUBLE) AS words",
        "CAST(n_sentences AS DOUBLE) AS sentences",
        "CAST(n_syllables AS DOUBLE) AS syllables",
    )
    return x.selectExpr(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        f"round({_FLESCH}, 4) AS flesch",
    )


# --------------------------------------------------------- tokenizer fertility

@register(
    "q_llm_tokenizer_fertility",
    oracle="""
    WITH d AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
               AS n_words,
             len(regexp_extract_all(text,
                 '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_tokens,
             length(text)::BIGINT AS n_chars
      FROM documents)
    SELECT source,
           sum(n_words)::BIGINT AS n_words,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(n_chars)::BIGINT AS n_chars,
           ((10000 * sum(n_tokens)) // nullif(sum(n_words), 0))::BIGINT
             AS fertility_bp,
           ((10000 * sum(n_chars)) // nullif(sum(n_tokens), 0))::BIGINT
             AS chars_per_token_bp
    FROM d GROUP BY source
    """,
    category="text",
)
def q_llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility — the cost model behind corpus
    mixing and context budgeting: how many pre-tokenizer pieces
    (word pieces / digit runs / single symbols, the same _TOKEN_RE
    lane as q_llm_text_stats) each whitespace word explodes into
    (fertility, in basis points — 10000 = one token per word; high-
    fertility sources eat context windows and training budget), and
    how many characters ride in each token. Tokenizer papers report
    exactly this ratio per language/domain when comparing vocab
    builds; a pipeline uses it to convert byte budgets into token
    budgets per source before sampling (q_llm_budget_allocation).

    Cross-engine exactness: identical split/regex token counts,
    char lengths, and integer floor-divisions of non-negative sums —
    no floats anywhere.

    Scale posture: one scan, per-row regexp counting in whole-stage
    codegen, ONE enum-sized (source) aggregate with map-side combine.
    No joins, no windows, no Python."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_words"),
        F.regexp_count("text", F.lit(_TOKEN_RE)).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return d.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.expr(
            "CAST((10000 * sum(n_tokens)) DIV nullif(sum(n_words), 0) AS BIGINT)"
        ).alias("fertility_bp"),
        F.expr(
            "CAST((10000 * sum(n_chars)) DIV nullif(sum(n_tokens), 0) AS BIGINT)"
        ).alias("chars_per_token_bp"),
    )


# ------------------------------------------------------------- Gopher rules

# Gopher's published stopword-presence rule list (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", appendix A1.1): a document
# must contain at least two of these eight function words.
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@register(
    "q_llm_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT lang, source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
               AS n_words,
             length(replace(text, ' ', ''))::BIGINT AS nc,
             len(list_filter(string_split(text, ' '),
                 w -> regexp_matches(w, '[a-zA-Z]')))::BIGINT AS n_alpha,
             len(list_filter(string_split(lower(text), ' '),
                 w -> list_contains(
                   [{", ".join("'" + w + "'" for w in _GOPHER_STOPS)}], w)))::BIGINT
               AS n_stop,
             len(list_distinct(list_filter(string_split(text, ' '),
                 x -> x <> '')))::BIGINT AS n_distinct
      FROM documents),
    r AS (
      SELECT lang, source,
             CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS p_wc,
             CASE WHEN 3 * n_words <= nc AND nc <= 10 * n_words
                  THEN 1 ELSE 0 END AS p_mwl,
             CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS p_alpha,
             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS p_stop,
             CASE WHEN 2 * n_distinct >= n_words THEN 1 ELSE 0 END AS p_rep
      FROM d)
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           sum(p_wc)::BIGINT AS n_pass_wordcount,
           sum(p_mwl)::BIGINT AS n_pass_meanwordlen,
           sum(p_alpha)::BIGINT AS n_pass_alphawords,
           sum(p_stop)::BIGINT AS n_pass_stopwords,
           sum(p_rep)::BIGINT AS n_pass_repetition,
           sum(p_wc * p_mwl * p_alpha * p_stop * p_rep)::BIGINT AS n_pass_all,
           ((10000 * sum(p_wc * p_mwl * p_alpha * p_stop * p_rep))
              // count(*))::BIGINT AS pass_all_bp
    FROM r GROUP BY lang, source
    """,
    category="text",
)
def q_llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule scorecard per (lang, source) — the
    published heuristic filter battery (Rae et al. 2021, appendix
    A1.1; the same family MassiveText/RefinedWeb/Dolma run before any
    model-based scoring), evaluated as a per-document rule bitmap and
    aggregated to pass counts:

    - word count in [50, 100000] (canonical Gopher bounds);
    - mean word length in [3, 10], tested as the INTEGER
      cross-multiplication 3·n_words <= chars_nospace <= 10·n_words —
      no division, no floats;
    - >= 80% of words contain an alphabetic character
      (5·n_alpha >= 4·n_words);
    - at least two hits from Gopher's published eight-stopword list
      (the/be/to/of/and/that/have/with);
    - a repetition gate: >= 50% distinct words
      (2·n_distinct >= n_words) — the fixture-meaningful stand-in for
      Gopher's duplicate-line/top-2-gram family, whose line-based
      variants degenerate on this corpus' single-line documents (the
      n-gram repetition profile is its own operator,
      q_llm_repetition_stats).

    Unlike q_llm_quality_filter (which EMITS the surviving rows),
    this is the curation AUDIT view: how much of each source×language
    cell survives each rule and all of them together — the table a
    data-mix owner reads before deciding which sources to re-crawl or
    drop.

    Cross-engine exactness: every rule is an integer comparison on
    exact token/char counts; pass shares are integer basis points
    (DIV). No floats anywhere.

    Scale posture: one scan, per-row split/regex counting inside
    whole-stage codegen, ONE enum-sized (lang × source) aggregate
    with map-side combine. No joins, no windows, no Python.

    Reference scope: the reference engine (batchprocessor-core) has
    no text surface; this extends SURVEY.md §2.4's curation family.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPS])
    per_doc = d.select(
        "lang",
        "source",
        F.size(words).cast("long").alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias("nc"),
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("long").alias("n_alpha"),
        F.size(
            F.filter(
                F.split(F.lower("text"), " "),
                lambda w: F.array_contains(stops, w),
            )
        ).cast("long").alias("n_stop"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
    )
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    r = per_doc.select(
        "lang",
        "source",
        flag(F.col("n_words").between(50, 100000)).alias("p_wc"),
        flag(
            (3 * F.col("n_words") <= F.col("nc"))
            & (F.col("nc") <= 10 * F.col("n_words"))
        ).alias("p_mwl"),
        flag(5 * F.col("n_alpha") >= 4 * F.col("n_words")).alias("p_alpha"),
        flag(F.col("n_stop") >= 2).alias("p_stop"),
        flag(2 * F.col("n_distinct") >= F.col("n_words")).alias("p_rep"),
    )
    return r.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("p_wc").cast("long").alias("n_pass_wordcount"),
        F.sum("p_mwl").cast("long").alias("n_pass_meanwordlen"),
        F.sum("p_alpha").cast("long").alias("n_pass_alphawords"),
        F.sum("p_stop").cast("long").alias("n_pass_stopwords"),
        F.sum("p_rep").cast("long").alias("n_pass_repetition"),
        F.sum(
            F.col("p_wc") * F.col("p_mwl") * F.col("p_alpha") * F.col("p_stop") * F.col("p_rep")
        ).cast("long").alias("n_pass_all"),
        F.expr(
            "CAST((10000 * sum(p_wc * p_mwl * p_alpha * p_stop * p_rep))"
            " DIV count(*) AS BIGINT)"
        ).alias("pass_all_bp"),
    )


# ------------------------------------------------------- lang-ID confusion

from batchprocessor_spark.plans.registry import REGISTRY as _REGISTRY


@register(
    "q_llm_lang_confusion",
    # The oracle NESTS the registered q_llm_lang_id SQL verbatim (the
    # q_ml_eval_metrics discipline), so the predictor being evaluated
    # and the evaluator can never drift apart.
    oracle=f"""
    WITH pred AS ({_REGISTRY['q_llm_lang_id'].oracle}),
    cells AS (
      SELECT lang_actual, lang_pred, count(*)::BIGINT AS n
      FROM pred GROUP BY lang_actual, lang_pred)
    SELECT lang_actual, lang_pred, n,
           ((10000 * n) // sum(n) OVER (PARTITION BY lang_actual))::BIGINT
             AS recall_bp,
           ((10000 * n) // sum(n) OVER (PARTITION BY lang_pred))::BIGINT
             AS precision_bp
    FROM cells
    """,
    category="text",
)
def q_llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the evaluation view of
    q_llm_lang_id's stopword-vote classifier: one row per
    (actual, predicted) cell with the cell count, per-actual recall
    and per-predicted precision in integer basis points. This is the
    audit a pipeline owner reads before trusting the lang column for
    mixture weighting (q_llm_budget_allocation) or per-language
    dedup: which languages leak into which, and how asymmetric the
    errors are. The builder CALLS the registered q_llm_lang_id
    builder and the oracle nests its SQL verbatim, so predictor and
    evaluator cannot drift (the q_ml_eval_metrics discipline).

    Cross-engine exactness: integer cell counts; recall/precision
    are integer DIV basis points over window sums of the bounded
    cell table.

    Scale posture: the per-doc prediction pass is q_llm_lang_id's
    (one scan, codegen regex votes); the confusion aggregate
    collapses to ≤ |langs|² rows BEFORE the two windows run (the
    value-table window discipline — windows never touch the corpus).

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text family."""
    pred = q_llm_lang_id(spark, sf_dir).select("lang_actual", "lang_pred")
    cells = pred.groupBy("lang_actual", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_actual = Window.partitionBy("lang_actual")
    w_pred = Window.partitionBy("lang_pred")
    return cells.select(
        "lang_actual",
        "lang_pred",
        "n",
        F.expr("10000 * n").alias("_n10k"),
        F.sum("n").over(w_actual).alias("_row_total"),
        F.sum("n").over(w_pred).alias("_col_total"),
    ).selectExpr(
        "lang_actual",
        "lang_pred",
        "n",
        "CAST(_n10k DIV _row_total AS BIGINT) AS recall_bp",
        "CAST(_n10k DIV _col_total AS BIGINT) AS precision_bp",
    )


# ------------------------------------------------------- script mix audit

# Unicode script classes as explicit codepoint ranges — the \x{hhhh}
# spelling is the one syntax Java regex (Spark) and RE2 (DuckDB) parse
# IDENTICALLY (probed; \p{Script=...} names differ between the two
# engines). Single source of truth: the oracle interpolates these
# verbatim and the builder passes the same strings to F.lit, so both
# engines count with byte-identical patterns.
_SCRIPT_CLASSES = {
    "latin": r"[A-Za-z]",
    "digit": r"[0-9]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "cjk": r"[\x{4E00}-\x{9FFF}]",
    "space": r"[\x{0009}-\x{000D}\x{0020}]",
}
_NONASCII_RE = r"[^\x{00}-\x{7F}]"


@register(
    "q_text_script_mix",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang, length(text)::BIGINT AS n_chars_calc,
             len(regexp_extract_all(text, '{_SCRIPT_CLASSES["latin"]}'))::BIGINT
               AS n_latin,
             len(regexp_extract_all(text, '{_SCRIPT_CLASSES["digit"]}'))::BIGINT
               AS n_digit,
             len(regexp_extract_all(text,
                 '{_SCRIPT_CLASSES["cyrillic"]}'))::BIGINT AS n_cyrillic,
             len(regexp_extract_all(text, '{_SCRIPT_CLASSES["cjk"]}'))::BIGINT
               AS n_cjk,
             len(regexp_extract_all(text, '{_SCRIPT_CLASSES["space"]}'))::BIGINT
               AS n_space,
             len(regexp_extract_all(text, '{_NONASCII_RE}'))::BIGINT
               AS n_nonascii
      FROM documents)
    SELECT doc_id, lang, n_chars_calc, n_latin, n_digit, n_cyrillic, n_cjk,
           n_space,
           (n_chars_calc - n_latin - n_digit - n_cyrillic - n_cjk - n_space)
             ::BIGINT AS n_other,
           ((10000 * n_latin) // nullif(n_chars_calc, 0))::BIGINT AS latin_bp,
           (n_nonascii = 0) AS is_ascii
    FROM c
    """,
    category="text",
)
def q_text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script composition — the mixed-script
    audit every multilingual curation pipeline runs before trusting a
    language label: counts per script class (Latin, digits, Cyrillic,
    CJK, whitespace, other), the Latin share in basis points, and the
    pure-ASCII flag. Mixed-script documents (Latin body + Cyrillic
    look-alikes, CJK fragments inside an 'en' doc) are the classic
    spam/homoglyph signal, and a lang='ru' doc with latin_bp > 9000
    is a labeling bug upstream.

    Cross-engine exactness: all counts are exact integers from
    byte-identical regex character classes (the \\x{{hhhh}} range
    spelling both Java regex and RE2 parse the same way — see
    _SCRIPT_CLASSES); latin_bp is an integer DIV with a nullif guard
    for the empty document.

    Scale posture: a pure per-row projection off the scan — no
    shuffle at all (plan-gated: no exchange, no window, no Python);
    the regex work is JVM-side codegen.

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-analysis family.
    """
    d = load_table(spark, sf_dir, "documents")

    def n_of(cls: str):
        return (
            F.regexp_count("text", F.lit(_SCRIPT_CLASSES[cls]))
            .cast("long")
            .alias(f"n_{cls}")
        )

    c = d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_of("latin"),
        n_of("digit"),
        n_of("cyrillic"),
        n_of("cjk"),
        n_of("space"),
        F.regexp_count("text", F.lit(_NONASCII_RE)).cast("long").alias("n_nonascii"),
    )
    return c.selectExpr(
        "doc_id",
        "lang",
        "n_chars_calc",
        "n_latin",
        "n_digit",
        "n_cyrillic",
        "n_cjk",
        "n_space",
        "CAST(n_chars_calc - n_latin - n_digit - n_cyrillic - n_cjk - n_space"
        " AS BIGINT) AS n_other",
        "CAST((10000 * n_latin) DIV nullif(n_chars_calc, 0) AS BIGINT)"
        " AS latin_bp",
        "(n_nonascii = 0) AS is_ascii",
    )


@register(
    "q_text_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS token
      FROM documents),
    t AS (
      SELECT source, token, count(*)::BIGINT AS c
      FROM tok GROUP BY 1, 2),
    n AS (
      SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types
      FROM t GROUP BY 1),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n_tokens AS n_tokens_a, b.n_tokens AS n_tokens_b,
             a.n_types AS n_types_a, b.n_types AS n_types_b
      FROM n a JOIN n b ON a.source < b.source),
    mem AS (
      SELECT source_a, source_b, source_a AS source FROM p
      UNION ALL
      SELECT source_a, source_b, source_b FROM p),
    cell AS (
      SELECT m.source_a, m.source_b, t.token,
             sum(CASE WHEN t.source = m.source_a THEN t.c ELSE 0 END)::BIGINT
               AS ca,
             sum(CASE WHEN t.source = m.source_b THEN t.c ELSE 0 END)::BIGINT
               AS cb
      FROM t JOIN mem m ON m.source = t.source
      GROUP BY 1, 2, 3),
    agg AS (
      SELECT source_a, source_b,
             sum(abs(ca::HUGEINT * p.n_tokens_b
                     - cb::HUGEINT * p.n_tokens_a))::HUGEINT AS tv_num,
             sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)::BIGINT
               AS shared_types,
             count(*)::BIGINT AS union_types
      FROM cell JOIN p USING (source_a, source_b)
      GROUP BY 1, 2)
    SELECT source_a, source_b, p.n_tokens_a, p.n_tokens_b,
           shared_types, union_types,
           ((1000000 * agg.tv_num)
            // (2::HUGEINT * p.n_tokens_a * p.n_tokens_b))::BIGINT
             AS tv_ppm,
           ((1000000 * shared_types) // union_types)::BIGINT
             AS vocab_jaccard_ppm
    FROM agg JOIN p USING (source_a, source_b)
    """,
    category="text",
)
def q_text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise unigram-DISTRIBUTION divergence between corpus
    sources: total-variation distance in exact integer ppm plus
    vocabulary Jaccard, for every source pair — the corpus-mix drift
    audit run before re-weighting or swapping a crawl snapshot.
    Complements q_llm_cross_source_contamination (SET overlap of
    shingles — catches re-hosted content) and q_dq_drift_psi
    (bucketed numeric drift): this one measures how differently two
    sources USE the shared vocabulary. TV = ½ Σ_t |p_a(t) − p_b(t)|
    carried as the exact integer Σ|c_a·N_b − c_b·N_a| over
    2·N_a·N_b — no floats anywhere, so the ranking of pairs by
    divergence is exact at any corpus size.

    Shape: one (source, token) count aggregate (map-side combined),
    a source-pair membership expansion whose fan-out is bounded by
    the SOURCE count (an enum — never document count), one
    (pair, token) aggregate over vocabulary-sized rows, and a
    pair-count-sized report join. The non-equi source_a < source_b
    join runs on the |sources|-row totals table — metadata scale.

    Cross-engine exactness: every number is an exact integer
    (wide-integer lanes for the c·N cross products, which reach
    ~1e16 per cell and ~1e22 summed at petabyte vocabularies —
    HUGEINT / DECIMAL(38) hold both); tv_ppm and jaccard_ppm are
    integer DIV.

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-analysis family.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("token"),
    )
    t = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = t.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    a = n.select(
        F.col("source").alias("source_a"),
        F.col("n_tokens").alias("n_tokens_a"),
    )
    b = n.select(
        F.col("source").alias("source_b"),
        F.col("n_tokens").alias("n_tokens_b"),
    )
    p = a.join(b, F.col("source_a") < F.col("source_b"))
    mem = p.select(
        "source_a",
        "source_b",
        F.explode(F.array("source_a", "source_b")).alias("source"),
    )
    cell = (
        t.join(mem, "source")
        .groupBy("source_a", "source_b", "token")
        .agg(
            F.sum(F.expr("CASE WHEN source = source_a THEN c ELSE 0 END"))
            .cast("long")
            .alias("ca"),
            F.sum(F.expr("CASE WHEN source = source_b THEN c ELSE 0 END"))
            .cast("long")
            .alias("cb"),
        )
    )
    agg = (
        cell.join(p, ["source_a", "source_b"])
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.expr(
                    "abs(CAST(ca AS DECIMAL(38,0)) * n_tokens_b"
                    " - CAST(cb AS DECIMAL(38,0)) * n_tokens_a)"
                )
            ).alias("tv_num"),
            F.sum(F.expr("CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("shared_types"),
            F.count(F.lit(1)).cast("long").alias("union_types"),
        )
    )
    return agg.join(p, ["source_a", "source_b"]).selectExpr(
        "source_a",
        "source_b",
        "n_tokens_a",
        "n_tokens_b",
        "shared_types",
        "union_types",
        "CAST((1000000 * tv_num) DIV (CAST(2 AS DECIMAL(38,0))"
        " * n_tokens_a * n_tokens_b) AS BIGINT) AS tv_ppm",
        "CAST((1000000 * shared_types) DIV union_types AS BIGINT)"
        " AS vocab_jaccard_ppm",
    )


# Declared RAKE stopword inventory (the corpus's function-word analogs;
# shared literally by builder and oracle — extending it is a semantic
# version change, like the quality-filter thresholds).
_RAKE_STOPWORDS = ("a", "the", "of", "and", "to", "is", "in", "on", "for", "with")


@register(
    "q_llm_keyword_rake",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.token, t.pos
      FROM documents,
           LATERAL (SELECT unnest(list_filter(
                             string_split_regex(lower(text), '[^a-z]+'),
                             x -> x <> '')) AS token,
                           generate_subscripts(list_filter(
                             string_split_regex(lower(text), '[^a-z]+'),
                             x -> x <> ''), 1) AS pos) t),
    marked AS (
      SELECT doc_id, pos, token,
             CASE WHEN token IN {_RAKE_STOPWORDS} THEN 1 ELSE 0 END AS stop
      FROM tok),
    numbered AS (
      SELECT doc_id, pos, token, stop,
             sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS phrase_id
      FROM marked),
    pw AS (
      SELECT doc_id, phrase_id, pos, token
      FROM numbered WHERE stop = 0),
    plen AS (
      SELECT doc_id, phrase_id,
             count(*)::BIGINT AS n_words,
             string_agg(token, ' ' ORDER BY pos) AS phrase
      FROM pw GROUP BY 1, 2),
    wstat AS (
      SELECT pw.token,
             count(*)::BIGINT AS freq,
             sum(plen.n_words)::BIGINT AS degree
      FROM pw JOIN plen ON plen.doc_id = pw.doc_id
                       AND plen.phrase_id = pw.phrase_id
      GROUP BY 1),
    wscore AS (
      SELECT token, ((1000000 * degree) // freq)::BIGINT AS score_ppm
      FROM wstat),
    phrases AS (
      SELECT phrase, max(n_words)::BIGINT AS n_words,
             count(*)::BIGINT AS n_occurrences
      FROM plen GROUP BY 1),
    scored AS (
      SELECT p.phrase, p.n_words, p.n_occurrences,
             sum(w.score_ppm)::BIGINT AS phrase_score_ppm
      FROM phrases p,
           LATERAL (SELECT unnest(string_split(p.phrase, ' ')) AS token) t
      JOIN wscore w ON w.token = t.token
      GROUP BY 1, 2, 3),
    top AS (
      SELECT * FROM scored
      ORDER BY phrase_score_ppm DESC, phrase LIMIT 15)
    SELECT phrase, n_words, n_occurrences, phrase_score_ppm,
           row_number() OVER (ORDER BY phrase_score_ppm DESC, phrase)
             ::BIGINT AS rank
    FROM top
    """,
    category="text",
)
def q_llm_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus —
    the classic unsupervised key-phrase miner a curation pipeline
    runs to label what a source is ABOUT: candidate phrases are the
    maximal stopword-free token runs (the declared _RAKE_STOPWORDS
    inventory splits them), each word scores degree/frequency over
    the whole corpus (degree = Σ length of phrases containing the
    word — co-occurrence raises a word's score, the property that
    makes RAKE prefer multi-word terms), and a phrase scores the sum
    of its word scores. Emits the top-15 phrases with word counts,
    occurrence counts, score, and rank.

    Cross-engine exactness: phrase segmentation is a stopword-prefix
    -sum (exact integers on both engines); word scores are quantized
    ONCE to integer ppm ((1e6·degree) DIV freq — a DECLARED part of
    the scoring contract, like the quality-filter thresholds), so
    phrase scores and the (score DESC, phrase) ranking are exact
    integer comparisons — no float anywhere, no tie ambiguity.

    Scale posture: one posexplode pass, a per-document prefix-sum
    window (state bounded by document length), two vocabulary-sized
    aggregates (word stats, distinct phrases), a vocabulary-sized
    equi-join of phrase words onto word scores, and a global top-15
    via orderBy().limit() (TakeOrderedAndProject — the rank window
    runs AFTER the 15-row cut). No Python, no hints.

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-analysis family beside
    q_llm_tfidf_topterms and q_llm_distinctive_terms.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("pos", "token"),
    )
    stops = ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)
    marked = tok.selectExpr(
        "doc_id",
        "pos",
        "token",
        f"CASE WHEN token IN ({stops}) THEN 1 ELSE 0 END AS stop",
    )
    numbered = marked.select(
        "doc_id",
        "pos",
        "token",
        "stop",
        F.sum("stop")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("phrase_id"),
    )
    pw = numbered.where(F.col("stop") == 0).select(
        "doc_id", "phrase_id", "pos", "token"
    )
    plen = pw.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, token))),"
            " x -> x.token), ' ')"
        ).alias("phrase"),
    )
    wstat = (
        pw.join(plen, ["doc_id", "phrase_id"])
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("n_words").cast("long").alias("degree"),
        )
    )
    wscore = wstat.selectExpr(
        "token", "CAST((1000000 * degree) DIV freq AS BIGINT) AS score_ppm"
    )
    phrases = plen.groupBy("phrase").agg(
        F.max("n_words").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    scored = (
        phrases.select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("token"),
        )
        .join(wscore, "token")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(F.sum("score_ppm").cast("long").alias("phrase_score_ppm"))
    )
    top = scored.orderBy(
        F.col("phrase_score_ppm").desc(), F.col("phrase")
    ).limit(15)
    return top.select(
        "phrase",
        "n_words",
        "n_occurrences",
        "phrase_score_ppm",
        F.row_number()
        .over(Window.orderBy(F.col("phrase_score_ppm").desc(), F.col("phrase")))
        .cast("long")
        .alias("rank"),
    )


@register(
    "q_text_burrows_delta",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS token
      FROM documents),
    t AS (
      SELECT source, token, count(*)::BIGINT AS c
      FROM tok GROUP BY 1, 2),
    n AS (
      SELECT source, sum(c)::BIGINT AS n_tokens FROM t GROUP BY 1),
    s AS (SELECT count(*)::BIGINT AS n_sources FROM n),
    mfw AS (
      SELECT token FROM (
        SELECT token, sum(c)::BIGINT AS tot FROM t GROUP BY 1
        ORDER BY tot DESC, token LIMIT 20)),
    grid AS (
      SELECT n.source, mfw.token,
             ((1000000000 * coalesce(t.c, 0)) // n.n_tokens)::BIGINT AS r
      FROM n CROSS JOIN mfw
      LEFT JOIN t ON t.source = n.source AND t.token = mfw.token),
    w AS (
      SELECT token,
             (  (SELECT n_sources FROM s)::HUGEINT * sum(r::HUGEINT * r)
              - sum(r)::HUGEINT * sum(r))::HUGEINT AS d
      FROM grid GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.token,
             abs(a.r - b.r)::BIGINT AS adiff
      FROM grid a JOIN grid b
        ON a.token = b.token AND a.source < b.source),
    agg AS (
      SELECT p.source_a, p.source_b,
             sum(CASE WHEN w.d > 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_words_used,
             list_reduce(
               list(CASE WHEN w.d = 0 THEN 0.0
                         ELSE p.adiff::DOUBLE / sqrt(w.d::DOUBLE) END
                    ORDER BY p.token),
               (x, y) -> x + y) AS acc
      FROM pairs p JOIN w ON w.token = p.token
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_words_used,
           round((SELECT n_sources FROM s) * acc / 20.0, 6) AS delta
    FROM agg
    """,
    category="text",
)
def q_text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (2002) stylometric distance between corpus
    sources — the authorship-attribution classic: over the 20 most
    frequent words (function words — style, not topic), each
    source's usage rate is z-scored against the cross-source
    distribution and Delta(a,b) is the mean |z_a − z_b|. Low Delta =
    same "authorial fingerprint": the signal that two crawls share a
    template/generator even when their VOCABULARIES differ (the
    complement of q_text_source_divergence, which reads content).

    Cross-engine exactness: rates are quantized ONCE to integer ppb
    ((1e9·c) DIV N_s, a declared part of the metric), so the
    per-word cross-source moments and the z numerators stay exact
    integers (D_w = S·Σr² − (Σr)² through wide lanes — ~4e20 at 20
    sources); |z_a − z_b| = S·|r_a − r_b|/sqrt(D_w) folds its 20
    per-word terms in EXPLICIT token order (array_sort left fold vs
    list_reduce over an ORDER BY list), zero-variance words
    contribute exactly 0 on both engines (CASE, not a NaN), 6-dp
    round as the belt.

    Scale posture: one (source, token) count aggregate, a top-20
    vocabulary cut via orderBy().limit(), a sources×20 grid (enum ×
    constant — metadata scale), and a pair fold over ≤ S²·20 rows.
    The corpus is scanned once. No Python, no hints.

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-analysis family.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("token"),
    )
    t = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = t.groupBy("source").agg(F.sum("c").cast("long").alias("n_tokens"))
    s = n.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    mfw = (
        t.groupBy("token")
        .agg(F.sum("c").cast("long").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("token"))
        .limit(20)
        .select("token")
    )
    grid = (
        n.crossJoin(mfw)
        .join(t, ["source", "token"], "left")
        .selectExpr(
            "source",
            "token",
            "CAST((1000000000 * coalesce(c, 0)) DIV n_tokens AS BIGINT) AS r",
        )
    )
    w = (
        grid.crossJoin(s)
        .groupBy("token")
        .agg(
            F.expr(
                "CAST(first(n_sources) AS DECIMAL(38,0))"
                " * sum(CAST(r AS DECIMAL(38,0)) * r)"
                " - CAST(sum(r) AS DECIMAL(38,0)) * sum(r)"
            ).alias("d")
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"), "token", F.col("r").alias("ra")
    )
    b = grid.select(
        F.col("source").alias("source_b"), "token", F.col("r").alias("rb")
    )
    pairs = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .selectExpr(
            "source_a",
            "source_b",
            "token",
            "CAST(abs(ra - rb) AS BIGINT) AS adiff",
        )
    )
    agg = (
        pairs.join(w, "token")
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.expr("CASE WHEN d > 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_words_used"),
            F.array_sort(
                F.collect_list(F.struct("token", "adiff", "d"))
            ).alias("gs"),
        )
        .selectExpr(
            "source_a",
            "source_b",
            "n_words_used",
            "aggregate(gs, 0.0D, (x, y) -> x + CASE WHEN y.d = 0 THEN 0.0D"
            " ELSE CAST(y.adiff AS DOUBLE) / sqrt(CAST(y.d AS DOUBLE)) END)"
            " AS acc",
        )
    )
    return agg.crossJoin(s).selectExpr(
        "source_a",
        "source_b",
        "n_words_used",
        "round(n_sources * acc / 20.0D, 6) AS delta",
    )


@register(
    "q_text_coverage_curve",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS token
      FROM documents),
    v AS (
      SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY 1),
    r AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, token) AS rnk,
             sum(c) OVER (ORDER BY c DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS cum
      FROM v),
    tot AS (
      SELECT max(cum)::BIGINT AS n, count(*)::BIGINT AS vocab FROM r)
    SELECT t.n AS n_tokens, t.vocab AS vocab_size,
           min(CASE WHEN 100 * r.cum >= 50 * t.n THEN r.rnk END)::BIGINT
             AS k50,
           min(CASE WHEN 100 * r.cum >= 90 * t.n THEN r.rnk END)::BIGINT
             AS k90,
           min(CASE WHEN 100 * r.cum >= 99 * t.n THEN r.rnk END)::BIGINT
             AS k99,
           ((1000000 * max(CASE WHEN r.rnk = 1 THEN r.c ELSE 0 END))
            // t.n)::BIGINT AS top1_share_ppm
    FROM r CROSS JOIN tot t
    GROUP BY t.n, t.vocab
    """,
    category="text",
)
def q_text_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — how much of the corpus's token
    MASS the top-k word types cover: the vocabulary-budget planner's
    number (a BPE/embedding table sized to k99 types covers 99% of
    running text; the rest hits UNK/byte fallback), and the
    concentration profile q_text_zipf_slope fits a line to, read
    directly. One row: total tokens, vocabulary size, the minimum
    type counts covering 50/90/99% of token mass (nearest-rank on
    the frequency-sorted cumulative), and the head word's share in
    exact ppm.

    Cross-engine exactness: everything is exact integer counting —
    the rank/cumulative window runs over the frequency-sorted
    VOCABULARY (deterministic (c DESC, token) order), coverage
    thresholds are integer cross-multiplications (100·cum ≥ p·N),
    and the head share is integer DIV. No floats anywhere.

    Scale posture: one (token) count aggregate with map-side
    combine; the rank window runs over the vocabulary table
    (documented single-partition-over-bounded-values, the q_ml_auc
    histogram discipline), then one 1-row aggregate. The corpus is
    scanned once. No Python, no hints.

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-analysis family beside
    q_llm_vocab_coverage (which scores a FIXED vocabulary; this
    derives the budget) and q_text_zipf_slope.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("token")
    )
    v = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ordered = Window.orderBy(F.col("c").desc(), F.col("token"))
    cum_w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = v.select(
        "c",
        F.row_number().over(ordered).alias("rnk"),
        F.sum("c").over(cum_w).cast("long").alias("cum"),
    )
    tot = r.agg(
        F.max("cum").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    return (
        r.crossJoin(tot)
        .groupBy("n", "vocab")
        .agg(
            F.expr(
                "CAST(min(CASE WHEN 100 * cum >= 50 * n THEN rnk END)"
                " AS BIGINT)"
            ).alias("k50"),
            F.expr(
                "CAST(min(CASE WHEN 100 * cum >= 90 * n THEN rnk END)"
                " AS BIGINT)"
            ).alias("k90"),
            F.expr(
                "CAST(min(CASE WHEN 100 * cum >= 99 * n THEN rnk END)"
                " AS BIGINT)"
            ).alias("k99"),
            F.expr(
                "CAST((1000000 * max(CASE WHEN rnk = 1 THEN c ELSE 0 END))"
                " DIV n AS BIGINT)"
            ).alias("top1_share_ppm"),
        )
        .selectExpr(
            "n AS n_tokens",
            "vocab AS vocab_size",
            "k50",
            "k90",
            "k99",
            "top1_share_ppm",
        )
    )


# Per-side token cap for the ROUGE-L LCS kernel: bounds the O(n·m²)
# per-pair cost at ~1.3e8 integer ops regardless of document length
# (the metric is DEFINED on the first 512 tokens of each side, same
# spirit as ROUGE-1.5.5's -l/-b limits). Applied identically in the
# Spark builder and the DuckDB oracle so parity is exact.
ROUGE_TOKEN_CAP = 512


@register(
    "q_text_rouge_l_pairs",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT (doc_id // 2)::BIGINT AS pair_id, doc_id % 2 AS side,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')[1:512] AS ws
      FROM documents),
    pr AS (
      SELECT c.pair_id, c.ws AS a, r.ws AS b,
             len(c.ws)::BIGINT AS n, len(r.ws)::BIGINT AS m
      FROM d c JOIN d r ON r.pair_id = c.pair_id
      WHERE c.side = 0 AND r.side = 1),
    lcs AS (
      SELECT pair_id, a, b, n, m, 0::BIGINT AS i,
             list_transform(generate_series(0, m::INT), x -> 0::BIGINT)
               AS state
      FROM pr
      UNION ALL
      SELECT pair_id, a, b, n, m, i + 1,
             list_prepend(0::BIGINT,
               list_transform(generate_series(1, m::INT), j ->
                 list_max(list_transform(generate_series(1, j), k ->
                   greatest(state[k + 1],
                            state[k] + CASE WHEN a[(i + 1)::INT] = b[k]
                                            THEN 1 ELSE 0 END)))))
      FROM lcs WHERE i < n),
    done AS (
      SELECT pair_id, n AS len_cand, m AS len_ref,
             state[(m + 1)::INT]::BIGINT AS lcs_len
      FROM lcs WHERE i = n),
    scored AS (
      SELECT pair_id, len_cand, len_ref, lcs_len,
             ((1000000 * lcs_len) // nullif(len_cand, 0))::BIGINT AS p_ppm,
             ((1000000 * lcs_len) // nullif(len_ref, 0))::BIGINT AS r_ppm
      FROM done)
    SELECT pair_id, len_cand, len_ref, lcs_len, p_ppm, r_ppm,
           ((2 * p_ppm * r_ppm) // nullif(p_ppm + r_ppm, 0))::BIGINT
             AS f_ppm
    FROM scored
    """,
    category="text",
)
def q_text_rouge_l_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L between the same candidate/reference pairs as
    q_text_bleu_pairs (cand = even doc_id, ref = the next odd one):
    the longest-common-SUBSEQUENCE overlap that rewards in-order
    content without requiring contiguity — the summarization metric
    that catches sentence reordering BLEU's n-gram clipping punishes.
    Per pair: token lengths, the exact LCS length, and
    precision/recall/F1 in exact integer ppm.

    Cost bound (VERDICT r9 #2): the per-pair kernel is O(n·m²), fine
    on paragraph-scale pairs but a CPU cliff on book-length documents
    — so BOTH engines truncate each side to its first
    ROUGE_TOKEN_CAP = 512 tokens (a documented metric definition, the
    same move ROUGE-1.5.5's -l/-b length limits make; at 512 the
    worst pair costs ~1.3e8 integer ops, bounded regardless of input).
    n/m are the CAPPED lengths so precision/recall stay consistent
    with the truncated LCS.

    The LCS row update is spelled WITHOUT an array-state fold (both
    engines lack heterogeneous fold accumulators in SQL):
    new[j] = max(new[j−1], prev[j], prev[j−1]+match) unrolls to a
    PREFIX-MAX of combined[k] = max(prev[k], prev[k−1]+match_k), so
    each row is transform + running-max over slices — identical
    integer arithmetic on both engines (the oracle carries the same
    recurrence through a recursive CTE; the builder folds rows with
    F.aggregate). O(n·m²) per pair with document-bounded m — the
    per-row prefix scan trades a factor of m for a pure-SQL,
    engine-portable kernel; at curation scale the PAIR COUNT is the
    axis that grows, and pairs are embarrassingly parallel.

    Cross-engine exactness: all integers — LCS counts, ppm DIVs,
    nullif on empty sides (an empty candidate or reference reads
    NULL precision/recall, not a divide error).

    Reference scope: the reference engine has no text surface; this
    extends SURVEY.md §2.4's text-metric family beside
    q_text_bleu_pairs.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("pair_id"),
        F.expr("doc_id % 2").alias("side"),
        F.slice(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != "",
            ),
            1,
            ROUGE_TOKEN_CAP,
        ).alias("ws"),
    )
    pr = (
        d.where(F.col("side") == 0)
        .select("pair_id", F.col("ws").alias("a"))
        .join(
            d.where(F.col("side") == 1).select(
                "pair_id", F.col("ws").alias("b")
            ),
            "pair_id",
        )
        .selectExpr(
            "pair_id",
            "a",
            "b",
            "CAST(size(a) AS BIGINT) AS n",
            "CAST(size(b) AS BIGINT) AS m",
        )
        # the LCS kernel is CPU-bound per pair and embarrassingly
        # parallel across pairs — spread pairs over the cluster with
        # an EXPLICIT partition count: the rows are tiny in BYTES but
        # heavy in CPU, so AQE's size-based coalescing would fold the
        # shuffle back to 1-2 tasks (measured at sf0.1 on local[32]:
        # 46 s single-task -> 11 s wall at 64-way). The count is
        # DERIVED from the cluster (VERDICT r9 #2 — a literal 64
        # would cap a 1000-executor cluster at 64 tasks): 2× slots
        # for scheduling slack, floored at 64 so small drivers still
        # spread the stage.
        .repartition(
            max(64, 2 * spark.sparkContext.defaultParallelism), "pair_id"
        )
    )
    # outer fold over candidate tokens; the inner fold builds the new
    # DP row LEFT-TO-RIGHT (new[j] = max(new[j-1], prev[j],
    # prev[j-1] + match)), state is the previous DP row, 1-indexed
    # positions 1..m+1 for j = 0..m.
    #
    # r12 (guide §1.2 "the distributed algorithm" applied per task):
    # the r9 spelling unrolled new[j] as a PREFIX-MAX over k ≤ j
    # (array_max over transform(sequence(1, j))) — O(n·m²)
    # interpreted-expression evaluations per pair. The sequential
    # inner fold is the textbook O(n·m) recurrence: same integer
    # values (the prefix-max form is exactly the expansion of this
    # recurrence), ~7× measured (sf0.01 interleaved: 10.6 s → 1.4 s;
    # sf0.1: see OPTIMIZATION_r12.md). The inner fold still append-
    # copies its row array per step (arrays are immutable in
    # expression land) — O(m) longs per step — but a copy is ~50×
    # cheaper than an interpreted greatest/element_at chain, and the
    # 512-token cap bounds the worst pair either way.
    lcs = pr.selectExpr(
        "pair_id",
        "n AS len_cand",
        "m AS len_ref",
        "element_at(aggregate(a,"
        " transform(sequence(0, CAST(m AS INT)), x -> CAST(0 AS BIGINT)),"
        " (state, tok) -> aggregate(sequence(1, CAST(m AS INT)),"
        "   array(CAST(0 AS BIGINT)),"
        "   (st, j) -> concat(st, array(greatest("
        "     element_at(st, j),"
        "     element_at(state, j + 1),"
        "     element_at(state, j)"
        "       + CASE WHEN tok = element_at(b, j)"
        "              THEN CAST(1 AS BIGINT)"
        "              ELSE CAST(0 AS BIGINT) END))))),"
        " CAST(m AS INT) + 1) AS lcs_len",
    )
    scored = lcs.selectExpr(
        "pair_id",
        "len_cand",
        "len_ref",
        "lcs_len",
        "CAST((1000000 * lcs_len) DIV nullif(len_cand, 0) AS BIGINT)"
        " AS p_ppm",
        "CAST((1000000 * lcs_len) DIV nullif(len_ref, 0) AS BIGINT)"
        " AS r_ppm",
    )
    return scored.selectExpr(
        "pair_id",
        "len_cand",
        "len_ref",
        "lcs_len",
        "p_ppm",
        "r_ppm",
        "CAST((2 * p_ppm * r_ppm) DIV nullif(p_ppm + r_ppm, 0) AS BIGINT)"
        " AS f_ppm",
    )
