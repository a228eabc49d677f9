"""Text-level pins for the round-11 structural DuckDB→Spark rewrites
(batchprocessor_spark/plans/sql_dialect.py).

These are pure string assertions — fast, no Spark.  The VALUE proof
for every rewrite is TWINS.json (scripts/gen_twins.py runs each
mapped text through a real spark.sql() and compares against the
DataFrame builder); these pins keep the text transforms themselves
from regressing and document the exact cross-engine semantics each
rule relies on.
"""

from __future__ import annotations

from batchprocessor_spark.plans.sql_dialect import (
    _convert_strftime_format,
    _rewrite_brackets,
    _rewrite_qualify,
    _split_top,
    rewrite_calls,
    structural_spark_sql as s,
)


def test_split_top_respects_quotes_and_brackets():
    assert _split_top("a, f(b, c), 'x,y', [1, 2]") == [
        "a", "f(b, c)", "'x,y'", "[1, 2]",
    ]


def test_qualify_alias_predicate_becomes_outer_where():
    out = _rewrite_qualify(
        "WITH t AS (SELECT a, lead(a) OVER w AS nxt FROM x WINDOW w AS "
        "(ORDER BY a) QUALIFY nxt IS NOT NULL) SELECT * FROM t"
    )
    # shape (a): predicate over output aliases -> outer WHERE; the
    # window stays inside the subquery
    assert "QUALIFY" not in out
    assert "__qf WHERE nxt IS NOT NULL" in out


def test_qualify_window_predicate_computed_inside():
    out = _rewrite_qualify(
        "WITH t AS (SELECT k, v FROM x QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY v) = 1) SELECT * FROM t"
    )
    # shape (b): the window predicate is computed as __q in the
    # subquery (it references base columns, not output aliases)
    assert "QUALIFY" not in out
    assert "AS __q" in out and "WHERE __q" in out


def test_qualify_preserves_distinct_order():
    # DuckDB applies QUALIFY before DISTINCT; DISTINCT must end up on
    # the OUTER select
    out = _rewrite_qualify(
        "SELECT DISTINCT a, b FROM x QUALIFY b IS NOT NULL"
    )
    assert out.startswith("SELECT DISTINCT a, b FROM")


def test_agg_internal_order_by():
    out = s("SELECT list(v ORDER BY k) FROM t")
    assert out == (
        "SELECT transform(array_sort(collect_list(struct(k AS _s0, "
        "v AS _v))), s -> s._v) FROM t"
    )
    # DESC keys have no array_sort equivalent — left unchanged (the
    # measurement records the gap instead of a silent wrong order)
    assert "ORDER BY" in s("SELECT list(v ORDER BY k DESC) FROM t")


def test_string_agg_distinct_same_key():
    assert s("SELECT string_agg(DISTINCT x, ',' ORDER BY x) FROM t") == (
        "SELECT array_join(array_sort(collect_set(x)), ',') FROM t"
    )


def test_list_reduce_seeds_with_first_element():
    out = s("SELECT list_reduce(l, (a, x) -> a + x) FROM t")
    assert out == (
        "SELECT aggregate(slice(l, 2, greatest(0, size(l) - 1)), "
        "element_at(l, 1), (a, x) -> a + x) FROM t"
    )


def test_range_is_half_open_and_empty_guarded():
    # DuckDB range(b<=a) is []; unguarded sequence(a, b-1) DESCENDS
    # (ADVICE r11) — the emptiness guard is part of the emitted text
    assert s("SELECT range(4)") == (
        "SELECT CASE WHEN (4) > 0 THEN sequence(0, (4) - 1) "
        "ELSE array() END"
    )
    assert s("SELECT range(1, n + 1, 40)") == (
        "SELECT CASE WHEN (40) > 0 AND (n + 1) > (1) "
        "THEN sequence(1, (n + 1) - 1, 40) "
        "WHEN (40) < 0 AND (n + 1) < (1) "
        "THEN sequence(1, (n + 1) + 1, 40) "
        "ELSE array() END"
    )


def test_from_range_exposes_duckdb_column_name():
    assert s("SELECT b.range FROM h CROSS JOIN range(60) b") == (
        "SELECT b.range FROM h CROSS JOIN "
        "(SELECT explode(CASE WHEN (60) > 0 THEN "
        "sequence(0, (60) - 1) ELSE array() END) AS range) b"
    )


def test_zipped_dual_unnest_fuses_to_inline():
    out = s("SELECT d, unnest(ws) AS w, unnest(range(len(ws))) AS i FROM t")
    assert out == (
        "SELECT d, inline(arrays_zip(ws, CASE WHEN size(ws) > 0 "
        "THEN sequence(0, size(ws) - 1) ELSE array() END)) "
        "AS (w, i) FROM t"
    )
    out = s("SELECT generate_subscripts(v, 1) AS i, unnest(v) AS x FROM t")
    assert out == (
        "SELECT inline(arrays_zip(CASE WHEN size(v) > 0 "
        "THEN sequence(1, size(v)) ELSE array() END, v)) AS (i, x) FROM t"
    )


def test_brackets_literal_index_slice():
    assert _rewrite_brackets("SELECT ['a', 'b']") == "SELECT array('a', 'b')"
    # 1-based computed index, including qualified bases and chains —
    # computed indices gain an INT cast (DuckDB `//` maps to DIV,
    # which always widens to BIGINT; Spark element_at wants INT)
    assert _rewrite_brackets("SELECT f.s[i + 1]") == (
        "SELECT element_at(f.s, CAST(i + 1 AS INT))"
    )
    assert _rewrite_brackets("SELECT x[1][2]") == (
        "SELECT element_at(element_at(x, 1), 2)"
    )
    # inclusive 1-based slice; length clamped (DuckDB x[a:b] with
    # b < a is [], Spark slice raises under ANSI on negative length)
    assert _rewrite_brackets("SELECT s[2:7]") == (
        "SELECT slice(s, 2, greatest(0, (7) - (2) + 1))"
    )
    # brackets inside string literals are untouched (regex classes)
    assert _rewrite_brackets("SELECT regexp_replace(t, '[a-z]', '')") == (
        "SELECT regexp_replace(t, '[a-z]', '')"
    )


def test_type_suffix_before_brackets():
    assert s("SELECT e::DOUBLE[] FROM t") == "SELECT e::ARRAY<DOUBLE> FROM t"


def test_struct_literal_and_pack():
    assert s("SELECT max({'a': v, 'k': k}).k FROM t") == (
        "SELECT max(named_struct('a', v, 'k', k)).k FROM t"
    )
    assert s("SELECT struct_pack(a := 1, b := x) FROM t") == (
        "SELECT named_struct('a', 1, 'b', x) FROM t"
    )


def test_strftime_format_conversion():
    assert _convert_strftime_format("%Y-%m-%d") == "yyyy-MM-dd"
    assert _convert_strftime_format("%Y-%m") == "yyyy-MM"
    # unmapped token or bare letter -> None (stay unserved, never
    # guess a Java pattern)
    assert _convert_strftime_format("%Q") is None
    assert _convert_strftime_format("T%H") is None
    assert s("SELECT strftime(ts, '%Y-%m-%d') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )


def test_arity_and_flag_fixes():
    # DuckDB 'g' = Spark's default global replace
    assert s("SELECT regexp_replace(t, 'a', 'b', 'g')") == (
        "SELECT regexp_replace(t, 'a', 'b')"
    )
    # group refs convert, literal $ escapes (parity with the 3-arg
    # path; no current oracle exercises the $, pinned regardless)
    assert s(r"SELECT regexp_replace(t, '(a)', '\1$', 'g')") == (
        "SELECT regexp_replace(t, '(a)', '$1\\$')"
    )


def test_regexp_replace_first_match_emulated():
    """DuckDB 3-arg regexp_replace replaces only the FIRST match;
    Spark always replaces all (ADVICE r11). Emulated by anchoring one
    lazy-prefix match over the whole string, with user group refs
    shifted past the prefix group."""
    assert s("SELECT regexp_replace(t, 'X', '-')") == (
        "SELECT regexp_replace(t, '(?s)^(.*?)(?:X)(.*)$', '$1-$2')"
    )
    # user capture groups shift by one; the suffix ref lands after them
    assert s(r"SELECT regexp_replace(t, '(a)(b)', '\2\1')") == (
        "SELECT regexp_replace(t, '(?s)^(.*?)(?:(a)(b))(.*)$', "
        "'$1$3$2$4')"
    )
    # a raw $ in a DuckDB replacement is a literal dollar — escaped
    # for Java (mechanical_spark_sql's backslash-doubling then turns
    # the \$ into the SQL-literal spelling \\$)
    assert s("SELECT regexp_replace(t, 'o', '$')") == (
        "SELECT regexp_replace(t, '(?s)^(.*?)(?:o)(.*)$', '$1\\$$2')"
    )
    # non-literal pattern/replacement: emit an unresolvable marker so
    # the twin measurement fails LOUDLY (dialect_fail -> unserved)
    # instead of passing replace-ALL semantics through
    out = s("SELECT regexp_replace(t, p, 'x')")
    assert "__bp_unsupported_first_match_regexp_replace__" in out


def test_count_capture_groups():
    from batchprocessor_spark.plans.sql_dialect import (
        _count_capture_groups as g,
    )

    assert g("abc") == 0
    assert g("(a)(b)") == 2
    assert g(r"(?:x)(?=y)(?!z)(?<=w)(?<!v)") == 0
    assert g(r"(?P<n>a)(?<m>b)") == 2
    assert g(r"\((a)[()](b)") == 2
    # DuckDB 2-arg regexp_extract_all returns group 0; Spark defaults
    # to group 1
    assert s("SELECT regexp_extract_all(t, 'p')") == (
        "SELECT regexp_extract_all(t, 'p', 0)"
    )
    assert s("SELECT encode(t)") == "SELECT encode(t, 'UTF-8')"
    assert s("SELECT xor(a, b)") == "SELECT (a ^ b)"


def test_interval_constructors():
    assert s("SELECT ts + to_minutes(5)") == (
        "SELECT ts + make_dt_interval(0, 0, 5)"
    )
    assert s("SELECT d + to_days(n)") == "SELECT d + make_dt_interval(n)"


def test_list_transform_zip_fuses_to_zip_with():
    out = s("SELECT list_transform(list_zip(a, b), z -> z[1] * z[2])")
    assert out == "SELECT zip_with(a, b, (_zl, _zr) -> _zl * _zr)"


def test_list_dot_product_is_left_fold():
    out = s("SELECT list_dot_product(a, b)")
    assert out == (
        "SELECT aggregate(zip_with(a, b, (_zx, _zy) -> _zx * _zy), "
        "0.0D, (_za, _zv) -> _za + _zv)"
    )


def test_nested_same_name_calls_rewrite_inside_out():
    out = rewrite_calls(
        "range(range(3))", "range",
        lambda args, inner: f"seq({inner})" if len(args) == 1 else None,
    )
    assert out == "seq(seq(3))"


def test_backslashes_in_literals_doubled():
    """DuckDB literals are raw; Spark's are C-escaped — the mapped
    text must double backslashes or '\\s+' silently matches the
    letter s (measured value_mismatch, r11)."""
    from batchprocessor_spark.plans.sql_dialect import (
        double_backslashes_in_literals as d,
    )

    assert d(r"SELECT regexp_replace(t, '\s+', ' ')") == (
        r"SELECT regexp_replace(t, '\\s+', ' ')"
    )
    # backslashes OUTSIDE literals untouched
    assert d(r"SELECT a \ b") == r"SELECT a \ b"


def test_zip_generator_with_casts():
    out = s(
        "SELECT unnest(range(len(e)))::INT AS pos, "
        "unnest(e::DOUBLE[]) AS x FROM t"
    )
    assert out == (
        "SELECT inline(arrays_zip(CASE WHEN size(e) > 0 "
        "THEN sequence(0, size(e) - 1) ELSE array() END, "
        "e::ARRAY<DOUBLE>)) AS (pos, x) FROM t"
    )


def test_qualify_nested_blocks_both_rewritten():
    """Splices shift offsets; hits must be re-found per rewrite
    (code-review r11 — a stale offset left nested QUALIFYs behind)."""
    out = _rewrite_qualify(
        "SELECT a FROM (SELECT b AS a FROM t QUALIFY a = 1) q "
        "QUALIFY a = 2"
    )
    assert "QUALIFY" not in out


def test_qualify_stops_before_window_clause():
    # the W fast-path omission swallowed a trailing WINDOW clause
    # into the predicate (code-review r11)
    out = _rewrite_qualify(
        "SELECT a, rn FROM t QUALIFY rn = 1 WINDOW w2 AS (ORDER BY a)"
    )
    assert "WHERE rn = 1 WINDOW" not in out.replace("  ", " ")
    assert out.rstrip().endswith("WINDOW w2 AS (ORDER BY a)")


def test_hoist_subquery_in_post_from_clause():
    """A hoistable call in WHERE splices the CROSS JOIN *before* the
    clause instead of duplicating it (code-review r11)."""
    from batchprocessor_spark.plans.sql_dialect import (
        _hoist_subqueries_in_calls as h,
    )

    out = h(
        "SELECT a FROM t WHERE "
        "exists(arr, e -> e > (SELECT max(v) FROM u))"
    )
    assert out.count("WHERE") == 1
    assert "CROSS JOIN (SELECT (SELECT max(v) FROM u) AS __hs1)" in out
    assert "e > __hs1" in out
    # and the join lands between FROM t and WHERE
    assert out.index("CROSS JOIN") < out.index("WHERE")
