"""Structural DuckDB → Spark SQL dialect rewrites (round 11).

The mechanical token map in ``sql_twins`` handles spelling-level
differences (``list_filter`` → ``filter``); this module handles the
*structural* DuckDB constructs that a token regex cannot: ``QUALIFY``,
aggregate-internal ``ORDER BY``, half-open ``range()`` generators,
zipped dual-``unnest``, ``[...]`` literals / 1-based indexing /
slices, ``{'k': v}`` struct literals, ``strftime`` format strings,
``list_reduce`` seed folds, and a handful of arity/argument-shape
differences (``regexp_replace(..., 'g')``, 2-arg
``regexp_extract_all``, 1-arg ``encode``).

Every pass is a pure, quote- and paren-aware text transform that
leaves the input unchanged when a construct doesn't match its known
shape — correctness is NEVER assumed from a rewrite. The only
authority on whether a mapped text is servable is the measurement:
``scripts/gen_twins.py`` executes the mapped text through a real
``spark.sql()`` and value-compares it against the DataFrame builder
(TWINS.json records per-query pass/fail plus a fingerprint of the
exact text measured; ``spark_sql_for`` serves a mapped oracle only on
a recorded pass whose fingerprint still matches). A rule that
mis-fires therefore surfaces as a recorded dialect_fail or
value_mismatch, never as wrong answers handed to a user.

Measurement alone is only as strong as the swept data shapes
(ADVICE r11): a rewrite can pass at every measured SF and still
diverge on a shape the fixtures never produce. Rules whose
cross-engine semantics have such edges are therefore GUARDED in the
emitted text itself (r12): ``range()``/``generate_subscripts()``
carry an emptiness CASE (Spark ``sequence`` descends where DuckDB
returns ``[]``), slice lengths are clamped (ANSI ``slice`` raises on
negative lengths), and 3-arg ``regexp_replace`` emulates DuckDB's
first-match-only semantics exactly — or emits an unresolvable marker
when its args aren't literals, so the measurement fails loudly
rather than admitting replace-all behavior that happens to match at
the swept SFs. tests/test_oracle_edgecases.py pins every guard
against live DuckDB on the edge shapes.

Reference scope: SURVEY §2.2 / §3.4 — the reference engine
(xzchaoo/batchprocessor) has no SQL surface at all; this front end is
an engine mandate, re-expressed on Spark's own parser.
"""

from __future__ import annotations

import re

_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _string_mask(sql: str) -> list[bool]:
    """True at positions inside a quoted literal ('' doubles inside
    single quotes; double-quoted identifiers treated the same way)."""
    mask = [False] * len(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            q = c
            mask[i] = True
            i += 1
            while i < n:
                mask[i] = True
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:  # doubled escape
                        mask[i + 1] = True
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
        else:
            i += 1
    return mask


def _find_close(sql: str, open_pos: int, mask: list[bool] | None = None) -> int | None:
    """Index of the bracket matching sql[open_pos] (one of ``([{``)."""
    pairs = {"(": ")", "[": "]", "{": "}"}
    close = pairs[sql[open_pos]]
    opener = sql[open_pos]
    if mask is None:
        mask = _string_mask(sql)
    depth = 0
    for i in range(open_pos, len(sql)):
        if mask[i]:
            continue
        c = sql[i]
        if c == opener:
            depth += 1
        elif c == close:
            depth -= 1
            if depth == 0:
                return i
    return None


def _find_open(sql: str, close_pos: int, mask: list[bool]) -> int | None:
    """Index of the bracket matching sql[close_pos] (one of ``)]}``),
    scanning backward."""
    pairs = {")": "(", "]": "[", "}": "{"}
    opener = pairs[sql[close_pos]]
    closer = sql[close_pos]
    depth = 0
    for i in range(close_pos, -1, -1):
        if mask[i]:
            continue
        c = sql[i]
        if c == closer:
            depth += 1
        elif c == opener:
            depth -= 1
            if depth == 0:
                return i
    return None


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level ``sep`` (outside strings and brackets)."""
    mask = _string_mask(s)
    parts, depth, last = [], 0, 0
    for i, c in enumerate(s):
        if mask[i]:
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p.strip() for p in parts]


def _find_top_keyword(s: str, kw: str) -> int:
    """Position of the first top-level occurrence of keyword ``kw``
    (word-bounded, outside strings/brackets), or -1."""
    mask = _string_mask(s)
    pat = re.compile(r"\b" + kw.replace(" ", r"\s+") + r"\b")
    depth = 0
    i = 0
    while i < len(s):
        if mask[i]:
            i += 1
            continue
        c = s[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return i
        i += 1
    return -1


def rewrite_calls(sql: str, fname: str, repl) -> str:
    """Rewrite every ``fname(...)`` call. ``repl(args, inner)`` returns
    the replacement text or None to leave the call as-is (inner args
    are still recursively rewritten)."""
    pat = re.compile(r"(?<![\w.])" + fname + r"\s*\(")

    def go(s: str) -> str:
        mask = _string_mask(s)
        for m in pat.finditer(s):
            if mask[m.start()]:
                continue
            op = m.end() - 1
            cl = _find_close(s, op, mask)
            if cl is None:
                continue
            inner = go(s[op + 1 : cl])
            new = repl(_split_top(inner), inner)
            if new is None:
                new = s[m.start() : m.end()] + inner + ")"
            return s[: m.start()] + new + go(s[cl + 1 :])
        return s

    return go(sql)


# ---------------------------------------------------------------------------
# Zipped dual-generator idioms.  DuckDB zips multiple unnests in one
# SELECT; Spark allows one generator per SELECT, but inline(arrays_zip)
# reproduces the zip exactly (including the 0-based range() index and
# the 1-based generate_subscripts index).

_ZIP_PATTERNS: list[tuple[re.Pattern[str], str]] = [
    # unnest(x) AS w, unnest(range(len(x))) AS i   (0-based index)
    (
        re.compile(
            r"unnest\(\s*([\w.]+)\s*\)\s+AS\s+(\w+)\s*,\s*"
            r"unnest\(\s*range\(\s*len\(\s*\1\s*\)\s*\)\s*\)\s+AS\s+(\w+)"
        ),
        r"inline(arrays_zip(\1, CASE WHEN size(\1) > 0 "
        r"THEN sequence(0, size(\1) - 1) ELSE array() END)) AS (\2, \3)",
    ),
    # unnest(range(len(x))) AS i, unnest(x) AS w — optional ::INT on
    # the index (sequence over INT size already yields INT) and an
    # optional element-type cast carried onto the zipped value side
    (
        re.compile(
            r"unnest\(\s*range\(\s*len\(\s*([\w.]+)\s*\)\s*\)\s*\)\s*"
            r"(?:::INT\w*)?\s+AS\s+(\w+)"
            r"\s*,\s*unnest\(\s*\1\s*((?:::[\w\[\]<>]+)?)\s*\)\s+AS\s+(\w+)"
        ),
        r"inline(arrays_zip(CASE WHEN size(\1) > 0 "
        r"THEN sequence(0, size(\1) - 1) ELSE array() END, \1\3)) AS (\2, \4)",
    ),
    # generate_subscripts(x, 1) AS i, unnest(x) AS v   (1-based index)
    (
        re.compile(
            r"generate_subscripts\(\s*([\w.]+)\s*,\s*1\s*\)\s+AS\s+(\w+)\s*,\s*"
            r"unnest\(\s*\1\s*\)\s+AS\s+(\w+)"
        ),
        r"inline(arrays_zip(CASE WHEN size(\1) > 0 "
        r"THEN sequence(1, size(\1)) ELSE array() END, \1)) AS (\2, \3)",
    ),
    # unnest(x) AS v, generate_subscripts(x, 1) AS i
    (
        re.compile(
            r"unnest\(\s*([\w.]+)\s*\)\s+AS\s+(\w+)\s*,\s*"
            r"generate_subscripts\(\s*\1\s*,\s*1\s*\)\s+AS\s+(\w+)"
        ),
        r"inline(arrays_zip(\1, CASE WHEN size(\1) > 0 "
        r"THEN sequence(1, size(\1)) ELSE array() END)) AS (\2, \3)",
    ),
]


def _rewrite_zip_generators(sql: str) -> str:
    for pat, rep in _ZIP_PATTERNS:
        sql = pat.sub(rep, sql)
    return sql


# ---------------------------------------------------------------------------
# QUALIFY → filtered subquery.  DuckDB evaluates QUALIFY after window
# functions and before DISTINCT; both rewrite shapes preserve that
# order.  Shape (a): predicate over output aliases → outer WHERE on
# the named subquery.  Shape (b): predicate contains its own window
# function (over base columns) → computed as __q inside the subquery.

_AS_TAIL = re.compile(r"\s+AS\s+(\w+)\s*$", re.I)
_IDENT_ONLY = re.compile(r"^[\w.]+$")
_QUALIFY = re.compile(r"\bQUALIFY\b")
_BLOCK_END_KW = re.compile(r"(ORDER\s+BY|LIMIT|UNION|INTERSECT|EXCEPT|WINDOW)\b")


def _output_names(sel_list: str) -> list[str] | None:
    names = []
    for item in _split_top(sel_list):
        m = _AS_TAIL.search(item)
        if m:
            names.append(m.group(1))
            continue
        if _IDENT_ONLY.match(item):
            names.append(item.split(".")[-1])
            continue
        return None
    return names


def _rewrite_qualify(sql: str) -> str:
    # Splicing shifts the offsets of every other hit, so hits are
    # re-found after each successful rewrite (a stale offset left
    # nested QUALIFYs unrewritten — code-review r11). Positions that
    # fail to rewrite are remembered relative to the CURRENT text and
    # skipped, bounding the loop.
    for _ in range(32):
        mask = _string_mask(sql)
        hits = [m for m in _QUALIFY.finditer(sql) if not mask[m.start()]]
        new_sql = _rewrite_one_qualify(sql, mask, hits)
        if new_sql is None:
            return sql
        sql = new_sql
    return sql


def _rewrite_one_qualify(
    sql: str, mask: list[bool], hits: list[re.Match]
) -> str | None:
    """Rewrite the LAST rewritable QUALIFY (inner-most blocks sit
    later in the text than their enclosing SELECT, so processing from
    the end keeps each splice self-contained); None when no hit can
    be rewritten."""
    for m in reversed(hits):
        qpos, qend = m.start(), m.end()
        # --- block end: first top-level ')' or trailing-clause keyword
        depth, i, end = 0, qend, len(sql)
        while i < len(sql):
            if mask[i]:
                i += 1
                continue
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0 and sql[i] in "OLUIEW" and _BLOCK_END_KW.match(sql, i):
                if i == 0 or sql[i - 1] not in _IDENT_CHARS:
                    end = i
                    break
            i += 1
        pred = sql[qend:end].strip()
        # --- matching SELECT backwards at the same paren depth
        depth, j, selpos = 0, qpos - 1, None
        while j >= 0:
            if mask[j]:
                j -= 1
                continue
            c = sql[j]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    break
                depth -= 1
            elif (
                depth == 0
                and sql[j : j + 6].upper() == "SELECT"
                and (j == 0 or sql[j - 1] not in _IDENT_CHARS)
                and (j + 6 >= len(sql) or sql[j + 6] not in _IDENT_CHARS)
            ):
                selpos = j
                break
            j -= 1
        if selpos is None:
            continue
        between = sql[selpos + 6 : qpos]
        fpos = _find_top_keyword(between, "FROM")
        if fpos < 0:
            continue
        head = between[:fpos].strip()
        body = between[fpos:].strip()  # "FROM ..."
        distinct = ""
        if head.upper().startswith("DISTINCT"):
            distinct = " DISTINCT"
            head = head[len("DISTINCT"):].strip()
        if "*" in [it.strip() for it in _split_top(head)]:
            continue
        names = _output_names(head)
        if names is None:
            continue
        cols = ", ".join(names)
        if _find_top_keyword(pred, "OVER") >= 0:
            new_block = (
                f"SELECT{distinct} {cols} FROM (SELECT {head}, "
                f"({pred}) AS __q {body}) __qf WHERE __q"
            )
        else:
            new_block = (
                f"SELECT{distinct} {cols} FROM "
                f"(SELECT {head} {body}) __qf WHERE {pred}"
            )
        return sql[:selpos] + new_block + sql[end:]
    return None


# ---------------------------------------------------------------------------
# Aggregate-internal ORDER BY.  DuckDB: list(x ORDER BY k) /
# string_agg(x, sep ORDER BY k).  Spark has no ordered aggregates;
# sorting a collected struct list reproduces the order exactly (ASC
# only — a DESC key leaves the call unchanged and the measurement
# records the gap).

def _ordered_collect(expr: str, keys: list[str]) -> str | None:
    for k in keys:
        if re.search(r"\b(DESC|NULLS)\b", k, re.I):
            return None
    fields = ", ".join(
        f"{k.strip()} AS _s{i}" for i, k in enumerate(keys)
    )
    return (
        f"transform(array_sort(collect_list(struct({fields}, "
        f"{expr} AS _v))), s -> s._v)"
    )


def _agg_order_repl_list(args: list[str], inner: str) -> str | None:
    ob = _find_top_keyword(inner, "ORDER BY")
    if ob < 0:
        return None
    expr = inner[:ob].strip()
    keys = _split_top(inner[ob:].split(None, 2)[2])
    collected = _ordered_collect(expr, keys)
    return collected


def _agg_order_repl_string_agg(args: list[str], inner: str) -> str | None:
    ob = _find_top_keyword(inner, "ORDER BY")
    if ob < 0:
        return None
    head, keys_txt = inner[:ob], inner[ob:].split(None, 2)[2]
    parts = _split_top(head)
    if len(parts) != 2:
        return None
    expr, sep = parts[0].strip(), parts[1].strip()
    keys = _split_top(keys_txt)
    if expr.upper().startswith("DISTINCT"):
        bare = expr[len("DISTINCT"):].strip()
        if len(keys) == 1 and keys[0].strip() == bare:
            return f"array_join(array_sort(collect_set({bare})), {sep})"
        return None
    collected = _ordered_collect(expr, keys)
    if collected is None:
        return None
    return f"array_join({collected}, {sep})"


# ---------------------------------------------------------------------------
# Misc call-shape rewrites (each documented inline).

def _repl_list_reduce(args, inner):
    # DuckDB list_reduce seeds the fold with the first element; the
    # acc type therefore equals the element type on both engines. The
    # slice length is clamped so an empty list fails at element_at
    # (matching DuckDB's list_reduce-on-empty error) instead of at
    # slice's ANSI negative-length check.
    if len(args) != 2:
        return None
    lst, lam = args
    return (
        f"aggregate(slice({lst}, 2, greatest(0, size({lst}) - 1)), "
        f"element_at({lst}, 1), {lam})"
    )


def _repl_list_aggregate(args, inner):
    if len(args) != 2:
        return None
    lst, name = args[0], args[1].strip().strip("'").lower()
    if name == "sum":
        # Oracles only use 'sum' over DOUBLE lists; the 0.0D seed
        # reproduces DuckDB's double left fold.
        return f"aggregate({lst}, 0.0D, (_la, _lx) -> _la + _lx)"
    if name == "max":
        return f"array_max({lst})"
    if name == "min":
        return f"array_min({lst})"
    return None


def _repl_list_dot_product(args, inner):
    if len(args) != 2:
        return None
    a, b = args
    return (
        f"aggregate(zip_with({a}, {b}, (_zx, _zy) -> _zx * _zy), "
        f"0.0D, (_za, _zv) -> _za + _zv)"
    )


def _repl_list_sum(args, inner):
    # Only integer-lane uses exist in the oracles (quantized values);
    # a DOUBLE list would fail the fold type check and stay unserved.
    if len(args) != 1:
        return None
    return (
        f"aggregate({args[0]}, CAST(0 AS BIGINT), (_la, _lx) -> _la + _lx)"
    )


def _repl_range(args, inner):
    # DuckDB range() is half-open AND returns [] when the range is
    # empty; Spark sequence() is inclusive and DESCENDS (or raises,
    # with an explicit step) when stop < start, so an unguarded
    # sequence(a, b-1) turns DuckDB's [] into [a, a-1] for b <= a
    # (ADVICE r11: a shape the measured SFs may never exercise). The
    # emptiness guard is part of the emitted text; array() (ARRAY<VOID>)
    # coerces to the sequence branch's element type in CASE.
    if len(args) == 1:
        n = args[0]
        return (
            f"CASE WHEN ({n}) > 0 THEN sequence(0, ({n}) - 1) "
            f"ELSE array() END"
        )
    if len(args) == 2:
        a, b = args
        return (
            f"CASE WHEN ({b}) > ({a}) THEN sequence({a}, ({b}) - 1) "
            f"ELSE array() END"
        )
    if len(args) == 3:
        # sign-aware: DuckDB descends for negative steps and excludes
        # the half-open bound in the step's direction
        a, b, s = args
        return (
            f"CASE WHEN ({s}) > 0 AND ({b}) > ({a}) "
            f"THEN sequence({a}, ({b}) - 1, {s}) "
            f"WHEN ({s}) < 0 AND ({b}) < ({a}) "
            f"THEN sequence({a}, ({b}) + 1, {s}) "
            f"ELSE array() END"
        )
    return None


def _repl_generate_subscripts(args, inner):
    # guarded like range(): sequence(1, 0) would yield [1, 0] for an
    # empty array where DuckDB generates zero subscripts
    if len(args) != 2:
        return None
    x = args[0]
    return (
        f"CASE WHEN size({x}) > 0 THEN sequence(1, size({x})) "
        f"ELSE array() END"
    )


_STRFTIME_TOKENS = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH",
    "M": "mm", "S": "ss", "j": "DDD", "a": "EEE", "A": "EEEE",
    "b": "MMM", "B": "MMMM", "f": "SSSSSS", "%": "%",
}


def _convert_strftime_format(fmt: str) -> str | None:
    """'%Y-%m-%d' → 'yyyy-MM-dd'; None when a token has no Java
    equivalent or a bare letter would need quoting."""
    out, i = [], 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                return None
            t = _STRFTIME_TOKENS.get(fmt[i + 1])
            if t is None:
                return None
            out.append(t)
            i += 2
        elif c.isalpha():
            return None  # would need single-quote escaping in Java fmt
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _repl_strftime(args, inner):
    if len(args) != 2:
        return None
    ts, fmt = args
    m = re.fullmatch(r"'([^']*)'", fmt.strip())
    if not m:
        return None
    conv = _convert_strftime_format(m.group(1))
    if conv is None:
        return None
    return f"date_format({ts}, '{conv}')"


_GROUP_REF = re.compile(r"\\(\d)")


def _count_capture_groups(pat: str) -> int:
    """Capturing groups in a regex literal's content. DuckDB compiles
    RE2, so backreferences cannot appear; named groups ((?P<n>…) /
    RE2-style (?<n>…)) count, lookaround / non-capturing don't."""
    n, i, in_class = 0, 0, False
    while i < len(pat):
        c = pat[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            in_class = c != "]"
        elif c == "[":
            in_class = True
        elif c == "(":
            nxt = pat[i + 1 : i + 2]
            if nxt != "?":
                n += 1
            elif pat[i + 2 : i + 3] == "P" or (
                pat[i + 2 : i + 3] == "<"
                and pat[i + 3 : i + 4] not in ("=", "!")
            ):
                n += 1  # named group still captures
        i += 1
    return n


def _repl_regexp_replace(args, inner):
    # DuckDB's 4th arg is an options string; 'g' (global) makes it
    # Spark's default replace-ALL behavior (other options stay
    # unserved). WITHOUT 'g' DuckDB replaces only the FIRST match
    # while Spark always replaces all (ADVICE r11) — emulated exactly
    # by anchoring one lazy-prefix match over the whole string:
    # pattern P → (?s)^(.*?)(?:P)(.*)$ applied globally matches
    # exactly once, with the user's groups shifted by one. DuckDB
    # replacement strings reference groups as \1; Java's as $1 —
    # converted here (the later backslash-doubling pass then only
    # sees backslashes that really are literal).
    had_flag = len(args) == 4 and args[3].strip() == "'g'"
    if not had_flag and len(args) != 3:
        return None
    repl = args[2].strip()
    if had_flag:
        if repl.startswith("'") and repl.endswith("'"):
            # \k → $k, and a raw $ (literal in DuckDB) → \$ for Java
            # (no oracle uses one today; parity with the 3-arg path)
            repl = re.sub(
                r"\\(\d)|\$",
                lambda m: f"${m.group(1)}" if m.group(1) else r"\$",
                repl,
            )
        return f"regexp_replace({args[0]}, {args[1]}, {repl})"
    # first-match-only form: both pattern and replacement must be
    # plain literals to rewrite confidently; anything else emits an
    # unresolvable marker so the twin measurement fails LOUDLY
    # (dialect_fail → unserved) instead of passing replace-all
    # semantics through on data that happens not to show the
    # difference at the measured SFs.
    pat = args[1].strip()
    pm = re.fullmatch(r"'((?:[^']|'')*)'", pat, re.S)
    rm = re.fullmatch(r"'((?:[^']|'')*)'", repl, re.S)
    if not pm or not rm:
        return (
            f"__bp_unsupported_first_match_regexp_replace__({inner})"
        )
    ngroups = _count_capture_groups(pm.group(1))
    # one pass: \k group refs shift to $(k+1); a raw $ in a DuckDB
    # replacement is literal and must be \$-escaped for Java (the
    # later backslash-doubling pass turns \$ into the SQL text \\$,
    # which parses back to the Java escape)
    shifted = re.sub(
        r"\\(\d)|\$",
        lambda m: f"${int(m.group(1)) + 1}" if m.group(1) else r"\$",
        rm.group(1),
    )
    wrapped = f"(?s)^(.*?)(?:{pm.group(1)})(.*)$"
    new_repl = f"$1{shifted}${ngroups + 2}"
    return (
        f"regexp_replace({args[0]}, '{wrapped}', '{new_repl}')"
    )


def _repl_regexp_extract_all(args, inner):
    # DuckDB's 2-arg form returns full matches (group 0); Spark's
    # default idx is 1.
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    return None


def _repl_encode(args, inner):
    if len(args) == 1:
        return f"encode({args[0]}, 'UTF-8')"
    return None


def _repl_xor(args, inner):
    if len(args) == 2:
        return f"({args[0]} ^ {args[1]})"
    return None


def _repl_to_days(args, inner):
    return f"make_dt_interval({args[0]})" if len(args) == 1 else None


def _repl_to_hours(args, inner):
    return f"make_dt_interval(0, {args[0]})" if len(args) == 1 else None


def _repl_to_minutes(args, inner):
    return f"make_dt_interval(0, 0, {args[0]})" if len(args) == 1 else None


def _repl_struct_pack(args, inner):
    fields = []
    for a in args:
        m = re.match(r"^(\w+)\s*:=\s*(.+)$", a.strip(), re.S)
        if not m:
            return None
        fields.append(f"'{m.group(1)}', {m.group(2)}")
    return "named_struct(" + ", ".join(fields) + ")"


def _repl_list_slice(args, inner):
    # DuckDB list_slice(l, a, b) is 1-based with an INCLUSIVE end and
    # returns [] when b < a; Spark slice() raises under ANSI for a
    # negative length, so the length is clamped (slice(l, a, 0) is []).
    if len(args) != 3:
        return None
    lst, a, b = args
    return f"slice({lst}, {a}, greatest(0, ({b}) - ({a}) + 1))"


def _repl_list_prepend(args, inner):
    if len(args) != 2:
        return None
    return f"array_prepend({args[1]}, {args[0]})"


def _repl_list_transform_zip(args, inner):
    """list_transform(list_zip(a, b), z -> f(z[1], z[2])) →
    zip_with(a, b, (za, zb) -> f(za, zb)) — DuckDB's 1-based struct
    indexing inside the lambda has no Spark equivalent, so the zip is
    fused away instead."""
    if len(args) != 2 or not re.match(r"^list_zip\s*\(", args[0]):
        return None
    op = args[0].index("(")
    cl = _find_close(args[0], op)
    if cl is None:
        return None
    zip_args = _split_top(args[0][op + 1 : cl])
    if len(zip_args) != 2:
        return None
    lam = re.match(r"^(\w+)\s*->\s*(.+)$", args[1].strip(), re.S)
    if not lam:
        return None
    var, body = lam.group(1), lam.group(2)
    pa, pb = f"_{var}l", f"_{var}r"
    body = re.sub(r"\b" + var + r"\[1\]", pa, body)
    body = re.sub(r"\b" + var + r"\[2\]", pb, body)
    if re.search(r"\b" + var + r"\b", body):
        return None  # residual un-indexed reference — shape unknown
    return f"zip_with({zip_args[0]}, {zip_args[1]}, ({pa}, {pb}) -> {body})"


_CTE_DEF = re.compile(r"(\b\w+\s*(?:\([^()]*\))?)(\s+AS\s*\()")


def _add_recursion_limit(sql: str, level: int = 10000) -> str:
    """Spark recursive CTEs default to a 100-level cap
    (RECURSION_LEVEL_LIMIT_EXCEEDED) — DuckDB has no such limit, so a
    row-DP recursion that fit at sf0.01 dies at sf0.1 on longer
    documents. Add `MAX RECURSION LEVEL n` to every SELF-REFERENCING
    CTE; runaway protection stays with the sweep watchdog."""
    if not re.search(r"\bRECURSIVE\b", sql):
        return sql
    mask = _string_mask(sql)
    out, pos = [], 0
    for m in _CTE_DEF.finditer(sql):
        if mask[m.start()]:
            continue
        op = m.end() - 1
        cl = _find_close(sql, op, mask)
        if cl is None:
            continue
        name = m.group(1).split("(")[0].strip()
        if not name or not re.search(
            r"\b" + re.escape(name) + r"\b", sql[op + 1 : cl]
        ):
            continue
        if m.start() < pos:
            continue
        out.append(sql[pos : m.end(1)])
        out.append(f" MAX RECURSION LEVEL {level}")
        pos = m.end(1)
    out.append(sql[pos:])
    return "".join(out)


_COMMA_UNNEST = re.compile(r",\s*unnest\s*\(")


def _rewrite_lateral_unnest(sql: str) -> str:
    """FROM-position comma-joined generator with a lateral reference
    (`FROM t, unnest(expr_over_t) AS u(i)`): Spark's comma join cannot
    see the left item's columns — LATERAL VIEW can, and is the exact
    equivalent. Only the aliased-column form is rewritten (a function
    argument can never be followed by `AS name(col)`)."""
    pos = 0
    while True:
        mask = _string_mask(sql)
        m = next(
            (
                m
                for m in _COMMA_UNNEST.finditer(sql, pos)
                if not mask[m.start()]
            ),
            None,
        )
        if m is None:
            return sql
        cl = _find_close(sql, m.end() - 1, mask)
        if cl is None:
            return sql
        am = re.match(
            r"\s+AS\s+(\w+)\s*\(\s*(\w+)\s*\)", sql[cl + 1 :]
        )
        if am is None:
            pos = cl + 1
            continue
        inner = sql[m.end() : cl]
        new = f" LATERAL VIEW explode({inner}) {am.group(1)} AS {am.group(2)}"
        sql = sql[: m.start()] + new + sql[cl + 1 + am.end() :]
        pos = m.start() + len(new)


_UNNEST_CALL = re.compile(r"(?<![\w.])unnest\s*\(")
_CAST_SUFFIX = re.compile(r"\s*::\s*(\w+)")


def _rewrite_cast_after_unnest(sql: str) -> str:
    """``unnest(X)::T`` — Spark generators cannot sit inside a CAST
    (UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS); cast the ARRAY
    instead: ``unnest(CAST(X AS ARRAY<T>))``."""
    pos = 0
    while True:
        mask = _string_mask(sql)
        m = next(
            (
                m
                for m in _UNNEST_CALL.finditer(sql, pos)
                if not mask[m.start()]
            ),
            None,
        )
        if m is None:
            return sql
        cl = _find_close(sql, m.end() - 1, mask)
        if cl is None:
            return sql
        cm = _CAST_SUFFIX.match(sql, cl + 1)
        if cm is None:
            pos = cl + 1
            continue
        inner = sql[m.end() : cl]
        new = f"unnest(CAST({inner} AS ARRAY<{cm.group(1)}>))"
        sql = sql[: m.start()] + new + sql[cm.end() :]
        pos = m.start() + len(new)


_SELECT_SUBQ = re.compile(r"\(\s*SELECT\b", re.I)
# both the DuckDB spellings (this pass runs before the list_* maps)
# and the Spark ones (defensive, for text earlier passes emitted)
_HOIST_FNS = (
    "aggregate", "transform", "filter", "zip_with", "reduce", "exists",
    "unnest", "list", "list_transform", "list_filter", "list_aggregate",
    "list_reduce", "list_dot_product", "list_zip", "list_sum",
)
_HOIST_CALL = re.compile(
    r"(?<![\w.])(" + "|".join(_HOIST_FNS) + r")\s*\("
)
_CLAUSE_KW = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|WINDOW|QUALIFY|ORDER\s+BY|LIMIT)\b"
)


def _hoist_subqueries_in_calls(sql: str) -> str:
    """Spark rejects subquery expressions inside higher-order
    functions and generators (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY
    .HIGHER_ORDER_FUNCTION / UNSUPPORTED_GENERATOR): hoist each
    UNCORRELATED scalar subquery found inside such a call into a
    one-row CROSS JOIN on the enclosing SELECT and reference it by
    name. Correlated subqueries would fail analysis afterwards and
    stay measured-unserved — never silently wrong."""
    counter = [0]

    def hoist_one(s: str) -> str | None:
        mask = _string_mask(s)
        for call in _HOIST_CALL.finditer(s):
            if mask[call.start()]:
                continue
            op = call.end() - 1
            cl = _find_close(s, op, mask)
            if cl is None:
                continue
            sub = next(
                (
                    mm
                    for mm in _SELECT_SUBQ.finditer(s, op + 1, cl)
                    if not mask[mm.start()]
                ),
                None,
            )
            if sub is None:
                continue
            sub_cl = _find_close(s, sub.start(), mask)
            if sub_cl is None or sub_cl > cl:
                continue
            subquery = s[sub.start() : sub_cl + 1]
            # enclosing SELECT (same depth as the call)
            depth, j, selpos = 0, call.start() - 1, None
            while j >= 0:
                if mask[j]:
                    j -= 1
                    continue
                c = s[j]
                if c == ")":
                    depth += 1
                elif c == "(":
                    if depth == 0:
                        break
                    depth -= 1
                elif (
                    depth == 0
                    and s[j : j + 6].upper() == "SELECT"
                    and (j == 0 or s[j - 1] not in _IDENT_CHARS)
                    and (j + 6 >= len(s) or s[j + 6] not in _IDENT_CHARS)
                ):
                    selpos = j
                    break
                j -= 1
            if selpos is None:
                continue
            # insertion point: end of the FROM clause (before the
            # first trailing clause keyword at depth 0) or block end
            depth, i = 0, selpos + 6
            frompos = None
            insert_at = len(s)
            while i < len(s):
                if mask[i]:
                    i += 1
                    continue
                c = s[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        insert_at = i
                        break
                    depth -= 1
                elif depth == 0:
                    nxt = s[i + 4 : i + 5]  # slice: no IndexError at EOS
                    if (
                        frompos is None
                        and s[i : i + 4].upper() == "FROM"
                        and (i == 0 or s[i - 1] not in _IDENT_CHARS)
                        and nxt
                        and nxt not in _IDENT_CHARS
                    ):
                        frompos = i
                    elif frompos is not None:
                        km = _CLAUSE_KW.match(s, i)
                        if km and s[i - 1] not in _IDENT_CHARS:
                            insert_at = i
                            break
                i += 1
            counter[0] += 1
            name = f"__hs{counter[0]}"
            talias = f"__ht{counter[0]}"
            hoist = f" (SELECT {subquery} AS {name}) {talias} "
            joiner = (
                f" CROSS JOIN{hoist}" if frompos is not None else f" FROM{hoist}"
            )
            # the call (and so the subquery) can sit AFTER the FROM
            # clause — in WHERE/GROUP/HAVING — in which case the join
            # is inserted BEFORE the subquery span; splice the two
            # edits in text order (the unordered form duplicated the
            # trailing clause — code-review r11)
            if insert_at <= sub.start():
                s = (
                    s[:insert_at]
                    + joiner
                    + s[insert_at : sub.start()]
                    + name
                    + s[sub_cl + 1 :]
                )
            else:
                s = (
                    s[: sub.start()]
                    + name
                    + s[sub_cl + 1 : insert_at]
                    + joiner
                    + s[insert_at:]
                )
            return s
        return None

    for _ in range(32):  # bounded; each pass hoists one subquery
        out = hoist_one(sql)
        if out is None:
            return sql
        sql = out
    return sql


# NOT rewritten (attempted and measured in r11, then reverted): the
# DuckDB recursive min-label closure (`walk(node, label)` connected
# components) NEEDS the recursive UNION's set-dedup to terminate, and
# Spark 4.1 supports only UNION ALL in recursion
# (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE). A bounded unrolled min-label
# ladder was tried and is optimizer-pathological — each round
# references the previous CTE twice, Spark inlines CTEs during
# analysis, so R rounds materialize 2^(2R) copies of the (large)
# candidate-pair prefix: a 51-row toy took 47 s at R=5 and the real
# queries wedged the driver uncancellably. The four affected queries
# (q_llm_curation_pipeline, q_llm_dedup_canonical/clusters/
# clusters_star) stay measured-unserved; the DataFrame builders'
# bounded-round CC operator (operators/graph.py) is the way to run
# them.


# ---------------------------------------------------------------------------
# FROM-position range(): DuckDB's table function exposes a column
# named after the function; Spark's range() exposes `id`.

_FROM_RANGE = re.compile(r"(\bFROM|\bJOIN|,)\s+range\s*\(")


def _rewrite_from_range(sql: str) -> str:
    """FROM-position range(): DuckDB's table function exposes a column
    named after the function (or the alias-list name, `range(9) i(i)`);
    Spark's exposes `id` — rewrite to an exploded-sequence subquery.
    The comma form is only rewritten when followed by a table alias
    (optionally with a column list), which never occurs for range()
    in expression position."""
    pos = 0
    while True:
        mask = _string_mask(sql)
        m = next(
            (
                m
                for m in _FROM_RANGE.finditer(sql, pos)
                if not mask[m.start()]
            ),
            None,
        )
        if m is None:
            return sql
        op = m.end() - 1
        cl = _find_close(sql, op, mask)
        if cl is None:
            return sql
        args = _split_top(sql[op + 1 : cl])
        seq = _repl_range(args, "")
        if seq is None:
            pos = m.end()
            continue
        tail = sql[cl + 1 :]
        # the whitespace before the optional column list must only be
        # consumed WITH the parens, or the replacement glues the alias
        # to the next keyword ("b GROUP BY" -> "bGROUP BY")
        am = re.match(r"\s+(?:AS\s+)?(\w+)(?:\s*\(\s*(\w+)\s*\))?", tail)
        if am is None:
            if m.group(1) == ",":
                pos = m.end()  # expression-position comma — leave it
                continue
            alias, col, rest = "range", "range", tail
        else:
            alias = am.group(1)
            col = am.group(2) or "range"
            rest = tail[am.end():]
            # the comma form is ambiguous with a SELECT-list item
            # (`SELECT a, range(5) AS r`); only the table-valued
            # alias-with-column-list spelling (`, range(9) i(i)`) is
            # unambiguously FROM-position
            if m.group(1) == "," and am.group(2) is None:
                pos = m.end()
                continue
        new = f"{m.group(1)} (SELECT explode({seq}) AS {col}) {alias}"
        sql = sql[: m.start()] + new + rest
        pos = m.start() + len(new)


# ---------------------------------------------------------------------------
# Brackets: [a, b] literals, 1-based x[i] indexing, x[a:b] slices.

_SQL_KEYWORDS = frozenset(
    "SELECT FROM WHERE THEN ELSE WHEN CASE END AND OR NOT IN ON BY AS "
    "DISTINCT ALL UNION EXCEPT INTERSECT JOIN HAVING GROUP ORDER LIMIT "
    "OVER PARTITION BETWEEN LIKE IS NULL TRUE FALSE RETURN RETURNS "
    "USING WITH VALUES".split()
)

_TYPE_ARRAY = re.compile(r"::\s*([A-Za-z_]\w*)\s*\[\s*\]")


def _rewrite_brackets(sql: str) -> str:
    mask = _string_mask(sql)
    i = 0
    while i < len(sql):
        if mask[i] or sql[i] != "[":
            i += 1
            continue
        cl = _find_close(sql, i, mask)
        if cl is None:
            i += 1
            continue
        j = i - 1
        while j >= 0 and sql[j] in " \t\n":
            j -= 1
        prev = sql[j] if j >= 0 else ""
        inner = _rewrite_brackets(sql[i + 1 : cl])
        if prev in _IDENT_CHARS or prev in ")]":
            # postfix index/slice — walk back over the base expression
            base_start = j + 1
            k = j
            while k >= 0:
                c = sql[k]
                if c in ")]":
                    ko = _find_open(sql, k, mask)
                    if ko is None:
                        break
                    k = ko - 1
                    base_start = ko
                elif c in _IDENT_CHARS or c == ".":
                    base_start = k
                    k -= 1
                else:
                    break
            base = sql[base_start:i].strip()
            # a bare SQL keyword before '[' means the bracket is an
            # expression-position literal, not an index
            if not base or base.upper() in _SQL_KEYWORDS:
                new = f"array({inner})"
                sql = sql[:i] + new + sql[cl + 1 :]
                mask = _string_mask(sql)
                i = i + len(new)
                continue
            colon = _split_top(inner, ":")
            if len(colon) == 2:
                a = colon[0].strip() or "1"
                b = colon[1].strip() or f"size({base})"
                # clamped: DuckDB x[a:b] is [] when b < a; Spark slice
                # raises under ANSI for a negative length
                new = f"slice({base}, {a}, greatest(0, ({b}) - ({a}) + 1))"
            elif re.fullmatch(r"\s*-?\d+\s*", inner):
                new = f"element_at({base}, {inner})"
            else:
                # computed index: Spark element_at requires INT and a
                # DuckDB expression can be BIGINT (e.g. `x // 2` maps
                # to DIV, which always widens)
                new = f"element_at({base}, CAST({inner} AS INT))"
            sql = sql[:base_start] + new + sql[cl + 1 :]
            mask = _string_mask(sql)
            i = base_start + len(new)
        else:
            # expression-position bracket = array literal
            new = f"array({inner})"
            sql = sql[:i] + new + sql[cl + 1 :]
            mask = _string_mask(sql)
            i = i + len(new)
    return sql


def _rewrite_struct_literals(sql: str) -> str:
    """{'k': v, ...} → named_struct('k', v, ...)."""
    while True:
        mask = _string_mask(sql)
        pos = next(
            (i for i, c in enumerate(sql) if c == "{" and not mask[i]), None
        )
        if pos is None:
            return sql
        cl = _find_close(sql, pos, mask)
        if cl is None:
            return sql
        fields = []
        ok = True
        for part in _split_top(sql[pos + 1 : cl]):
            kv = _split_top(part, ":")
            if len(kv) != 2 or not re.fullmatch(r"'[^']*'", kv[0].strip()):
                ok = False
                break
            fields.append(f"{kv[0].strip()}, {kv[1].strip()}")
        if not ok:
            return sql
        sql = sql[:pos] + "named_struct(" + ", ".join(fields) + ")" + sql[cl + 1 :]


_DATE_DIFF_UNIT = re.compile(r"\bdate_diff\(\s*'(\w+)'\s*,")


def double_backslashes_in_literals(sql: str) -> str:
    """DuckDB string literals are RAW (standard SQL: no escape
    processing); Spark's are C-escaped ('\\s' parses as 's'). The
    faithful translation of ANY DuckDB literal is therefore to double
    every backslash — this is what silently flips regex semantics
    otherwise ('\\s+' matching the letter s instead of whitespace was
    a measured value_mismatch, r11)."""
    mask = _string_mask(sql)
    out = []
    for i, c in enumerate(sql):
        if c == "\\" and mask[i]:
            out.append("\\\\")
        else:
            out.append(c)
    return "".join(out)


def structural_spark_sql(sql: str) -> str:
    """All structural passes, in dependency order (zip idioms before
    the generic range/unnest maps; type-suffix before the bracket
    pass; everything before the token map in sql_twins)."""
    sql = _add_recursion_limit(sql)
    sql = _rewrite_zip_generators(sql)
    sql = _rewrite_lateral_unnest(sql)
    sql = _rewrite_cast_after_unnest(sql)
    sql = _rewrite_qualify(sql)
    sql = _hoist_subqueries_in_calls(sql)
    sql = rewrite_calls(sql, "list", _agg_order_repl_list)
    sql = rewrite_calls(sql, "array_agg", _agg_order_repl_list)
    sql = rewrite_calls(sql, "string_agg", _agg_order_repl_string_agg)
    sql = rewrite_calls(sql, "list_transform", _repl_list_transform_zip)
    sql = rewrite_calls(sql, "list_reduce", _repl_list_reduce)
    sql = rewrite_calls(sql, "list_aggregate", _repl_list_aggregate)
    sql = rewrite_calls(sql, "list_dot_product", _repl_list_dot_product)
    sql = rewrite_calls(sql, "list_sum", _repl_list_sum)
    sql = rewrite_calls(sql, "list_slice", _repl_list_slice)
    sql = rewrite_calls(sql, "list_prepend", _repl_list_prepend)
    sql = _rewrite_from_range(sql)
    sql = rewrite_calls(sql, "range", _repl_range)
    sql = rewrite_calls(sql, "generate_subscripts", _repl_generate_subscripts)
    sql = rewrite_calls(sql, "strftime", _repl_strftime)
    sql = _DATE_DIFF_UNIT.sub(lambda m: f"date_diff({m.group(1)},", sql)
    sql = rewrite_calls(sql, "regexp_replace", _repl_regexp_replace)
    sql = rewrite_calls(sql, "regexp_extract_all", _repl_regexp_extract_all)
    sql = rewrite_calls(sql, "encode", _repl_encode)
    sql = rewrite_calls(sql, "xor", _repl_xor)
    sql = rewrite_calls(sql, "to_days", _repl_to_days)
    sql = rewrite_calls(sql, "to_hours", _repl_to_hours)
    sql = rewrite_calls(sql, "to_minutes", _repl_to_minutes)
    sql = rewrite_calls(sql, "struct_pack", _repl_struct_pack)
    sql = _rewrite_struct_literals(sql)
    sql = _TYPE_ARRAY.sub(lambda m: f"::ARRAY<{m.group(1)}>", sql)
    sql = _rewrite_brackets(sql)
    return sql
