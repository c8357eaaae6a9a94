"""``DIFF(...)`` SQL table-macro — the SURVEY §4.2 "optional stretch".

The reference's user-facing surface is a CLI + rendered SQL
(/root/reference/checkatron/diffgen.py); SURVEY §4.2 notes that a
``DIFF(...)`` *SQL syntax* would be a nice-to-have beyond parity. Spark's
parser can only be extended with JVM-side ``ParserInterface`` plugins, so a
pure-PySpark engine provides the same ergonomics as a MACRO layer:
:func:`sql` scans the query text for ``DIFF(...)`` table factors
(quote-aware — a DIFF inside a string literal is untouched), builds each
one with the REAL diff operator (:func:`checkatron_spark.diff` — the
single full-outer null-safe join, every option available), registers the
result as a temp view, and hands the rewritten text to ``spark.sql``.
Catalyst therefore optimizes the diff TOGETHER with the surrounding query
(filters over the macro's view push into the diff's join like any other
subquery).

Grammar (case-insensitive keywords; table refs are identifiers, dotted
names allowed)::

    DIFF(before_ref, after_ref, KEYS(k1 [, k2 ...])
         [, BEFORE_WHERE => '<sql predicate>']
         [, AFTER_WHERE  => '<sql predicate>']
         [, FAITHFUL] [, PRESENCE_FIX])

Example::

    sql(spark, '''
        SELECT _row_status, COUNT(*) AS n
        FROM DIFF(prod.orders_old, prod.orders_new, KEYS(o_orderkey))
        WHERE _row_status IS NOT NULL
        GROUP BY _row_status
    ''')

Reference parity note: the reference has no SQL-function surface — this is
the one SURVEY §4.2 stretch item, built on the operator the engine already
verifies; the declared ``diff_orders_sqlmacro`` query grades the macro
path against the SAME rendered-SQL oracle as ``diff_orders``, so the
expansion is value-checked end to end, not just parsed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["sql", "expand_diff_macros"]

_DIFF_HEAD = re.compile(r"\bDIFF\s*\(", re.IGNORECASE)
_IDENT = re.compile(r"^[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)*$")


def _scan_string(text: str, i: int) -> int:
    """Given text[i] == "'", return the index just past the closing quote
    (SQL '' escapes honored)."""
    i += 1
    while i < len(text):
        if text[i] == "'":
            if i + 1 < len(text) and text[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    raise ValueError("unterminated string literal in SQL text")


def _skip_inert(text: str, i: int) -> int:
    """If text[i] opens a region the macro scanner must not look inside —
    a single-/double-quoted string, a backtick identifier, a ``--`` line
    comment, or a ``/* */`` block comment — return the index just past
    it; else return i. (Review r11: the first cut lexed only
    single-quoted strings, so an apostrophe in a comment crashed the
    scanner and a DIFF inside a comment or double-quoted literal was
    expanded.)"""
    ch = text[i]
    if ch == "'":
        return _scan_string(text, i)
    if ch in ('"', "`"):
        j = text.find(ch, i + 1)
        # doubled-quote escapes ("" / ``) inside quoted identifiers
        while j != -1 and j + 1 < len(text) and text[j + 1] == ch:
            j = text.find(ch, j + 2)
        if j == -1:
            raise ValueError(f"unterminated {ch}-quoted section in SQL text")
        return j + 1
    if ch == "-" and text[i:i + 2] == "--":
        j = text.find("\n", i)
        return len(text) if j == -1 else j + 1
    if ch == "/" and text[i:i + 2] == "/*":
        j = text.find("*/", i + 2)
        if j == -1:
            raise ValueError("unterminated /* */ comment in SQL text")
        return j + 2
    return i


def _find_calls(text: str):
    """Yield (start, end, inner) spans of top-level DIFF(...) calls,
    skipping any that sit inside string literals, quoted identifiers, or
    comments."""
    spans = []
    i = 0
    while i < len(text):
        j = _skip_inert(text, i)
        if j != i:
            i = j
            continue
        m = _DIFF_HEAD.match(text, i)
        # a word boundary before DIFF: not preceded by an identifier char,
        # and not a qualified reference like catalog.DIFF(...) — a dotted
        # name is the user's own function/table in some namespace, which
        # Spark's resolver must handle (ADVICE r11: rewriting it produced
        # invalid `catalog.__diff_macro_N` SQL instead of a clear error)
        prev_non_space = next(
            (text[p] for p in range(i - 1, -1, -1) if not text[p].isspace()),
            "",
        )
        if m and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "_$")
        ) and prev_non_space != ".":
            depth = 1
            j = m.end()
            while j < len(text) and depth:
                j2 = _skip_inert(text, j)
                if j2 != j:
                    j = j2
                    continue
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced parentheses in DIFF(...)")
            spans.append((i, j, text[m.end(): j - 1]))
            i = j
            continue
        i += 1
    return spans


def _split_args(inner: str) -> list[str]:
    """Split on top-level commas, respecting parens and strings."""
    out, buf, depth, i = [], [], 0, 0
    while i < len(inner):
        ch = inner[i]
        j = _skip_inert(inner, i)
        if j != i:
            buf.append(inner[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


def _parse_call(inner: str) -> dict:
    args = _split_args(inner)
    if len(args) < 3:
        raise ValueError(
            "DIFF(...) needs at least (before_ref, after_ref, KEYS(...))"
        )
    before_ref, after_ref = args[0], args[1]
    for ref in (before_ref, after_ref):
        if not _IDENT.match(ref):
            raise ValueError(
                f"DIFF table ref {ref!r} is not an identifier "
                "(dotted names allowed; register frames as temp views)"
            )
    mkeys = re.match(r"(?is)^KEYS\s*\((.*)\)$", args[2].strip())
    if not mkeys:
        raise ValueError("DIFF's third argument must be KEYS(k1 [, k2 ...])")
    keys = [k.strip() for k in mkeys.group(1).split(",") if k.strip()]
    if not keys or not all(_IDENT.match(k) for k in keys):
        raise ValueError(f"bad KEYS list in DIFF(...): {mkeys.group(1)!r}")
    opts: dict = {"keys": keys, "before": before_ref, "after": after_ref}
    for extra in args[3:]:
        mkw = re.match(r"(?is)^(BEFORE_WHERE|AFTER_WHERE)\s*=>\s*'(.*)'$",
                       extra.strip())
        if mkw:
            opts[mkw.group(1).lower()] = mkw.group(2).replace("''", "'")
            continue
        flag = extra.strip().upper()
        if flag in ("FAITHFUL", "PRESENCE_FIX"):
            opts[flag.lower()] = True
            continue
        raise ValueError(f"unknown DIFF(...) argument: {extra!r}")
    return opts


# Monotonic per-process id for macro view names (ADVICE r11): fixed
# __diff_macro_0/1/... names collided across interleaved sql() calls on one
# session and could clobber a user view of the same name. The counter makes
# every expansion's views unique for the session's lifetime; :func:`sql`
# additionally DROPS its views right after analysis so nothing leaks into
# the catalog.
_VIEW_SEQ = [0]


def _expand(
    spark: SparkSession, query: str, *, column_case: str = "upper"
) -> tuple[str, list[str]]:
    """Rewrite + register; returns (rewritten_sql, registered_view_names)."""
    from checkatron_spark.operators.diff import diff

    spans = _find_calls(query)
    out, last, views = [], 0, []
    try:
        for start, end, inner in spans:
            o = _parse_call(inner)
            d = diff(
                spark.table(o["before"]),
                spark.table(o["after"]),
                o["keys"],
                before_where=o.get("before_where"),
                after_where=o.get("after_where"),
                faithful=o.get("faithful", False),
                presence_fix=o.get("presence_fix", False),
                column_case=column_case,
            )
            view = f"__diff_macro_{_VIEW_SEQ[0]}"
            _VIEW_SEQ[0] += 1
            d.createOrReplaceTempView(view)
            views.append(view)
            out.append(query[last:start])
            out.append(view)
            last = end
    except BaseException:
        # a later span's failure (bad options, missing table) must not
        # leak the views already registered for earlier spans (ADVICE
        # r12) — sql()'s finally only covers the spark.sql call
        for v in views:
            try:
                spark.catalog.dropTempView(v)
            except Exception:  # noqa: BLE001 — dead session mid-cleanup
                pass
        raise
    out.append(query[last:])
    return "".join(out), views


def expand_diff_macros(
    spark: SparkSession, query: str, *, column_case: str = "upper"
) -> str:
    """Expand every DIFF(...) call in ``query`` into a registered temp
    view and return the rewritten SQL. Exposed for inspection/testing —
    the views STAY registered (the caller runs the rewritten text later);
    :func:`sql` is the run-it form and cleans its views up itself."""
    return _expand(spark, query, column_case=column_case)[0]


def sql(
    spark: SparkSession, query: str, *, column_case: str = "upper"
) -> DataFrame:
    """``spark.sql`` with the ``DIFF(...)`` table macro (module docstring
    for the grammar). Queries without a DIFF call pass through verbatim.

    The macro temp views are dropped right after ``spark.sql`` returns:
    analysis is eager, so the returned DataFrame's resolved plan no longer
    needs the catalog entries — nothing leaks into the session."""
    rewritten, views = _expand(spark, query, column_case=column_case)
    try:
        return spark.sql(rewritten)
    finally:
        for v in views:
            spark.catalog.dropTempView(v)
