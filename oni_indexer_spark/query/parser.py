"""Lucene-lite query-string parser (the Solr portal's actual input
surface — reference ``portal_base.json:18-23`` sends user-typed query
strings to Solr's lucene/edismax parser over ``main_search``).

Grammar (flat boolean — no parentheses/nesting, documented limitation):

- bare word            → SHOULD term (Solr default ``q.op=OR``)
- ``"a b"`` / ``"a b"~N`` → phrase clause (optional slop N)
- ``+x`` / ``-x``      → MUST / MUST_NOT (x may be a word, phrase,
                          wildcard or fuzzy form)
- ``AND`` / ``OR`` / ``NOT`` → keyword sugar: ``a AND b`` promotes both
                          neighbours to MUST, ``NOT x`` prohibits the
                          next clause, ``OR`` is the default (no-op)
- ``pref*``            → trailing-wildcard (PrefixQuery) clause
- ``word~`` / ``word~N`` → fuzzy clause (N ∈ {1,2}; bare ``~`` = 2,
                          Lucene's default; ``~0`` degrades to a term)
- ``field:value``      → metadata filter (Solr fq; validated against the
                          index's doclen columns at query time)
- ``-field:value``     → negated filter (``<>`` — NULLs excluded)
- ``field:[lo TO hi]`` → inclusive range filter
- ``field:"v w"``      → exact-match filter on a value with spaces
- ``x^N`` / ``"a b"^N`` → query-time boost (any clause kind; composes
                          with slop/fuzzy: ``"a b"~2^3``, ``fix~1^0.5``)

Scoring semantics are Lucene ``BooleanQuery`` (post-6.0, no coord): the
document score is the SUM of its matching MUST and SHOULD clause scores;
a document must match every MUST clause, no MUST_NOT clause, and — when
no MUST clause exists — at least one SHOULD clause. Filters restrict the
result set only (idf/avgdl stay corpus-global, Solr fq semantics).

The parse is pure Python and deterministic, shared verbatim by the
engine (``Searcher.search``) and the DuckDB oracle twin
(``oracle.boolean_query_sql``) so both sides interpret a query string
identically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Clause:
    """One positive/negative query clause.

    ``kind``: "term" | "phrase" | "prefix" | "fuzzy".
    ``occur``: "should" | "must" | "not".
    ``text``: the raw body (analyzed later — the analyzer is an index
    property, not a parse property).
    ``slop``: phrase slop, or fuzzy max_edits for kind="fuzzy".
    ``boost``: Lucene ``^N`` query-time boost — multiplies the clause's
    score contribution (idf weight for term-set clauses, the summed-idf
    pseudo-term weight for phrases). 1.0 = unboosted.
    """

    kind: str
    occur: str
    text: str
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class ParsedQuery:
    clauses: tuple[Clause, ...] = ()
    # filters: col → condition, where condition is a plain value,
    # ("neq", v), ("range", lo, hi), or ("all", (cond, ...)) when several
    # conditions target the same column. Hashable throughout (the fq
    # memo keys on it).
    filters: dict = field(default_factory=dict)

    def by(self, occur: str, kind: str | None = None) -> list[Clause]:
        return [
            c
            for c in self.clauses
            if c.occur == occur and (kind is None or c.kind == kind)
        ]


_TOKEN = re.compile(
    r"""
    (?P<sign>[+-])?
    (?:
        (?P<field>[A-Za-z_][A-Za-z0-9_]*):
        (?:
            \[\s*(?P<lo>[^\s\]]+)\s+TO\s+(?P<hi>[^\s\]]+)\s*\]
          | "(?P<fqq>[^"]*)"
          | (?P<fval>[^\s"]+)
        )
      | "(?P<phrase>[^"]*)"(?:~(?P<pslop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?
      | (?P<word>[^\s"]+)
    )
    """,
    re.X,
)

_KEYWORDS = {"AND", "OR", "NOT", "&&", "||", "!"}


def _coerce(v: str):
    """Numeric-looking filter values compare as numbers (dl:[5 TO 100])."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _merge_filter(filters: dict, col: str, cond) -> None:
    if col not in filters:
        filters[col] = cond
        return
    prev = filters[col]
    prev_list = list(prev[1]) if isinstance(prev, tuple) and prev[0] == "all" else [prev]
    filters[col] = ("all", tuple(prev_list + [cond]))


def parse_query(q: str) -> ParsedQuery:
    """Parse a Lucene-lite query string. Raises ``ValueError`` on forms
    the flat grammar can't express (parentheses, negated ranges, a query
    with no positive clause)."""
    if "(" in q or ")" in q:
        raise ValueError("grouping parentheses are not supported (flat boolean)")
    raw: list[tuple[str, object]] = []  # ("kw", word) | ("clause", Clause) | ("filter", (col, cond, sign))
    for m in _TOKEN.finditer(q):
        sign = m.group("sign") or ""
        if m.group("field") is not None:
            col = m.group("field")
            if m.group("lo") is not None:
                cond = ("range", _coerce(m.group("lo")), _coerce(m.group("hi")))
                if sign == "-":
                    raise ValueError("negated range filters are not supported")
            else:
                # quoted values stay strings; bare numerics compare as numbers
                v = (
                    m.group("fqq")
                    if m.group("fqq") is not None
                    else _coerce(m.group("fval"))
                )
                cond = ("neq", v) if sign == "-" else v
            raw.append(("filter", (col, cond)))
            continue
        occur = {"+": "must", "-": "not", "": "should"}[sign]
        if m.group("phrase") is not None:
            body = m.group("phrase")
            slop = int(m.group("pslop") or 0)
            boost = float(m.group("pboost") or 1.0)
            raw.append(("clause", Clause("phrase", occur, body, slop, boost)))
            continue
        w = m.group("word")
        if not sign and w in _KEYWORDS:
            raw.append(("kw", w))
            continue
        boost = 1.0
        bm = re.fullmatch(r"(.+?)\^(\d+(?:\.\d+)?)", w)
        if bm:
            w, boost = bm.group(1), float(bm.group(2))
        fm = re.fullmatch(r"(.+?)~(\d?)", w)
        if w.endswith("*") and len(w) > 1:
            raw.append(("clause", Clause("prefix", occur, w[:-1], 0, boost)))
        elif fm:
            edits = int(fm.group(2)) if fm.group(2) else 2
            kind = "term" if edits == 0 else "fuzzy"
            raw.append(
                ("clause", Clause(kind, occur, fm.group(1), min(edits, 2), boost))
            )
        else:
            raw.append(("clause", Clause("term", occur, w, 0, boost)))

    # keyword sugar → occur rewrites (explicit +/- signs win)
    items: list[object] = []
    pending_not = False
    pending_and = False
    for tag, val in raw:
        if tag == "kw":
            if val in ("NOT", "!"):
                pending_not = True
            elif val in ("AND", "&&"):
                pending_and = True
                # promote the previous clause too (scan by index — value
                # equality would hit an earlier duplicate clause)
                for j in range(len(items) - 1, -1, -1):
                    prev = items[j]
                    if isinstance(prev, Clause):
                        if prev.occur == "should":
                            items[j] = Clause(
                                prev.kind, "must", prev.text, prev.slop, prev.boost
                            )
                        break
            continue
        if tag == "filter":
            items.append(val)
            pending_not = pending_and = False
            continue
        c: Clause = val
        if pending_not and c.occur == "should":
            c = Clause(c.kind, "not", c.text, c.slop, c.boost)
        elif pending_and and c.occur == "should":
            c = Clause(c.kind, "must", c.text, c.slop, c.boost)
        items.append(c)
        pending_not = pending_and = False

    clauses = tuple(i for i in items if isinstance(i, Clause))
    filters: dict = {}
    for i in items:
        if not isinstance(i, Clause):
            _merge_filter(filters, i[0], i[1])
    if not any(c.occur in ("should", "must") for c in clauses):
        raise ValueError("query needs at least one positive (non -/NOT) clause")
    return ParsedQuery(clauses, filters)
