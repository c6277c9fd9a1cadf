"""DuckDB SQL builders mirroring the engine's semantics exactly.

Used by ``__spark_entry__.oracle_sql`` (the driver's correctness gate) and
by the pytest oracle harness. Each builder returns ANSI-ish SQL DuckDB can
run over the pre-registered parquet views. The tokenizer expression is the
SAME regex as the Spark analyzer; BM25 is the same formula; ranking uses
the same round-then-tie-break convention (see query/bm25._ranked).
"""

from __future__ import annotations

from oni_indexer_spark.analyzer import (
    analyzer_tokenize_py,
    analyzer_tokens_sql,
    duckdb_tokens_sql,
    query_terms,
)


def _values(terms: list[str]) -> str:
    return ", ".join("('" + t.replace("'", "''") + "')" for t in terms)


def bm25_topk_sql(
    query: str,
    k: int = 10,
    mode: str = "or",
    fq_lang: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_sub: str | None = None,
) -> str:
    """Full BM25 top-k over the driver's ``documents`` view. ``fq_sub``
    is a raw DuckDB subquery returning the allowed ``doc_id`` set (the
    generalized filter-query forms — negation, ranges; it may reference
    the ``dl`` CTE for doc-length filters)."""
    terms = query_terms(query, analyzer)
    toks = analyzer_tokens_sql(text_col, analyzer)
    # Solr fq semantics: the filter restricts the RESULT set only; idf /
    # avgdl / N stay corpus-global (SURVEY.md §2.C9).
    if fq_sub:
        fq_pred = f"AND doc_id IN ({fq_sub})"
    elif fq_lang:
        fq_pred = f"AND doc_id IN (SELECT doc_id FROM {table} WHERE lang = '{fq_lang}')"
    else:
        fq_pred = ""
    having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
),
q(term) AS (VALUES {_values(terms)}),
qtf AS (SELECT tf.* FROM tf JOIN q USING (term)),
dfreq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT qtf.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * qtf.tf * ({k1} + 1.0)
              / (qtf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM qtf
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qtf.doc_id
  {having}
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
  WHERE TRUE {fq_pred}
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def bm25_phrase_topk_sql(
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_lang: str | None = None,
    slop: int = 0,
) -> str:
    """Phrase-query oracle (Lucene ``PhraseQuery`` semantics, mirrored by
    ``Searcher._phrase_topk``): phrase frequency = count of start
    positions where the full token sequence matches; score =
    ``(Σ_j idf(term_j)) · tfn(phraseFreq, dl)`` with idf summed over all
    query positions (duplicates counted per position). ``slop`` (m=2
    only here; larger m is brute-force-oracled in tests/test_phrase.py)
    counts anchors whose partner term appears in the next ``1+slop``
    positions — the engine's ordered total-budget semantics."""
    qtoks = analyzer_tokenize_py(query, analyzer)
    m = len(qtoks)
    toks = analyzer_tokens_sql(text_col, analyzer)
    if slop and m != 2:
        raise ValueError("slop oracle SQL supports 2-term phrases only")
    cond = " AND ".join(
        f"toks[i+{j}] = '" + t.replace("'", "''") + "'" for j, t in enumerate(qtoks)
    )
    if slop and m == 2:
        t0 = qtoks[0].replace("'", "''")
        t1 = qtoks[1].replace("'", "''")
        cond = (
            f"toks[i] = '{t0}' AND list_contains("
            f"list_slice(toks, i + 1, least(len(toks), i + 1 + {slop})), '{t1}')"
        )
    distinct = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(qtoks)))
    # Solr fq semantics: restrict results only; idf/avgdl stay corpus-wide
    fq_pred = (
        f"AND pf.doc_id IN (SELECT doc_id FROM {table} WHERE lang = '{fq_lang}')"
        if fq_lang
        else ""
    )
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
toksd AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES {_values(qtoks)}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toksd
  WHERE term IN ({distinct}) GROUP BY term
),
idfsum AS (
  SELECT sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS w
  FROM q JOIN dfreq d USING (term) CROSS JOIN stats s
),
pf AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks) - {m} + 2), i -> {cond})) AS pf
  FROM base WHERE len(toks) >= {m}
),
scored AS (
  SELECT pf.doc_id,
         i.w * pf.pf * ({k1} + 1.0)
             / (pf.pf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) AS score
  FROM pf
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  CROSS JOIN idfsum i
  WHERE pf.pf > 0 {fq_pred}
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def _expanded_topk_sql(
    q_cte: str,
    k: int,
    k1: float,
    b: float,
    table: str,
    text_col: str,
    analyzer: str,
    fq_sub: str | None = None,
) -> str:
    """Shared scaffold for term-dictionary-expanded queries (prefix /
    fuzzy — Searcher._topk_from_dfs's oracle twin). ``q_cte`` must
    select ``(term, w)`` and may reference ``df_all`` (the corpus term
    dictionary with df) — mirroring the engine, which expands against
    the index's dfreq table. ``w`` multiplies the term's idf."""
    toks = analyzer_tokens_sql(text_col, analyzer)
    fq_pred = f"AND doc_id IN ({fq_sub})" if fq_sub else ""
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
),
df_all AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q AS ({q_cte}),
qtf AS (SELECT tf.doc_id, tf.term, tf.tf, q.w FROM tf JOIN q USING (term)),
dfreq AS (SELECT d.term, d.df FROM df_all d JOIN q USING (term)),
scored AS (
  SELECT qtf.doc_id,
         sum( qtf.w * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * qtf.tf * ({k1} + 1.0)
              / (qtf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM qtf
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qtf.doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
  WHERE TRUE {fq_pred}
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def _sq(s: str) -> str:
    return s.replace("'", "''")


def bm25_prefix_topk_sql(
    prefix: str,
    k: int = 10,
    max_terms: int = 128,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_sub: str | None = None,
    rewrite: str = "scoring",
) -> str:
    """Trailing-wildcard oracle (Searcher.prefix_topk): expand the term
    dictionary by prefix, keep the top ``max_terms`` by (df desc, term
    asc) — Lucene's top-terms scoring rewrite — and score a plain BM25
    OR (w = 1) over the expansion. ``substr`` (not LIKE) so ``_`` in
    code tokens is literal. ``rewrite="constant"`` is the
    large-expansion twin: constant score 1.0, top-k = k lowest matching
    doc_ids (Searcher._constant_score_topk)."""
    toks = analyzer_tokenize_py(prefix, analyzer)
    pre = _sq(toks[0]) if toks else ""
    q_cte = (
        f"SELECT term, 1.0 AS w FROM df_all "
        f"WHERE substr(term, 1, {len(pre)}) = '{pre}' "
        f"ORDER BY df DESC, term ASC LIMIT {max_terms}"
    )
    if rewrite == "constant":
        toks_expr = analyzer_tokens_sql(text_col, analyzer)
        fq_pred = f"AND doc_id IN ({fq_sub})" if fq_sub else ""
        return f"""
WITH base AS (
  SELECT doc_id, {toks_expr} AS toks FROM {table}
),
toksd AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM base),
df_all AS (SELECT term, count(*) AS df FROM toksd GROUP BY term),
q AS ({q_cte}),
matched AS (SELECT DISTINCT doc_id FROM toksd JOIN q USING (term)),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) AS rank
  FROM matched WHERE TRUE {fq_pred}
)
SELECT rank::int AS rank, doc_id, 1.0::DOUBLE AS score
FROM ranked WHERE rank <= {k}
""".strip()
    return _expanded_topk_sql(q_cte, k, k1, b, table, text_col, analyzer, fq_sub)


def bm25_fuzzy_topk_sql(
    term: str,
    k: int = 10,
    max_edits: int = 1,
    prefix_len: int = 1,
    max_terms: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Fuzzy-query oracle (Searcher.fuzzy_topk): classic-Levenshtein
    expansion (DuckDB ``levenshtein`` == Spark ``levenshtein``) within
    ``max_edits``, sharing a ``prefix_len`` prefix, top ``max_terms`` by
    (df desc, term asc); each term weighted by Lucene's fuzzy boost
    ``1 − ed / min(|term|, |query|)``."""
    toks = analyzer_tokenize_py(term, analyzer)
    t = _sq(toks[0]) if toks else ""
    n = len(t)
    pre = _sq(toks[0][:prefix_len]) if toks else ""
    q_cte = (
        f"SELECT term, 1.0 - levenshtein(term, '{t}')::DOUBLE "
        f"/ least(length(term), {n}) AS w "
        f"FROM df_all "
        f"WHERE substr(term, 1, {len(pre)}) = '{pre}' "
        f"AND length(term) BETWEEN {n - max_edits} AND {n + max_edits} "
        f"AND levenshtein(term, '{t}') <= {max_edits} "
        f"ORDER BY df DESC, term ASC LIMIT {max_terms}"
    )
    return _expanded_topk_sql(q_cte, k, k1, b, table, text_col, analyzer)


def mlt_topk_sql(
    doc_id: int,
    k: int = 10,
    max_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """MoreLikeThis oracle (query.bm25.more_like_this): select the
    target doc's top ``max_terms`` terms by tf·idf (ties by term asc),
    score a BM25 OR over them, exclude the source doc. The q CTE
    references the scaffold's ``tf``/``df_all``/``stats`` — the same
    derivation the engine does driver-side from the target's tf vector
    and the dfreq table."""
    q_cte = (
        f"SELECT t.term, 1.0 AS w FROM tf t "
        f"JOIN df_all d USING (term) CROSS JOIN stats s "
        f"WHERE t.doc_id = {doc_id} "
        f"ORDER BY t.tf * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) DESC, "
        f"t.term ASC LIMIT {max_terms}"
    )
    fq_sub = f"SELECT doc_id FROM {table} WHERE doc_id <> {doc_id}"
    return _expanded_topk_sql(q_cte, k, k1, b, table, text_col, analyzer, fq_sub)


def snippet_topk_sql(
    query: str,
    k: int = 10,
    window: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Highlighting oracle (query.bm25.snippet_topk): BM25 OR top-k,
    each row joined back to its analyzed token stream and sliced to the
    (2·window+1)-token neighbourhood of the first occurrence of the
    query's FIRST term (leading tokens when absent). ``list_slice`` is
    1-based inclusive-end, matching Spark ``slice(start, 2w+1)``; both
    clamp at the document boundaries."""
    terms = query_terms(query, analyzer)
    anchor = _sq(terms[0]) if terms else ""
    toks = analyzer_tokens_sql(text_col, analyzer)
    w = window
    base_topk = bm25_topk_sql(
        query, k=k, k1=k1, b=b, table=table, text_col=text_col, analyzer=analyzer
    )
    # strip the trailing SELECT of the scaffold and re-emit it as a CTE
    body = base_topk[: base_topk.rindex("SELECT rank::int")].rstrip()
    return f"""{body},
final AS (
  SELECT rank::int AS rank, doc_id, round(score, 6) AS score
  FROM ranked WHERE rank <= {k}
),
snip AS (
  SELECT f.rank, f.doc_id, f.score,
         CASE WHEN p IS NOT NULL THEN greatest(1, p - {w}) ELSE 1 END AS s,
         b.toks
  FROM final f
  JOIN (
    SELECT doc_id, toks,
           nullif(coalesce(list_position(toks, '{anchor}'), 0), 0) AS p
    FROM base
  ) b USING (doc_id)
)
SELECT rank, doc_id, score,
       array_to_string(list_slice(toks, s, s + {2 * w}), ' ') AS snippet
FROM snip
""".strip()


def doclen_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = duckdb_tokens_sql(text_col)
    return (
        f"SELECT doc_id, len({toks})::bigint AS dl, "
        f"sha256({text_col}) AS content_sha256 FROM {table}"
    )


def stats_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = duckdb_tokens_sql(text_col)
    return (
        f"SELECT count(*)::bigint AS n_docs, round(avg(len({toks})), 6) AS avgdl "
        f"FROM {table}"
    )


def dfreq_sql(terms: list[str], table: str = "documents", text_col: str = "text") -> str:
    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH toksd AS (SELECT doc_id, unnest({toks}) AS term FROM {table}),
q(term) AS (VALUES {_values(terms)})
SELECT t.term, count(DISTINCT t.doc_id)::bigint AS df, count(*)::bigint AS cf
FROM toksd t JOIN q USING (term)
GROUP BY t.term
""".strip()


def facet_sql(field: str, limit: int = 5, table: str = "documents") -> str:
    return (
        f"SELECT {field} AS value, count(*)::bigint AS count FROM {table} "
        f"WHERE {field} IS NOT NULL GROUP BY {field} "
        f"ORDER BY count DESC, value ASC LIMIT {limit}"
    )


# ----------------------------------------------------------- boolean


def _sql_lit(v) -> str:
    return str(v) if isinstance(v, (int, float)) else "'" + str(v).replace("'", "''") + "'"


def _phrase_pf_cond(qtoks: list[str], slop: int) -> str:
    """The list_filter lambda condition counting phrase starts at
    position i (shared by the phrase and boolean oracles)."""
    if slop:
        if len(qtoks) != 2:
            raise ValueError("slop oracle SQL supports 2-term phrases only")
        t0, t1 = _sq(qtoks[0]), _sq(qtoks[1])
        return (
            f"toks[i] = '{t0}' AND list_contains("
            f"list_slice(toks, i + 1, least(len(toks), i + 1 + {slop})), '{t1}')"
        )
    return " AND ".join(
        f"toks[i+{j}] = '{_sq(t)}'" for j, t in enumerate(qtoks)
    )


def boolean_query_sql(
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    max_prefix_terms: int = 128,
    max_fuzzy_terms: int = 64,
) -> str:
    """Oracle twin of ``Searcher.search`` — the Lucene-lite boolean
    query-string surface. Parses the SAME query string with the SAME
    ``query/parser.parse_query`` + analyzer the engine uses, then emits
    one DuckDB query implementing Lucene BooleanQuery scoring: per-doc
    score = Σ of matching MUST and SHOULD clause scores, docs must match
    every MUST clause and no MUST_NOT clause, metadata filters restrict
    the result set only (idf/avgdl corpus-global). MUST terms fuse into
    one all-required weighted pass, SHOULD terms + prefix/fuzzy
    expansions into one weighted OR pass (weights summed per term),
    each phrase scores as its own pseudo-term clause — mirroring the
    engine's clause grouping exactly."""
    from oni_indexer_spark.query.parser import parse_query

    pq = parse_query(query)
    toks_expr = analyzer_tokens_sql(text_col, analyzer)

    terms: dict[str, dict[str, float]] = {"must": {}, "should": {}, "not": {}}
    phrases: list[tuple[str, list[str], int, float]] = []
    expansions: list[tuple[str, str, str, int, float]] = []
    for c in pq.clauses:
        toks = analyzer_tokenize_py(c.text, analyzer)
        if not toks:
            continue
        if c.kind == "phrase" and len(toks) >= 2:
            phrases.append((c.occur, toks, c.slop, c.boost))
        elif c.kind in ("prefix", "fuzzy"):
            expansions.append((c.occur, c.kind, toks[0], c.slop, c.boost))
        else:
            w = terms[c.occur]
            for t in toks:
                w[t] = w.get(t, 0.0) + c.boost

    def weights_values(w: dict[str, float]) -> str:
        return ", ".join(f"('{_sq(t)}', {wt})" for t, wt in sorted(w.items()))

    def expansion_select(kind: str, tok: str, edits: int, boost: float = 1.0) -> str:
        if kind == "prefix":
            return (
                f"SELECT term, {boost} AS w FROM df_all "
                f"WHERE substr(term, 1, {len(tok)}) = '{_sq(tok)}' "
                f"ORDER BY df DESC, term ASC LIMIT {max_prefix_terms}"
            )
        t, n = _sq(tok), len(tok)
        pre = _sq(tok[:1])
        return (
            f"SELECT term, {boost} * (1.0 - levenshtein(term, '{t}')::DOUBLE "
            f"/ least(length(term), {n})) AS w FROM df_all "
            f"WHERE substr(term, 1, {len(pre)}) = '{pre}' "
            f"AND length(term) BETWEEN {n - edits} AND {n + edits} "
            f"AND levenshtein(term, '{t}') <= {edits} "
            f"ORDER BY df DESC, term ASC LIMIT {max_fuzzy_terms}"
        )

    score_expr = (
        f"sum( q.w * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) "
        f"* tf.tf * ({k1} + 1.0) "
        f"/ (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) )"
    )

    def term_pass_cte(name: str, q_sub: str, require_all: int | None) -> str:
        having = f"HAVING count(*) = {require_all}" if require_all else ""
        return (
            f"{name} AS (\n"
            f"  SELECT tf.doc_id, {score_expr} AS score\n"
            f"  FROM tf JOIN ({q_sub}) q USING (term)\n"
            f"  JOIN df_all d USING (term) JOIN dl USING (doc_id)\n"
            f"  CROSS JOIN stats s GROUP BY tf.doc_id {having}\n)"
        )

    def phrase_cte(name: str, qtoks: list[str], slop: int, boost: float = 1.0) -> str:
        m = len(qtoks)
        cond = _phrase_pf_cond(qtoks, slop)
        pos_vals = ", ".join(f"('{_sq(t)}')" for t in qtoks)
        return (
            f"{name} AS (\n"
            f"  SELECT pf.doc_id,\n"
            f"         i.w * pf.pf * ({k1} + 1.0)\n"
            f"             / (pf.pf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) AS score\n"
            f"  FROM (SELECT doc_id,\n"
            f"               len(list_filter(range(1, len(toks) - {m} + 2), i -> {cond})) AS pf\n"
            f"        FROM base WHERE len(toks) >= {m}) pf\n"
            f"  JOIN dl USING (doc_id) CROSS JOIN stats s\n"
            f"  CROSS JOIN (SELECT sum(idf) * {boost} AS w FROM (VALUES {pos_vals}) p(term)\n"
            f"              JOIN idf_all USING (term)) i\n"
            f"  WHERE pf.pf > 0\n)"
        )

    ctes = [
        f"base AS (SELECT doc_id, {toks_expr} AS toks FROM {table})",
        "dl AS (SELECT doc_id, len(toks) AS dl FROM base)",
        "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl)",
        "tf AS (SELECT b.doc_id, t.term, count(*) AS tf"
        " FROM base b, unnest(b.toks) AS t(term) GROUP BY b.doc_id, t.term)",
        "df_all AS (SELECT term, count(*) AS df FROM tf GROUP BY term)",
        "idf_all AS (SELECT term, ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf"
        " FROM df_all CROSS JOIN stats s)",
    ]

    must_names: list[str] = []
    if terms["must"]:
        ctes.append(term_pass_cte(
            "must_t",
            f"SELECT * FROM (VALUES {weights_values(terms['must'])}) v(term, w)",
            require_all=len(terms["must"]),
        ))
        must_names.append("must_t")
    for i, (occ, qt, slop, boost) in enumerate(phrases):
        if occ == "must":
            ctes.append(phrase_cte(f"mph{i}", qt, slop, boost))
            must_names.append(f"mph{i}")
    for i, (occ, kind, tok, edits, boost) in enumerate(expansions):
        if occ == "must":
            ctes.append(term_pass_cte(
                f"mex{i}", expansion_select(kind, tok, edits, boost),
                require_all=None))
            must_names.append(f"mex{i}")

    should_names: list[str] = []
    sh_parts: list[str] = []
    if terms["should"]:
        sh_parts.append(
            f"SELECT * FROM (VALUES {weights_values(terms['should'])}) v(term, w)"
        )
    for occ, kind, tok, edits, boost in expansions:
        if occ == "should":
            # subquery wrap: a bare ORDER BY/LIMIT inside a UNION ALL
            # branch would bind to the whole union in DuckDB
            sh_parts.append(
                f"SELECT term, w FROM ({expansion_select(kind, tok, edits, boost)}) e"
            )
    if sh_parts:
        union = "\n    UNION ALL\n    ".join(sh_parts)
        ctes.append(
            "shq AS (SELECT term, sum(w) AS w FROM (\n    "
            + union
            + "\n  ) u GROUP BY term)"
        )
        ctes.append(term_pass_cte("sh_t", "SELECT * FROM shq", require_all=None))
        should_names.append("sh_t")
    for i, (occ, qt, slop, boost) in enumerate(phrases):
        if occ == "should":
            ctes.append(phrase_cte(f"shph{i}", qt, slop, boost))
            should_names.append(f"shph{i}")

    not_parts: list[str] = []
    if terms["not"]:
        vals = ", ".join(f"('{_sq(t)}')" for t in sorted(terms["not"]))
        not_parts.append(
            f"SELECT DISTINCT tf.doc_id FROM tf JOIN (VALUES {vals}) nq(term) USING (term)"
        )
    for occ, qt, slop, _boost in phrases:
        if occ == "not":
            m = len(qt)
            cond = _phrase_pf_cond(qt, slop)
            not_parts.append(
                f"SELECT doc_id FROM base WHERE len(toks) >= {m} AND "
                f"len(list_filter(range(1, len(toks) - {m} + 2), i -> {cond})) > 0"
            )
    for occ, kind, tok, edits, _boost in expansions:
        if occ == "not":
            not_parts.append(
                f"SELECT DISTINCT tf.doc_id FROM tf JOIN ({expansion_select(kind, tok, edits)}) nq USING (term)"
            )
    not_pred = ""
    if not_parts:
        ctes.append("notm AS (" + " UNION ".join(not_parts) + ")")
        not_pred = "AND doc_id NOT IN (SELECT doc_id FROM notm)"

    # combined score
    if must_names:
        joins = must_names[0] + " t0"
        score_sum = "t0.score"
        for j, nm in enumerate(must_names[1:], 1):
            joins += f" JOIN {nm} t{j} USING (doc_id)"
            score_sum += f" + t{j}.score"
        if should_names:
            sh_union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in should_names)
            ctes.append(
                f"sh_sum AS (SELECT doc_id, sum(score) AS score FROM ({sh_union}) u GROUP BY doc_id)"
            )
            ctes.append(
                f"combined AS (SELECT t0.doc_id, {score_sum} + coalesce(ss.score, 0.0) AS score\n"
                f"  FROM {joins} LEFT JOIN sh_sum ss USING (doc_id))"
            )
        else:
            ctes.append(
                f"combined AS (SELECT t0.doc_id, {score_sum} AS score FROM {joins})"
            )
    else:
        if not should_names:
            raise ValueError("query needs at least one positive clause")
        sh_union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in should_names)
        ctes.append(
            f"combined AS (SELECT doc_id, sum(score) AS score FROM ({sh_union}) u GROUP BY doc_id)"
        )

    fq_pred = ""
    if pq.filters:
        def cond_sql(col: str, v) -> str:
            ref = "dlt.dl" if col == "dl" else f"doc.{col}"
            if isinstance(v, tuple):
                if v[0] == "neq":
                    return f"{ref} <> {_sql_lit(v[1])}"
                if v[0] == "range":
                    return f"{ref} BETWEEN {_sql_lit(v[1])} AND {_sql_lit(v[2])}"
                if v[0] == "all":
                    return "(" + " AND ".join(cond_sql(col, s) for s in v[1]) + ")"
                raise ValueError(f"unknown fq op {v[0]!r}")
            return f"{ref} = {_sql_lit(v)}"

        conds = " AND ".join(cond_sql(c, v) for c, v in sorted(pq.filters.items()))
        fq_pred = (
            f"AND doc_id IN (SELECT doc.doc_id FROM {table} doc "
            f"JOIN dl dlt ON doc.doc_id = dlt.doc_id WHERE {conds})"
        )

    ctes.append(
        "ranked AS (SELECT doc_id, score,\n"
        "  row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank\n"
        f"  FROM combined WHERE TRUE {not_pred} {fq_pred})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT rank::int AS rank, doc_id, round(score, 6) AS score"
        + f"\nFROM ranked WHERE rank <= {k}"
    )


# ------------------------------------------------------------- paging


def page_sql(
    query: str,
    rows: int = 10,
    mode: str = "or",
    sort=None,
    start: int = 0,
    cursor: tuple | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_sub: str | None = None,
) -> str:
    """Oracle twin of ``query.paging.page`` (Solr sort + start/rows and
    cursorMark keyset paging) for or/and term queries: score the full
    match set, order by the sort spec — ``score`` compares on
    ``round(score, 6)``, metadata fields (``dl`` from the token-length
    CTE, others from the documents view) compare natively, ``doc_id``
    asc is the implicit final tiebreak — then slice ``(start,
    start+rows]`` or apply the lexicographic keyset predicate and take
    the first ``rows``. rank is the 1-based position WITHIN the page."""
    terms = query_terms(query, analyzer)
    toks = analyzer_tokens_sql(text_col, analyzer)
    spec = [(f, d.lower()) for f, d in (sort or (("score", "desc"),))]
    if "doc_id" not in [f for f, _ in spec]:
        spec.append(("doc_id", "asc"))

    def key_sql(f: str) -> str:
        if f == "score":
            return "round(m.score, 6)"
        return f"m.{f}"

    order = ", ".join(f"{key_sql(f)} {d.upper()}" for f, d in spec)
    cursor_pred = ""
    if cursor is not None:
        if start:
            raise ValueError("start and cursor are mutually exclusive")
        if len(cursor) != len(spec):
            raise ValueError("cursor arity != sort arity (incl. doc_id tiebreak)")
        ors = []
        for i, (f, d) in enumerate(spec):
            op = "<" if d == "desc" else ">"
            parts = [
                f"{key_sql(spec[j][0])} = {_sql_lit(cursor[j])}" for j in range(i)
            ]
            parts.append(f"{key_sql(f)} {op} {_sql_lit(cursor[i])}")
            ors.append("(" + " AND ".join(parts) + ")")
        cursor_pred = "AND (" + " OR ".join(ors) + ")"

    meta_cols = sorted({f for f, _ in spec if f not in ("score", "doc_id", "dl")})
    meta_sel = "".join(f", doc.{_doc_col(c)} AS {c}" for c in meta_cols)
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    fq_pred = f"AND m.doc_id IN ({fq_sub})" if fq_sub else ""
    if cursor is not None:
        slice_pred, rank_expr, lim = f"gr <= {rows}", "gr", rows
    else:
        slice_pred, rank_expr, lim = (
            f"gr > {start} AND gr <= {start + rows}",
            f"gr - {start}",
            start + rows,
        )
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
),
q(term) AS (VALUES {_values(sorted(set(terms)))}),
qtf AS (SELECT tf.* FROM tf JOIN q USING (term)),
dfreq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT qtf.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * qtf.tf * ({k1} + 1.0)
              / (qtf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM qtf
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qtf.doc_id
  {having}
),
m AS (
  SELECT s.doc_id, s.score, dlt.dl{meta_sel}
  FROM scored s JOIN dl dlt ON s.doc_id = dlt.doc_id
  JOIN {table} doc ON s.doc_id = doc.doc_id
),
pg AS (
  SELECT m.doc_id, m.score,
         row_number() OVER (ORDER BY {order}) AS gr
  FROM m WHERE TRUE {cursor_pred} {fq_pred}
)
SELECT ({rank_expr})::int AS rank, doc_id, round(score, 6) AS score
FROM pg WHERE {slice_pred} ORDER BY gr
""".strip()


# ------------------------------------------------- range facets / stats


def _doc_col(field: str) -> str:
    """Engine metadata field → driver documents-view column (the engine
    names ``source`` as ``repo`` and synthesizes ``path`` —
    corpus.from_driver_documents)."""
    return {"repo": "source"}.get(field, field)


def _num_field_cte(field: str, table: str, text_col: str) -> tuple[str, str]:
    """(CTE prelude, value-relation) for a numeric field: ``dl`` is the
    analyzed token length (the engine reads it off doclen), anything
    else is a raw document column."""
    if field == "dl":
        toks = duckdb_tokens_sql(text_col)
        return (
            f"vals AS (SELECT doc_id, len({toks})::bigint AS v FROM {table})",
            "vals",
        )
    return f"vals AS (SELECT doc_id, {field} AS v FROM {table})", "vals"


def facet_range_sql(
    field: str,
    start,
    end,
    gap,
    mincount: int = 0,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """Oracle twin of ``facets.facet_range`` (Solr facet.range): every
    ``gap``-wide bucket over ``[start, end)`` with its count, zero-filled
    (mincount=0), values outside the window excluded."""
    import math as _m

    n = int(_m.ceil((end - start) / gap))
    cte, rel = _num_field_cte(field, table, text_col)
    having = f"WHERE count >= {mincount}" if mincount else ""
    return f"""
WITH {cte},
buckets AS (
  SELECT ({start} + range * {gap})::bigint AS bucket_start FROM range({n})
),
counts AS (
  SELECT ({start} + floor((v - {start}) / {gap}) * {gap})::bigint AS bucket_start,
         count(*) AS cnt
  FROM {rel} WHERE v IS NOT NULL AND v >= {start} AND v < {end}
  GROUP BY 1
)
SELECT bucket_start, coalesce(cnt, 0)::bigint AS count
FROM buckets LEFT JOIN counts USING (bucket_start)
{having}
ORDER BY bucket_start
""".strip()


def field_stats_sql(
    field: str, table: str = "documents", text_col: str = "text"
) -> str:
    """Oracle twin of ``facets.field_stats`` (Solr stats component)."""
    cte, rel = _num_field_cte(field, table, text_col)
    return f"""
WITH {cte}
SELECT count(v)::bigint AS count,
       sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::bigint AS missing,
       min(v) AS min, max(v) AS max,
       sum(v)::bigint AS sum, avg(v)::double AS mean
FROM {rel}
""".strip()


# ------------------------------------------------------------ grouping


def group_topk_sql(
    query: str,
    group_field: str,
    k_groups: int = 10,
    docs_per_group: int = 3,
    mode: str = "or",
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_sub: str | None = None,
) -> str:
    """Oracle twin of ``query.grouping.group_topk`` (Solr group.field):
    docs rank within their group on (round(score,6) desc, doc_id asc),
    groups rank by their best doc's (score, doc_id), both levels capped;
    NULL group values form their own group (IS NOT DISTINCT FROM join)."""
    terms = query_terms(query, analyzer)
    toks = analyzer_tokens_sql(text_col, analyzer)
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    fq_pred = f"AND s.doc_id IN ({fq_sub})" if fq_sub else ""
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
),
q(term) AS (VALUES {_values(sorted(set(terms)))}),
qtf AS (SELECT tf.* FROM tf JOIN q USING (term)),
dfreq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT qtf.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * qtf.tf * ({k1} + 1.0)
              / (qtf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM qtf
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qtf.doc_id
  {having}
),
g AS (
  SELECT s.doc_id, s.score, doc.{_doc_col(group_field)}::varchar AS grp
  FROM scored s JOIN {table} doc ON s.doc_id = doc.doc_id
  WHERE TRUE {fq_pred}
),
ranked AS (
  SELECT doc_id, score, grp,
         row_number() OVER (PARTITION BY grp
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM g
),
kept AS (SELECT * FROM ranked WHERE rank <= {docs_per_group}),
heads AS (
  SELECT grp, round(score, 6) AS g_score, doc_id AS g_doc
  FROM kept WHERE rank = 1
),
topg AS (
  SELECT grp, g_score, g_doc FROM heads
  ORDER BY g_score DESC, g_doc ASC LIMIT {k_groups}
),
topg_r AS (
  SELECT grp, row_number() OVER (ORDER BY g_score DESC, g_doc ASC) AS grp_rank
  FROM topg
)
SELECT t.grp_rank::int AS grp_rank, k.grp, k.rank::int AS rank,
       k.doc_id, round(k.score, 6) AS score
FROM kept k JOIN topg_r t ON k.grp IS NOT DISTINCT FROM t.grp
ORDER BY grp_rank, rank
""".strip()


# ---------------------------------------------------- suggest / spellcheck


def suggest_sql(
    prefix: str,
    count: int = 10,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``query.suggest.suggest`` (Solr TermsComponent):
    dictionary terms extending the analyzed prefix by (df desc, term
    asc), df = distinct-doc frequency."""
    toks_py = analyzer_tokenize_py(prefix, analyzer)
    pre = _sq(toks_py[0]) if toks_py else ""
    toks = analyzer_tokens_sql(text_col, analyzer)
    return f"""
WITH toksd AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM {table}
),
df_all AS (SELECT term, count(*) AS df FROM toksd GROUP BY term)
SELECT term, df::bigint AS df FROM df_all
WHERE substr(term, 1, {len(pre)}) = '{pre}'
ORDER BY df DESC, term ASC LIMIT {count}
""".strip()


def spellcheck_sql(
    term: str,
    count: int = 5,
    max_edits: int = 2,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``query.suggest.spellcheck``: corrections within
    ``max_edits`` classic Levenshtein (identity excluded), shared first
    character, by (df desc, term asc)."""
    toks_py = analyzer_tokenize_py(term, analyzer)
    t = _sq(toks_py[0]) if toks_py else ""
    n = len(t)
    toks = analyzer_tokens_sql(text_col, analyzer)
    return f"""
WITH toksd AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM {table}
),
df_all AS (SELECT term, count(*) AS df FROM toksd GROUP BY term)
SELECT term, df::bigint AS df,
       levenshtein(term, '{t}')::int AS ed
FROM df_all
WHERE substr(term, 1, 1) = '{_sq(t[:1])}'
  AND length(term) BETWEEN {n - max_edits} AND {n + max_edits}
  AND term <> '{t}'
  AND levenshtein(term, '{t}') <= {max_edits}
ORDER BY df DESC, term ASC LIMIT {count}
""".strip()


def query_facet_counts_sql(
    query: str,
    field: str,
    limit: int = 5,
    mode: str = "or",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
    fq_sub: str | None = None,
) -> str:
    """Oracle twin of ``facets.query_facet_counts``: facet counts over
    the docs matching the query (Solr facet-on-results semantics)."""
    terms = query_terms(query, analyzer)
    toks = analyzer_tokens_sql(text_col, analyzer)
    having = f"HAVING count(DISTINCT term) = {len(set(terms))}" if mode == "and" else ""
    fq_pred = f"AND m.doc_id IN ({fq_sub})" if fq_sub else ""
    col = _doc_col(field)
    return f"""
WITH base AS (SELECT doc_id, {toks} AS toks FROM {table}),
toksd AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES {_values(sorted(set(terms)))}),
matched AS (
  SELECT doc_id FROM toksd JOIN q USING (term)
  GROUP BY doc_id {having}
)
SELECT doc.{col} AS value, count(*)::bigint AS count
FROM matched m JOIN {table} doc ON m.doc_id = doc.doc_id
WHERE doc.{col} IS NOT NULL {fq_pred}
GROUP BY doc.{col}
ORDER BY count DESC, value ASC LIMIT {limit}
""".strip()


def facet_stats_sql(
    by: str,
    stat_field: str,
    limit: int = 10,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """Oracle twin of ``facets.facet_stats`` (JSON Facet nested aggs).
    ``stat_field='dl'`` resolves to the analyzed token length."""
    by_col = _doc_col(by)
    if stat_field == "dl":
        toks = duckdb_tokens_sql(text_col)
        v = f"len({toks})::bigint"
    else:
        v = _doc_col(stat_field)
    return f"""
SELECT {by_col} AS value, count(*)::bigint AS count,
       min({v}) AS min, max({v}) AS max,
       sum({v})::bigint AS sum, avg({v})::double AS mean
FROM {table}
WHERE {by_col} IS NOT NULL
GROUP BY {by_col}
ORDER BY count DESC, value ASC LIMIT {limit}
""".strip()


def facet_pivot_sql(
    parent: str,
    child: str,
    limit: int = 5,
    sublimit: int = 3,
    table: str = "documents",
) -> str:
    """Oracle twin of ``facets.facet_pivot`` (Solr facet.pivot)."""
    pcol, ccol = _doc_col(parent), _doc_col(child)
    return f"""
WITH pc AS (
  SELECT {pcol} AS parent, count(*)::bigint AS parent_count
  FROM {table} WHERE {pcol} IS NOT NULL
  GROUP BY 1 ORDER BY parent_count DESC, parent ASC LIMIT {limit}
),
cc AS (
  SELECT d.{pcol} AS parent, d.{ccol} AS child, count(*)::bigint AS child_count
  FROM {table} d JOIN pc ON d.{pcol} = pc.parent
  WHERE d.{ccol} IS NOT NULL
  GROUP BY 1, 2
),
rk AS (
  SELECT parent, child, child_count,
         row_number() OVER (
           PARTITION BY parent ORDER BY child_count DESC, child ASC
         ) AS rk
  FROM cc
)
SELECT rk.parent, pc.parent_count, rk.child, rk.child_count
FROM rk JOIN pc USING (parent)
WHERE rk.rk <= {sublimit}
ORDER BY parent_count DESC, parent ASC, child_count DESC, child ASC
""".strip()


def facet_query_sql(
    query: str,
    named: dict[str, str],
    mode: str = "or",
    sub_mode: str = "or",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``facets.facet_query`` (Solr facet.query): per
    named sub-query, count of docs matching both the main query and the
    sub-query."""
    toks = analyzer_tokens_sql(text_col, analyzer)

    def match_cte(name: str, q: str, m: str) -> str:
        terms = sorted(set(query_terms(q, analyzer)))
        if not terms:  # stopword-only / empty query: matches nothing
            return f"{name} AS (SELECT doc_id FROM toksd WHERE FALSE)"
        having = (
            f"HAVING count(DISTINCT term) = {len(terms)}" if m == "and" else ""
        )
        in_list = ", ".join(f"'{_sq(t)}'" for t in terms)
        return (
            f"{name} AS (SELECT doc_id FROM toksd "
            f"WHERE term IN ({in_list}) "
            f"GROUP BY doc_id {having})"
        )

    ctes = [
        f"base AS (SELECT doc_id, {toks} AS toks FROM {table})",
        "toksd AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM base)",
        match_cte("main_m", query, mode),
    ]
    selects = []
    for i, name in enumerate(sorted(named)):
        ctes.append(match_cte(f"sub_{i}", named[name], sub_mode))
        selects.append(
            f"SELECT '{_sq(name)}' AS name, "
            f"(SELECT count(*) FROM main_m "
            f"WHERE doc_id IN (SELECT doc_id FROM sub_{i}))::bigint AS count"
        )
    body = "\nUNION ALL\n".join(selects)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT name, count FROM ({body})\n"
        "ORDER BY name ASC"
    ).strip()


_BOOST_FN_SQL = {
    "log1p": lambda v: f"ln(1.0 + {v})",
    "linear": lambda v: f"({v})::double",
}


def _scored_cte(
    query: str,
    mode: str,
    analyzer: str,
    prefix: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> tuple[str, str]:
    """(CTE text, scored-relation name) for a plain BM25 term query —
    assumes base/dl/stats/tf CTEs already exist in the statement."""
    terms = query_terms(query, analyzer)
    having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    cte = f"""
{prefix}_q(term) AS (VALUES {_values(terms)}),
{prefix}_qtf AS (SELECT tf.* FROM tf JOIN {prefix}_q USING (term)),
{prefix}_dfreq AS (SELECT term, count(*) AS df FROM {prefix}_qtf GROUP BY term),
{prefix}_scored AS (
  SELECT qtf.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * qtf.tf * ({k1} + 1.0)
              / (qtf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM {prefix}_qtf qtf
  JOIN {prefix}_dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qtf.doc_id
  {having}
)""".strip()
    return cte, f"{prefix}_scored"


_SHARED_TF_CTES = """
base AS (SELECT doc_id, {toks} AS toks FROM {table}),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
)""".strip()


def boost_topk_sql(
    query: str,
    boost_field: str = "dl",
    k: int = 10,
    weight: float = 1.0,
    fn: str = "log1p",
    mode: str = "or",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``rescore.boost_topk`` (Solr bf boost function).
    ``boost_field='dl'`` resolves to the analyzed token length."""
    toks = analyzer_tokens_sql(text_col, analyzer)
    shared = _SHARED_TF_CTES.format(toks=toks, table=table)
    scored_cte, scored = _scored_cte(query, mode, analyzer, "m")
    if boost_field == "dl":
        bval = "dl.dl"
        bjoin = "JOIN dl USING (doc_id)"
    else:
        bval = f"doc.{_doc_col(boost_field)}"
        bjoin = f"JOIN {table} doc USING (doc_id)"
    bexpr = _BOOST_FN_SQL[fn](bval)
    return f"""
WITH {shared},
{scored_cte},
boosted AS (
  SELECT s.doc_id, s.score + {weight} * {bexpr} AS score
  FROM {scored} s {bjoin}
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM boosted
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def rerank_topk_sql(
    query: str,
    rerank_query: str,
    k: int = 10,
    rerank_docs: int = 50,
    weight: float = 2.0,
    mode: str = "or",
    rerank_mode: str = "or",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``rescore.rerank_topk`` (Solr ReRankQParser)."""
    toks = analyzer_tokens_sql(text_col, analyzer)
    shared = _SHARED_TF_CTES.format(toks=toks, table=table)
    m_cte, m_scored = _scored_cte(query, mode, analyzer, "m")
    r_cte, r_scored = _scored_cte(rerank_query, rerank_mode, analyzer, "r")
    return f"""
WITH {shared},
{m_cte},
{r_cte},
win AS (
  SELECT doc_id, score AS base_score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS brank
  FROM {m_scored}
),
finals AS (
  SELECT w.doc_id,
         w.base_score + {weight} * coalesce(r.score, 0.0) AS score
  FROM win w LEFT JOIN {r_scored} r USING (doc_id)
  WHERE w.brank <= {rerank_docs}
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM finals
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def synonym_topk_sql(
    groups: list,
    k: int = 10,
    mode: str = "or",
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``synonyms.synonym_topk`` (Lucene SynonymQuery):
    per group, tf = sum of member tfs (merged BEFORE saturation),
    df = max member docFreq; groups combine as score-sum (OR) or
    all-groups-hit (AND)."""
    norm: list[list[str]] = []
    for g in groups:
        members = [g] if isinstance(g, str) else list(g)
        toks: list[str] = []
        for m in members:
            ts = analyzer_tokenize_py(m, analyzer)
            if ts and ts[0] not in toks:
                toks.append(ts[0])
        if toks:
            norm.append(toks)
    toks_expr = analyzer_tokens_sql(text_col, analyzer)
    syn_vals = ", ".join(
        f"('{_sq(t)}', {gi})" for gi, g in enumerate(norm) for t in g
    )
    having = f"HAVING count(*) = {len(norm)}" if mode == "and" else ""
    return f"""
WITH base AS (SELECT doc_id, {toks_expr} AS toks FROM {table}),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT b.doc_id, t.term, count(*) AS tf
  FROM base b, unnest(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term
),
syn(term, grp) AS (VALUES {syn_vals}),
gtf AS (
  SELECT tf.doc_id, s.grp, sum(tf.tf) AS tf
  FROM tf JOIN syn s USING (term)
  GROUP BY tf.doc_id, s.grp
),
gdf AS (
  SELECT s.grp, max(d.df) AS df
  FROM (SELECT term, count(*) AS df FROM tf
        JOIN syn USING (term) GROUP BY term) d
  JOIN syn s USING (term)
  GROUP BY s.grp
),
scored AS (
  SELECT g.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * g.tf * ({k1} + 1.0)
              / (g.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
  FROM gtf g
  JOIN gdf d USING (grp)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY g.doc_id
  {having}
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT rank::int AS rank, doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def topk_fields_sql(
    query: str,
    fields: list[str],
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "code",
) -> str:
    """Oracle twin of ``bm25.topk_fields`` (Solr fl): the plain BM25
    top-k joined to the documents view for the requested stored
    columns. Engine metadata names map through ``_doc_col``."""
    inner = bm25_topk_sql(
        query, k=k, mode=mode, table=table, text_col=text_col, analyzer=analyzer
    )
    cols = ", ".join(
        f"d.{_doc_col(f)} AS {f}" for f in fields
    )
    return (
        f"SELECT t.rank, t.doc_id, t.score, {cols}\n"
        f"FROM ({inner}) t JOIN {table} d USING (doc_id)\n"
        f"ORDER BY t.rank"
    )
