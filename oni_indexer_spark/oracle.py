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
) -> str:
    """Full BM25 top-k over the driver's ``documents`` view."""
    terms = query_terms(query, analyzer)
    toks = analyzer_tokens_sql(text_col, analyzer)
    # Solr fq semantics: the filter restricts the RESULT set only; idf /
    # avgdl / N stay corpus-global (SURVEY.md §2.C9).
    fq_pred = (
        f"AND doc_id IN (SELECT doc_id FROM {table} WHERE lang = '{fq_lang}')"
        if fq_lang
        else ""
    )
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
) -> str:
    """Phrase-query oracle (Lucene ``PhraseQuery`` semantics, mirrored by
    ``Searcher._phrase_topk``): phrase frequency = count of start
    positions where the full token sequence matches; score =
    ``(Σ_j idf(term_j)) · tfn(phraseFreq, dl)`` with idf summed over all
    query positions (duplicates counted per position)."""
    qtoks = analyzer_tokenize_py(query, analyzer)
    m = len(qtoks)
    toks = analyzer_tokens_sql(text_col, analyzer)
    cond = " AND ".join(
        f"toks[i+{j}] = '" + t.replace("'", "''") + "'" for j, t in enumerate(qtoks)
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
