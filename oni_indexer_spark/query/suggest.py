"""Solr TermsComponent / Suggester + SpellCheckComponent over the term
dictionary.

The reference's portal autocompletes and spell-corrects against Solr
(both components read the Lucene term dictionary; the suggester's
default ``DocumentDictionaryFactory`` weights by frequency). Here the
dictionary IS the dfreq table — vocabulary-sized, orders of magnitude
smaller than postings — so both components are one pushed-down
dictionary scan:

- ``suggest``: terms.prefix semantics — dictionary terms starting with
  the (analyzed) prefix, ordered by ``(df desc, term asc)``, top N.
  The StartsWith predicate pushes to the parquet reader and dfreq files
  are term-sorted within buckets, so rowgroup min/max stats prune.
- ``spellcheck``: SpellCheckComponent semantics — corrections within
  ``max_edits`` classic Levenshtein (Spark/DuckDB-twin metric, see
  ``expand_fuzzy``) sharing the first character, EXCLUDING the input
  term itself (a correctly-spelled word suggests alternatives, Solr's
  ``spellcheck.onlyMorePopular=false`` still drops the identity row),
  ordered by ``(df desc, term asc)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_indexer_spark.index.build import IndexTables


def suggest(tables: IndexTables, prefix: str, count: int = 10) -> DataFrame:
    """Autocomplete: ``(term, df)`` for dictionary terms extending the
    prefix, weighted by document frequency."""
    from oni_indexer_spark.analyzer import analyzer_tokenize_py

    toks = analyzer_tokenize_py(prefix, tables.cfg.analyzer)
    if not toks:
        from oni_indexer_spark.query.bm25 import _empty_literal

        return _empty_literal(tables.dfreq.sparkSession, "term string, df long")
    return (
        tables.dfreq.where(F.col("term").startswith(toks[0]))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))  # sum over appended segments
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(count)
    )


def spellcheck(
    tables: IndexTables,
    term: str,
    count: int = 5,
    max_edits: int = 2,
) -> DataFrame:
    """Spelling corrections: ``(term, df, ed)`` within ``max_edits``
    classic Levenshtein edits (identity excluded), by (df desc, term
    asc). The dictionary scan is bounded by the shared-first-character
    and ±max_edits length-band predicates before levenshtein runs."""
    from oni_indexer_spark.analyzer import analyzer_tokenize_py

    toks = analyzer_tokenize_py(term, tables.cfg.analyzer)
    if not toks:
        from oni_indexer_spark.query.bm25 import _empty_literal

        return _empty_literal(
            tables.dfreq.sparkSession, "term string, df long, ed int"
        )
    q = toks[0]
    n = len(q)
    cand = tables.dfreq.where(
        F.col("term").startswith(q[:1])
        & F.length("term").between(n - max_edits, n + max_edits)
        & (F.col("term") != q)
        & (F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
    )
    return (
        cand.groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .withColumn("ed", F.levenshtein(F.col("term"), F.lit(q)).cast("int"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(count)
    )
