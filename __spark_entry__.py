"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (BM25 top-k through the
full materialized-index path) on sf0.001. ``queries()`` exposes one entry
per implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL over the pre-registered parquet views. Column names
and types are aligned on both sides so the driver's order-insensitive
value-hash compare is exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_indexer_spark import oracle
from oni_indexer_spark.corpus import from_driver_documents
from oni_indexer_spark.index import IndexConfig, IndexTables, build_index
from oni_indexer_spark.query import facet_counts, topk

_CFG = IndexConfig(block_size=64, n_buckets=8)
_DF_TERMS = ["the", "scan", "join", "hash", "merge", "window", "spark"]

# One in-memory index per sf_dir (the driver calls every query at the same
# sf; building once keeps the correctness run fast).
_INDEX_CACHE: dict[str, IndexTables] = {}


def _index(spark: SparkSession, sf_dir: str) -> IndexTables:
    from oni_indexer_spark.session import ship_package

    ship_package(spark)  # driver-owned sessions: make UDFs importable on workers
    t = _INDEX_CACHE.get(sf_dir)
    if t is None:
        docs = from_driver_documents(spark, sf_dir)
        t = build_index(docs, _CFG)
        t.postings.cache().count()
        t.dfreq.cache().count()
        t.doclen.cache().count()
        _INDEX_CACHE[sf_dir] = t
    return t


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return from_driver_documents(spark, sf_dir)


def _rounded(df: DataFrame) -> DataFrame:
    return df.select("rank", "doc_id", F.round("score", 6).alias("score"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 and answer a
    multi-term BM25 top-10 through postings decode + block-max pruning."""
    return _rounded(topk(_index(spark, "/root/testdata/sf0.001"), "hash join", k=10))


# ---------------------------------------------------------------- queries

def _q_bm25(query: str, k: int = 10, mode: str = "or", fq: dict | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _rounded(topk(_index(spark, sf_dir), query, k=k, mode=mode, fq=fq))

    return run


def _q_dfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _index(spark, sf_dir)
    return (
        t.dfreq.where(F.col("term").isin(_DF_TERMS))
        .select("term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf"))
    )


def _q_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _index(spark, sf_dir)
    return t.doclen.select("doc_id", F.col("dl").cast("long").alias("dl"), "content_sha256")


def _q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _index(spark, sf_dir)
    return t.stats.select("n_docs", F.round("avgdl", 6).alias("avgdl"))


def _q_facet_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return facet_counts(_docs(spark, sf_dir), "lang", limit=5).select(
        "value", F.col("count").cast("long").alias("count")
    )


def _q_facet_repo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return facet_counts(_docs(spark, sf_dir), "repo", limit=5).select(
        "value", F.col("count").cast("long").alias("count")
    )


def _q_id_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).where(F.col("doc_id") == 42).select(
        "doc_id", "repo", "lang", "content"
    )


def _q_copyfield(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C7: main_search copy-field — concat of searchable fields
    # (oni-indexer.js:272-288, schema.json:92-118).
    return _docs(spark, sf_dir).select(
        "doc_id", F.concat_ws(" ", "repo", "lang", "content").alias("main_search")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact dedup: keep min doc_id per identical content hash
    return (
        _docs(spark, sf_dir)
        .groupBy(F.sha2("content", 256).alias("content_sha256"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).cast("long").alias("n_copies"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_or_topk": _q_bm25("hash join", k=10),
        "bm25_hot_single": _q_bm25("the", k=10),
        "bm25_three_term": _q_bm25("window merge sort", k=10),
        "bm25_and": _q_bm25("hash join", k=10, mode="and"),
        "bm25_fq_lang": _q_bm25("hash", k=10, fq={"lang": "en"}),
        "bm25_zero_result": _q_bm25("zzz_not_in_corpus", k=10),
        "bm25_k100": _q_bm25("the scan", k=100),
        "term_dfreq": _q_dfreq,
        "doclen_sha256": _q_doclen,
        "corpus_stats": _q_stats,
        "facet_lang": _q_facet_lang,
        "facet_repo": _q_facet_repo,
        "id_lookup": _q_id_lookup,
        "copyfield_main_search": _q_copyfield,
        "dedup_exact": _q_dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_or_topk": oracle.bm25_topk_sql("hash join", k=10),
        "bm25_hot_single": oracle.bm25_topk_sql("the", k=10),
        "bm25_three_term": oracle.bm25_topk_sql("window merge sort", k=10),
        "bm25_and": oracle.bm25_topk_sql("hash join", k=10, mode="and"),
        "bm25_fq_lang": oracle.bm25_topk_sql("hash", k=10, fq_lang="en"),
        "bm25_zero_result": oracle.bm25_topk_sql("zzz_not_in_corpus", k=10),
        "bm25_k100": oracle.bm25_topk_sql("the scan", k=100),
        "term_dfreq": oracle.dfreq_sql(_DF_TERMS),
        "doclen_sha256": oracle.doclen_sql(),
        "corpus_stats": oracle.stats_sql(),
        "facet_lang": oracle.facet_sql("lang"),
        "facet_repo": oracle.facet_sql("source"),
        "id_lookup": (
            "SELECT doc_id, source AS repo, lang, text AS content "
            "FROM documents WHERE doc_id = 42"
        ),
        "copyfield_main_search": (
            "SELECT doc_id, concat_ws(' ', source, lang, text) AS main_search "
            "FROM documents"
        ),
        "dedup_exact": (
            "SELECT sha256(text) AS content_sha256, min(doc_id) AS keep_doc_id, "
            "count(*)::bigint AS n_copies FROM documents GROUP BY sha256(text)"
        ),
    }
