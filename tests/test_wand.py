"""Block-max pruning must be LOSSLESS: pruned top-k == exhaustive top-k
(FIXTURES.md §4 invariant; north_star's block-max WAND)."""

import pytest

from oni_indexer_spark.index import IndexConfig, build_index
from oni_indexer_spark.query import topk

QUERIES = [
    ("the", 5),
    ("the", 10),
    ("scan join", 10),
    ("hash window merge", 3),
    ("spark", 1),
    ("the scan join hash", 100),
]


@pytest.fixture(scope="module")
def tables(docs):
    t = build_index(docs, IndexConfig(block_size=32, n_buckets=8))
    t.postings.cache().count()
    t.dfreq.cache().count()
    return t


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in df.collect()]


@pytest.mark.parametrize("query,k", QUERIES)
def test_pruned_equals_exhaustive(tables, query, k):
    assert _rows(topk(tables, query, k=k, prune=True)) == _rows(
        topk(tables, query, k=k, prune=False)
    )


def test_prune_actually_prunes(tables, docs):
    """For k=1 the threshold is the global max score, so every block whose
    bound falls below it must be dropped. (For stop-word queries at larger
    k the bounds are tightly clustered and lossless pruning legitimately
    keeps everything — same as classic WAND.)"""
    import math

    from pyspark.sql import functions as F

    from oni_indexer_spark.query.bm25 import Searcher, _blockmax_prune, _buckets_for

    terms = ["the"]
    s = Searcher(tables)
    n_docs, avgdl = s.stats()
    dfs = s.term_dfs(terms)
    idf = {t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for t, d in dfs.items()}
    buckets = _buckets_for(tables, terms)
    p = tables.postings.where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
    total = p.count()
    pruned = _blockmax_prune(p, tables, idf, avgdl, 1).count()
    assert pruned < total
