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


def test_prune_actually_prunes(spark):
    """With real tf spread (one doc repeats the query term 40x) the k=1
    threshold exceeds every other block's bound — those blocks must be
    dropped. (For stop-word queries with flat tf the avgdl-independent
    bounds are tightly clustered and lossless pruning legitimately keeps
    everything — same regime as classic WAND.)"""
    import math

    from pyspark.sql import functions as F

    from oni_indexer_spark.index import IndexConfig, build_index
    from oni_indexer_spark.query.bm25 import Searcher, _blockmax_prune, _buckets_for

    rows = []
    for i in range(256):
        body = " ".join(f"tok{j}_{i}" for j in range(30)) + " needle"
        if i == 7:
            body += " needle" * 40
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    t = build_index(df, IndexConfig(block_size=16, n_buckets=4))
    t.postings.cache().count()
    t.dfreq.cache().count()
    s = Searcher(t)
    n_docs, avgdl = s.stats()
    dfs = s.term_dfs(["needle"])
    idf = {k: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for k, d in dfs.items()}
    buckets = _buckets_for(t, ["needle"])
    from oni_indexer_spark.hashing import xxhash64_str

    tid = xxhash64_str("needle")
    idf = {tid: idf["needle"]}
    p = t.postings.where(F.col("bucket").isin(buckets) & (F.col("tid") == tid))
    total = p.count()
    pruned_p, tau = _blockmax_prune(p, t, idf, avgdl, 1)
    assert tau is not None  # a threshold was established
    pruned = pruned_p.count()
    assert pruned < total
    # and the pruned result is still exact
    from oni_indexer_spark.query import topk

    a = [(r["rank"], r["doc_id"]) for r in topk(t, "needle", k=1, prune=True).collect()]
    assert a == [(1, 7)]


def test_pruned_plan_has_no_unpartitioned_window(spark):
    """Scale guard (VERDICT r1 #6): the pruned plan must not funnel block
    bounds through a global Window — τ selection is TakeOrdered + a
    broadcast scalar."""
    rows = [(i, f"needle tok_{i} tok_{i+1} filler_{i % 7}") for i in range(128)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    t = build_index(df, IndexConfig(block_size=16, n_buckets=4))
    plan = (
        topk(t, "needle", k=3, prune=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # _ranked's final row_number over an already-limited k-row frame is
    # fine; the prune path itself must contribute no Window at all — so
    # the whole plan carries at most that single one.
    assert plan.count("Window") <= 1
    assert "TakeOrderedAndProject" in plan
