"""Lucene SynonymQuery semantics (query-time synonym groups) vs the
DuckDB oracle, plus the semantic invariants that distinguish a
SynonymQuery from a weighted OR."""

import duckdb
import pytest

from oni_indexer_spark.index import IndexConfig, build_index
from oni_indexer_spark.oracle import synonym_topk_sql
from oni_indexer_spark.query.synonyms import synonym_topk
from tests.conftest import SF_SMOKE

CFG = IndexConfig(block_size=64, n_buckets=8)


@pytest.fixture(scope="module")
def stab(docs):
    t = build_index(docs, CFG)
    t.postings.cache().count()
    t.doclen.cache().count()
    return t


def _oracle(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return [(r[0], r[1], round(r[2], 6)) for r in con.execute(sql).fetchall()]


def _rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.orderBy("rank").collect()
    ]


def _assert_match(got, exp):
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 1e-6


GROUPS = [["join", "merge"], "hash"]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_synonym_topk_matches_oracle(stab, mode):
    got = _rows(synonym_topk(stab, GROUPS, k=10, mode=mode))
    exp = _oracle(synonym_topk_sql(GROUPS, k=10, mode=mode))
    _assert_match(got, exp)
    assert len(got) == 10


def test_synonym_absent_member_and_group(stab):
    g = [["scan", "seek", "qqqabsent"], ["the"]]
    _assert_match(_rows(synonym_topk(stab, g, k=10)),
                  _oracle(synonym_topk_sql(g, k=10)))
    g2 = [["qqqabsent1", "qqqabsent2"], "hash"]
    _assert_match(_rows(synonym_topk(stab, g2, k=10)),
                  _oracle(synonym_topk_sql(g2, k=10)))
    assert synonym_topk(stab, g2, k=10, mode="and").count() == 0


def test_synonym_is_not_weighted_or(stab):
    # tf merges BEFORE saturation: a doc containing several group
    # members must score differently from a plain OR over the members
    from oni_indexer_spark.query.bm25 import topk

    syn = _rows(synonym_topk(stab, GROUPS, k=10))
    plain = _rows(topk(stab, "join merge hash", k=10))
    assert [(s[1]) for s in syn] != [(p[1]) for p in plain]


def test_synonym_singleton_groups_equal_plain_query(stab):
    # all-singleton groups: df_max == df, tf_sum == tf — must reduce to
    # the ordinary multi-term scorer exactly
    from oni_indexer_spark.query.bm25 import topk

    syn = _rows(synonym_topk(stab, ["hash", "join"], k=10))
    plain = _rows(topk(stab, "hash join", k=10))
    assert syn == plain


def test_synonym_rejects_overlapping_groups(stab):
    with pytest.raises(ValueError):
        synonym_topk(stab, [["join", "merge"], ["merge", "scan"]], k=5)
