"""Positional (v5) indexes + phrase queries: the engine's phrase top-k
must match the DuckDB oracle (exact token-sequence counting over the
corpus), the positional layout must round-trip through disk, and every
existing query mode and mutator must stay exact on a positional index.

This covers the part of Solr's query surface (quoted phrases over
``main_search``, ``portal_base.json:18-23``; Lucene text fields index
positions by default, ``schema.json:5,16``) that the v4 codec couldn't
serve — r4 VERDICT "What's missing" #2.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_indexer_spark.index import (
    IndexConfig,
    append_to_index,
    build_index,
    build_to_path,
    compact_index,
    overwrite_docs,
    read_index,
)
from oni_indexer_spark.oracle import bm25_phrase_topk_sql, bm25_topk_sql
from oni_indexer_spark.query import topk
from tests.conftest import SF_SMOKE

CFG = IndexConfig(block_size=64, n_buckets=8, positions=True)

PHRASES = [
    ("hash join", 10),
    ("the scan", 10),
    ("window merge sort", 10),
    ("the the", 10),           # duplicate term in the phrase
    ("join hash", 10),         # order matters: reverse of a common bigram
    ("hash zzz_not_in_corpus", 10),  # missing term -> empty
]


def _oracle_rows(sql):
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


@pytest.fixture(scope="module")
def ptables(docs):
    t = build_index(docs, CFG)
    t.postings.cache().count()
    t.dfreq.cache().count()
    return t


@pytest.mark.parametrize("query,k", PHRASES)
def test_phrase_matches_oracle(ptables, query, k):
    got = _rows(topk(ptables, query, k=k, mode="phrase"))
    exp = _oracle_rows(bm25_phrase_topk_sql(query, k=k))
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp], "rank/doc"
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 1e-6


@pytest.mark.parametrize("query,slop", [
    ("hash join", 1), ("hash join", 2), ("hash join", 5),
    ("join hash", 2),          # ordered: reverse stays a different query
    ("the the", 3),            # duplicate term with a gap budget
])
def test_sloppy_phrase_matches_oracle(ptables, query, slop):
    """Sloppy 2-term phrases (Solr ``"a b"~N``, ordered total-budget
    semantics) against the DuckDB windowed-containment oracle."""
    got = _rows(topk(ptables, query, k=10, mode="phrase", slop=slop))
    exp = _oracle_rows(bm25_phrase_topk_sql(query, k=10, slop=slop))
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp], "rank/doc"
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 1e-6


def test_sloppy_phrase_three_terms_brute_force(ptables, docs):
    """m>2 sloppy (no SQL oracle): greedy-chain engine vs an exact
    Python brute force over the collected corpus — the greedy minimal
    chain is optimal for the span criterion, so both enumerate the same
    anchors."""
    import math

    corpus = {
        r["doc_id"]: r["content"] for r in docs.select("doc_id", "content").collect()
    }
    from oni_indexer_spark.analyzer import tokenize_py

    toks = {d: tokenize_py(c) for d, c in corpus.items()}
    qt, slop, k1, b = ["hash", "join", "the"], 3, 1.2, 0.75
    n_docs = len(toks)
    dfs = {t: sum(1 for ts in toks.values() if t in ts) for t in set(qt)}
    idf_sum = sum(math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in qt)
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    exp = []
    for did, ts in toks.items():
        pf = 0
        for i, tok in enumerate(ts):
            if tok != qt[0]:
                continue
            prev, ok = i, True
            for j, tj in enumerate(qt[1:], 1):
                nxt = next(
                    (p for p in range(prev + 1, min(len(ts), i + j + slop + 1))
                     if ts[p] == tj),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                prev = nxt
            if ok:
                pf += 1
        if pf:
            dl = len(ts)
            s = idf_sum * (pf * (k1 + 1.0)) / (pf + k1 * (1 - b + b * dl / avgdl))
            exp.append((did, round(s, 6)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = [(r + 1, d, s) for r, (d, s) in enumerate(exp[:10])]
    got = _rows(topk(ptables, "hash join the", k=10, mode="phrase", slop=slop))
    assert got == exp


def test_slop_zero_equals_exact_and_slop_widens(ptables):
    """slop=0 through the API equals the exact matcher; growing slop
    only ever grows the match set (monotone relaxation)."""
    exact = _rows(topk(ptables, "hash join", k=1000, mode="phrase"))
    s0 = _rows(topk(ptables, "hash join", k=1000, mode="phrase", slop=0))
    assert exact == s0
    prev_docs = {d for _, d, _ in exact}
    for slop in (1, 2, 5):
        # k=1000 > corpus size: no top-k truncation, so the FULL match
        # sets must be monotone under the relaxation
        cur = {d for _, d, _ in _rows(
            topk(ptables, "hash join", k=1000, mode="phrase", slop=slop))}
        assert prev_docs <= cur
        prev_docs = cur


def test_slop_outside_phrase_mode_raises(ptables):
    with pytest.raises(ValueError, match="slop"):
        topk(ptables, "hash join", k=10, mode="or", slop=2)


def test_phrase_single_term_rewrites_to_term_query(ptables):
    got = _rows(topk(ptables, "merge", k=10, mode="phrase"))
    exp = _oracle_rows(bm25_topk_sql("merge", k=10))
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp]


def test_phrase_requires_positional_index(docs):
    t4 = build_index(docs, IndexConfig(block_size=64, n_buckets=8))
    with pytest.raises(ValueError, match="positional index"):
        topk(t4, "hash join", k=10, mode="phrase").collect()


def test_or_and_queries_exact_on_positional_index(ptables):
    """Positions must not perturb the non-phrase scoring paths (the
    decoders skip the positions region but share the blob layout)."""
    for query, k, mode in [
        ("the", 10, "or"),
        ("hash join", 10, "or"),
        ("hash join", 10, "and"),
        ("window merge sort", 10, "or"),
    ]:
        got = _rows(topk(ptables, query, k=k, mode=mode))
        exp = _oracle_rows(bm25_topk_sql(query, k=k, mode=mode))
        assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp], (query, mode)
        for g, e in zip(got, exp):
            assert abs(g[2] - e[2]) < 1e-6


def test_positional_disk_roundtrip_and_mutators(spark, docs, tmp_path):
    """v5 on disk: build_to_path -> read_index restores positions=True;
    phrase + OR queries stay exact through append, compaction and C11
    overwrite (the decode->re-encode paths must carry positions)."""
    p = str(tmp_path / "pidx")
    a = docs.where(F.col("doc_id") < 350)
    b = docs.where(F.col("doc_id") >= 350)
    build_to_path(a, p, CFG, bucket_group_size=8)
    t = read_index(spark, p)
    assert t.cfg.positions

    append_to_index(b, p)
    compact_index(p, spark)
    t = read_index(spark, p)
    for query in ["hash join", "the scan"]:
        got = _rows(topk(t, query, k=10, mode="phrase"))
        exp = _oracle_rows(bm25_phrase_topk_sql(query, k=10))
        assert got == exp, ("post-compact phrase", query)
    got = _rows(topk(t, "hash join", k=10))
    exp = _oracle_rows(bm25_topk_sql("hash join", k=10))
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp]

    # C11 overwrite on a positional index: marker phrase becomes findable
    changed = docs.where(F.col("doc_id") % 101 == 0).withColumn(
        "content", F.concat(F.col("content"), F.lit(" zz marker phrase"))
    )
    overwrite_docs(changed, p, batch_id="pov")
    t = read_index(spark, p)
    got = _rows(topk(t, "zz marker phrase", k=10, mode="phrase"))
    exp = _oracle_rows(
        bm25_phrase_topk_sql(
            "zz marker phrase",
            k=10,
            text_col=(
                "concat(text, CASE WHEN doc_id % 101 = 0"
                " THEN ' zz marker phrase' ELSE '' END)"
            ),
        )
    )
    assert got == exp
    assert len(got) > 0  # the phrase actually matches the changed docs


def test_phrase_with_fq_both_paths(spark, docs, ptables):
    """fq must compose with phrase queries exactly as with OR/AND
    (Solr: fq restricts results, stats untouched) — on BOTH the
    broadcast-pushdown path and the forced semi-join path."""
    from oni_indexer_spark.query.bm25 import searcher_for

    lang = docs.select("lang").first()["lang"]
    exp = _oracle_rows(bm25_phrase_topk_sql("hash join", k=10, fq_lang=lang))
    assert exp, "fixture lang must match some docs"

    s = searcher_for(ptables)
    got = _rows(s.topk("hash join", k=10, mode="phrase", fq={"lang": lang}))
    assert got == exp

    # force the unselective path: filter can't ship, selection off,
    # semi-join applies afterwards — same answer
    s._fq_cache.clear()
    old = s.fq_pushdown_max_docs
    s.fq_pushdown_max_docs = 0
    try:
        got2 = _rows(s.topk("hash join", k=10, mode="phrase", fq={"lang": lang}))
    finally:
        s.fq_pushdown_max_docs = old
        s._fq_cache.clear()
    assert got2 == exp

    # zero-match filter -> empty, not an error
    assert _rows(s.topk("hash join", k=10, mode="phrase", fq={"lang": "zz_none"})) == []

    # 1-term rewrite carries the fq
    got1 = _rows(s.topk("merge", k=10, mode="phrase", fq={"lang": lang}))
    exp1 = _oracle_rows(bm25_topk_sql("merge", k=10, fq_lang=lang))
    assert [(g[0], g[1]) for g in got1] == [(e[0], e[1]) for e in exp1]


def test_rare_term_block_prefilter_phrase(spark, docs):
    """The rarest-term block prefilter (lossless conjunctive pruning):
    with a selective term in the phrase, only blocks containing that
    term survive the scan — and the answer is still oracle-exact.
    block_size=8 makes the 500-doc corpus span ~62 blocks so the gate
    (min_df < n_blocks/2) actually opens for df('dup')≈25."""
    from oni_indexer_spark.query.bm25 import searcher_for

    cfg = IndexConfig(block_size=8, n_buckets=8, positions=True)
    t = build_index(docs, cfg)
    s = searcher_for(t)

    # the gate must be open for this corpus/config
    dfs = s.term_dfs(["window", "dup"])
    n_docs, _ = s.stats()
    assert dfs["dup"] < max(1, n_docs // cfg.block_size) // 2

    # the prefilter really prunes: hot-term blocks without 'dup' drop
    p_all = t.postings.where(F.col("tid").isNotNull())
    import oni_indexer_spark.query.bm25 as B

    pre = s._rare_block_prefilter(p_all, dfs, n_docs)
    blocks_all = p_all.select("block_id").distinct().count()
    blocks_kept = pre.select("block_id").distinct().count()
    assert blocks_kept < blocks_all

    # correctness: 'window window dup' appears in the corpus, so the
    # bigram 'window dup' has real matches through the prefiltered plan
    exp = _oracle_rows(bm25_phrase_topk_sql("window dup", k=10))
    got = _rows(topk(t, "window dup", k=10, mode="phrase"))
    assert got == exp
    assert len(got) > 0


def test_rare_term_block_prefilter_and_mode(spark, docs):
    """Same lossless prefilter on AND-mode queries (a conjunction can
    only match inside blocks holding every term)."""
    cfg = IndexConfig(block_size=8, n_buckets=8)
    t = build_index(docs, cfg)
    exp = _oracle_rows(bm25_topk_sql("dup scan", k=10, mode="and"))
    got = _rows(topk(t, "dup scan", k=10, mode="and"))
    assert got == exp
    assert len(got) > 0
