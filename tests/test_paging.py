"""Solr-style paging (sort + start/rows, cursorMark keyset) vs the
DuckDB oracle, plus the paging invariants that make cursors usable:
walking pages by cursor reconstructs the full ordered result exactly,
and page N by cursor equals page N by offset.
"""

import duckdb
import pytest

from oni_indexer_spark.index import IndexConfig, build_index
from oni_indexer_spark.oracle import page_sql
from oni_indexer_spark.query import page
from tests.conftest import SF_SMOKE

CFG = IndexConfig(block_size=64, n_buckets=8)


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
def ptab(docs):
    t = build_index(docs, CFG)
    t.postings.cache().count()
    t.dfreq.cache().count()
    t.doclen.cache().count()
    return t


CASES = [
    dict(query="hash join", rows=10),
    dict(query="hash join", rows=10, start=10),
    dict(query="hash join", rows=7, start=33),
    dict(query="hash join", rows=10, sort=[("dl", "desc")]),
    dict(query="hash join", rows=10, sort=[("dl", "asc"), ("score", "desc")]),
    dict(query="hash join", rows=10, sort=[("lang", "asc"), ("dl", "desc")], start=5),
    dict(query="hash join", rows=10, mode="and", sort=[("dl", "desc")]),
    dict(query="hash join", rows=10, sort=[("dl", "desc")], cursor=(100, 50)),
    dict(query="merge", rows=10, cursor=(1.0, 0)),  # score-keyed cursor
]


@pytest.mark.parametrize("c", CASES)
def test_page_matches_oracle(ptab, c):
    assert _rows(page(ptab, **c)) == _oracle_rows(page_sql(**c))


def test_cursor_walk_reconstructs_full_ordering(ptab, docs):
    """Walk ALL pages by cursorMark (dl desc) and compare to the one-shot
    ordering — the continuity contract deep paging relies on."""
    dl_of = {r["doc_id"]: r["dl"] for r in ptab.doclen.select("doc_id", "dl").collect()}
    full = _rows(page(ptab, "hash join", rows=10_000, sort=[("dl", "desc")]))
    walked, cursor = [], None
    while True:
        p = _rows(page(ptab, "hash join", rows=37, sort=[("dl", "desc")], cursor=cursor))
        if not p:
            break
        walked.extend((d, s) for _, d, s in p)
        last_doc = p[-1][1]
        cursor = (dl_of[last_doc], last_doc)
    assert walked == [(d, s) for _, d, s in full]
    assert len(walked) > 37  # actually exercised multiple pages


def test_cursor_equals_offset_page(ptab):
    p1 = _rows(page(ptab, "hash join", rows=10))
    last = p1[-1]
    by_cursor = _rows(page(ptab, "hash join", rows=10, cursor=(last[2], last[1])))
    by_start = _rows(page(ptab, "hash join", rows=10, start=10))
    assert by_cursor == by_start


def test_page_rejects_bad_args(ptab):
    with pytest.raises(ValueError, match="mutually exclusive"):
        page(ptab, "hash", rows=5, start=5, cursor=(1.0, 0))
    with pytest.raises(ValueError, match="sort direction"):
        page(ptab, "hash", rows=5, sort=[("dl", "down")])
    with pytest.raises(ValueError, match="cursor has"):
        page(ptab, "hash", rows=5, cursor=(1.0,)).collect()


def test_page_with_fq(ptab):
    got = _rows(page(ptab, "hash join", rows=10, sort=[("dl", "desc")],
                     fq={"lang": "en"}))
    exp = _oracle_rows(page_sql(
        "hash join", rows=10, sort=[("dl", "desc")],
        fq_sub="SELECT doc_id FROM documents WHERE lang = 'en'",
    ))
    assert got == exp


def test_phrase_mode_paging(ptab, docs):
    """Phrase paging (no SQL twin here — phrase page vs the ranked
    phrase query re-sorted in Python over the full match set)."""
    t = build_index(docs, IndexConfig(block_size=64, n_buckets=8, positions=True))
    from oni_indexer_spark.query import topk

    full = [
        (r["doc_id"], round(r["score"], 6))
        for r in topk(t, "hash join", k=10_000, mode="phrase").collect()
    ]
    dl_of = {r["doc_id"]: r["dl"] for r in t.doclen.select("doc_id", "dl").collect()}
    exp = sorted(full, key=lambda x: (-dl_of[x[0]], x[0]))[:10]
    got = [(d, s) for _, d, s in _rows(
        page(t, "hash join", rows=10, mode="phrase", sort=[("dl", "desc")]))]
    assert got == exp


# ------------------------------------------- range facets / stats (C8+)

def test_facet_range_matches_oracle(ptab):
    from oni_indexer_spark.oracle import facet_range_sql
    from oni_indexer_spark.query.facets import facet_range

    got = [(r["bucket_start"], r["count"])
           for r in facet_range(ptab.doclen, "dl", 0, 500, 50).collect()]
    exp = [(r[0], r[1]) for r in _oracle_rows_raw(facet_range_sql("dl", 0, 500, 50))]
    assert got == exp
    assert sum(c for _, c in got) == 500  # every doc in exactly one bucket
    assert len(got) == 10  # zero-filled buckets present


def test_facet_range_mincount_and_window(ptab):
    from oni_indexer_spark.oracle import facet_range_sql
    from oni_indexer_spark.query.facets import facet_range

    got = [(r["bucket_start"], r["count"])
           for r in facet_range(ptab.doclen, "dl", 10, 100, 7, mincount=1).collect()]
    exp = [(r[0], r[1])
           for r in _oracle_rows_raw(facet_range_sql("dl", 10, 100, 7, mincount=1))]
    assert got == exp
    assert all(c >= 1 for _, c in got)


def test_facet_range_rejects_bad_args(ptab):
    import pytest as _pytest

    from oni_indexer_spark.query.facets import facet_range

    with _pytest.raises(ValueError):
        facet_range(ptab.doclen, "dl", 0, 500, 0)
    with _pytest.raises(ValueError):
        facet_range(ptab.doclen, "dl", 500, 0, 10)


def test_field_stats_matches_oracle(ptab):
    from oni_indexer_spark.oracle import field_stats_sql
    from oni_indexer_spark.query.facets import field_stats

    g = field_stats(ptab.doclen, "dl").collect()[0]
    e = _oracle_rows_raw(field_stats_sql("dl"))[0]
    assert (g["count"], g["missing"], g["min"], g["max"], g["sum"]) == tuple(e[:5])
    assert abs(g["mean"] - e[5]) < 1e-9


def _oracle_rows_raw(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


# --------------------------------------------------- grouping (collapse)

@pytest.mark.parametrize("field,kg,m,mode", [
    ("repo", 5, 3, "or"),
    ("lang", 3, 2, "or"),
    ("repo", 100, 1, "or"),     # k_groups > group count
    ("repo", 10, 1, "and"),
])
def test_group_topk_matches_oracle(ptab, field, kg, m, mode):
    from oni_indexer_spark.oracle import group_topk_sql
    from oni_indexer_spark.query import group_topk

    got = [(r["grp_rank"], r["grp"], r["rank"], r["doc_id"], round(r["score"], 6))
           for r in group_topk(ptab, "hash join", field,
                               k_groups=kg, docs_per_group=m, mode=mode).collect()]
    exp = [(r[0], r[1], r[2], r[3], round(r[4], 6))
           for r in _oracle_rows_raw(group_topk_sql(
               "hash join", field, k_groups=kg, docs_per_group=m, mode=mode))]
    assert got == exp
    assert got, "grouping should return rows on this corpus"


def test_group_topk_collapse_consistency(ptab):
    """Each group's head doc must be the globally best-ranked doc of
    that group in the flat ranking (collapse = keep best per group)."""
    from oni_indexer_spark.query import group_topk, topk

    flat = topk(ptab, "hash join", k=10_000).collect()
    grp_of = {r["doc_id"]: r["repo"]
              for r in ptab.doclen.select("doc_id", "repo").collect()}
    best = {}
    for r in flat:  # flat is rank-ordered
        g = grp_of[r["doc_id"]]
        best.setdefault(g, r["doc_id"])
    rows = group_topk(ptab, "hash join", "repo", k_groups=100,
                      docs_per_group=1).collect()
    assert {(r["grp"], r["doc_id"]) for r in rows} == set(best.items())


def test_group_topk_null_group(ptab, spark, docs):
    """Docs with a NULL group value form their own group (Solr keeps a
    null group) — exercised by nulling one repo value."""
    from pyspark.sql import functions as F

    from oni_indexer_spark.index import IndexConfig, build_index
    from oni_indexer_spark.oracle import group_topk_sql
    from oni_indexer_spark.query import group_topk

    import duckdb as _dd

    nulled = docs.withColumn(
        "repo", F.when(F.col("doc_id") < 100, None).otherwise(F.col("repo"))
    )
    t = build_index(nulled, IndexConfig(block_size=64, n_buckets=8))
    got = [(r["grp_rank"], r["grp"], r["rank"], r["doc_id"], round(r["score"], 6))
           for r in group_topk(t, "hash join", "repo",
                               k_groups=20, docs_per_group=2).collect()]
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text, CASE WHEN doc_id < 100 "
        f"THEN NULL ELSE source END AS source, lang, n_chars "
        f"FROM '{SF_SMOKE}/documents.parquet'"
    )
    exp = [(r[0], r[1], r[2], r[3], round(r[4], 6))
           for r in con.execute(group_topk_sql(
               "hash join", "repo", k_groups=20, docs_per_group=2)).fetchall()]
    assert got == exp
    assert any(g[1] is None for g in got), "null group should appear"


# ------------------------------------- facet-on-results / nested stats

def test_query_facet_counts_matches_oracle(ptab):
    from oni_indexer_spark.oracle import query_facet_counts_sql
    from oni_indexer_spark.query.facets import query_facet_counts

    for q, f, mode in [("hash join", "lang", "or"), ("hash join", "repo", "and"),
                       ("zzq_missing", "lang", "or")]:
        got = [(r["value"], r["count"])
               for r in query_facet_counts(ptab, q, f, limit=5, mode=mode).collect()]
        exp = [tuple(r) for r in _oracle_rows_raw(
            query_facet_counts_sql(q, f, limit=5, mode=mode))]
        assert got == exp, (q, f, mode)


def test_query_facet_counts_with_fq(ptab):
    from oni_indexer_spark.oracle import query_facet_counts_sql
    from oni_indexer_spark.query.facets import query_facet_counts

    got = [(r["value"], r["count"])
           for r in query_facet_counts(ptab, "hash join", "repo", limit=5,
                                       fq={"lang": "en"}).collect()]
    exp = [tuple(r) for r in _oracle_rows_raw(query_facet_counts_sql(
        "hash join", "repo", limit=5,
        fq_sub="SELECT doc_id FROM documents WHERE lang = 'en'"))]
    assert got == exp


def test_facet_stats_matches_oracle(ptab):
    from oni_indexer_spark.oracle import facet_stats_sql
    from oni_indexer_spark.query.facets import facet_stats

    got = [tuple(r) for r in facet_stats(ptab.doclen, "lang", "dl").collect()]
    exp = [tuple(r) for r in _oracle_rows_raw(facet_stats_sql("lang", "dl"))]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[:5] == e[:5]
        assert abs(g[5] - e[5]) < 1e-9


def test_page_null_sort_keys_order_last(spark, docs):
    """Docs missing the sort value order LAST in both directions
    (sortMissingLast == DuckDB's default null order; Spark's default
    asc-nulls-first would silently diverge from the oracle)."""
    from pyspark.sql import functions as F

    from oni_indexer_spark.index import IndexConfig, build_index

    nulled = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang"))
    )
    t = build_index(nulled, IndexConfig(block_size=64, n_buckets=8))
    got = _rows(page(t, "hash join", rows=2000, sort=[("lang", "asc")]))
    lang_of = {r["doc_id"]: r["lang"]
               for r in t.doclen.select("doc_id", "lang").collect()}
    langs = [lang_of[d] for _, d, _ in got]
    nn = [x for x in langs if x is not None]
    assert nn == sorted(nn)
    assert langs[len(nn):] == [None] * (len(langs) - len(nn))
    # and the oracle agrees on the full ordering
    import duckdb as _dd

    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text, CASE WHEN doc_id % 7 = 0 "
        f"THEN NULL ELSE lang END AS lang, source, n_chars "
        f"FROM '{SF_SMOKE}/documents.parquet'"
    )
    exp = [(r[0], r[1], round(r[2], 6)) for r in con.execute(
        page_sql("hash join", rows=2000, sort=[("lang", "asc")])).fetchall()]
    assert got == exp


# ------------------------------------------- pivot facets + facet.query

def test_facet_pivot_matches_oracle(docs):
    from oni_indexer_spark.oracle import facet_pivot_sql
    from oni_indexer_spark.query.facets import facet_pivot

    got = [tuple(r) for r in facet_pivot(docs, "lang", "repo",
                                         limit=4, sublimit=3).collect()]
    exp = _oracle_rows_raw(facet_pivot_sql("lang", "repo", limit=4, sublimit=3))
    assert got == exp
    # hierarchical invariants: per-parent child rows <= sublimit, child
    # counts never exceed their parent count, parents ordered by count
    by_parent = {}
    for p, pc, c, cc in got:
        by_parent.setdefault((p, pc), []).append(cc)
        assert cc <= pc
    assert all(len(v) <= 3 for v in by_parent.values())
    pcs = [pc for (_, pc) in by_parent]
    assert pcs == sorted(pcs, reverse=True)


def test_facet_query_matches_oracle(ptab):
    from oni_indexer_spark.oracle import facet_query_sql
    from oni_indexer_spark.query.facets import facet_query

    named = {"hash_and_join": "hash join", "merge_or_scan": "merge scan"}
    got = [tuple(r) for r in facet_query(ptab, "the", named,
                                         mode="or", sub_mode="and").collect()]
    exp = _oracle_rows_raw(
        facet_query_sql("the", named, mode="or", sub_mode="and"))
    assert got == exp
    assert len(got) == 2 and all(c > 0 for _, c in got)


def test_facet_query_zero_and_unmatched_buckets(ptab):
    from oni_indexer_spark.oracle import facet_query_sql
    from oni_indexer_spark.query.facets import facet_query

    named = {"none": "qqqzzznotaterm", "all": "the", "empty": ""}
    got = [tuple(r) for r in facet_query(ptab, "the", named).collect()]
    exp = _oracle_rows_raw(facet_query_sql("the", named))
    assert got == exp
    d = dict(got)
    assert d["none"] == 0 and d["empty"] == 0 and d["all"] > 0


def test_facet_query_mode_combinations_match_oracle(ptab):
    # r6 fused presence-mask kernel: pin every main/sub mode combination
    # against the oracle, including a partially-missing OR bucket (the
    # absent term must contribute nothing, not zero the bucket)
    from oni_indexer_spark.oracle import facet_query_sql
    from oni_indexer_spark.query.facets import facet_query

    named = {
        "pair_a": "hash join",
        "partial_or": "merge qqqzzznotaterm",
        "and_missing": "scan qqqzzznotaterm",
    }
    for mode in ("or", "and"):
        for sub_mode in ("or", "and"):
            got = [
                tuple(r)
                for r in facet_query(
                    ptab, "the scan", named, mode=mode, sub_mode=sub_mode
                ).collect()
            ]
            exp = _oracle_rows_raw(
                facet_query_sql("the scan", named, mode=mode, sub_mode=sub_mode)
            )
            assert got == exp, (mode, sub_mode)
