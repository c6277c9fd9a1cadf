"""ETL operator unit tests (beyond the oracle-compared entry queries):
admin/operational parity + semantics edge cases."""

import os

import pytest
from pyspark.sql import functions as F

from oni_indexer_spark.etl import admin, ops
from oni_indexer_spark.etl.fixture import ROOT_ID, spark_edges, spark_items


@pytest.fixture(scope="module")
def items(spark):
    return spark_items(spark).cache()


@pytest.fixture(scope="module")
def edges(spark):
    return spark_edges(spark).cache()


def test_filter_is_root(spark, items):
    rows = ops.filter_items(items, {"name": {"is_root": True}}, root_id=ROOT_ID).collect()
    assert [r["id"] for r in rows] == ["d1"]


def test_filter_array_any_and_conjunction(spark, items):
    got = ops.filter_items(
        items, {"types": "RepositoryCollection", "name": {"re": "corpus"}}
    ).collect()
    assert [r["id"] for r in got] == ["d3"]


def test_type_dispatch_first_match_wins(spark, items):
    d = ops.type_dispatch(items, {"Dataset": {}, "RepositoryCollection": {}})
    got = {r["id"]: r["record_type_s"] for r in d.collect()}
    assert got["d3"] == "Dataset"  # multi-typed item claimed by first config type
    assert set(got) == {"d1", "d2", "d3"}


def test_resolve_multi_arity(spark, items, edges):
    got = ops.resolve(items, edges, "author", "lead")
    rows = {(r["id"], r["lead_id"]): r["lead"] for r in got.collect()}
    assert rows[("d1", "p1")] == "Ada Lovelace"
    assert rows[("d1", "p2")] == "Grace Hopper"  # ALL elements (unwrap bug fixed)
    assert rows[("d2", "p3")] == "Alan Turing"


def test_validate_re(spark, items):
    got = items.select("id", ops.validate_re("commit" if False else "name", "([A-Z][a-z]+)").alias("v"))
    rows = {r["id"]: r["v"] for r in got.collect()}
    assert rows["p1"] == "Ada"
    assert rows["d1"] == "Root"


def test_skip_and_limit(spark, items):
    got = admin.apply_skip_and_limit(items, skip_ids=["d1", "p1"], limit=3, id_col="id")
    assert [r["id"] for r in got.collect()] == [
        "anzsrc-for-0801", "anzsrc-for-0806", "anzsrc-seo-970108",
    ]


def test_quarantine_invalid(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (None, "x"), (4, "dup"), (4, "dup2")],
        "doc_id long, content string",
    )
    good, bad = admin.quarantine_invalid(df)
    assert sorted(r["doc_id"] for r in good.collect()) == [1]
    reasons = sorted(
        ((r["doc_id"], r["quarantine_reason"]) for r in bad.collect()), key=repr
    )
    assert (2, "null_content") in reasons
    assert (None, "null_id") in reasons
    assert sum(1 for d, r in reasons if r == "duplicate_id") == 2


def test_portal_facets_roundtrip(tmp_path):
    existing = {"lang": {"field": "lang", "limit": 10, "sort": "index"}, "stale": {"field": "stale"}}
    facets = admin.make_portal_facets(
        {"lang": {}, "repo": {"limit": 7}}, existing=existing
    )
    assert set(facets) == {"lang", "repo"}  # stale dropped, new added
    assert facets["lang"]["limit"] == 10 and facets["lang"]["sort"] == "index"  # kept
    assert facets["repo"]["limit"] == 7
    p = str(tmp_path / "facets.json")
    admin.write_portal_facets(p, facets)
    assert os.path.exists(p)


def test_purge_and_dump(spark, docs, tmp_path):
    from oni_indexer_spark.index import IndexConfig, build_to_path

    p = str(tmp_path / "idx")
    build_to_path(docs.limit(50), p, IndexConfig(block_size=64, n_buckets=4), bucket_group_size=4)
    assert os.path.exists(os.path.join(p, "postings"))
    admin.dump_docs(docs.limit(5), str(tmp_path / "dump"))
    assert any(f.endswith(".json") for f in os.listdir(tmp_path / "dump"))
    admin.purge_index(p)
    assert not os.path.exists(os.path.join(p, "postings"))
    assert not os.path.exists(os.path.join(p, "_lineage"))


def test_match_multi_for_seo(spark, items):
    # B10 (lib/ROCrateIndexer.js:398-414; test/ro-crate.spec.js:64-94):
    # 'about' values split by clause regex into FOR/SEO; non-matching
    # values (topic-misc) drop; counts mirror the reference expectations.
    from oni_indexer_spark.etl import fixture, ops

    out = ops.match_multi(
        items,
        fixture.spark_edges(spark),
        "about",
        [
            {"match": {"id": {"re": "anzsrc-for"}}, "index_as": "FOR"},
            {"match": {"id": {"re": "anzsrc-seo"}}, "index_as": "SEO"},
        ],
    ).collect()
    d1 = [(r["index_as"], r["value_id"]) for r in out if r["id"] == "d1"]
    assert sorted(d1) == [
        ("FOR", "anzsrc-for-0801"),
        ("FOR", "anzsrc-for-0806"),
        ("SEO", "anzsrc-seo-970108"),
    ]
    assert not any(r["value_id"] == "topic-misc" for r in out)
    # a value matching several clauses indexes once per clause
    both = ops.match_multi(
        items,
        fixture.spark_edges(spark),
        "about",
        [
            {"match": {"id": {"re": "anzsrc"}}, "index_as": "ANY"},
            {"match": {"id": {"re": "anzsrc-for"}}, "index_as": "FOR"},
        ],
    ).where("id = 'd2' AND value_id = 'anzsrc-for-0806'").collect()
    assert sorted(r["index_as"] for r in both) == ["ANY", "FOR"]


def test_schema_copyfields_and_ddl(spark):
    # A8 (oni-indexer.js:272-288): copyfield JSON in the reference shape,
    # and the DDL view derives main_search from the same config.
    from oni_indexer_spark.etl.config import schema_copyfields, schema_ddl

    cf = {"main_search": ["name", "description", "id"], "facets": ["license"]}
    assert schema_copyfields(cf) == [
        {"source": "name", "dest": ["main_search"]},
        {"source": "description", "dest": ["main_search"]},
        {"source": "id", "dest": ["main_search"]},
    ]
    df = spark.createDataFrame(
        [("x1", "Ada", "math", "cc-by")], "id string, name string, description string, license string"
    )
    df.createOrReplaceTempView("t_schema_src")
    spark.sql(schema_ddl(cf, table="t_schema_src", view="t_schema_view"))
    row = spark.sql("SELECT main_search, license_facet FROM t_schema_view").collect()[0]
    assert row["main_search"] == "Ada math x1"
    assert row["license_facet"] == "cc-by"


def test_inherit_root_from_unfiltered_items(spark, items, edges):
    """ADVICE r2: the canonical inherit is Person.license inheriting from
    the root Dataset — the root is NOT of the dispatched type, so the
    root lookup must go against the unfiltered items frame, not the
    type-filtered slice (where it silently became a no-op)."""
    from oni_indexer_spark.etl.config import compile_type_pipeline

    out = compile_type_pipeline(
        items, edges, "Person", {"license": {"inherit": True}}, root_id=ROOT_ID
    )
    got = {r["id"]: r["value"] for r in out.where(F.col("field") == "license").collect()}
    root_license = items.where(F.col("id") == ROOT_ID).collect()[0]["license"]
    persons = [r["id"] for r in items.collect() if "Person" in r["types"]]
    assert persons and all(got[p] == root_license for p in persons)
    # direct op call: explicit root_source
    base = items.where(F.array_contains("types", "Person"))
    inh = ops.inherit(base, "license", ROOT_ID, root_source=items)
    assert all(r["license"] == root_license for r in inh.collect())


def test_fixpoint_dangling_intermediate_matches_oracle(spark):
    """ADVICE r2: a non-item id with outgoing edges must NOT be traversed
    through (nor indexed), and a non-item seed is dropped — engine and
    recursive-CTE oracle agree on such graphs."""
    import duckdb

    from oni_indexer_spark.etl.oracle import resolve_fixpoint_sql, sql_cte  # noqa: F401

    items = spark.createDataFrame(
        [("a", ["Dataset"], "A"), ("c", ["Person"], "C"), ("e", ["Person"], "E")],
        "id string, types array<string>, name string",
    )
    # a -> dangling -> c : c is unreachable (dangling not traversed through)
    # a -> e             : e reachable at depth 1
    edges = spark.createDataFrame(
        [
            ("a", "link", "dangling"),
            ("dangling", "link", "c"),
            ("a", "link", "e"),
        ],
        "src string, property string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("ghost_seed",)], "id string")
    got = {
        (r["id"], r["depth"])
        for r in ops.resolve_fixpoint(items, edges, seeds).collect()
    }
    assert got == {("a", 0), ("e", 1)}
    # oracle twin over the same graph, inlined as VALUES
    sql = """WITH RECURSIVE items(id) AS (VALUES ('a'), ('c'), ('e')),
edges(src, dst) AS (VALUES ('a','dangling'), ('dangling','c'), ('a','e')),
reach(id, depth) AS (
  SELECT id, 0 FROM items WHERE id = 'a'
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.id JOIN items i2 ON i2.id = e.dst
  WHERE r.depth < 20
)
SELECT r.id, min(r.depth)::int AS depth FROM reach r GROUP BY r.id"""
    oracle_got = {(r[0], r[1]) for r in duckdb.sql(sql).fetchall()}
    assert oracle_got == {("a", 0), ("e", 1)} == got


def test_dynamic_field_registry():
    """A8: suffix-pattern typing mirrors the reference schema.json
    dynamicfield block; longest matching pattern wins (Solr's rule)."""
    from oni_indexer_spark.etl.config import dynamic_field_def, facet_field_name

    assert dynamic_field_def("author_id") == {"type": "text_en", "multiValued": True}
    assert dynamic_field_def("Dataset_keywords_facetmulti") == {
        "type": "string", "multiValued": True,
    }
    assert dynamic_field_def("Person_role_facet") == {
        "type": "string", "multiValued": False,
    }
    # *_datePublished (longer) beats nothing else; *_date does NOT match it
    assert dynamic_field_def("x_datePublished")["type"] == "text_en"
    assert dynamic_field_def("no_pattern_matches_this") is None
    # facetFieldName arity: multi / resolve-multi -> facetmulti
    assert facet_field_name("Dataset", "keywords", {"multi": True}) == "Dataset_keywords_facetmulti"
    assert facet_field_name("Dataset", "author", {"resolve": "multi"}) == "Dataset_author_facetmulti"
    assert facet_field_name("Person", "role", {}) == "Person_role_facet"
    assert facet_field_name("Person", "affil", {"index_as": "org"}) == "Person_org_facet"


def test_schema_from_config_shape():
    """A8: derived schema carries the reference's static fields, the full
    dynamic-field registry, per-source main_search copyfields and the
    *_datePublished -> yearPublished 4-char copy."""
    from oni_indexer_spark.etl.config import schema_from_config

    s = schema_from_config(
        {"main_search": ["name", "description"]},
        types_cf={"Dataset": {"keywords": {"multi": True, "facet": True}}},
    )
    assert {f["name"] for f in s["field"]} >= {"main_search", "yearPublished"}
    assert {d["name"] for d in s["dynamicfield"]} >= {"*_facetmulti", "*_id"}
    assert {"source": "name", "dest": ["main_search"]} in s["copyfield"]
    assert {"source": "*_datePublished", "maxChars": 4, "dest": ["yearPublished"]} in s["copyfield"]
    assert s["derived"] == [
        {"name": "Dataset_keywords_facetmulti", "type": "string", "multiValued": True}
    ]


def test_resolve_via_reverse_hop(spark, items, edges):
    """A via chain whose first hop runs against edge direction: person
    <-author- dataset -about-> term (the criminals reverseSentence
    shape)."""
    out = ops.resolve_via(
        items, edges,
        [{"property": "author", "reverse": True}, "about"],
        "rwa",
    )
    got = {(r["id"], r["rwa"]) for r in out.collect()}
    # p1/p2 author d1 (4 about targets); p3 authors d2 (2 targets)
    assert ("p1", "Artificial Intelligence") in got
    assert ("p2", "Expanding Knowledge") in got
    assert ("p3", "Information Systems") in got
    assert len([1 for i, _ in got if i == "p3"]) == 2


def test_type_dispatch_single_scan(spark, items):
    """The when-chain dispatch reads items ONCE (r3 VERDICT nit #2): the
    optimized plan contains a single relation scan, not one per type."""
    d = ops.type_dispatch(items, {"Dataset": {}, "Person": {"name": {"re": "a"}}})
    plan = d._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("InMemoryRelation") + plan.count("LogicalRDD") == 1, plan
    assert "Union" not in plan, plan


def test_facet_fields_resolve_dispatch(spark, items, edges):
    """r3 ADVICE (medium): facet value source dispatches by resolve
    arity/form like compile_type_pipeline — resolve:"single" facets ONE
    value; a dict-valued resolve follows its via chain + display."""
    from oni_indexer_spark.etl.config import facet_fields

    cf = {
        "hasPart": {"resolve": "single", "facet": True},
        "author": {
            "resolve": {"via": [{"property": "affiliation"}], "display": "name"},
            "facet": True,
        },
    }
    rows = [
        (r["id"], r["facet_field"], r["value"])
        for r in facet_fields(items, edges, "Dataset", cf).collect()
    ]
    # hasPart resolve:"single": exactly ONE row for d1 (min target id)
    hp = [r for r in rows if r[1] == "Dataset_hasPart_facet"]
    assert hp == [("d1", "Dataset_hasPart_facet", "Sub corpus")]
    # dict-resolve: author -> affiliation chain, display=name (NOT the
    # 1-hop author name the old code emitted)
    au = sorted(r for r in rows if r[1] == "Dataset_author_facet")
    assert au == [
        ("d1", "Dataset_author_facet", "Analytical Engines Ltd"),
        ("d1", "Dataset_author_facet", "Analytical Engines Ltd"),
    ]
