"""A2 JSON-LD ingestion (etl/ingest.py): VARIANT @graph parse into the
relational items/edges shape, plus B7 unwrap's JSON-stringify fallback
(lib/ROCrateIndexer.js:242-254, 839-860)."""

import json

import pytest

from oni_indexer_spark.etl import fixture, ingest


@pytest.fixture(scope="module")
def crate(spark):
    return fixture.spark_crate(spark)


def test_items_match_relational_fixture(spark, crate):
    got = {
        r["id"]: r
        for r in ingest.ingest_items(crate).collect()
    }
    assert len(got) == len(fixture.ITEMS)
    for id_, types, name, desc, lic, date_pub, kw in fixture.ITEMS:
        r = got[id_]
        assert r["types"] == types
        assert r["name"] == name
        assert r["description"] == desc
        assert r["license"] == lic  # root's {"@id": ...} link unwraps too
        assert r["date_published"] == date_pub
        assert r["keywords"] == kw


def test_edges_match_relational_fixture(spark, crate):
    got = sorted(
        (r["src"], r["property"], r["dst"])
        for r in ingest.ingest_edges(crate).collect()
        # the root license rides as a link object in the crate; the
        # relational fixture models license as an item column instead
        if r["property"] != "license"
    )
    assert got == sorted(fixture.EDGES)


def test_unwrap_name_and_json_fallback(spark, crate):
    items = ingest.ingest_items(crate)
    edges = ingest.ingest_edges(crate)
    # named target -> name
    named = ingest.unwrap_display(items, edges, "author", "author").collect()
    assert ("d1", "Ada Lovelace") in {(r["id"], r["author"]) for r in named}
    # nameless target -> whole entity JSON (sorted keys, minified)
    fb = ingest.unwrap_display(items, edges, "address", "addr").collect()
    assert len(fb) == 1 and fb[0]["id"] == "pl2"
    assert json.loads(fb[0]["addr"]) == {
        "@id": "w-addr1",
        "@type": "PostalAddress",
        "description": "221B Baker St",
    }
    # escapedJSON: true -> JSON even when the target has a name
    esc = ingest.unwrap_display(items, edges, "author", "author", escaped_json=True)
    rows = {(r["id"], r["author_id"]): r["author"] for r in esc.collect()}
    assert json.loads(rows[("d1", "p1")])["name"] == "Ada Lovelace"
