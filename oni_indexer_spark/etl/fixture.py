"""Deterministic item-graph fixture for the §2.B ETL parity operators.

Mirrors the reference's JSON-LD item model (RO-Crate ``@graph``:
``test-data/vic-arch-ro-crate-metadata.jsonld``, criminals crate
``test-data/criminals/indexer.json:37-87``) in relational form:

- ``items(id, types, name, description, license, date_published, keywords)``
- ``edges(src, property, dst)``  (link objects ``{"@id": ...}``; reverse
  edges are the same rows traversed dst→src, cf. ``crate.addBackLinks()``
  at ``lib/ROCrateIndexer.js:250-254``)

The SAME Python constants build the Spark DataFrames and the DuckDB
``VALUES`` CTE, so oracle comparisons are exact. 'd1' is the root dataset
(reference ``getRootDataset``, ``lib/ROCrateIndexer.js:263``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROOT_ID = "d1"

# (id, types, name, description, license, date_published, keywords)
ITEMS: list[tuple] = [
    ("d1", ["Dataset"], "Root corpus", "The root dataset", "https://creativecommons.org/licenses/by/4.0/", "2021-03-15T10:00:00", "spark,index,bm25"),
    ("d2", ["Dataset"], "Sub corpus", "A nested dataset", None, "2020-1-1", "search,solr"),
    ("d3", ["Dataset", "RepositoryCollection"], "Old corpus", "Legacy data", "custom-internal", "not a date", None),
    ("p1", ["Person"], "Ada Lovelace", "mathematician", None, None, None),
    ("p2", ["Person"], "Grace Hopper", "admiral", None, None, None),
    ("p3", ["Person"], "Alan Turing", None, None, None, None),
    ("o1", ["Organization"], "Analytical Engines Ltd", None, None, None, None),
    ("s1", ["Sentence"], "Sentence One", None, None, None, None),
    ("s2", ["Sentence"], "Sentence Two", None, None, None, None),
    ("pl1", ["Place"], "Melbourne", None, None, None, None),
    ("pl2", ["Place"], "London", None, None, None, None),
    # subject codes for the B10 match-clause split (reference FOR/SEO:
    # test-data/fields-index-matching.json, test/ro-crate.spec.js:64-94)
    ("anzsrc-for-0801", ["DefinedTerm"], "Artificial Intelligence", None, None, None, None),
    ("anzsrc-for-0806", ["DefinedTerm"], "Information Systems", None, None, None, None),
    ("anzsrc-seo-970108", ["DefinedTerm"], "Expanding Knowledge", None, None, None, None),
    ("topic-misc", ["DefinedTerm"], "Uncategorised", None, None, None, None),
    # nameless entity: exercises B7's JSON-stringify fallback
    ("w-addr1", ["PostalAddress"], None, "221B Baker St", None, None, None),
]

# (src, property, dst)
EDGES: list[tuple[str, str, str]] = [
    ("d1", "author", "p1"),
    ("d1", "author", "p2"),
    ("d2", "author", "p3"),
    ("d1", "hasPart", "d2"),
    ("p1", "affiliation", "o1"),
    ("p2", "affiliation", "o1"),
    ("p1", "conviction", "s1"),
    ("p3", "conviction", "s2"),
    ("s1", "location", "pl1"),
    ("s2", "location", "pl2"),
    ("d1", "about", "anzsrc-for-0801"),
    ("d1", "about", "anzsrc-for-0806"),
    ("d1", "about", "anzsrc-seo-970108"),
    ("d1", "about", "topic-misc"),
    ("d2", "about", "anzsrc-for-0806"),
    ("d2", "about", "anzsrc-seo-970108"),
    ("pl2", "address", "w-addr1"),
    # geo links: the reference encodes coordinates IN the @id
    # (doc/Solr_config.md:248-253 '#-37.808598,144.966347'); the targets
    # are deliberately not items (dangling refs, like the source crates)
    ("pl1", "geo", "#-37.8136,144.9631"),
    ("pl2", "geo", "#51.5074,-0.1278"),
]

ITEMS_SCHEMA = (
    "id string, types array<string>, name string, description string,"
    " license string, date_published string, keywords string"
)
EDGES_SCHEMA = "src string, property string, dst string"


def spark_items(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ITEMS, ITEMS_SCHEMA)


def spark_edges(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(EDGES, EDGES_SCHEMA)


def jsonld_crate() -> str:
    """The SAME fixture rendered as a single RO-Crate JSON-LD ``@graph``
    string (the reference's primary input shape,
    ``lib/ROCrateIndexer.js:242-254``; ``test-data/CATALOG.json:31-44``).

    Keys are sorted and the output minified: Spark's VARIANT re-serializes
    with recursively sorted keys, DuckDB's JSON preserves input order —
    pre-sorting makes B7's JSON-stringify fallback byte-identical across
    engines. The root's license is emitted as a link object
    ``{"@id": ...}`` (not a plain string) to exercise ingest's coalesce;
    single links stay objects, multi-links become arrays, and multi-type
    entities use @type arrays — all four JSON-LD shape variations."""
    import json as _json

    by_src: dict[str, dict[str, list[str]]] = {}
    for src, prop, dst in EDGES:
        by_src.setdefault(src, {}).setdefault(prop, []).append(dst)
    graph = []
    for id_, types, name, desc, lic, date_pub, kw in ITEMS:
        ent: dict = {"@id": id_, "@type": types if len(types) > 1 else types[0]}
        if name is not None:
            ent["name"] = name
        if desc is not None:
            ent["description"] = desc
        if lic is not None:
            ent["license"] = {"@id": lic} if id_ == ROOT_ID else lic
        if date_pub is not None:
            ent["datePublished"] = date_pub
        if kw is not None:
            ent["keywords"] = kw
        for prop, dsts in by_src.get(id_, {}).items():
            links = [{"@id": d} for d in dsts]
            ent[prop] = links if len(links) > 1 else links[0]
        graph.append(ent)
    crate = {"@context": "https://w3id.org/ro/crate/1.1/context", "@graph": graph}
    return _json.dumps(crate, sort_keys=True, separators=(",", ":"))


def spark_crate(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("crate1", jsonld_crate())], "crate_id string, jsonld string"
    )


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, list):
        return "[" + ", ".join(_sql_lit(x) for x in v) + "]"
    return "'" + str(v).replace("'", "''") + "'"


def sql_cte() -> str:
    """``WITH items(...) AS (VALUES ...), edges(...) AS (VALUES ...)``
    prefix for DuckDB oracles over the same fixture."""
    items_rows = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in ITEMS
    )
    edges_rows = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in EDGES
    )
    return f"""WITH items(id, types, name, description, license, date_published, keywords) AS (
  VALUES
    {items_rows}
),
edges(src, property, dst) AS (
  VALUES
    {edges_rows}
)"""
