"""A2: JSON-LD (RO-Crate) graph ingestion — the reference's primary
input path, re-expressed on Spark 4 VARIANT.

The reference loads a crate, indexes ``@graph`` items by ``@id`` and adds
back-links (``lib/ROCrateIndexer.js:242-254``; fixtures
``test-data/CATALOG.json:31-44``). Here a DataFrame of raw JSON-LD
strings (one crate per row — at corpus scale, millions of crates) parses
declaratively into the relational shape every §2.B operator consumes:

- ``items(crate_id, id, types, name, description, license,
  date_published, keywords, raw)`` — ``raw`` is the whole entity
  re-serialized, for B7's JSON-stringify fallback
- ``edges(crate_id, src, property, dst)`` — one row per ``{"@id": ...}``
  link object, arrays unrolled (``crate.addBackLinks()``'s reverse
  traversal is the same rows read dst→src)

Scale shape: ``parse_json`` → VARIANT keeps the heterogeneous entities
binary-encoded and columnar; the two ``variant_explode`` lateral joins
are narrow per-row generators (no shuffle at all — ingestion is
embarrassingly parallel over crates), and every downstream field access
is a variant path that Spark evaluates without re-parsing text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ID = "$['@id']"
_TYPE = "$['@type']"


def _vstr(col: Column, path: str) -> Column:
    return F.try_variant_get(col, path, "string")


def _as_array(v: Column) -> Column:
    """Wrap a scalar/object variant into a 1-element variant array
    (JSON-LD allows both ``x`` and ``[x]`` everywhere)."""
    return F.when(
        F.schema_of_variant(v).startswith("ARRAY"), v
    ).otherwise(F.parse_json(F.concat(F.lit("["), F.to_json(v), F.lit("]"))))


def graph_items_raw(
    crates: DataFrame, json_col: str = "jsonld", crate_col: str = "crate_id"
) -> DataFrame:
    """(crate_id, item VARIANT): one row per ``@graph`` entity."""
    spark = crates.sparkSession
    g = crates.select(
        F.col(crate_col).alias("crate_id"),
        F.variant_get(F.parse_json(F.col(json_col)), "$['@graph']", "variant").alias("_graph"),
    )
    exploded = g.lateralJoin(
        spark.tvf.variant_explode(F.col("_graph").outer())
    )
    return exploded.select("crate_id", F.col("value").alias("item"))


def ingest_items(
    crates: DataFrame, json_col: str = "jsonld", crate_col: str = "crate_id"
) -> DataFrame:
    """items table in the §2.B fixture shape (+ crate_id + raw JSON)."""
    it = graph_items_raw(crates, json_col, crate_col)
    item = F.col("item")
    types = F.when(
        F.schema_of_variant(F.variant_get(item, _TYPE, "variant")).startswith("ARRAY"),
        F.try_variant_get(item, _TYPE, "array<string>"),
    ).otherwise(F.array(_vstr(item, _TYPE)))
    # license may be a plain string or a link object {"@id": ...}
    license_ = F.coalesce(
        _vstr(item, "$.license['@id']"), _vstr(item, "$.license")
    )
    return it.select(
        "crate_id",
        _vstr(item, _ID).alias("id"),
        types.alias("types"),
        _vstr(item, "$.name").alias("name"),
        _vstr(item, "$.description").alias("description"),
        license_.alias("license"),
        _vstr(item, "$.datePublished").alias("date_published"),
        _vstr(item, "$.keywords").alias("keywords"),
        F.to_json(item).alias("raw"),
    )


def ingest_edges(
    crates: DataFrame, json_col: str = "jsonld", crate_col: str = "crate_id"
) -> DataFrame:
    """edges table: every ``{"@id": ...}`` link object under every
    property, single values and arrays alike."""
    spark = crates.sparkSession
    it = graph_items_raw(crates, json_col, crate_col)
    fields = it.lateralJoin(
        spark.tvf.variant_explode(F.col("item").outer())
    ).select(
        "crate_id",
        F.col("item").alias("_item"),
        F.col("key").alias("property"),
        _as_array(F.col("value")).alias("_vals"),
    )
    vals = fields.lateralJoin(
        spark.tvf.variant_explode(F.col("_vals").outer())
    )
    return vals.select(
        "crate_id",
        F.try_variant_get(F.col("_item"), _ID, "string").alias("src"),
        "property",
        F.try_variant_get(F.col("value"), _ID, "string").alias("dst"),
    ).where(F.col("dst").isNotNull() & (F.col("property") != "@id"))


def unwrap_display(
    items: DataFrame,
    edges: DataFrame,
    prop: str,
    index_as: str,
    escaped_json: bool = False,
) -> DataFrame:
    """B7 field copy + unwrap with the JSON-stringify fallback
    (``lib/ROCrateIndexer.js:839-860``, intended semantics — the
    reference's first-element-only early return is a listed latent bug):
    resolve ``prop`` links; a target WITH a name contributes its name,
    a target WITHOUT one (or any target under ``escapedJSON: true``)
    contributes the whole entity JSON-serialized
    (golden ``test-data/CatalogSolr.json:25-27``)."""
    e = edges.where(F.col("property") == prop).select(
        F.col("src").alias("_src"), F.col("dst").alias("_dst")
    )
    tgt = items.select(
        F.col("id").alias("_tid"), F.col("name").alias("_tname"), F.col("raw").alias("_traw")
    )
    val = (
        F.col("_traw")
        if escaped_json
        else F.coalesce(F.col("_tname"), F.col("_traw"))
    )
    return (
        e.join(tgt, F.col("_dst") == F.col("_tid"))
        .select(
            F.col("_src").alias("id"),
            val.alias(index_as),
            F.col("_dst").alias(f"{index_as}_id"),
        )
    )
