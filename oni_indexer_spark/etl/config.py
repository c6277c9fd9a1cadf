"""B1/A8: the fields-config compiler — the reference's ``setConfig`` +
``buildSchema`` pair re-expressed as config → Column expressions / join
fragments.

The reference compiles ``config.json``'s ``fields`` block into per-item
JS closures (``lib/ROCrateIndexer.js:27-76``) and, separately, derives
the Solr schema's copyfield list from ``fields.main_search``
(``oni-indexer.js:272-288``, golden ``schema.json:92-118``). Here the
same config compiles into:

- :func:`main_search_col` / :func:`schema_copyfields` / :func:`schema_ddl`
  — A8: the copyfield column, the reference-shaped copyfield JSON, and a
  ``CREATE OR REPLACE VIEW`` DDL that materializes the derived columns
  over any documents table (the Spark analogue of posting schema updates
  to Solr).
- :func:`compile_type_pipeline` — B1: one type's field config driven
  end-to-end through the §2.B operators (skip / index_as / validate /
  facet / resolve / via / reverse / match clauses / inherit), emitting
  the long-format (id, field, value) rows the reference's multivalued
  Solr documents flatten to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oni_indexer_spark.etl import ops


# --- A8: copyfield / schema generation -----------------------------------

def main_search_col(sources: list[str]) -> Column:
    """The ``main_search`` copyfield as a column: space-joined copy of the
    configured source fields (Solr copies each source field's tokens into
    the dest field's index; for a bag-of-words analyzer the concatenation
    indexes identically)."""
    return F.concat_ws(" ", *sources)


def schema_copyfields(fields_cf: dict) -> list[dict]:
    """Reference-shaped copyfield config (``oni-indexer.js:276-283``):
    one ``{"source": f, "dest": ["main_search"]}`` per configured source."""
    return [
        {"source": f, "dest": ["main_search"]}
        for f in fields_cf.get("main_search", [])
    ]


def schema_ddl(
    fields_cf: dict, table: str = "documents", view: str = "indexed_documents"
) -> str:
    """A8 schema sink: DDL deriving the indexed view (main_search
    copyfield + facet columns) from a fields config — the engine-side
    analogue of the reference posting add-copy-field/add-dynamic-field
    to Solr's schema API (``oni-indexer.js:294-348``)."""
    cols = ["*"]
    ms = fields_cf.get("main_search", [])
    if ms:
        srcs = ", ".join(ms)
        cols.append(f"concat_ws(' ', {srcs}) AS main_search")
    for facet in fields_cf.get("facets", []):
        cols.append(f"{facet} AS {facet}_facet")
    sel = ",\n  ".join(cols)
    return f"CREATE OR REPLACE TEMPORARY VIEW {view} AS\nSELECT\n  {sel}\nFROM {table}"


# --- B1: full per-type pipeline compile -----------------------------------

def compile_type_pipeline(
    items: DataFrame,
    edges: DataFrame,
    type_name: str,
    type_cf: dict,
    root_id: str | None = None,
) -> DataFrame:
    """Drive one ``fields.types.<Type>`` config block end-to-end through
    the §2.B operators. Output: long-format (id, field, value) — one row
    per indexed value, the flat shape of the reference's multivalued Solr
    docs (``createSolrDocument``, ``lib/ROCrateIndexer.js:317-342``).

    Supported field-config keys (each dispatches to its §2.B operator):
    ``skip``, ``index_as``, ``validate: date|{re}``, ``facet`` (tokenize),
    ``resolve: multi|single`` (+ ``reverse``), ``via`` chains, clause
    ARRAYS (``match``/``index_as`` — B10), ``inherit`` (from root).
    """
    base = items.where(F.array_contains(F.col("types"), type_name))
    base_ids = base.select("id")
    outs: list[DataFrame] = []

    def long(df: DataFrame, field: str, value: Column) -> DataFrame:
        return df.select(F.col("id"), F.lit(field).alias("field"), value.alias("value"))

    for field, fcf in type_cf.items():
        if isinstance(fcf, list):  # B10 match-partitioned clauses
            m = ops.match_multi(items, edges, field, fcf).join(
                base_ids, "id", "left_semi"
            )
            outs.append(
                m.select("id", F.col("index_as").alias("field"), F.col("value"))
            )
            continue
        fcf = fcf or {}
        if fcf.get("skip"):
            continue
        index_as = fcf.get("index_as", field)
        if "via" in fcf:
            r = ops.resolve_via(items, edges, fcf["via"], index_as).join(
                base_ids, "id", "left_semi"
            )
            outs.append(long(r, index_as, F.col(index_as)))
            continue
        if fcf.get("reverse"):
            r = ops.resolve_reverse(items, edges, field, index_as).join(
                base_ids, "id", "left_semi"
            )
            outs.append(long(r, index_as, F.col(index_as)))
            continue
        if "resolve" in fcf:
            fn = ops.resolve_single if fcf["resolve"] == "single" else ops.resolve
            r = fn(items, edges, field, index_as).join(base_ids, "id", "left_semi")
            outs.append(long(r, index_as, F.col(index_as)))
            continue
        # scalar column transforms
        src = base
        if fcf.get("inherit") and root_id is not None:
            # root lookup goes against the UNFILTERED items frame: the
            # canonical case is Person.license inheriting from the root
            # Dataset, and the root is not of the dispatched type
            src = ops.inherit(base, field, root_id, root_source=items)
        val = F.col(field)
        validate = fcf.get("validate")
        if validate == "date":
            val = ops.validate_date(val)
        elif isinstance(validate, dict) and "re" in validate:
            val = ops.validate_re(val, validate["re"])
        if fcf.get("facet") == "tokenize":
            toks = ops.facet_tokenize(field)
            outs.append(
                src.select(
                    "id",
                    F.lit(index_as).alias("field"),
                    F.explode(toks).alias("value"),
                )
            )
            continue
        outs.append(long(src.where(val.isNotNull()), index_as, val))

    if not outs:
        return base.select(
            "id", F.lit(None).cast("string").alias("field"),
            F.lit(None).cast("string").alias("value"),
        ).limit(0)
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out
