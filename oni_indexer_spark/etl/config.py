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


# A8: the dynamic-field suffix registry — mirrors the reference's
# golden ``schema.json:43-91``: a concrete field name is typed by its
# suffix pattern (Solr dynamic fields; longest matching pattern wins,
# Solr's resolution rule). (pattern, solr_type, multiValued)
DYNAMIC_FIELDS: list[tuple[str, str, bool]] = [
    ("*_name", "text_en", False),
    ("*_id", "text_en", True),
    ("*_description", "text_en", False),
    ("*_date", "text_en", False),
    ("*_datePublished", "text_en", False),
    ("*_dateCreated", "text_en", False),
    ("*_birthDate", "text_en", False),
    ("*_facetmulti", "string", True),
    ("*_facet", "string", False),
]

# static fields the reference schema always declares (schema.json:2-41)
STATIC_FIELDS: list[dict] = [
    {"name": "name", "type": "text_general", "stored": True},
    {"name": "type", "type": "string", "stored": True},
    {"name": "description", "type": "text_en", "stored": True},
    {"name": "main_search", "type": "text_en", "stored": True, "multiValued": True},
    {"name": "yearPublished", "type": "text_en", "stored": True, "multiValued": True},
]


def facet_field_name(type_name: str, field: str, fcf: dict) -> str:
    """The reference's ``facetFieldName`` (``lib/ROCrateIndexer.js:111-113``):
    ``{Type}_{index_as}_{facet|facetmulti}`` — multi when the config says
    ``multi`` or ``resolve: multi``, so the name lands on the ``*_facet``
    / ``*_facetmulti`` dynamic-field patterns with the right arity."""
    multi = bool(fcf.get("multi")) or fcf.get("resolve") == "multi"
    index_as = fcf.get("index_as", field)
    return "_".join([type_name, index_as, "facetmulti" if multi else "facet"])


def dynamic_field_def(name: str) -> dict | None:
    """Resolve a concrete field name against the dynamic-field registry
    (longest matching suffix pattern wins — Solr's rule). Returns the
    ``{"type", "multiValued"}`` the field would get, or None when no
    pattern matches (an undeclared field would be rejected by Solr)."""
    best: tuple[str, str, bool] | None = None
    for pat, typ, multi in DYNAMIC_FIELDS:
        suffix = pat[1:]  # '*_id' -> '_id'
        if name.endswith(suffix) and (best is None or len(suffix) > len(best[0])):
            best = (suffix, typ, multi)
    if best is None:
        return None
    return {"type": best[1], "multiValued": best[2]}


def schema_from_config(fields_cf: dict, types_cf: dict | None = None) -> dict:
    """A8: the full reference-shaped schema document derived from a
    fields config — the Spark-side analogue of ``buildSchema`` +
    ``updateSchema`` posting field/dynamic-field/copy-field definitions
    to Solr's schema API (``oni-indexer.js:270-348``; golden shape
    ``schema.json``). Sections:

    - ``field``: the static base fields;
    - ``dynamicfield``: the suffix registry (facet/facetmulti/_id/... —
      every per-type derived field name resolves against these);
    - ``copyfield``: one ``{source, dest: [main_search]}`` per
      configured ``fields.main_search`` source (``buildSchema``,
      ``oni-indexer.js:275-280``) plus the standing
      ``*_datePublished → yearPublished`` 4-char year copy
      (``schema.json:98-104``).

    ``types_cf`` (optional, ``fields.types``) additionally reports the
    per-type facet field names the config will emit, each resolved
    against the registry — so a config whose facet arity mismatches its
    dynamic-field pattern is caught at compile time, not at index time.
    """
    copyfields = [
        {"source": src, "dest": ["main_search"]}
        for src in fields_cf.get("main_search", [])
    ]
    copyfields.append(
        {"source": "*_datePublished", "maxChars": 4, "dest": ["yearPublished"]}
    )
    schema = {
        "field": list(STATIC_FIELDS),
        "dynamicfield": [
            {"name": pat, "type": typ, "stored": True, **({"multiValued": True} if multi else {})}
            for pat, typ, multi in DYNAMIC_FIELDS
        ],
        "copyfield": copyfields,
    }
    if types_cf:
        derived = []
        for type_name, type_cf in types_cf.items():
            for field, fcf in type_cf.items():
                if isinstance(fcf, dict) and fcf.get("facet"):
                    fname = facet_field_name(type_name, field, fcf)
                    d = dynamic_field_def(fname)
                    if d is None:
                        raise ValueError(
                            f"facet field {fname} matches no dynamic-field pattern"
                        )
                    derived.append({"name": fname, **d})
        schema["derived"] = derived
    return schema


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


def _norm_via(hops: list) -> list[dict]:
    """Normalize a via chain: bare property strings become hop dicts."""
    return [{"property": h} if isinstance(h, str) else dict(h) for h in hops]


def facet_fields(
    items: DataFrame, edges: DataFrame, type_name: str, type_cf: dict
) -> DataFrame:
    """A8 data path: emit ``(id, facet_field, value)`` rows for every
    facet-configured field of one type, named via ``facetFieldName`` so
    each row's field resolves against the dynamic-field registry (the
    reference's ``this.solr[facetField] = facet``,
    ``lib/ROCrateIndexer.js:483-499``). Facet values follow ``makeFacet``
    (``:732-764``): ``tokenize`` splits the raw value; otherwise the
    facet is the resolved/flattened ``this.solr[index_as]`` value — so
    the value source dispatches EXACTLY like compile_type_pipeline's
    resolve dispatch: ``resolve: "single"`` facets the single resolved
    target, a dict-valued resolve follows its via chain and emits its
    configured display field, and plain/multi resolve facets every
    resolved name. A facet name matching no registry pattern raises at
    compile time — Solr would reject the undeclared field at index
    time."""
    base = items.where(F.array_contains(F.col("types"), type_name))
    base_ids = base.select("id")
    outs: list[DataFrame] = []
    for field, fcf in type_cf.items():
        if not isinstance(fcf, dict) or not fcf.get("facet"):
            continue
        fname = facet_field_name(type_name, field, fcf)
        if dynamic_field_def(fname) is None:
            raise ValueError(f"facet field {fname} matches no dynamic-field pattern")
        fc = fcf["facet"]
        if isinstance(fc, dict) and "tokenize" in fc:
            delim = fc["tokenize"].get("delim", ",")
            rows = base.select(
                "id", F.explode(ops.facet_tokenize(field, delim)).alias("value")
            )
        elif "resolve" in fcf:
            res = fcf["resolve"]
            if isinstance(res, dict):
                # dict form: follow the field, then the via chain, facet
                # the configured display field (criminals config shape)
                via = [{"property": field}] + _norm_via(res.get("via", []))
                r = ops.resolve_via(
                    items, edges, via, "_v", display=res.get("display", "name")
                ).join(base_ids, "id", "left_semi")
            elif res == "single":
                r = ops.resolve_single(items, edges, field, "_v").join(
                    base_ids, "id", "left_semi"
                )
            else:
                r = ops.resolve(items, edges, field, "_v").join(
                    base_ids, "id", "left_semi"
                )
            rows = r.select("id", F.col("_v").alias("value"))
        else:
            rows = base.where(F.col(field).isNotNull()).select(
                "id", F.col(field).alias("value")
            )
        outs.append(rows.select("id", F.lit(fname).alias("facet_field"), "value"))
    if not outs:
        return items.select(
            "id",
            F.lit(None).cast("string").alias("facet_field"),
            F.lit(None).cast("string").alias("value"),
        ).limit(0)
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


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
    ``resolve: multi|single`` (+ ``reverse``), dict-valued ``resolve``
    (``{"display", "search", "via"}`` — the criminals config's form,
    ``test-data/criminals/indexer.json:57-71``), ``via`` chains, clause
    ARRAYS (``match``/``index_as`` — B10), ``inherit`` (from root), and
    nested ``cf['@reverse']`` blocks composing reverse + via chains
    (``lib/ROCrateIndexer.js:359-367``; the criminals reverseSentence
    chain, ``indexer.json:73-83``).
    """
    base = items.where(F.array_contains(F.col("types"), type_name))
    base_ids = base.select("id")
    outs: list[DataFrame] = []

    def long(df: DataFrame, field: str, value: Column) -> DataFrame:
        return df.select(F.col("id"), F.lit(field).alias("field"), value.alias("value"))

    norm_via = _norm_via

    for field, fcf in type_cf.items():
        if field == "@reverse" and isinstance(fcf, dict):
            # one reverse hop per configured incoming property, composed
            # with that property's resolve-via chain
            for rprop, rcf in fcf.items():
                r_index_as = rcf.get("index_as", rprop)
                rres = rcf.get("resolve") or {}
                rres = rres if isinstance(rres, dict) else {}
                via = [{"property": rprop, "reverse": True}] + norm_via(
                    rres.get("via", [])
                )
                r = ops.resolve_via(
                    items, edges, via, r_index_as,
                    display=rres.get("display", "name"),
                ).join(base_ids, "id", "left_semi")
                outs.append(long(r, r_index_as, F.col(r_index_as)))
            continue
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
            res = fcf["resolve"]
            if isinstance(res, dict):
                # dict form: follow the field itself, then the optional
                # via chain, emitting the configured display field
                via = [{"property": field}] + norm_via(res.get("via", []))
                r = ops.resolve_via(
                    items, edges, via, index_as, display=res.get("display", "name")
                ).join(base_ids, "id", "left_semi")
            else:
                fn = ops.resolve_single if res == "single" else ops.resolve
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
