"""DuckDB oracle SQL for the §2.B ETL parity operators, over the same
VALUES fixture the Spark side builds (etl/fixture.sql_cte)."""

from __future__ import annotations

from oni_indexer_spark.etl.fixture import ROOT_ID, sql_cte


def filter_type_regex_sql() -> str:
    return f"""{sql_cte()}
SELECT id, name FROM items
WHERE list_contains(types, 'Dataset') AND regexp_matches(name, 'corpus$')
""".strip()


def resolve_author_sql() -> str:
    return f"""{sql_cte()}
SELECT i.id AS id, t.name AS author, e.dst AS author_id
FROM items i
JOIN edges e ON i.id = e.src AND e.property = 'author'
JOIN items t ON e.dst = t.id
""".strip()


def resolve_via_sql() -> str:
    return f"""{sql_cte()}
SELECT i.id AS id, t.name AS conviction_location, e2.dst AS conviction_location_id
FROM items i
JOIN edges e1 ON i.id = e1.src AND e1.property = 'conviction'
JOIN edges e2 ON e1.dst = e2.src AND e2.property = 'location'
JOIN items t ON e2.dst = t.id
""".strip()


def reverse_location_sql() -> str:
    return f"""{sql_cte()}
SELECT i.id AS id, t.name AS located_sentence, e.src AS located_sentence_id
FROM items i
JOIN edges e ON i.id = e.dst AND e.property = 'location'
JOIN items t ON e.src = t.id
""".strip()


def inherit_license_sql() -> str:
    return f"""{sql_cte()}
SELECT id, coalesce(license, (SELECT license FROM items WHERE id = '{ROOT_ID}')) AS license
FROM items
""".strip()


LICENSE_RULES = [
    ("^https://creativecommons.org/licenses/by", "CC-BY"),
    ("^custom", "Custom"),
]
LICENSE_DEFAULT = "All rights reserved"


def license_map_sql() -> str:
    cases = " ".join(
        f"WHEN regexp_matches(license, '{pat}') THEN '{label}'"
        for pat, label in LICENSE_RULES
    )
    return f"""{sql_cte()}
SELECT id,
  CASE WHEN license IS NULL THEN '{LICENSE_DEFAULT}' {cases}
       ELSE '{LICENSE_DEFAULT}' END AS license,
  license AS licenseOriginal
FROM items
""".strip()


def validate_date_sql() -> str:
    return f"""{sql_cte()}
SELECT id,
  coalesce(regexp_extract(date_published, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1), '') AS date_valid
FROM items
""".strip()


def facet_tokenize_sql() -> str:
    return f"""{sql_cte()}
SELECT id, unnest(list_filter(list_transform(str_split(keywords, ','), x -> trim(x)), x -> x != '')) AS keyword
FROM items
""".strip()


def year_published_sql() -> str:
    return f"""{sql_cte()}
SELECT id, substr(date_published, 1, 4) AS yearPublished FROM items
WHERE date_published IS NOT NULL
""".strip()


def uri_id_sql(namespace: str = "https://repo.example.org") -> str:
    ns = namespace.rstrip("/")
    return f"""{sql_cte()}
SELECT id,
  CASE WHEN name IS NOT NULL THEN '{ns}/' || name ELSE md5(id) END AS uri_id
FROM items
""".strip()


def resolve_single_sql() -> str:
    return f"""{sql_cte()}
SELECT id, author, author_id FROM (
  SELECT i.id AS id, t.name AS author, e.dst AS author_id,
         row_number() OVER (PARTITION BY i.id ORDER BY e.dst ASC) AS rn
  FROM items i
  JOIN edges e ON i.id = e.src AND e.property = 'author'
  JOIN items t ON e.dst = t.id
) WHERE rn = 1
""".strip()


def map_all_sql() -> str:
    return f"""{sql_cte()}
SELECT id, id AS id_orig, types[1] AS record_type_s, types[1] AS type_label,
       name, description
FROM items
""".strip()


def type_dispatch_sql() -> str:
    # config: Dataset (no filter), Person (name must contain 'a'); first
    # matching type wins, so d3 counts once under Dataset.
    return f"""{sql_cte()}
SELECT record_type_s, count(*)::bigint AS n FROM (
  SELECT id, 'Dataset' AS record_type_s FROM items WHERE list_contains(types, 'Dataset')
  UNION ALL
  SELECT id, 'Person' FROM items
  WHERE list_contains(types, 'Person') AND NOT list_contains(types, 'Dataset')
        AND regexp_matches(name, 'a')
) GROUP BY record_type_s
""".strip()


def match_multi_sql() -> str:
    # B10 FOR/SEO split of 'about' (doc/Solr_config.md §match): one
    # SELECT per clause over the resolved values, UNION ALL so a value
    # matching several clauses indexes once per clause.
    return f"""{sql_cte()}
, j AS (
  SELECT e.src AS id, i.name AS value, i.id AS value_id
  FROM edges e JOIN items i ON i.id = e.dst
  WHERE e.property = 'about'
)
SELECT id, 'FOR' AS index_as, value, value_id FROM j WHERE regexp_matches(value_id, 'anzsrc-for')
UNION ALL
SELECT id, 'SEO' AS index_as, value, value_id FROM j WHERE regexp_matches(value_id, 'anzsrc-seo')
""".strip()


def _crate_lit() -> str:
    from oni_indexer_spark.etl.fixture import jsonld_crate

    return jsonld_crate().replace("'", "''")


def _crate_items_cte() -> str:
    return f"""WITH raw AS (SELECT '{_crate_lit()}'::json AS j),
g AS (SELECT unnest(json_extract(j, '$."@graph"[*]')) AS item FROM raw)"""


def ingest_items_sql() -> str:
    # A2: same JSON-LD literal parsed with DuckDB's JSON functions;
    # types joined to a scalar (the driver canonicalizer sorts/hashes
    # scalars only).
    return f"""{_crate_items_cte()}
SELECT item->>'@id' AS id,
  CASE WHEN json_type(item, '$."@type"') = 'ARRAY'
       THEN array_to_string(json_extract_string(item, '$."@type"[*]'), ',')
       ELSE item->>'@type' END AS types,
  item->>'name' AS name,
  item->>'description' AS description,
  coalesce(item->'license'->>'@id', item->>'license') AS license,
  item->>'datePublished' AS date_published,
  item->>'keywords' AS keywords
FROM g
""".strip()


def ingest_edges_sql() -> str:
    return f"""{_crate_items_cte()},
f AS (SELECT item, unnest(json_keys(item)) AS property FROM g),
v AS (SELECT item, property,
        (CASE WHEN json_type(item, '$."'||property||'"') = 'ARRAY'
             THEN json_extract(item, '$."'||property||'"')
             ELSE json_array(json_extract(item, '$."'||property||'"')) END)::json[] AS vals
      FROM f WHERE property NOT IN ('@id')),
e AS (SELECT item->>'@id' AS src, property, unnest(vals) AS val FROM v)
SELECT src, property, val->>'@id' AS dst FROM e WHERE val->>'@id' IS NOT NULL
""".strip()


def unwrap_json_sql(prop: str = "address", index_as: str = "address_display") -> str:
    # B7 unwrap with JSON-stringify fallback: name when present, else the
    # whole entity minified (key order pre-sorted in the fixture crate so
    # Spark's variant re-serialization is byte-identical).
    return f"""{_crate_items_cte()},
f AS (SELECT item, unnest(json_keys(item)) AS property FROM g),
v AS (SELECT item, property,
        (CASE WHEN json_type(item, '$."'||property||'"') = 'ARRAY'
             THEN json_extract(item, '$."'||property||'"')
             ELSE json_array(json_extract(item, '$."'||property||'"')) END)::json[] AS vals
      FROM f WHERE property NOT IN ('@id')),
e AS (SELECT item->>'@id' AS src, property, unnest(vals) AS val FROM v),
edges AS (SELECT src, property, val->>'@id' AS dst FROM e WHERE val->>'@id' IS NOT NULL)
SELECT edges.src AS id,
       coalesce(t.item->>'name', json_extract(t.item, '$')::varchar) AS {index_as},
       edges.dst AS {index_as}_id
FROM edges JOIN g t ON t.item->>'@id' = edges.dst
WHERE edges.property = '{prop}'
""".strip()


def config_pipeline_sql() -> str:
    # B1: the compiled Dataset pipeline's long-format rows — one UNION
    # branch per configured field, mirroring compile_type_pipeline's
    # dispatch (name copy, author resolve, FOR/SEO match split,
    # datePublished validate, keywords facet-tokenize, hasPart skipped).
    return f"""{sql_cte()},
ds AS (SELECT * FROM items WHERE list_contains(types, 'Dataset'))
SELECT id, 'name' AS field, name AS value FROM ds WHERE name IS NOT NULL
UNION ALL
SELECT i.id, 'author', t.name
FROM ds i JOIN edges e ON e.src = i.id AND e.property = 'author'
JOIN items t ON t.id = e.dst
UNION ALL
SELECT i.id, 'FOR', t.name
FROM ds i JOIN edges e ON e.src = i.id AND e.property = 'about'
JOIN items t ON t.id = e.dst WHERE regexp_matches(t.id, 'anzsrc-for')
UNION ALL
SELECT i.id, 'SEO', t.name
FROM ds i JOIN edges e ON e.src = i.id AND e.property = 'about'
JOIN items t ON t.id = e.dst WHERE regexp_matches(t.id, 'anzsrc-seo')
UNION ALL
SELECT id, 'datePublished',
  coalesce(regexp_extract(date_published, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1), '')
FROM ds
UNION ALL
SELECT id, 'keywords',
  unnest(list_filter(list_transform(str_split(keywords, ','), x -> trim(x)), x -> x != ''))
FROM ds
""".strip()


def resolve_fixpoint_sql(seed: str = ROOT_ID, max_iters: int = 20) -> str:
    # B14: BFS min-depth reachability as a recursive CTE (the intended
    # transitive-closure semantics of the reference's resolvedItemsToIndex
    # queue). Traversal is restricted to ids that exist as items IN THE
    # RECURSIVE TERM (and the seed must be an item), exactly like the
    # engine's per-hop left_semi — a dangling @id has no item to index
    # and is not traversed THROUGH either, so engine and oracle agree on
    # graphs with non-item intermediate nodes.
    return f"""{sql_cte().replace("WITH items", "WITH RECURSIVE items", 1)},
reach(id, depth) AS (
  SELECT id, 0 FROM items WHERE id = '{seed}'
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r
  JOIN edges e ON e.src = r.id
  JOIN items i2 ON i2.id = e.dst
  WHERE r.depth < {max_iters}
)
SELECT r.id, min(r.depth)::int AS depth
FROM reach r
GROUP BY r.id
""".strip()


def resolve_json_sql() -> str:
    # B11 JSON-facet form: json_object argument order mirrors the
    # engine's struct field order, so the serialized strings match
    # byte-for-byte.
    return f"""{sql_cte()}
SELECT i.id AS id,
       json_object('@id', t.id, 'display', t.name, 'search', t.id)::varchar AS author
FROM items i
JOIN edges e ON i.id = e.src AND e.property = 'author'
JOIN items t ON e.dst = t.id
""".strip()


def geofilt_sql(lat: float, lon: float, d_km: float) -> str:
    # geo resolve + Solr geofilt: identical haversine expression order so
    # the rounded distances match bit-for-bit.
    return f"""{sql_cte()},
geo AS (
  SELECT i.id AS id,
    regexp_extract(e.dst, '^#(-?[0-9.]+),(-?[0-9.]+)$', 1)::double AS latitude,
    regexp_extract(e.dst, '^#(-?[0-9.]+),(-?[0-9.]+)$', 2)::double AS longitude
  FROM items i JOIN edges e ON i.id = e.src AND e.property = 'geo'
  WHERE regexp_matches(e.dst, '^#(-?[0-9.]+),(-?[0-9.]+)$')
),
d AS (
  SELECT id, latitude, longitude,
    round(2 * 6371.0 * asin(sqrt(
      sin(radians(latitude - {float(lat)}) / 2) * sin(radians(latitude - {float(lat)}) / 2)
      + cos(radians({float(lat)})) * cos(radians(latitude))
        * sin(radians(longitude - {float(lon)}) / 2) * sin(radians(longitude - {float(lon)}) / 2)
    )), 6) AS dist_km
  FROM geo
)
SELECT id, latitude, longitude, dist_km FROM d WHERE dist_km <= {float(d_km)}
""".strip()


def resolve_via_includes_sql() -> str:
    # B12 'includes' hop option: only follow 'about' targets that are
    # DefinedTerms whose name matches /Intelligence/.
    return f"""{sql_cte()}
SELECT i.id AS id, t.name AS subject, e.dst AS subject_id
FROM items i
JOIN edges e ON i.id = e.src AND e.property = 'about'
JOIN items t ON e.dst = t.id
WHERE list_contains(t.types, 'DefinedTerm') AND regexp_matches(t.name, 'Intelligence')
""".strip()


def resolve_subgraph_sql() -> str:
    # B12 store_subgraph: every item passed through the conviction ->
    # location chain, with its hop index.
    return f"""{sql_cte()}
SELECT i.id AS id, t.name AS ctx, e1.dst AS ctx_id, 1 AS hop
FROM items i
JOIN edges e1 ON i.id = e1.src AND e1.property = 'conviction'
JOIN items t ON e1.dst = t.id
UNION ALL
SELECT i.id, t.name, e2.dst, 2
FROM items i
JOIN edges e1 ON i.id = e1.src AND e1.property = 'conviction'
JOIN edges e2 ON e1.dst = e2.src AND e2.property = 'location'
JOIN items t ON e2.dst = t.id
""".strip()


def reverse_via_sql() -> str:
    # nested cf['@reverse'] block (criminals reverseSentence shape,
    # test-data/criminals/indexer.json:73-83): reverse hop 'author'
    # (datasets that reference the person) then forward 'about' — long
    # (id, field, value) rows like the pipeline compiler emits.
    return f"""{sql_cte()}
SELECT p.id AS id, 'reverseWorksAbout' AS field, t.name AS value
FROM items p
JOIN edges e1 ON e1.dst = p.id AND e1.property = 'author'
JOIN edges e2 ON e2.src = e1.src AND e2.property = 'about'
JOIN items t ON t.id = e2.dst
WHERE list_contains(p.types, 'Person')
""".strip()


def facet_multi_sql() -> str:
    # A8 facetFieldName data path: Dataset keywords tokenized under
    # Dataset_keywords_facetmulti; Dataset author resolved names under
    # Dataset_author_facetmulti; Dataset hasPart (resolve:"single")
    # facets the ONE resolved value under Dataset_hasPart_facet (facet
    # default = resolved values, lib/ROCrateIndexer.js:732-764, and the
    # value source dispatches by resolve arity like makeFacet's
    # this.solr[index_as]).
    return f"""{sql_cte()},
kw AS (
  SELECT id, 'Dataset_keywords_facetmulti' AS facet_field,
         trim(u.tok) AS value
  FROM items, unnest(string_split(keywords, ',')) AS u(tok)
  WHERE list_contains(types, 'Dataset') AND keywords IS NOT NULL
        AND trim(u.tok) <> ''
),
au AS (
  SELECT i.id AS id, 'Dataset_author_facetmulti' AS facet_field,
         t.name AS value
  FROM items i
  JOIN edges e ON i.id = e.src AND e.property = 'author'
  JOIN items t ON e.dst = t.id
  WHERE list_contains(i.types, 'Dataset')
),
hp AS (
  SELECT id, 'Dataset_hasPart_facet' AS facet_field, value FROM (
    SELECT i.id AS id, t.name AS value,
           row_number() OVER (PARTITION BY i.id ORDER BY e.dst ASC) AS rn
    FROM items i
    JOIN edges e ON i.id = e.src AND e.property = 'hasPart'
    JOIN items t ON e.dst = t.id
    WHERE list_contains(i.types, 'Dataset')
  ) WHERE rn = 1
)
SELECT * FROM kw UNION ALL SELECT * FROM au UNION ALL SELECT * FROM hp
""".strip()


def schema_dynamic_fields_sql() -> str:
    # A8 schema generation: the golden field/dynamicfield/copyfield rows
    # the reference's buildSchema+updateSchema would post to Solr's
    # schema API (oni-indexer.js:270-348), pinned to schema.json's shape.
    rows = []
    for name, typ in [
        ("name", "text_general"), ("type", "string"), ("description", "text_en"),
    ]:
        rows.append(f"('field', '{name}', '{typ}', false, NULL, NULL)")
    for name, typ in [("main_search", "text_en"), ("yearPublished", "text_en")]:
        rows.append(f"('field', '{name}', '{typ}', true, NULL, NULL)")
    for pat, typ, multi in [
        ("*_name", "text_en", False), ("*_id", "text_en", True),
        ("*_description", "text_en", False), ("*_date", "text_en", False),
        ("*_datePublished", "text_en", False), ("*_dateCreated", "text_en", False),
        ("*_birthDate", "text_en", False), ("*_facetmulti", "string", True),
        ("*_facet", "string", False),
    ]:
        rows.append(
            f"('dynamicfield', '{pat}', '{typ}', {'true' if multi else 'false'}, NULL, NULL)"
        )
    for src in ["name", "description", "id"]:
        rows.append(f"('copyfield', NULL, NULL, false, '{src}', 'main_search')")
    rows.append("('copyfield', NULL, NULL, false, '*_datePublished', 'yearPublished')")
    vals = ",\n  ".join(rows)
    return (
        "SELECT * FROM (VALUES\n  " + vals + "\n) AS t(kind, name, type, multi, source, dest)"
    )
