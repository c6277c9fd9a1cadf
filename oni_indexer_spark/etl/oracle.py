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
