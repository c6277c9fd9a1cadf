"""Facet counts + filter queries (Solr facet semantics, SURVEY.md §2.C8-C10).

The reference derives facet fields from its field config
(``lib/ROCrateIndexer.js:111-114``, names ``{Type}_{field}_facet[multi]``)
and the portal requests facet counts with limit 5 by default
(``config.json:30-32``, ``oni-indexer.js:558-614``). Counts here are
ordinary hash aggregations; Catalyst's partial aggregation makes them one
small shuffle, and exact-match drill-down filters push down to the
parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    df: DataFrame, field: str, limit: int = 5, multi: bool = False
) -> DataFrame:
    """Top-N facet values by count: ``(value, count)``, ties broken by
    value asc (deterministic, oracle-matchable). ``multi=True`` explodes
    array-valued facet columns (Solr ``*_facetmulti``)."""
    col = F.explode(F.col(field)) if multi else F.col(field)
    return (
        df.select(col.alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(limit)
    )


def filter_query(df: DataFrame, filters: dict[str, str]) -> DataFrame:
    """Solr ``fq`` drill-down: conjunction of exact matches (C9)."""
    out = df
    for c, v in filters.items():
        out = out.where(F.col(c) == v)
    return out


def id_lookup(df: DataFrame, doc_id: int) -> DataFrame:
    """Exact-id record view (C10) — min/max + bloom skipping at scale."""
    return df.where(F.col("doc_id") == doc_id)
