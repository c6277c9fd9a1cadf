"""Solr result grouping / field collapse (``group.field`` — the portal
groups search hits by their parent collection/repository the same way;
Solr's grouping component returns the top N groups each with its top M
documents).

Semantics mirrored from Solr's grouping component defaults:

- documents rank WITHIN a group by relevance — ``(round(score, 6)
  desc, doc_id asc)``, the engine's standard tie-break grid;
- groups rank by the relevance of their BEST document (Solr's default
  ``group.sort = sort = score desc``), ties broken by the best doc's
  id asc (deterministic, oracle-matchable);
- ``docs_per_group`` (Solr ``group.limit``) and ``k_groups`` (``rows``)
  cap both levels; docs with a NULL group value form their own group
  (Solr keeps a null group), carried through the joins on an internal
  non-null key and emitted back as NULL.

Scale shape: the scored match set joins its group key from doclen, then
ONE shuffle by group key feeds both window functions (within-group rank
and per-group best) — group cardinality never reaches the driver; the
group-level cap is a TakeOrdered over one row per group, broadcast back
to pick the members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_indexer_spark.index.build import IndexTables
from oni_indexer_spark.query.bm25 import searcher_for
from oni_indexer_spark.query.paging import _full_scores

#: internal stand-in for the NULL group (join keys must be non-null;
#: \x00 cannot appear in a metadata value)
_NULL_KEY = "\x00<null>"


def group_topk(
    tables: IndexTables,
    query: str,
    group_field: str,
    k_groups: int = 10,
    docs_per_group: int = 3,
    mode: str = "or",
    fq: dict | None = None,
    slop: int = 0,
) -> DataFrame:
    """Top ``k_groups`` groups by best-doc relevance, each with its top
    ``docs_per_group`` documents: ``(grp_rank, grp, rank, doc_id,
    score)`` where ``rank`` is the document's 1-based position within
    its group."""
    s = searcher_for(tables)
    scored = _full_scores(s, query, mode, fq, slop)
    if scored is None:
        from oni_indexer_spark.query.bm25 import _empty_literal

        return _empty_literal(
            tables.doclen.sparkSession,
            "grp_rank int, grp string, rank int, doc_id long, score double",
        )
    scored = scored.join(
        tables.doclen.select(
            "doc_id",
            F.coalesce(
                F.col(group_field).cast("string"), F.lit(_NULL_KEY)
            ).alias("gk"),
        ),
        "doc_id",
        "left",
    ).withColumn("gk", F.coalesce(F.col("gk"), F.lit(_NULL_KEY)))
    from pyspark.sql import Window as W

    in_group = W.partitionBy("gk").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(in_group)).where(
        F.col("rank") <= docs_per_group
    )
    # one row per group: its best doc defines the group's rank key
    heads = ranked.where(F.col("rank") == 1).select(
        "gk", F.round("score", 6).alias("g_score"), F.col("doc_id").alias("g_doc")
    )
    top_groups = heads.orderBy(F.desc("g_score"), F.asc("g_doc")).limit(k_groups)
    w_all = W.orderBy(F.desc("g_score"), F.asc("g_doc"))
    grp_ranked = top_groups.withColumn("grp_rank", F.row_number().over(w_all)).select(
        "gk", "grp_rank"
    )
    return (
        ranked.join(F.broadcast(grp_ranked), "gk")
        .select(
            "grp_rank",
            F.when(F.col("gk") == _NULL_KEY, F.lit(None).cast("string"))
            .otherwise(F.col("gk"))
            .alias("grp"),
            "rank",
            "doc_id",
            "score",
        )
        .orderBy("grp_rank", "rank")
    )
