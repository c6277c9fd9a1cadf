"""Operational parity operators (SURVEY.md §2.A): purge, debug dump,
portal facet config, skip-list/limit, error quarantine.

These mirror the reference's operational surface around the core
pipeline: ``--purge`` (``oni-indexer.js:409-435``), per-doc debug dumps
(``oni-indexer.js:496-501``), portal facet config generation
(``oni-indexer.js:558-614``), skip-list/limit (``oni-indexer.js:150-156,
198-200``) and the malformed-doc quarantine (``oni-indexer.js:168-194``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_index(path: str) -> None:
    """Delete a built index for a clean rebuild (the reference's
    delete-by-query ``*:*`` + ``--purge`` flag). Removes data and
    lineage so the next build starts fresh."""
    for sub in ("postings", "doclen", "dfreq", "stats", "tf_stage", "_lineage"):
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)


def dump_docs(df: DataFrame, dump_dir: str, limit: int | None = None) -> None:
    """Debug sink: write docs as JSON lines (the reference pretty-prints
    one file per doc; a JSON dataset is the distributed equivalent)."""
    out = df if limit is None else df.limit(limit)
    out.write.mode("overwrite").json(dump_dir)


def apply_skip_and_limit(
    docs: DataFrame,
    skip_ids: list | None = None,
    limit: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """B22: drop skip-listed ids, cap at N records. The limit is applied
    on doc_id order (deterministic), not arbitrary partition order."""
    out = docs
    if skip_ids:
        out = out.where(~F.col(id_col).isin(list(skip_ids)))
    if limit is not None:
        out = out.orderBy(id_col).limit(limit)
    return out


def quarantine_invalid(
    docs: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> tuple[DataFrame, DataFrame]:
    """B23: split (good, quarantined). A malformed row (null id, null
    content, duplicate id) never fails the job — it lands in the
    quarantine frame with a reason column, mirroring the reference's
    per-doc try/catch + error dump."""
    dup = (
        docs.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > 1)
        .select(F.col(id_col).alias("_dup_id"))
    )
    tagged = docs.join(
        F.broadcast(dup), docs[id_col] == F.col("_dup_id"), "left"
    ).withColumn(
        "quarantine_reason",
        F.when(F.col(id_col).isNull(), "null_id")
        .when(F.col(content_col).isNull(), "null_content")
        .when(F.col("_dup_id").isNotNull(), "duplicate_id")
        .otherwise(F.lit(None)),
    ).drop("_dup_id")
    good = tagged.where(F.col("quarantine_reason").isNull()).drop("quarantine_reason")
    bad = tagged.where(F.col("quarantine_reason").isNotNull())
    return good, bad


def make_portal_facets(
    facet_fields: dict[str, dict], existing: dict | None = None
) -> dict:
    """A11: regenerate the portal facet config from the engine config —
    add newly configured facets, drop stale ones, keep per-facet
    overrides (sort/limit) of surviving entries."""
    existing = existing or {}
    out: dict[str, dict] = {}
    for name, cf in facet_fields.items():
        base = {"field": name, "label": cf.get("label", name.title()),
                "limit": cf.get("limit", 5), "sort": cf.get("sort", "count")}
        if name in existing:
            base.update({k: v for k, v in existing[name].items() if k in ("sort", "limit")})
        out[name] = base
    return out


def write_portal_facets(path: str, facets: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(facets, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)
