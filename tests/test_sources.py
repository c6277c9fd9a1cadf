"""Input-source dispatch (sources.py): Parquet loads + contract
validation + deterministic id minting; Iceberg branch error contract
(the runtime JAR is not in this sandbox — SURVEY.md §1.3 documents the
snapshot mapping, this pins the code path and its failure mode)."""

import pytest
from pyspark.sql import functions as F

from oni_indexer_spark.corpus import synth_documents
from oni_indexer_spark.sources import (
    load_documents,
    validate_documents,
    with_doc_ids,
)


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "documents.parquet")
    synth_documents(spark, 200).write.parquet(p)
    return p


def test_parquet_load_validates_and_keeps_doc_id(spark, corpus_path):
    df = load_documents(spark, corpus_path)
    assert df.columns == ["doc_id", "repo", "path", "commit", "lang", "content"]
    assert df.count() == 200


def test_missing_column_fails_fast(spark, corpus_path):
    df = spark.read.parquet(corpus_path).drop("lang")
    with pytest.raises(ValueError, match="missing=\\['lang'\\]"):
        validate_documents(df)


def test_mistyped_column_fails_fast(spark, corpus_path):
    df = spark.read.parquet(corpus_path).withColumn(
        "commit", F.col("commit").cast("int")
    )
    with pytest.raises(ValueError, match="mistyped="):
        validate_documents(df)


@pytest.mark.parametrize("strategy", ["dense", "hash64"])
def test_mint_ids_deterministic_and_partition_independent(
    spark, corpus_path, strategy
):
    base = spark.read.parquet(corpus_path).drop("doc_id")
    a = with_doc_ids(base, strategy=strategy, strict=True)
    b = with_doc_ids(base.repartition(7, "path"), strategy=strategy, strict=True)
    rows_a = {r["path"]: r["doc_id"] for r in a.select("path", "doc_id").collect()}
    rows_b = {r["path"]: r["doc_id"] for r in b.select("path", "doc_id").collect()}
    assert rows_a == rows_b
    assert len(set(rows_a.values())) == 200


def test_dense_ids_are_rank_of_identity_triple(spark, corpus_path):
    base = spark.read.parquet(corpus_path).drop("doc_id")
    got = with_doc_ids(base, strategy="dense").select(
        "repo", "path", "commit", "doc_id"
    ).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(200))
    by_rank = sorted(got, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in by_rank] == list(range(200))


def test_dense_ids_share_one_range_exchange(spark, corpus_path):
    # The per-partition offsets and the row_numbers must see the SAME
    # physical range partitioning: the range partitioner re-samples its
    # boundaries per exchange, so two independent shuffles could place
    # boundary rows in different partitions in the two branches
    # (duplicate/skipped ids). ReuseExchange proved fragile (column
    # pruning de-canonicalizes the branches on file sources — r5 VERDICT
    # #1), so the shuffle is now materialized ONCE via an eager
    # localCheckpoint before branching. Pin that: the minting plan must
    # read a checkpointed RDD and contain NO rangepartitioning exchange
    # of its own (both would re-sample boundaries).
    base = spark.read.parquet(corpus_path).drop("doc_id")
    out = with_doc_ids(base, strategy="dense")
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ExistingRDD" in plan
    assert "rangepartitioning" not in plan


def test_dense_ids_multi_partition_contiguity_100k(spark):
    # r5 VERDICT #1 "done" criterion: at >=100k rows over many input
    # partitions, dense ids must be exactly 0..n-1 (no duplicates, no
    # gaps) and identical across independent mints of differently
    # partitioned input — the failure mode of un-shared range shuffles
    # was boundary rows getting duplicate/skipped ids at scale.
    n = 100_000
    base = (
        spark.range(n)
        .select(
            F.concat(F.lit("repo-"), (F.col("id") % 7).cast("string")).alias("repo"),
            F.concat(F.lit("p/"), F.col("id").cast("string")).alias("path"),
            F.sha2(F.col("id").cast("string"), 256).alias("commit"),
        )
        .repartition(16)
    )
    a = with_doc_ids(base, strategy="dense")
    agg = a.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (n, n, 0, n - 1)
    b = with_doc_ids(base.repartition(3, "repo"), strategy="dense")
    ids_a = {r["path"]: r["doc_id"] for r in a.select("path", "doc_id").collect()}
    ids_b = {r["path"]: r["doc_id"] for r in b.select("path", "doc_id").collect()}
    assert ids_a == ids_b


def test_dense_ids_stable_across_reexecutions(spark, corpus_path):
    # every execution of the minting plan must yield identical ids (the
    # downstream index build triggers several actions over the same df)
    base = spark.read.parquet(corpus_path).drop("doc_id")
    out = with_doc_ids(base, strategy="dense").select("path", "doc_id")
    runs = [{r["path"]: r["doc_id"] for r in out.collect()} for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]
    assert sorted(runs[0].values()) == list(range(200))


@pytest.mark.parametrize("strategy", ["dense", "hash64"])
def test_strict_ids_raise_on_duplicate_triple(spark, corpus_path, strategy):
    # duplicate identity triples: hash64 collides outright; dense ids
    # would be order-unstable — strict rejects both
    one = spark.read.parquet(corpus_path).drop("doc_id").limit(1)
    dup = one.union(one)
    with pytest.raises(ValueError, match="doc_id collision"):
        with_doc_ids(dup, strategy=strategy, strict=True)


def test_time_travel_rejected_for_parquet(spark, corpus_path):
    with pytest.raises(ValueError, match="time travel"):
        load_documents(spark, corpus_path, snapshot_id=3)


def test_iceberg_branch_error_contract(spark):
    # dotted identifier dispatches to the iceberg reader; without the
    # runtime JAR / catalog the error must say what is missing
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_documents(spark, "warehouse.db.documents")


def test_both_snapshot_selectors_rejected(spark):
    with pytest.raises(ValueError, match="not both"):
        load_documents(
            spark, "warehouse.db.documents", snapshot_id=1, as_of_timestamp=2
        )
