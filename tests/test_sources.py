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


def test_mint_ids_deterministic_and_partition_independent(spark, corpus_path):
    base = spark.read.parquet(corpus_path).drop("doc_id")
    a = with_doc_ids(base, strict=True)
    b = with_doc_ids(base.repartition(7, "path"), strict=True)
    rows_a = {r["path"]: r["doc_id"] for r in a.select("path", "doc_id").collect()}
    rows_b = {r["path"]: r["doc_id"] for r in b.select("path", "doc_id").collect()}
    assert rows_a == rows_b
    assert len(set(rows_a.values())) == 200


def test_strict_ids_raise_on_collision(spark, corpus_path):
    # two rows with the same identity triple hash to the same doc_id
    one = spark.read.parquet(corpus_path).drop("doc_id").limit(1)
    dup = one.union(one)
    with pytest.raises(ValueError, match="doc_id collision"):
        with_doc_ids(dup, strict=True)


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
