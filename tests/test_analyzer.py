"""The three tokenizer implementations (JVM expr, Arrow UDF, driver-side
Python) and the DuckDB oracle expression must agree exactly — this is the
foundation of every oracle comparison (analogue of the reference's Solr
``text_en`` analyzer contract, schema.json:5)."""

import duckdb
from pyspark.sql import functions as F

from oni_indexer_spark.analyzer import (
    duckdb_tokens_sql,
    query_terms,
    tokenize_py,
    tokens_col,
    tokens_pandas,
)

CASES = [
    "Hello World",
    "camelCase snake_case UPPER lower123",
    "def foo(x, y): return x*y  # comment",
    "",
    "   ",
    "a-b.c_d e__f 0x1F 42",
    "unicode: café naïve 日本語 emoji 🎉 mixed",
    "SELECT * FROM t WHERE a='x' AND b>=2",
]


def test_py_matches_duckdb():
    for s in CASES:
        got = duckdb.sql(
            f"SELECT {duckdb_tokens_sql('t')} FROM (SELECT ? AS t)", params=[s]
        ).fetchone()[0]
        assert list(got) == tokenize_py(s), s


def test_spark_col_matches_py(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, t string")
    rows = df.select("i", tokens_col("t").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert r["toks"] == tokenize_py(CASES[r["i"]])


def test_spark_pandas_udf_matches_py(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, t string")
    rows = df.select("i", tokens_pandas("t").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert r["toks"] == tokenize_py(CASES[r["i"]])


def test_null_safe(spark):
    df = spark.createDataFrame([(1, None)], "i int, t string")
    assert df.select(tokens_col("t").alias("x")).collect()[0]["x"] == []


def test_query_terms_dedup_order():
    assert query_terms("Hash JOIN hash") == ["hash", "join"]
    assert query_terms("") == []
    assert query_terms("...") == []
