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


def test_text_en_three_way_parity(spark):
    import duckdb

    con = duckdb.connect()
    """text_en (stopwords + S-stem): Spark column expr == DuckDB SQL ==
    python twin, over strings exercising every stemmer branch."""
    from oni_indexer_spark.analyzer import (
        duckdb_tokens_text_en_sql,
        tokenize_text_en_py,
        tokens_text_en_col,
    )

    texts = [
        "The ponies and armies carried supplies into these cities",
        "he goes; she does: toes, shoes, classes pass thus",
        "a bus focus miss glass trees sees agrees",
        "Ladies_and_gentlemen is not a token but ladies are",
        None,
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got_spark = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_text_en_col("t").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        expected = tokenize_text_en_py(t)
        assert got_spark[i] == expected, (i, got_spark[i], expected)
        if t is not None:
            sql = f"SELECT {duckdb_tokens_text_en_sql('?')}"
            got_duck = con.execute(sql.replace("?", f"'{t}'")).fetchone()[0]
            assert got_duck == expected, (i, got_duck, expected)


def test_porter_stemmer_classic_vocab():
    """Spot-check the Porter implementation against the published
    examples from the 1980 paper (steps 1-5)."""
    from oni_indexer_spark.analyzer import porter_stem_py as p

    expected = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    bad = {w: (p(w), want) for w, want in expected.items() if p(w) != want}
    assert not bad, bad


def test_porter_pandas_matches_py(spark):
    from oni_indexer_spark.analyzer import (
        tokens_text_en_porter_pandas,
        tokenize_text_en_porter_py,
    )

    texts = ["Relational databases are generalizations of flat files",
             "the quick brown foxes jumped over lazy dogs repeatedly"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_text_en_porter_pandas("t").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize_text_en_porter_py(t)
