"""Driver-side XXH64 must match Spark's xxhash64 bit-for-bit — the query
path relies on it for term→bucket partition pruning without a Spark job."""

from pyspark.sql import functions as F

from oni_indexer_spark.hashing import term_bucket_py, xxhash64_str

WORDS = [
    "the",
    "scan",
    "join",
    "hash",
    "a",
    "",
    "tok_123",
    "snake_case_7",
    "日本語",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "v" * 33,
    "u" * 100,
]

# Spot values captured from Spark 4.1.2 (xxhash64 default seed 42).
KNOWN = {
    "the": -7881039948661331430,
    "scan": 2297731803634519398,
    "join": 3716473979634878067,
    "hash": 8833079730388691208,
    "a": -8582455328737087284,
    "": -7444071767201028348,
    "tok_123": -3085628860594652958,
    "snake_case_7": 8582644990028420167,
    "日本語": -619341062884681239,
}


def test_known_values():
    for w, h in KNOWN.items():
        assert xxhash64_str(w) == h, w


def test_matches_spark_all_lengths(spark):
    rows = (
        spark.createDataFrame([(w,) for w in WORDS], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxhash64_str(r["t"]) == r["h"], r["t"]


def test_bucket_matches_spark(spark):
    from oni_indexer_spark.index.build import term_bucket

    rows = (
        spark.createDataFrame([(w,) for w in WORDS], "t string")
        .select("t", term_bucket(F.col("t"), 32).alias("b"))
        .collect()
    )
    for r in rows:
        assert term_bucket_py(r["t"], 32) == r["b"], r["t"]
