"""Corpus loading + deterministic synthesis.

Engine input contract (BASELINE.json ``input_hint``): a table
``documents(repo string, path string, commit string, lang string,
content string)`` — the Spark-native analogue of the reference's OCFL
objects + loaded full-text payloads (``oni-indexer.js:441-467``,
``lib/ROCrateIndexer.js:801-816``).

Two providers:

- :func:`from_driver_documents` — adapts the driver's synthetic
  ``documents.parquet`` ``(doc_id, text, lang, source, n_chars)`` into the
  hint shape, keeping the driver's ``doc_id`` so DuckDB oracles can join.
- :func:`synth_documents` — a fully deterministic generator (seed 42, no
  wall clock / RNG state: every value derives from ``xxhash64(seed, i)``),
  mirroring the reference's synthetic corpus generator
  (``lib/randomize.js:52-219``, ``random.js``) but reproducible, with a
  Zipf-skewed vocabulary so hot terms exercise the skew path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLUMNS = ["doc_id", "repo", "path", "commit", "lang", "content"]

# Deterministic synthetic vocabulary: a code/SQL-flavoured head (hot,
# stop-word-like) plus generated identifier tails.
_VOCAB_HEAD = [
    "the", "scan", "join", "hash", "sort", "merge", "table", "order",
    "batch", "stream", "window", "key", "part", "spark", "small", "fast",
    "dup", "index", "query", "term",
]


def from_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents.parquet to the input-hint shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
    )


def deposit_corpus(
    docs: DataFrame,
    path: str,
    namespace: str = "public_ocfl",
    partition_by: tuple[str, ...] = ("repo",),
) -> DataFrame:
    """A13 corpus deposit (``ro-crate-deposit.js:29-59``): import a
    generated corpus into the repository layout, minting namespaced
    identifiers — CTAS into a partitioned parquet table. The reference
    mints random uuids; we mint DETERMINISTIC ids (md5 over the object's
    identity triple under the configured namespace,
    ``config.json:identifierNamespace``) so deposits are reproducible and
    idempotent. Returns the deposited table (read back from ``path``)."""
    out = docs.withColumn(
        "identifier",
        F.concat(
            F.lit(namespace),
            F.lit("/"),
            F.md5(F.concat_ws(":", F.col("repo"), F.col("path"), F.col("commit"))),
        ),
    )
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    return docs.sparkSession.read.parquet(path)


def synth_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, n_repos: int | None = None
) -> DataFrame:
    """Deterministic (repo, path, commit, lang, content) corpus.

    Every value is a pure function of ``xxhash64(seed, i, slot)``; content
    is 20-400 tokens with a Zipf-ish head (hot terms) plus code-shaped
    identifiers (``tok_<n>``, ``snake_case_<n>``) to exercise the
    tokenizer and the skew handling.
    """
    if n_repos is None:
        n_repos = max(4, n_docs // 200)
    n_head = len(_VOCAB_HEAD)
    head_arr = F.array(*[F.lit(w) for w in _VOCAB_HEAD])

    df = spark.range(n_docs).withColumnRenamed("id", "i")

    def h(*cols):
        return F.abs(F.xxhash64(F.lit(seed), *cols))

    # Zipf-skewed repo id: square the uniform fraction so low repo ids are hot.
    repo_frac = (h(F.col("i"), F.lit("repo")) % 1000000) / 1000000.0
    repo_id = F.floor(repo_frac * repo_frac * n_repos).cast("int")
    exts = F.array(F.lit("py"), F.lit("js"), F.lit("java"), F.lit("md"), F.lit("txt"))
    langs = F.array(
        F.lit("python"), F.lit("javascript"), F.lit("java"), F.lit("markdown"), F.lit("text")
    )
    ext_ix = (h(F.col("i"), F.lit("ext")) % 5 + 1).cast("int")

    n_toks = (20 + h(F.col("i"), F.lit("len")) % 381).cast("int")
    # Token j of doc i: with p~0.7 a Zipf-ish head word, else an identifier.
    tok_seq = F.transform(
        F.sequence(F.lit(1), n_toks),
        lambda j: F.when(
            h(F.col("i"), j, F.lit("p")) % 10 < 7,
            # Zipf-ish: square the fraction to concentrate on low ranks.
            F.element_at(
                head_arr,
                (
                    F.floor(
                        F.pow((h(F.col("i"), j, F.lit("w")) % 1000000) / 1000000.0, 2.0)
                        * n_head
                    )
                    + 1
                ).cast("int"),
            ),
        ).otherwise(
            F.concat(
                F.when(h(F.col("i"), j, F.lit("k")) % 2 == 0, F.lit("tok_")).otherwise(
                    F.lit("snake_case_")
                ),
                (h(F.col("i"), j, F.lit("id")) % (n_docs // 4 + 50)).cast("string"),
            )
        ),
    )

    return df.select(
        F.col("i").alias("doc_id"),
        F.format_string("repo%04d", repo_id).alias("repo"),
        F.format_string("src/m%d/f%d.%s", (h(F.col("i"), F.lit("d")) % 64).cast("int"), F.col("i"),
                        F.element_at(exts, ext_ix)).alias("path"),
        F.substring(F.sha2(F.concat_ws(":", F.lit(seed), F.col("i")), 256), 1, 40).alias("commit"),
        F.element_at(langs, ext_ix).alias("lang"),
        F.array_join(tok_seq, " ").alias("content"),
    )
