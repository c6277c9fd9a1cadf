"""Deterministic sampling / splitting / sequence-packing operators for
training-data curation — the plumbing between a cleaned corpus and a
training run.

All three are pure column expressions (plus one windowed cumsum for
packing): scan-parallel, no Python UDFs, reproducible bit-for-bit across
engines via the portable md5-prefix hash (the same 32-bit convention the
dedup/minhash ops use), so "which doc landed in which split/sequence" is
auditable years later from the hash alone — the property a real pipeline
needs when a contamination question arrives after the model shipped.

Scale notes (100 TB):
- split / mixture: no shuffle at all — a filter/projection riding the
  scan, partition-pruned like any other predicate.
- pack_sequences: ONE hash-partitioned window cumsum. The pack is
  per-shard (shard = hash bucket), so there is no global-order
  bottleneck; each shard's window sorts locally after one exchange by
  shard id. Shards ≈ number of training-data writer tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oni_indexer_spark.analyzer import duckdb_tokens_sql, tokens_col
from oni_indexer_spark.ops.text import _portable_hash, portable_hash_sql

#: hash-bucket denominator for split/mixture assignment: the portable
#: 32-bit hash taken mod 1e6 gives ~1e-6 rate granularity
_BUCKETS = 1_000_000


def split_by_hash(
    docs: DataFrame, val_frac: float = 0.01, test_frac: float = 0.01, salt: str = "split"
) -> DataFrame:
    """(doc_id, split) with split ∈ {train, val, test} assigned by hash
    bucket — deterministic (same doc always lands in the same split, on
    any cluster, any run), leakage-free (membership depends only on
    doc_id + salt), and exact in expectation (bucket thresholds, not
    per-row RNG)."""
    b = F.pmod(_portable_hash(F.col("doc_id").cast("string"), seed=salt + ":"), F.lit(_BUCKETS))
    val_cut = int(val_frac * _BUCKETS)
    test_cut = val_cut + int(test_frac * _BUCKETS)
    return docs.select(
        "doc_id",
        F.when(b < val_cut, F.lit("val"))
        .when(b < test_cut, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def split_by_hash_sql(
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    salt: str = "split",
    table: str = "documents",
) -> str:
    h = portable_hash_sql("doc_id::varchar", seed=salt + ":")
    val_cut = int(val_frac * _BUCKETS)
    test_cut = val_cut + int(test_frac * _BUCKETS)
    return f"""
SELECT doc_id,
  CASE WHEN ({h}) % {_BUCKETS} < {val_cut} THEN 'val'
       WHEN ({h}) % {_BUCKETS} < {test_cut} THEN 'test'
       ELSE 'train' END AS split
FROM {table}
""".strip()


def mixture_sample(
    docs: DataFrame, rates: dict[str, float], default_rate: float = 0.0, salt: str = "mix"
) -> DataFrame:
    """Deterministic per-source downsampling to hit a training-mixture
    recipe: keep a doc from source s with probability ``rates[s]``
    (sources absent from ``rates`` use ``default_rate``). Returns the
    kept (doc_id, source). Rates are hash-bucket thresholds, so the
    realized fraction converges to the rate with no RNG state and the
    SAME docs survive on every run/cluster — reproducible mixtures."""
    b = F.pmod(_portable_hash(F.col("doc_id").cast("string"), seed=salt + ":"), F.lit(_BUCKETS))
    cut = F.lit(int(default_rate * _BUCKETS))
    for s, r in sorted(rates.items()):
        cut = F.when(F.col("source") == s, F.lit(int(r * _BUCKETS))).otherwise(cut)
    return docs.select("doc_id", "source").where(b < cut)


def mixture_sample_sql(
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
    table: str = "documents",
    source: str = "source",
) -> str:
    h = portable_hash_sql("doc_id::varchar", seed=salt + ":")
    whens = " ".join(
        f"WHEN {source} = '{s}' THEN {int(r * _BUCKETS)}"
        for s, r in sorted(rates.items())
    )
    return f"""
SELECT doc_id, {source} AS source
FROM {table}
WHERE ({h}) % {_BUCKETS} < (CASE {whens} ELSE {int(default_rate * _BUCKETS)} END)
""".strip()


def pack_sequences(
    docs: DataFrame, budget: int = 2048, n_shards: int = 8, salt: str = "pack"
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM pre-training
    layout: shard's docs are concatenated in doc_id order and cut every
    ``budget`` tokens; a doc belongs to the sequence where it STARTS):
    (doc_id, shard, seq_id, start_offset, n_tokens).

    shard = hash(doc_id) mod n_shards keeps the window per-shard — one
    exchange by shard, local sort, no global-order bottleneck; n_shards
    scales with writer parallelism. Token counts use the engine's
    standard tokenizer (`analyzer.tokens_col`)."""
    sharded = docs.select(
        "doc_id",
        F.pmod(
            _portable_hash(F.col("doc_id").cast("string"), seed=salt + ":"),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
        F.size(tokens_col("content")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sharded.select(
        "doc_id",
        "shard",
        (F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget))
        .cast("long")
        .alias("seq_id"),
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias("start_offset"),
        "n_tokens",
    )


def pack_sequences_sql(
    budget: int = 2048,
    n_shards: int = 8,
    salt: str = "pack",
    table: str = "documents",
    text: str = "text",
) -> str:
    h = portable_hash_sql("doc_id::varchar", seed=salt + ":")
    return f"""
WITH t AS (
  SELECT doc_id,
         (({h}) % {n_shards})::int AS shard,
         len({duckdb_tokens_sql(text)})::bigint AS n_tokens
  FROM {table}
),
c AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::bigint AS start_offset
  FROM t
)
SELECT doc_id, shard, (start_offset // {budget})::bigint AS seq_id,
       start_offset, n_tokens
FROM c
""".strip()
