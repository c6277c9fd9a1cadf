"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k against one query
  vector. All arithmetic in double via ``zip_with``/``aggregate``
  (left-to-right fold, so the DuckDB oracle is bit-comparable after
  round(6)). At scale this is a single scan + TakeOrdered — fine as the
  baseline and as the verifier for the ANN path.
- :func:`cosine_pairs` — embedding near-duplicate pairs ≥ threshold
  (brute force; used to verify the LSH variant).
- :func:`lsh_bucket_topk` — random-hyperplane LSH: 16 deterministic
  hyperplanes (md5-seeded, reproducible across engines/runs) give a
  16-bit bucket; candidates = same bucket (or Hamming-adjacent probes),
  exact cosine re-rank inside. The scale path: the bucket is a join/
  partition key, so a 10^12-row ANN probe touches one bucket's shard.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector:
    (rank, vec_id, cosine). Tie-break: vec_id asc on round(cosine, 6)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        "vec_id", F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", "cosine"
    )


def cosine_topk_sql(query_vec: list[float], k: int = 10, table: str = "embeddings") -> str:
    vec = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH q AS (SELECT {vec}::double[] AS qv),
scored AS (
  SELECT vec_id,
    round(
      list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, qv), s -> s[1]::double * s[2]::double)), (a,b) -> a+b)
      / ( sqrt(list_reduce(list_prepend(0.0, list_transform(embedding, x -> x::double * x::double)), (a,b) -> a+b))
        * sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x::double * x::double)), (a,b) -> a+b)) )
    , 6) AS cosine
  FROM {table}, q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::int AS rank, vec_id, cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
""".strip()


def cosine_pairs(
    emb: DataFrame, threshold: float = 0.95, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding near-duplicate pairs (vec_a, vec_b, cosine ≥ threshold).
    Brute-force O(n²); the LSH path replaces it at scale."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col(vec_col).alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("ea"), F.col("eb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 16) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) derives
    from md5(f"{p}:{d}") — reproducible everywhere, no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / float(0xFFFFFFFF)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec, p) > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to the query's LSH
    bucket. Approximate by construction (recall measured in tests
    against cosine_topk); at scale the bucket column is a partition key
    so the probe reads one shard."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qbucket = 0
    for j, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, plane)) > 0:
            qbucket += 2**j
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    return cosine_topk(bucketed.where(F.col("bucket") == qbucket), query_vec, k, vec_col)


def cosine_pairs_sql(
    threshold: float = 0.95, table: str = "embeddings", max_vec_id: int | None = None
) -> str:
    """DuckDB twin of :func:`cosine_pairs` (same left-fold arithmetic);
    ``max_vec_id`` bounds the quadratic join for oracle-sized runs."""
    lim = f"WHERE vec_id < {max_vec_id}" if max_vec_id is not None else ""
    dot = (
        "list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, b.embedding),"
        " s -> s[1]::double * s[2]::double)), (x,y) -> x+y)"
    )
    norm = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform({v}.embedding,"
        " x -> x::double * x::double)), (x,y) -> x+y))"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding FROM {table} {lim}),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({dot} / ({norm.format(v='a')} * {norm.format(v='b')}), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {threshold}
""".strip()


def build_ann_index(
    emb: DataFrame, path: str, n_planes: int = 8, vec_col: str = "embedding"
) -> None:
    """Materialize the ANN index: embeddings written bucket-PARTITIONED
    by their hyperplane signature, so a probe reads exactly its bucket's
    directory (partition pruning — the one-shard probe at 10^12 rows,
    vs lsh_bucket_topk's per-probe full-table bucket recompute)."""
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    (
        emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def _hamming_neighbors(bucket: int, n_planes: int, radius: int) -> list[int]:
    out = {bucket}
    frontier = {bucket}
    for _ in range(radius):
        frontier = {b ^ (1 << j) for b in frontier for j in range(n_planes)}
        out |= frontier
    return sorted(out)


def ann_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probes_radius: int = 0,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized ANN index: exact cosine top-k inside the
    query's bucket directory (plus Hamming-``probes_radius`` neighbor
    buckets for recall). The scan is directory-pruned — tests pin
    PartitionFilters in the plan."""
    planes = hyperplanes(len(query_vec), n_planes)
    qbucket = 0
    for j, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, plane)) > 0:
            qbucket += 2**j
    buckets = _hamming_neighbors(qbucket, n_planes, probes_radius)
    df = spark.read.parquet(path).where(F.col("bucket").isin(buckets))
    return cosine_topk(df, query_vec, k, vec_col)


def _dot_sql(vec_expr: str, literal: list[float]) -> str:
    """DuckDB rendering of :func:`_dot` against a literal vector — the
    same left-to-right fold with 0.0 init, so results are IEEE-identical
    to Spark's ``F.aggregate`` (sign tests on the dot are therefore safe
    to compare exactly)."""
    lit = "[" + ", ".join(repr(float(x)) for x in literal) + "]"
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({vec_expr}, {lit}::double[]),"
        f" s -> s[1]::double * s[2]::double)), (a,b) -> a+b)"
    )


def lsh_bucket_topk_sql(
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`lsh_bucket_topk`. The hyperplanes are
    driver-computed literals (md5-seeded, no RNG state), so the bucket
    test is plain arithmetic: bit j = sign of the same left-fold dot
    product Spark computes."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qbucket = 0
    for j, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, plane)) > 0:
            qbucket += 2**j
    bucket = " + ".join(
        f"(CASE WHEN {_dot_sql('embedding', plane)} > 0 THEN {2**j}::bigint ELSE 0::bigint END)"
        for j, plane in enumerate(planes)
    )
    qv = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM {table}),
scored AS (
  SELECT vec_id,
    round(
      {_dot_sql("embedding", query_vec)}
      / ( sqrt(list_reduce(list_prepend(0.0, list_transform(embedding, x -> x::double * x::double)), (a,b) -> a+b))
        * sqrt(list_reduce(list_prepend(0.0, list_transform({qv}::double[], x -> x::double * x::double)), (a,b) -> a+b)) )
    , 6) AS cosine
  FROM b WHERE bucket = {qbucket}
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::int AS rank, vec_id, cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
""".strip()
