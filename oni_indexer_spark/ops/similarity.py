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

# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path.
#
# Random-hyperplane LSH partitions the sphere blindly: at 1M vecs / 8
# planes the measured recall@10 was 0.04 (radius 0) / 0.215 (radius 1)
# (BENCH/llm_ops_1m_r05.json) because 2^8 sign buckets ignore the data
# distribution. IVF instead partitions by nearest CENTROID (Voronoi
# cells adapt to the data; FAISS's IndexIVFFlat design, Jégou et al.,
# "Product quantization for nearest neighbor search", TPAMI 2011):
#
# - centroids: nlist deterministic seed vectors (actual data vectors at
#   fixed vec_ids — k-means sample-init), optionally refined by
#   :func:`ivf_train` (distributed spherical Lloyd: one groupBy-agg per
#   iteration, no driver-side data loops).
# - assignment: argmax_j round(cosine(vec, c_j), 6), ties to the lowest
#   centroid id — a pure column expression over literal centroids (no
#   join, no UDF; whole-stage codegen).
# - probe: the nprobe centroids nearest the query (driver arithmetic on
#   the same literals) — scan only those lists. Materialized form
#   partitions the parquet by list_id, so a probe is directory-pruned to
#   nprobe/nlist of the data, exactly like the LSH index but with
#   data-adaptive cells (measured at 100k vecs: see BENCH/BASELINE.md).
#
# Oracle parity: the centroid ids are FIXED (vec_id < nlist), so DuckDB
# re-derives identical centroids from the same table and replays the
# same argmax via a cross-join + row_number — engine-identical after
# round(6) because both sides fold the dot product left-to-right in
# double (same convention as cosine_topk_sql, proven bit-stable).
# ---------------------------------------------------------------------------


def ivf_centroids(
    emb: DataFrame, nlist: int = 8, vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic sample-init centroids: the embeddings at
    vec_id 0..nlist-1 (k-means sample initialization; refine with
    :func:`ivf_train` when cells should adapt further). One tiny
    driver collect of nlist rows — never the corpus."""
    rows = (
        emb.where(F.col("vec_id") < nlist)
        .select("vec_id", vec_col)
        .orderBy("vec_id")
        .collect()
    )
    if len(rows) != nlist:
        raise ValueError(f"need vec_id 0..{nlist-1} present, got {len(rows)} rows")
    return [[float(x) for x in r[1]] for r in rows]


def _python_cosine(a: list[float], b: list[float]) -> float:
    """Driver twin of :func:`cosine_expr`: same left-to-right fold in
    double, so probe selection agrees with what either engine computes."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return dot / ((na**0.5) * (nb**0.5))


def ivf_probe_lists(query_vec: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """The nprobe list ids nearest the query (rounded cosine desc, id
    asc) — driver-side arithmetic over the same centroid literals both
    engines use."""
    sims = [
        (round(_python_cosine(query_vec, c), 6), j) for j, c in enumerate(centroids)
    ]
    sims.sort(key=lambda t: (-t[0], t[1]))
    return sorted(j for _, j in sims[:nprobe])


def ivf_assign_cols(
    vec: Column, centroids: list[list[float]]
) -> tuple[list[Column], Column]:
    """(per-centroid rounded-cosine columns, argmax list_id column).
    Bind the sim columns to named aliases BEFORE referencing them in the
    argmax (CollapseProject keeps multi-referenced non-cheap aliases
    materialized — same O(n) discipline as dedup._shingle_rows)."""
    sims = [
        F.round(
            cosine_expr(vec, F.array(*[F.lit(float(x)) for x in c])), 6
        ).alias(f"_ivf_s{j}")
        for j, c in enumerate(centroids)
    ]
    best = F.greatest(*[F.col(f"_ivf_s{j}") for j in range(len(centroids))])
    list_id = F.coalesce(
        *[
            F.when(F.col(f"_ivf_s{j}") == best, F.lit(j).cast("int"))
            for j in range(len(centroids))
        ]
    )
    return sims, list_id


def _ivf_assigned(emb: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    sims, list_id = ivf_assign_cols(F.col(vec_col), centroids)
    return (
        emb.select("vec_id", vec_col, *sims)
        .withColumn("list_id", list_id)
        .select("vec_id", vec_col, "list_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Inline IVF ANN top-k: assign each vector to its nearest
    centroid, scan only the nprobe lists nearest the query, exact cosine
    re-rank inside. Approximate by construction; recall is measured in
    tests/bench against :func:`cosine_topk`."""
    if centroids is None:
        centroids = ivf_centroids(emb, nlist, vec_col)
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    assigned = _ivf_assigned(emb, centroids, vec_col)
    return cosine_topk(
        assigned.where(F.col("list_id").isin(probes)), query_vec, k, vec_col
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    nlist: int = 8,
    iters: int = 0,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the IVF index: embeddings parquet-PARTITIONED by
    list_id (a probe reads nprobe/nlist directories — partition pruning,
    pinned in tests), centroids saved alongside as JSON. Returns the
    centroids. ``iters`` > 0 runs distributed Lloyd refinement first."""
    import json as _json
    import os as _os

    centroids = ivf_centroids(emb, nlist, vec_col)
    if iters:
        centroids = ivf_train(emb, centroids, iters=iters, vec_col=vec_col)
    (
        _ivf_assigned(emb, centroids, vec_col)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    with open(_os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        _json.dump(centroids, fh)
    return centroids


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized IVF index: exact cosine top-k inside the
    nprobe nearest list directories (directory-pruned scan)."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_ivf_centroids.json")) as fh:
        centroids = _json.load(fh)
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    df = spark.read.parquet(path).where(F.col("list_id").isin(probes))
    return cosine_topk(df, query_vec, k, vec_col)


def ivf_train(
    emb: DataFrame,
    centroids: list[list[float]],
    iters: int = 2,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed spherical-Lloyd refinement: per iteration ONE
    assignment scan + ONE (list_id, pos) groupBy-agg; the collect is
    nlist×dim cells (8×64 = 512 rows), never data rows. Empty cells keep
    their previous centroid. NOTE: float-sum reduction order makes the
    refined centroids deterministic only to ~1 ulp across cluster
    layouts — training is a build-time op; the serving path stores the
    trained centroids as literals (JSON in the index dir), so queries
    stay exactly reproducible."""
    nlist = len(centroids)
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = _ivf_assigned(emb, centroids, vec_col)
        cells = (
            assigned.select("list_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums = [[0.0] * dim for _ in range(nlist)]
        counts = [0] * nlist
        for r in cells:
            sums[r["list_id"]][r["pos"]] = float(r["s"])
            counts[r["list_id"]] = int(r["n"])
        new = []
        for j in range(nlist):
            if counts[j] == 0:
                new.append(centroids[j])
                continue
            mean = [s / counts[j] for s in sums[j]]
            norm = sum(x * x for x in mean) ** 0.5 or 1.0
            new.append([x / norm for x in mean])
        centroids = new
    return centroids


def ivf_topk_sql(
    query_vec: list[float],
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`ivf_topk` with sample-init centroids: the
    centroids are re-derived from the same table (vec_id < nlist), the
    argmax assignment is a cross-join + row_number over the identical
    rounded left-fold cosine, and the probe set is computed in SQL by
    the same rounded-cosine ranking the Spark driver performs in
    :func:`ivf_probe_lists` (same fold order, same tie-break)."""
    pair_dot = (
        "list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.cvec),"
        " s -> s[1]::double * s[2]::double)), (x,y) -> x+y)"
    )
    norm = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform({v},"
        " x -> x::double * x::double)), (x,y) -> x+y))"
    )
    qv = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM {table} WHERE vec_id < {nlist}
),
asgn AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({pair_dot} / ({norm.format(v='e.embedding')} * {norm.format(v='c.cvec')}), 6) DESC,
                    c.cid ASC
         ) AS rn
  FROM {table} e CROSS JOIN cents c
),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (
             ORDER BY round({_dot_sql("c.cvec", query_vec)} / ({norm.format(v='c.cvec')} * {norm.format(v=qv + '::double[]')}), 6) DESC,
                      c.cid ASC
           ) AS rn
    FROM cents c
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT a.vec_id,
    round(
      {_dot_sql("a.embedding", query_vec)}
      / ( {norm.format(v='a.embedding')} * {norm.format(v=qv + '::double[]')} )
    , 6) AS cosine
  FROM asgn a
  WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probe)
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::int AS rank, vec_id, cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
""".strip()
