"""Deduplication operators for large-scale corpus curation: exact,
n-gram Jaccard, MinHash+LSH, SimHash. Spark-first design notes:

- **Exact**: hash-groupBy on sha256(content) — one shuffle, map-side
  partial agg; at 100 TB the only cost is the scan.
- **Jaccard / MinHash**: shingle joins are the classic skew trap — an
  ultra-common shingle (boilerplate header) fans out quadratically.
  ``jaccard_pairs`` therefore drops shingles above ``max_shingle_df``
  (standard df-cap trick; a shingle in thousands of docs carries no
  dedup signal but dominates the join). MinHash+LSH replaces the
  all-pairs join entirely: band buckets are the join key, candidate
  verification is exact Jaccard on the candidates only.
- **SimHash**: one aggregation, no joins; near-dup = equal 16-bit band
  of the 32-bit signature (probe), verified by Hamming distance.

Every op has an exact DuckDB oracle twin (the portable 32-bit
md5-prefix hash makes signatures identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oni_indexer_spark.analyzer import duckdb_tokens_sql, tokens_col
from oni_indexer_spark.ops.text import _portable_hash, portable_hash_sql


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical content: (content_sha256, keep_doc_id,
    n_copies). Keep = min doc_id (deterministic)."""
    return docs.groupBy(F.sha2("content", 256).alias("content_sha256")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


def _shingles_of(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles from an ALREADY-BOUND token-array
    column. Docs shorter than n tokens yield an empty set (guard needed:
    Spark's sequence(1, 0) would generate a DESCENDING range, not an
    empty one)."""
    gram = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, gram).otherwise(F.array().cast("array<string>"))
    )


def shingles_col(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    SCALE WARNING: inlines the tokenizer into the transform lambda, so
    Catalyst re-evaluates the regex tokenization per sequence element —
    O(doc_len²) per document (caught by the r5 1M-doc bench: the
    shingle scan crawled at ~30x the expected cost). Fine for ad-hoc
    use on short text; the pipeline path is :func:`_shingle_rows`,
    which binds the token array to a named column first (CollapseProject
    keeps a multi-referenced non-cheap alias materialized, so the
    tokenizer runs once per doc)."""
    return _shingles_of(tokens_col(col), n)


def shingles_sql(text: str, n: int = 3) -> str:
    """DuckDB twin of shingles_col over a CTE exposing ``toks``.
    DuckDB range(a, b) is end-exclusive: range(1, len-n+2) gives
    i = 1..len-n+1 (and an empty list for short docs)."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {n - 2}, 1)), i -> {parts}))"
    )


def _shingle_rows(docs: DataFrame, n: int) -> DataFrame:
    # two-step projection: tokens bound to a named column BEFORE the
    # shingle lambda references it 3x per element (see shingles_col's
    # scale warning — this keeps the tokenize O(doc_len), not O(len²))
    return docs.select("doc_id", tokens_col("content").alias("toks")).select(
        "doc_id", F.explode(_shingles_of(F.col("toks"), n)).alias("shingle")
    )


#: Default df-cap for the shingle self-join. A shingle present in more
#: than this many docs is boilerplate (no dedup signal) but fans the join
#: out quadratically — the classic skew trap at corpus scale. Callers that
#: truly need exact all-pairs semantics pass ``max_shingle_df=None``.
DEFAULT_MAX_SHINGLE_DF = 1000


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ threshold:
    (doc_a, doc_b, jaccard). ``max_shingle_df`` (default
    ``DEFAULT_MAX_SHINGLE_DF``) drops boilerplate shingles before the
    self-join (skew control at scale); ``None`` disables the cap.

    NOTE on semantics under the cap: dropping a capped shingle removes it
    from both the intersection and the union counts, so pairs whose
    similarity rests on boilerplate alone fall below threshold — the
    standard MinHash-era convention (Broder '97 resemblance over the
    capped shingle universe)."""
    sh = _shingle_rows(docs, n)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .where(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_sql(
    n: int = 3,
    threshold: float = 0.8,
    table: str = "documents",
    text: str = "text",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> str:
    """DuckDB twin of :func:`jaccard_pairs` — same df-cap and the same
    round(6)-then-compare threshold convention as the engine."""
    cap = (
        f"sh AS (SELECT doc_id, shingle FROM sh0 QUALIFY"
        f" count(*) OVER (PARTITION BY shingle) <= {max_shingle_df}),"
        if max_shingle_df is not None
        else "sh AS (SELECT doc_id, shingle FROM sh0),"
    )
    return f"""
WITH t AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table}),
sh0 AS (
  SELECT doc_id, unnest({shingles_sql(text, n)}) AS shingle FROM t
),
{cap}
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(inter::double / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter::double / (sa.n_sh + sb.n_sh - inter), 6) >= {threshold}
""".strip()


def minhash_signatures(docs: DataFrame, n_hashes: int = 12, n: int = 3) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}): per-doc minimum of the seeded portable
    hash over its shingles — one explode + one groupBy with n_hashes
    partial-aggregated mins (no join)."""
    sh = _shingle_rows(docs, n)
    aggs = [
        F.min(_portable_hash(F.col("shingle"), seed=f"{i}:")).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(
    n_hashes: int = 12, n: int = 3, table: str = "documents", text: str = "text"
) -> str:
    mins = ", ".join(
        f"min({portable_hash_sql('shingle', seed=f'{i}:')}) AS mh_{i}"
        for i in range(n_hashes)
    )
    return f"""
WITH t AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table}),
sh AS (SELECT doc_id, unnest({shingles_sql(text, n)}) AS shingle FROM t)
SELECT doc_id, {mins} FROM sh GROUP BY doc_id
""".strip()


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH candidate generation + candidate-only exact-Jaccard
    verification.

    Docs sharing ANY band (n_hashes/bands consecutive signature values)
    become candidates — the band bucket is the join key, so the quadratic
    all-pairs join never materializes. Verification then touches ONLY the
    candidates: shingle rows are semi-joined down to candidate doc_ids and
    intersections are computed per candidate pair (cand ⋈ sh_a ⋈ sh_b),
    never via a full-corpus shingle self-join. At 10^12 docs the cost is
    O(candidate pairs × shingles/doc), not O(all co-shingled pairs).

    The signature and candidate tables are PERSISTED inside the plan:
    both feed multiple branches (bands × the self-join's two sides;
    cand → cand_ids → intersections), and without materialization each
    branch re-runs the full shingle+minhash aggregation over the corpus
    — invisible at test scale, ~8 redundant 10^8-row aggregations at 1M
    docs (caught by the r5 non-toy bench; Spark's own ML LSH persists
    for the same reason). sig is O(n_docs × n_hashes) ints, cand is the
    candidate pairs — both tiny next to the shingle stream. At cluster
    scale replace persist with a checkpoint to storage if executors are
    memory-tight."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, n).persist()
    # bands as ONE explode-projection of sig (not a union of per-band
    # selects): a single pass over the cached signatures
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh_{bi * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("bkey"),
        )
        for bi in range(bands)
    ]
    bandsdf = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a = bandsdf.alias("a")
    b = bandsdf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # verification shingles: candidate docs only (uncapped — exact sets);
    # persisted — three consumers (sizes, both join sides) would each
    # re-run the tokenize+shingle scan otherwise
    sh = _shingle_rows(docs, n).join(cand_ids, "doc_id", "left_semi").persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs_sql(
    n_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    table: str = "documents",
    text: str = "text",
) -> str:
    """DuckDB twin of :func:`minhash_lsh_pairs`: band keys are concat of
    the same portable md5-prefix min-hashes, candidates the same banded
    self-join, verification the same candidate-only exact Jaccard with
    round(6)-then-compare."""
    rows_per_band = n_hashes // bands
    mins = ", ".join(
        f"min({portable_hash_sql('shingle', seed=f'{i}:')}) AS mh_{i}"
        for i in range(n_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, concat_ws('_', {cols}) AS bkey FROM sig".format(
            bi=bi,
            cols=", ".join(
                f"mh_{bi * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    return f"""
WITH t AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table}),
sh AS (SELECT doc_id, unnest({shingles_sql(text, n)}) AS shingle FROM t),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bandsd AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsd a JOIN bandsd b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.inter::double / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.inter::double / (sa.n_sh + sb.n_sh - i.inter), 6) >= {threshold}
""".strip()


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash over tf-weighted token hashes: bit j of the
    signature is set iff Σ_tokens tf·(±1 by bit j of hash32(token)) > 0.
    One explode + one groupBy; no joins."""
    toks = docs.select("doc_id", F.explode(tokens_col("content")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = _portable_hash(F.col("term"))
    weighted = tf.select(
        "doc_id",
        *[
            (
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"w_{j}")
            for j in range(bits)
        ],
    )
    agg = weighted.groupBy("doc_id").agg(
        *[F.sum(f"w_{j}").alias(f"s_{j}") for j in range(bits)]
    )
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2**j).cast("long")
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_sql(bits: int = 32, table: str = "documents", text: str = "text") -> str:
    h = portable_hash_sql("term")
    sums = ", ".join(
        f"sum(CASE WHEN (({h}) >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS s_{j}"
        for j in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN s_{j} > 0 THEN 1::bigint ELSE 0 END) * {2**j}" for j in range(bits))
    return f"""
WITH toksd AS (
  SELECT doc_id, unnest({duckdb_tokens_sql(text)}) AS term FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toksd GROUP BY doc_id, term),
s AS (SELECT doc_id, {sums} FROM tf GROUP BY doc_id)
SELECT doc_id, {sig} AS simhash FROM s
""".strip()


# ---------------------------------------------------------------------------
# Connected-component clustering over near-duplicate PAIRS — the step a
# real curation pipeline runs after LSH: pairs say "A~B, B~C"; the keep/
# drop decision needs the transitive closure {A,B,C} with one canonical
# representative. (The reference's Solr-side dedup stops at overwrite-
# by-id; clustering is part of the LLM-pipeline extension surface.)
#
# Default algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris,
# Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
# MapReduce and Beyond", SoCC 2014): each round is two groupBy-min +
# explode passes over the edge list; converges in O(log² n) rounds
# w.h.p. REGARDLESS of component diameter — the property that matters at
# 100 TB, where near-dup chains (A~B~C~… boilerplate drift) defeat
# plain label propagation (O(diameter) rounds). ``algorithm="minlabel"``
# keeps the simple propagation path for cross-checking; tests assert
# both match a union-find reference on random graphs (hypothesis).
# ---------------------------------------------------------------------------


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set canonicalized to (hi, lo) with hi > lo."""
    return (
        e.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    m = min(Γ(u) ∪ {u}). Emitted as canonical (hi, lo) pairs."""
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    joined = sym.join(m, "u").where(F.col("v") > F.col("u"))
    return _canon_edges(joined.select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node hi over its smaller neighbors N = {lo}: connect
    every lo and hi itself to m = min(N) (m ≤ every lo < hi)."""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    to_lo = edges.join(m, "hi").select(F.col("lo").alias("u"), F.col("m").alias("v"))
    to_hi = m.select(F.col("hi").alias("u"), F.col("m").alias("v"))
    return _canon_edges(to_lo.unionByName(to_hi))


def cluster_pairs_cc(
    pairs: DataFrame,
    algorithm: str = "star",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in ``pairs``
    (cols doc_a, doc_b): cluster_id = the MINIMUM doc_id of the
    connected component (deterministic canonical representative —
    the same keep-min convention as :func:`exact_dedup`). Docs in no
    pair are untouched (singleton handling belongs to the caller's
    anti-join). Iterations run driver-side with a one-row convergence
    aggregate per round; every data-sized operation is a groupBy/join."""
    edges = _canon_edges(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).persist()

    def _sig(e: DataFrame):
        # order-insensitive edge-set signature: one aggregate row
        # pmod keeps the per-row term < 2^31 so the ANSI-mode long sum
        # cannot overflow below ~4e9 edges (order-insensitive either way)
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("hi", "lo"), F.lit(2**31))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    if algorithm == "star":
        prev = _sig(edges)
        for _ in range(max_iters):
            # localCheckpoint (same discipline as etl.resolve_fixpoint):
            # each round references the previous edge set ~6x (sym union,
            # groupBy-min, join), so without cutting lineage the logical
            # plan grows ~6^rounds and analysis dominates. On a real
            # cluster swap for a reliable checkpoint dir (executor-loss
            # safety); the algorithm is unchanged.
            nxt = _small_star(_large_star(edges)).localCheckpoint()
            cur = _sig(nxt)
            edges.unpersist()
            edges = nxt
            if cur == prev:
                break
            prev = cur
        # at fixpoint every edge is (node, component-min); the minima
        # themselves appear only on the lo side
        labels = edges.select(
            F.col("hi").alias("doc_id"), F.col("lo").alias("cluster_id")
        )
        roots = (
            edges.select(F.col("lo").alias("doc_id"))
            .distinct()
            .join(labels.select(F.col("doc_id")), "doc_id", "left_anti")
            .withColumn("cluster_id", F.col("doc_id"))
        )
        out = labels.unionByName(roots)
        return out.select("doc_id", F.col("cluster_id").cast("long").alias("cluster_id"))

    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    lab = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("doc_id"), F.col("u").alias("lbl"))
        .persist()
    )
    prev_sum = None
    for _ in range(max_iters):
        prop = (
            sym.join(lab, sym["u"] == lab["doc_id"])
            .select(F.col("v").alias("doc_id"), F.col("lbl"))
            .unionByName(lab.select("doc_id", "lbl"))
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()  # cut the growing lineage each round
        )
        s = prop.agg(
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("doc_id", "lbl"), F.lit(2**31))), F.lit(0)
            ).alias("s")
        ).collect()[0]["s"]
        lab.unpersist()
        lab = prop
        if s == prev_sum:
            break
        prev_sum = s
    return lab.select("doc_id", F.col("lbl").cast("long").alias("cluster_id"))


def cluster_cc_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`cluster_pairs_cc`: BFS of component-min
    labels as a recursive CTE over the SAME pairs query (UNION dedups
    the frontier, so the recursion is bounded by Σ|component|²)."""
    return f"""
WITH RECURSIVE p AS (
{pairs_sql}
),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION
  SELECT doc_b AS u, doc_a AS v FROM p
),
reach(u, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT e.v, r.l FROM reach r JOIN e ON e.u = r.u
)
SELECT u AS doc_id, min(l)::bigint AS cluster_id FROM reach GROUP BY u
""".strip()


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark-contamination detection: per training doc, how many of
    its distinct word n-grams also occur in ``benchmark`` (the test-set
    decontamination step of GPT-3 §C / PaLM / Llama training reports —
    n-gram collision against the eval suites, here n-gram-exact).

    Returns (doc_id, n_collisions, contaminated) for EVERY doc (zero
    rows kept — the downstream filter wants the clean set, not just the
    dirty one). Scale shape: the benchmark side is eval suites — a few
    MB against a 100 TB corpus — so its distinct-shingle set rides a
    BROADCAST hash join (no shuffle of the corpus shingle stream); the
    only wide op is the per-doc count aggregation."""
    doc_sh = _shingle_rows(docs, n)
    bench_sh = _shingle_rows(benchmark, n).select("shingle").distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("n_collisions"),
            (F.coalesce(F.col("hits"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def ngram_contamination_sql(
    n: int = 5,
    min_hits: int = 1,
    table: str = "documents",
    text: str = "text",
    benchmark_where: str = "doc_id % 20 = 3",
) -> str:
    """DuckDB twin of :func:`ngram_contamination` with the benchmark
    drawn as a deterministic slice of the same table (the oracle's
    self-contained stand-in for an external eval suite)."""
    return f"""
WITH t AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table}),
dsh AS (SELECT doc_id, unnest({shingles_sql(text, n)}) AS shingle FROM t),
bt AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table} WHERE {benchmark_where}),
bsh AS (SELECT DISTINCT unnest({shingles_sql(text, n)}) AS shingle FROM bt),
hits AS (
  SELECT d.doc_id, count(*) AS hits
  FROM dsh d JOIN bsh USING (shingle)
  GROUP BY d.doc_id
),
base AS (SELECT doc_id FROM {table})
SELECT base.doc_id,
       coalesce(hits.hits, 0)::bigint AS n_collisions,
       coalesce(hits.hits, 0) >= {min_hits} AS contaminated
FROM base LEFT JOIN hits ON base.doc_id = hits.doc_id
""".strip()


def span_dedup(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    text_col: str = "content",
) -> DataFrame:
    """Cross-document duplicated-substring removal (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better": delete every substring of >= n tokens that also occurs in
    another document, keeping one copy).

    Suffix-array-free distributed re-expression. The key identity: a
    token position lies inside a cross-document duplicated substring of
    length >= n IFF it is covered by at least one duplicated n-gram —
    a maximal duplicated substring of length M >= n is exactly the
    coverage union of its M-n+1 duplicated n-grams. That collapses the
    sequential suffix array into word-count-shaped dataflow:

    1. explode (doc_id, start, xxhash64(n-gram)) — 8-byte gram keys
       through the shuffle, never gram strings (the tid trick);
    2. one groupBy gram hash -> (distinct-doc count, min-doc_id owner);
    3. join flagged grams (doc count >= min_docs) back to occurrences —
       the flagged side is bounded by total-occurrences/min_docs, so
       AQE broadcasts it in the common case; non-owner occurrences
       aggregate to one sorted start-offset array per doc;
    4. rebuild: a positional F.filter keeps tokens outside every
       [s, s+n) window — pure codegen column expressions, no UDF.

    Keep-one-copy is deterministic: the min-doc_id occurrence of each
    duplicated gram survives (Lee et al. keep an arbitrary one).
    Within-document repetition is out of scope (that is
    ``repetition_score``'s domain). Returns
    (doc_id, n_tokens, n_removed, text_clean) for EVERY doc.
    """
    toks = docs.select("doc_id", tokens_col(text_col).alias("toks"))
    gram_hashes = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = toks.select(
        "doc_id", F.posexplode(gram_hashes).alias("pos0", "gram_h")
    ).select("doc_id", (F.col("pos0") + 1).alias("start"), "gram_h")
    flagged = (
        occ.groupBy("gram_h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("owner"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select("gram_h", "owner")
    )
    starts = (
        occ.join(flagged, "gram_h")
        .where(F.col("doc_id") != F.col("owner"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("start")).alias("starts"))
    )
    bound = toks.join(starts, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(
            F.col("starts"), lambda s: (s <= i + 1) & (i + 1 < s + n)
        ),
    )
    return bound.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text_clean"),
    )


def span_dedup_sql(
    n: int = 10,
    min_docs: int = 2,
    table: str = "documents",
    text: str = "text",
) -> str:
    """DuckDB twin of :func:`span_dedup`: grams grouped by STRING (the
    oracle re-derives what the engine keys by xxhash64), coverage via
    the same [s, s+n) window union, rebuild via a position-filtered
    list_transform. DuckDB list slices are 1-based inclusive-inclusive:
    toks[s : s+n-1] is exactly n tokens."""
    return f"""
WITH t AS (SELECT doc_id, {duckdb_tokens_sql(text)} AS toks FROM {table}),
o AS (
  SELECT doc_id, unnest(range(1, greatest(len(toks) - {n - 2}, 1))) AS s, toks
  FROM t
),
g AS (SELECT doc_id, s, array_to_string(toks[s:s+{n - 1}], ' ') AS gram FROM o),
gs AS (
  SELECT gram, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
  FROM g GROUP BY gram
),
rem AS (
  SELECT g.doc_id, g.s
  FROM g JOIN gs USING (gram)
  WHERE gs.nd >= {min_docs} AND g.doc_id <> gs.owner
),
pd AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS starts FROM rem GROUP BY doc_id),
k AS (
  SELECT t.doc_id, t.toks,
         list_transform(
           list_filter(range(1, len(t.toks) + 1),
             p -> len(list_filter(coalesce(pd.starts, []),
                      s2 -> s2 <= p AND p < s2 + {n})) = 0),
           p -> t.toks[p]) AS kept
  FROM t LEFT JOIN pd USING (doc_id)
)
SELECT doc_id,
       len(toks)::bigint AS n_tokens,
       (len(toks) - len(kept))::bigint AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_clean
FROM k
""".strip()
