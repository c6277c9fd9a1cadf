"""Corpus ops vs their DuckDB oracle twins + internal consistency
(LSH candidates verified against brute force, stub decoder determinism)."""

import duckdb
import pytest

from oni_indexer_spark.ops import dedup, similarity, text
from tests.conftest import SF_SMOKE

QUERY_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'")
    return c


@pytest.fixture(scope="module")
def driver_docs(spark):
    # ops run on the raw driver table shape (doc_id, text as content)
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.col("text").alias("content"))
        .cache()
    )


def _cmp(sdf, con, sql, float_round=6):
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(round(v, float_round) if isinstance(v, float) else v for v in
               (r[c] for c in scols)) for r in sdf.collect()],
        key=repr,
    )
    res = con.execute(sql)
    ocols = sorted(d[0] for d in res.description)
    raw = res.fetchall()
    names = [d[0] for d in res.description]
    orows = sorted(
        [tuple(round(v, float_round) if isinstance(v, float) else v for v in
               (row[names.index(c)] for c in ocols)) for row in raw],
        key=repr,
    )
    assert scols == ocols
    assert srows == orows


def test_token_count(driver_docs, con):
    _cmp(text.token_count(driver_docs), con, text.token_count_sql())


def test_lang_id(driver_docs, con):
    _cmp(text.lang_id(driver_docs), con, text.lang_id_sql())


def test_quality_score(driver_docs, con):
    _cmp(text.quality_score(driver_docs), con, text.quality_score_sql())


def test_fingerprint(driver_docs, con):
    _cmp(text.fingerprint(driver_docs), con, text.fingerprint_sql())


def test_fingerprint_detects_identical_sequences(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "THE  quick... FOX"), (3, "the quick cat")],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert rows[1] == rows[2]  # same token stream after analysis
    assert rows[1] != rows[3]


def test_repetition_score(driver_docs, con):
    _cmp(text.repetition_score(driver_docs), con, text.repetition_score_sql())


def test_repetition_flags_selfcopy(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma " * 30),          # 3 distinct trigrams repeated
            (2, " ".join(f"w{i}" for i in range(90))),  # all distinct
            (3, "a b"),                               # too short for trigrams
        ],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_score(df).collect()}
    assert rows[1]["is_repetitive"] and rows[1]["dup_trigram_ratio"] > 0.9
    assert not rows[2]["is_repetitive"] and rows[2]["dup_trigram_ratio"] == 0.0
    assert rows[3]["dup_trigram_ratio"] == 0.0 and not rows[3]["is_repetitive"]


def test_pii_counts(driver_docs, con):
    _cmp(text.pii_counts(driver_docs), con, text.pii_counts_sql())


def test_pii_counts_detects_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "contact a.user@example.org or 10.0.0.1 via https://x.io/y"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "clean prose with no identifiers at all"),
        ],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r for r in text.pii_counts(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ipv4s"] == 1 and rows[1]["n_urls"] == 1
    assert rows[2]["n_phones"] == 1 and rows[2]["has_pii"]
    assert not rows[3]["has_pii"]


def test_minhash_signatures(driver_docs, con):
    _cmp(
        dedup.minhash_signatures(driver_docs, n_hashes=6),
        con,
        dedup.minhash_signatures_sql(n_hashes=6),
    )


def test_simhash(driver_docs, con):
    _cmp(dedup.simhash(driver_docs, bits=16), con, dedup.simhash_sql(bits=16))


def test_jaccard_pairs(driver_docs, con):
    _cmp(
        dedup.jaccard_pairs(driver_docs, n=3, threshold=0.2),
        con,
        dedup.jaccard_pairs_sql(n=3, threshold=0.2),
    )


def test_shingles_short_doc(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], "doc_id long, content string")
    rows = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", dedup.shingles_col("content", 3).alias("sh")).collect()
    }
    assert rows[1] == []
    assert rows[2] == ["a b c", "b c d"]


def test_minhash_lsh_candidates_verified(spark):
    # near-dup docs share bands; verified pairs must carry exact jaccard
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base) for i in range(3)] + [
        (3, base + " extra tail tokens here"),
        (4, "completely different content about spark shuffles and postings"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(df, n_hashes=12, bands=4, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)


def test_minhash_lsh_no_fullcorpus_selfjoin(spark):
    # scale guard: verification must restrict shingles to candidate docs
    # (LeftSemi before the pair joins) — never the all-pairs shingle
    # self-join LSH exists to avoid
    df = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h") for i in range(6)], "doc_id long, content string"
    )
    plan = dedup.minhash_lsh_pairs(df, n_hashes=12, bands=4)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, content string"
    )
    rows = {r["keep_doc_id"]: r["n_copies"] for r in dedup.exact_dedup(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_cosine_topk_matches_oracle(spark, con):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    _cmp(
        similarity.cosine_topk(emb, QUERY_VEC, k=10),
        con,
        similarity.cosine_topk_sql(QUERY_VEC, k=10),
    )


def test_lsh_topk_subset_of_exact_ordering(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, QUERY_VEC, k=50).collect()]
    ann = similarity.lsh_bucket_topk(emb, QUERY_VEC, k=10, n_planes=4).collect()
    assert len(ann) > 0
    # every ANN hit is a real vector and cosine values agree with exact scan
    exact_all = {
        r["vec_id"]: r["cosine"]
        for r in similarity.cosine_topk(emb, QUERY_VEC, k=10**6).collect()
    }
    for r in ann:
        assert abs(exact_all[r["vec_id"]] - r["cosine"]) < 1e-9
    # recall@10 against exact top-50 is nonzero (sanity, not a guarantee)
    assert any(r["vec_id"] in exact
               for r in ann)


def test_multimodal_plumbing(spark):
    from oni_indexer_spark.ops import multimodal as mm

    assets = mm.synth_assets(spark, n=30)
    feats = mm.extract_features(assets, dim=8, decoder="fake")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows)
    # determinism across runs
    again = {r["asset_id"]: r["feature"] for r in mm.extract_features(assets, dim=8).collect()}
    for r in rows:
        assert again[r["asset_id"]] == r["feature"]
    # real decoder is an explicit stub
    import pytest as _pytest

    with _pytest.raises(Exception):
        mm.extract_features(assets, dim=8, decoder="real").collect()
    # frame sampling plan
    plan = mm.frame_sample_plan(assets, every_ms=500)
    assert plan.where("frame_ts_ms % 500 != 0").count() == 0
    assert plan.count() > 0


def test_ann_index_partition_pruned(spark, tmp_path):
    # materialized ANN index: the probe must read ONE bucket directory
    # (PartitionFilters), and probes_radius=0 equals lsh_bucket_topk
    from oni_indexer_spark.ops import similarity as sim

    rows = [(i, [((i * 13 + j * 7) % 19 - 9) / 9.0 for j in range(8)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ann")
    sim.build_ann_index(emb, path, n_planes=4)
    q = [0.3, -0.2, 0.8, 0.1, -0.5, 0.4, 0.0, 0.9]
    got = sim.ann_topk(spark, path, q, k=5, n_planes=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    want = sim.lsh_bucket_topk(emb, q, k=5, n_planes=4)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # radius-1 probing can only add candidates (recall >= single-bucket)
    wide = sim.ann_topk(spark, path, q, k=5, n_planes=4, probes_radius=1)
    assert wide.count() >= got.count()


def test_shingle_plan_tokenizes_once(spark, docs):
    """Pin the r5 scale fix: the shingle pipeline must evaluate the regex
    tokenizer ONCE per doc. Inlining the tokenizer expression inside the
    transform lambda re-evaluates it per sequence element (O(doc_len^2)
    per doc — stuck-at-20-min at 1M docs); binding it to a named column
    keeps it materialized (CollapseProject does not inline
    multi-referenced non-cheap aliases)."""
    from oni_indexer_spark.ops.dedup import _shingle_rows

    plan = _shingle_rows(docs.select("doc_id", "content"), 3)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") == 1, plan


def test_repetition_plan_tokenizes_once(spark, docs):
    from oni_indexer_spark.ops.text import repetition_score

    plan = (
        repetition_score(docs.select("doc_id", "content"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("regexp_extract_all") == 1, plan


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_topk_matches_oracle(spark, con):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    _cmp(
        similarity.ivf_topk(emb, QUERY_VEC, k=10, nlist=8, nprobe=2),
        con,
        similarity.ivf_topk_sql(QUERY_VEC, k=10, nlist=8, nprobe=2),
    )


def test_ivf_indexed_matches_inline(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, nlist=8)
    inline = similarity.ivf_topk(emb, QUERY_VEC, k=10, nlist=8, nprobe=2).collect()
    indexed = similarity.ivf_index_topk(spark, path, QUERY_VEC, k=10, nprobe=2).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in indexed]
    # probe plan must be directory-pruned on list_id (partition column)
    plan = similarity.ivf_index_topk(
        spark, path, QUERY_VEC, k=10, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan and "PartitionFilters: [" in plan


def test_ivf_recall_in_distribution(spark):
    # Recall properties that are DETERMINISTIC on this fixed table (the
    # IVF-vs-LSH head-to-head lives in scripts/bench_llm_ops.py at 100k
    # vecs, where one query isn't noise):
    # 1. self-retrieval: a query equal to a stored vector always returns
    #    it (its own cell is by construction the nearest probe cell);
    # 2. mean recall@10 over 10 in-distribution queries ≥ 0.4 while
    #    scanning ~nprobe/nlist = 1/4 of the table (measured 0.45).
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
    centroids = similarity.ivf_centroids(emb, nlist=8)
    qids = [20, 21, 22, 23, 24, 100, 101, 102, 103, 104]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(emb.vec_id.isin(qids)).collect()
    }
    hits = 0
    for qid in qids:
        qv = qvecs[qid]
        exact = {r["vec_id"] for r in similarity.cosine_topk(emb, qv, k=10).collect()}
        ivf = {
            r["vec_id"]
            for r in similarity.ivf_topk(
                emb, qv, k=10, nprobe=2, centroids=centroids
            ).collect()
        }
        assert qid in ivf, f"self-retrieval failed for {qid}"
        hits += len(ivf & exact)
    assert hits / (10 * len(qids)) >= 0.4


def test_ivf_train_refines_deterministic_seed(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
    init = similarity.ivf_centroids(emb, nlist=8)
    trained = similarity.ivf_train(emb, init, iters=2)
    assert len(trained) == 8 and len(trained[0]) == len(init[0])
    for c in trained:  # spherical Lloyd keeps centroids unit-norm
        n = sum(x * x for x in c) ** 0.5
        assert abs(n - 1.0) < 1e-9
    # refinement must not hurt recall on the clustered synthetic table
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, QUERY_VEC, k=10).collect()}
    r_init = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, QUERY_VEC, k=10, nprobe=2, centroids=init
        ).collect()
    }
    r_tr = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, QUERY_VEC, k=10, nprobe=2, centroids=trained
        ).collect()
    }
    assert len(r_tr & exact) >= len(r_init & exact) - 1  # allow 1-hit jitter


# ---------------------------------------------------------------------------
# Connected-component clustering of near-dup pairs
# ---------------------------------------------------------------------------


def _uf_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), set()).add(x)
    out = {}
    for r, nodes in comp.items():
        m = min(nodes | {r})
        for x in nodes | {r}:
            out[x] = m
    return out


def _cc_of(spark, pairs, algorithm):
    pdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )
    rows = dedup.cluster_pairs_cc(pdf, algorithm=algorithm).collect()
    labels = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert len(labels) == len(rows), "duplicate doc_id rows"
    return labels


@pytest.mark.parametrize("algorithm", ["star", "minlabel"])
def test_cluster_cc_matches_union_find(spark, algorithm):
    import random

    rng = random.Random(7)
    graphs = [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4), (10, 11)],  # path + separate pair
        [(i, i + 1) for i in range(30)],  # adversarial chain
        [(5, 1), (5, 2), (5, 3), (9, 8)],  # star not rooted at min
    ]
    for _ in range(4):
        n = rng.randint(4, 40)
        graphs.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(2, 60))]
        )
    for g in graphs:
        g = [(a, b) for a, b in g if a != b]
        if not g:
            continue
        assert _cc_of(spark, g, algorithm) == _uf_labels(g), g


def test_cluster_cc_entry_oracle(spark, con, driver_docs):
    pairs = dedup.minhash_lsh_pairs(driver_docs, n_hashes=12, bands=4, threshold=0.3)
    _cmp(
        dedup.cluster_pairs_cc(pairs),
        con,
        dedup.cluster_cc_sql(
            dedup.minhash_lsh_pairs_sql(n_hashes=12, bands=4, threshold=0.3)
        ),
    )


def test_ngram_contamination_matches_oracle(spark, con, driver_docs):
    from pyspark.sql import functions as F

    bench = driver_docs.where(F.col("doc_id") % 20 == 3)
    _cmp(
        dedup.ngram_contamination(driver_docs, bench, n=5, min_hits=1),
        con,
        dedup.ngram_contamination_sql(n=5, min_hits=1),
    )


def test_ngram_contamination_broadcasts_benchmark(spark, driver_docs):
    from pyspark.sql import functions as F

    bench = driver_docs.where(F.col("doc_id") % 20 == 3)
    plan = (
        dedup.ngram_contamination(driver_docs, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# Sampling / split / sequence packing
# ---------------------------------------------------------------------------


def test_split_by_hash_matches_oracle(spark, con):
    from oni_indexer_spark.ops import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    _cmp(
        sampling.split_by_hash(docs, val_frac=0.05, test_frac=0.05),
        con,
        sampling.split_by_hash_sql(val_frac=0.05, test_frac=0.05),
    )


def test_split_deterministic_and_disjoint(spark):
    from oni_indexer_spark.ops import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in sampling.split_by_hash(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_by_hash(docs).collect()}
    assert a == b and len(a) == docs.count()
    # a different salt reassigns (the leakage-avoidance knob works)
    c = {
        r["doc_id"]: r["split"]
        for r in sampling.split_by_hash(docs, salt="other").collect()
    }
    assert c != a


def test_mixture_sample_matches_oracle(spark, con):
    from oni_indexer_spark.ops import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rates = {"src1": 1.0, "src2": 0.5, "src3": 0.25}
    _cmp(
        sampling.mixture_sample(docs, rates, default_rate=0.1),
        con,
        sampling.mixture_sample_sql(rates, default_rate=0.1),
    )
    # rate 1.0 keeps every doc of that source
    kept = sampling.mixture_sample(docs, rates, default_rate=0.1)
    from pyspark.sql import functions as F

    n_src1_all = docs.where(F.col("source") == "src1").count()
    n_src1_kept = kept.where(F.col("source") == "src1").count()
    assert n_src1_kept == n_src1_all


def test_pack_sequences_matches_oracle(spark, con, driver_docs):
    from oni_indexer_spark.ops import sampling

    _cmp(
        sampling.pack_sequences(driver_docs, budget=512, n_shards=4),
        con,
        sampling.pack_sequences_sql(budget=512, n_shards=4),
    )


def test_pack_sequences_invariants(spark, driver_docs):
    from oni_indexer_spark.ops import sampling

    rows = sampling.pack_sequences(driver_docs, budget=512, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            # offsets are the exact concat positions in doc_id order
            assert r["start_offset"] == off
            # a doc belongs to the sequence where it starts
            assert r["seq_id"] == off // 512
            off += r["n_tokens"]


def test_sampling_plan_shapes(spark, driver_docs):
    # scale pins: split/mixture ride the scan (zero Exchange);
    # pack_sequences pays exactly ONE Exchange (the per-shard window)
    from oni_indexer_spark.ops import sampling

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for df in (
        sampling.split_by_hash(docs),
        sampling.mixture_sample(docs, {"src1": 0.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    plan = (
        sampling.pack_sequences(driver_docs, budget=512, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_span_dedup_semantics(spark):
    # doc 1 owns the shared 5-gram "a b c d e"; doc 2 loses exactly the
    # 5 covered positions; unique and too-short docs are untouched
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e q r s"),
        (3, "p q r s t"),
        (4, "short one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in dedup.span_dedup(docs, n=5).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == "a b c d e f g h"
    assert out[2]["n_removed"] == 5 and out[2]["text_clean"] == "x y q r s"
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] == 5
    assert out[4]["n_removed"] == 0 and out[4]["n_tokens"] == 2


def test_span_dedup_overlap_coverage(spark):
    # doc 2 duplicates a 7-token run of doc 1: its three overlapping
    # duplicated 5-grams must union to 7 removed positions, not 15 —
    # i.e. coverage union == Lee et al.'s "substring of length >= n"
    rows = [
        (1, "m1 m2 u v w x y z a1 a2"),
        (2, "k1 u v w x y z a1 k2 k3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in dedup.span_dedup(docs, n=5).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 7
    assert out[2]["text_clean"] == "k1 k2 k3"


def test_span_dedup_oracle(driver_docs, con):
    _cmp(dedup.span_dedup(driver_docs, n=10), con, dedup.span_dedup_sql(n=10))


def test_span_dedup_removes_injected_dups(driver_docs):
    # the sf corpus carries injected near-duplicates: the op must find
    # real cross-doc spans, and every fully-removed doc must be a doc
    # whose whole text re-occurs inside some earlier doc
    out = dedup.span_dedup(driver_docs, n=10)
    assert out.where("n_removed > 0").count() > 0
    full = [r["doc_id"] for r in out.where("n_removed = n_tokens AND n_tokens > 0").collect()]
    if full:
        texts = {r["doc_id"]: r["content"] for r in driver_docs.collect()}
        for d in full[:3]:
            assert any(
                texts[d] in t for i, t in texts.items() if i < d
            ), f"doc {d} fully removed but no earlier superstring"


def test_span_dedup_plan_shape(spark, driver_docs):
    # distributed shape: no cartesian product, no Python row UDF — the
    # rebuild is codegen'd higher-order filters, the only wide ops are
    # the gram-hash aggregation and the per-doc start aggregation
    plan = (
        dedup.span_dedup(driver_docs, n=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
