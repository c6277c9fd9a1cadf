"""Text-analysis operators for a training-data pipeline over the corpus:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure ``pyspark.sql.functions`` expressions
(whole-stage codegen, no Python in the hot path), each with an exact
DuckDB oracle twin (``*_sql``).

These extend the reference's per-field transforms (SURVEY.md §2.B —
validate/facet-tokenize are the same shape of work) to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oni_indexer_spark.analyzer import duckdb_tokens_sql, tokens_col

# Tiny deterministic stopword inventories for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
}

MOD = 1_000_000_007


def _portable_hash(col: Column, seed: str = "") -> Column:
    """32-bit hash identical in Spark and DuckDB: first 8 hex chars of
    md5(seed || value), parsed as an integer."""
    src = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(src), 1, 8), 16, 10).cast("long")


def portable_hash_sql(expr: str, seed: str = "") -> str:
    src = f"'{seed}' || {expr}" if seed else expr
    return f"('0x' || substr(md5({src}), 1, 8))::bigint"


def token_count(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.size(tokens_col("content")).cast("long").alias("n_tokens")
    )


def token_count_sql(table: str = "documents", text: str = "text") -> str:
    return (
        f"SELECT doc_id, len({duckdb_tokens_sql(text)})::bigint AS n_tokens FROM {table}"
    )


# BPE-ish subword pieces: the GPT-2-style pre-tokenizer regex shape —
# letter runs, digit runs, punctuation runs, each an eventual merge seed.
# A real BPE's merged-token count is bounded above by this piece count,
# so it's the standard cheap budget estimator for LLM training data.
SUBWORD_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def subword_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_subword_pieces): whitespace token count +
    BPE-ish pre-token piece count — the two budget numbers a training
    pipeline tracks per document."""
    ws = F.size(F.split(F.trim(F.col("content")), r"\s+"))
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("content"))) == 0, F.lit(0))
        .otherwise(ws)
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("content"), F.lit(SUBWORD_PATTERN), 0))
        .cast("long")
        .alias("n_subword_pieces"),
    )


def subword_count_sql(table: str = "documents", text: str = "text") -> str:
    return f"""
SELECT doc_id,
  CASE WHEN len(trim({text})) = 0 THEN 0
       ELSE len(str_split_regex(trim({text}), '\\s+')) END::bigint AS n_ws_tokens,
  len(regexp_extract_all({text}, '{SUBWORD_PATTERN}'))::bigint AS n_subword_pieces
FROM {table}
""".strip()


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language scores + argmax prediction (deterministic
    tie-break: language code asc). Tokens bound to a named column first —
    the score expressions reference the array ~8x per row and must not
    re-run the tokenizer each time."""
    toks = F.col("toks")
    cols = {}
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))  # noqa: B023
        cols[lang] = F.round(
            F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0)), 6
        )
    pred = None
    best = None
    for lang in sorted(STOPWORDS):
        if pred is None:
            pred, best = F.lit(lang), cols[lang]
        else:
            pred = F.when(cols[lang] > best, F.lit(lang)).otherwise(pred)
            best = F.when(cols[lang] > best, cols[lang]).otherwise(best)
    return docs.select("doc_id", tokens_col("content").alias("toks")).select(
        "doc_id",
        *[cols[lang].alias(f"score_{lang}") for lang in sorted(STOPWORDS)],
        pred.alias("predicted_lang"),
    )


def lang_id_sql(table: str = "documents", text: str = "text") -> str:
    toks = duckdb_tokens_sql(text)
    score_exprs = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        score_exprs.append(
            f"round(CASE WHEN len(toks) > 0 THEN "
            f"len(list_filter(toks, x -> list_contains({arr}, x)))::double / len(toks) "
            f"ELSE 0.0 END, 6) AS score_{lang}"
        )
    langs = sorted(STOPWORDS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({best}, score_{lang})"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
s AS (SELECT doc_id, {", ".join(score_exprs)} FROM t)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)}, {pred} AS predicted_lang
FROM s
""".strip()


def quality_score(docs: DataFrame) -> DataFrame:
    """Cheap quality heuristics: token count, mean token length,
    non-alphanumeric character ratio, English stopword ratio, and a
    composite score in [0,1]. Tokens bound to a named column first
    (multi-referenced — see lang_id)."""
    toks = F.col("toks")
    n_toks = F.size(toks)
    n_chars = F.length(F.col("content"))
    alnum = F.length(F.regexp_replace(F.lower(F.col("content")), "[^a-z0-9_]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    mean_len = F.when(
        n_toks > 0, F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / n_toks
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, 1.0 - alnum / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_toks > 0, sw_hits / n_toks).otherwise(F.lit(0.0))
    len_score = F.least(n_toks / F.lit(100.0), F.lit(1.0))
    composite = 0.4 * len_score + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(
        sw_ratio * 5.0, F.lit(1.0)
    )
    return docs.select(
        "doc_id", "content", tokens_col("content").alias("toks")
    ).select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(composite, 6).alias("quality"),
    )


def quality_score_sql(table: str = "documents", text: str = "text") -> str:
    toks = duckdb_tokens_sql(text)
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks, {text} AS txt FROM {table}
),
m AS (
  SELECT doc_id,
    len(toks) AS n_toks,
    length(txt) AS n_chars,
    length(regexp_replace(lower(txt), '[^a-z0-9_]', '', 'g')) AS alnum,
    CASE WHEN len(toks) > 0 THEN
      list_reduce(list_prepend(0::bigint, list_transform(toks, x -> length(x)::bigint)), (a,b) -> a+b)::double / len(toks)
    ELSE 0.0 END AS mean_len,
    CASE WHEN len(toks) > 0 THEN
      len(list_filter(toks, x -> list_contains({sw}, x)))::double / len(toks)
    ELSE 0.0 END AS sw_ratio
  FROM t
)
SELECT doc_id,
  n_toks::bigint AS n_tokens,
  round(mean_len, 6) AS mean_token_len,
  round(CASE WHEN n_chars > 0 THEN 1.0 - alnum::double / n_chars ELSE 0.0 END, 6) AS punct_ratio,
  round(sw_ratio, 6) AS stopword_ratio,
  round(0.4 * least(n_toks / 100.0, 1.0)
      + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN 1.0 - alnum::double / n_chars ELSE 0.0 END)
      + 0.3 * least(sw_ratio * 5.0, 1.0), 6) AS quality
FROM m
""".strip()


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    ``fold(h = (h*31 + hash32(token)) mod 1e9+7)`` over the token stream —
    equal fingerprints ⇒ near-certain duplicate token sequences."""
    toks = tokens_col("content")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + _portable_hash(x)) % MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def fingerprint_sql(table: str = "documents", text: str = "text") -> str:
    toks = duckdb_tokens_sql(text)
    h = portable_hash_sql("b")
    return f"""
SELECT doc_id,
  list_reduce(
    list_prepend(0::bigint, list_transform({toks}, b -> {h})),
    (a, b) -> (a * 31 + b) % {MOD}
  ) AS fingerprint
FROM {table}
""".strip()


def repetition_score(docs: DataFrame) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText-style
    quality gate: excessively self-repeating documents are low-value
    training data — Rae et al. 2021, public): distinct-token fraction and
    duplicate-trigram fraction, plus the standard flag (dup-trigram
    ratio > 0.3 or distinct-token ratio < 0.3). Pure column expressions —
    whole-stage codegen, no shuffle, scan-parallel at any corpus size.

    The token array is bound to a named column in a first projection:
    referencing the raw tokenizer expression inside the trigram lambda
    would re-run the regex per sequence element — O(doc_len²) per doc
    (the r5 1M-doc scale bug found in the shingle path)."""
    toks = F.col("toks")
    n = F.size(toks)
    uniq_frac = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(1.0)
    )
    # trigram branch only evaluates when n >= 3 (CASE short-circuits):
    # sequence(1, n-2) would run DESCENDING for n < 3 and element_at
    # would hit index 0 under ANSI
    tri = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + F.lit(1)),
            F.element_at(toks, i + F.lit(2)),
        ),
    )
    dup_tri = F.when(
        n >= 3, 1.0 - F.size(F.array_distinct(tri)) / (n - 2)
    ).otherwise(F.lit(0.0))
    uniq_r = F.round(uniq_frac, 6)
    dup_r = F.round(dup_tri, 6)
    return docs.select("doc_id", tokens_col("content").alias("toks")).select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        uniq_r.alias("distinct_token_ratio"),
        dup_r.alias("dup_trigram_ratio"),
        ((dup_r > 0.3) | (uniq_r < 0.3)).alias("is_repetitive"),
    )


def repetition_score_sql(table: str = "documents", text: str = "text") -> str:
    toks = duckdb_tokens_sql(text)
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
m AS (
  SELECT doc_id, len(toks) AS n,
    CASE WHEN len(toks) > 0
         THEN len(list_distinct(toks))::double / len(toks) ELSE 1.0 END AS uniq_frac,
    CASE WHEN len(toks) >= 3
         THEN 1.0 - len(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))::double
              / (len(toks) - 2)
         ELSE 0.0 END AS dup_tri
  FROM t
)
SELECT doc_id, n::bigint AS n_tokens,
  round(uniq_frac, 6) AS distinct_token_ratio,
  round(dup_tri, 6) AS dup_trigram_ratio,
  (round(dup_tri, 6) > 0.3 OR round(uniq_frac, 6) < 0.3) AS is_repetitive
FROM m
""".strip()


# PII-ish patterns a training pipeline counts per document before
# filtering/redaction (public C4/Dolma-style preprocessing stage). The
# same regex strings run in Spark and DuckDB (both RE2-ish dialects for
# this subset), so the oracle is exact.
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phones": r"\b\+?[0-9][0-9()\-. ]{7,}[0-9]\b",
    "urls": r"https?://[^\s]+",
}


def pii_counts(docs: DataFrame) -> DataFrame:
    """Per-document counts of PII-shaped spans (emails, IPv4s, phone-like
    digit runs, URLs) + the any-hit flag a filtering stage keys on. Pure
    column expressions — codegen, scan-parallel, no shuffle."""
    counted = docs.select(
        "doc_id",
        *[
            F.size(F.regexp_extract_all(F.col("content"), F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )
    # has_pii from the already-computed count columns (second select) —
    # each regex evaluates exactly once per row regardless of whether
    # Catalyst's subexpression elimination fires (r4 VERDICT)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return counted.select("*", (total > 0).alias("has_pii"))


def pii_counts_sql(table: str = "documents", text: str = "text") -> str:
    count_exprs = ", ".join(
        f"len(regexp_extract_all({text}, '{pat}'))::bigint AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH c AS (SELECT doc_id, {count_exprs} FROM {table})
SELECT doc_id, {", ".join(f"n_{n}" for n in PII_PATTERNS)}, ({total}) > 0 AS has_pii
FROM c
""".strip()
