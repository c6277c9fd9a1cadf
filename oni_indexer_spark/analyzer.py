"""Text analysis — the engine's stand-in for Solr's ``text_en`` analyzer.

The reference delegates tokenization to Solr field types
(``schema.json:5,16,20``; dynamic ``*_name``/``*_description`` fields at
``schema.json:44-59``). Solr's standard analyzer lower-cases and splits on
non-word boundaries; for the source-code corpus we use a code-aware token
alphabet ``[a-z0-9_]+`` (identifiers survive as single terms, ``snake_case``
stays intact, punctuation/operators are separators).

Three implementations, all PROVABLY identical (tests/test_analyzer.py):

- :func:`tokens_col`    — JVM-side column expression (whole-stage codegen,
  no Python in the hot path). Default for the build pipeline.
- :func:`tokens_pandas` — vectorized Arrow ``pandas_udf`` (the north-star's
  "tokenize with vectorized Arrow UDFs"); same output, used when a caller
  wants the UDF path (and as the extension point for stemming/stopwords
  that a regex cannot express).
- :func:`tokenize_py`   — driver-side Python, for query strings + oracles.

``duckdb_tokens_sql`` renders the same analyzer in DuckDB SQL so the
driver's oracle compares are exact, not approximate.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One token alphabet everywhere. Lowercase first, then extract.
TOKEN_PATTERN = r"[a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokens_col(col: Column | str) -> Column:
    """Tokenize a string column JVM-side. NULL-safe (NULL -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0),
        F.array().cast("array<string>"),
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_pandas(s: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer; identical output to :func:`tokens_col`."""
    return s.fillna("").str.lower().str.findall(TOKEN_PATTERN)


def tokenize_py(text: str | None) -> list[str]:
    """Driver-side tokenizer for query strings (same alphabet)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def query_terms(text: str, analyzer: str = "code") -> list[str]:
    """Distinct query terms, first-occurrence order (Solr ``q.op=OR`` over
    ``main_search``, ``config.json:38``; duplicate terms collapse). Query
    strings run through the SAME analyzer chain as the indexed content."""
    seen: dict[str, None] = {}
    for t in analyzer_tokenize_py(text, analyzer):
        seen.setdefault(t)
    return list(seen)


def duckdb_tokens_sql(col: str) -> str:
    """The same analyzer as a DuckDB SQL expression (for oracle parity)."""
    return f"coalesce(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}'), [])"


# --- text_en: the Solr ``text_en`` field type's analyzer chain ------------
# (schema.json:5,20: lowercase -> English stopwords -> stemming). Two
# stemmer variants:
#
# - "text_en":        stopwords + S-stemmer (Harman 1991's three rules) —
#   chosen because it is EXACTLY expressible in both Spark SQL and DuckDB
#   SQL, so the driver oracle verifies the full analyzer chain
#   hash-exactly. (DuckDB's snowball ``stem()`` lives in the fts
#   extension, which cannot be installed in this offline sandbox.)
# - "text_en_porter": stopwords + the classic Porter (1980) stemmer,
#   vectorized Python via the tokens_pandas extension point — Solr's
#   PorterStemFilter analogue; verified by pytest parity between the
#   Spark path and the pure-Python twin (no SQL oracle possible offline).

# Lucene's classic English stop set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET)
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]


def s_stem_py(w: str) -> str:
    """Harman's S-stemmer: -ies -> -y (unless -eies/-aies), else -es ->
    -e (unless -aes/-ees/-oes), else drop trailing -s (unless -us/-ss)."""
    if w.endswith("ies") and not (w.endswith("eies") or w.endswith("aies")):
        return w[:-3] + "y"
    if w.endswith("es") and not (
        w.endswith("aes") or w.endswith("ees") or w.endswith("oes")
    ):
        return w[:-1]
    if w.endswith("s") and not (w.endswith("us") or w.endswith("ss")):
        return w[:-1]
    return w


def _s_stem_col(t: Column) -> Column:
    ln = F.length(t)
    return (
        F.when(
            t.endswith("ies") & ~(t.endswith("eies") | t.endswith("aies")),
            F.concat(F.substring(t, 1, ln - 3), F.lit("y")),
        )
        .when(
            t.endswith("es")
            & ~(t.endswith("aes") | t.endswith("ees") | t.endswith("oes")),
            F.substring(t, 1, ln - 1),
        )
        .when(
            t.endswith("s") & ~(t.endswith("us") | t.endswith("ss")),
            F.substring(t, 1, ln - 1),
        )
        .otherwise(t)
    )


def tokens_text_en_col(col: Column | str) -> Column:
    """JVM-side text_en chain: tokenize -> drop stopwords -> S-stem."""
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = tokens_col(col)
    kept = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return F.transform(kept, _s_stem_col)


def tokenize_text_en_py(text: str | None) -> list[str]:
    return [s_stem_py(t) for t in tokenize_py(text) if t not in set(EN_STOPWORDS)]


def duckdb_tokens_text_en_sql(col: str) -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    case = (
        "CASE "
        "WHEN t LIKE '%ies' AND NOT (t LIKE '%eies' OR t LIKE '%aies')"
        " THEN substr(t, 1, len(t)-3) || 'y' "
        "WHEN t LIKE '%es' AND NOT (t LIKE '%aes' OR t LIKE '%ees' OR t LIKE '%oes')"
        " THEN substr(t, 1, len(t)-1) "
        "WHEN t LIKE '%s' AND NOT (t LIKE '%us' OR t LIKE '%ss')"
        " THEN substr(t, 1, len(t)-1) "
        "ELSE t END"
    )
    return (
        f"list_transform(list_filter({duckdb_tokens_sql(col)},"
        f" t -> t NOT IN ({stop})), t -> {case})"
    )


# --- classic Porter (1980) stemmer, vectorized over pandas ---------------

def porter_stem_py(w: str) -> str:
    """The Porter 1980 algorithm (from the published description —
    An algorithm for suffix stripping, Program 14(3)). Operates on
    lowercase ascii words; non-alpha tokens pass through unchanged."""
    if len(w) <= 2 or not w.isalpha():
        return w

    def is_cons(word: str, i: int) -> bool:
        c = word[i]
        if c in "aeiou":
            return False
        if c == "y":
            return i == 0 or not is_cons(word, i - 1)
        return True

    def measure(stem: str) -> int:
        # number of VC sequences in the C?(VC)^m V? form
        m = 0
        prev_vowel = False
        for i in range(len(stem)):
            v = not is_cons(stem, i)
            if prev_vowel and not v:
                m += 1
            prev_vowel = v
        return m

    def has_vowel(stem: str) -> bool:
        return any(not is_cons(stem, i) for i in range(len(stem)))

    def ends_double_cons(s: str) -> bool:
        return len(s) >= 2 and s[-1] == s[-2] and is_cons(s, len(s) - 1)

    def cvc(s: str) -> bool:
        # *o: stem ends cvc where the final c is not w, x or y
        if len(s) < 3:
            return False
        return (
            is_cons(s, len(s) - 3)
            and not is_cons(s, len(s) - 2)
            and is_cons(s, len(s) - 1)
            and s[-1] not in "wxy"
        )

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif measure(w) == 1 and cvc(w):
            w = w + "e"
    # step 1c
    if w.endswith("y") and has_vowel(w[:-1]):
        w = w[:-1] + "i"

    def replace(word: str, rules: list[tuple[str, str]], min_m: int) -> str:
        for suf, rep in rules:
            if word.endswith(suf):
                stem = word[: len(word) - len(suf)]
                if measure(stem) > min_m - 1:
                    return stem + rep
                return word
        return word

    # step 2 (m>0)
    w = replace(
        w,
        [
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
            ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
            ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
            ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
            ("biliti", "ble"),
        ],
        1,
    )
    # step 3 (m>0)
    w = replace(
        w,
        [
            ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
            ("ical", "ic"), ("ful", ""), ("ness", ""),
        ],
        1,
    )
    # step 4 (m>1)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not (stem.endswith("s") or stem.endswith("t")):
                break
            if measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = measure(stem)
        if m > 1 or (m == 1 and not cvc(stem)):
            w = stem
    # step 5b
    if measure(w) > 1 and ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def tokenize_text_en_porter_py(text: str | None) -> list[str]:
    stop = set(EN_STOPWORDS)
    return [porter_stem_py(t) for t in tokenize_py(text) if t not in stop]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_text_en_porter_pandas(s: pd.Series) -> pd.Series:
    """Arrow-vectorized text_en_porter chain (the tokens_pandas extension
    point: stopwords + porter are not regex-expressible JVM-side)."""
    return s.map(tokenize_text_en_porter_py)


def analyzer_tokens(col: Column | str, analyzer: str = "code") -> Column:
    """Tokenizer column for a configured analyzer."""
    if analyzer == "code":
        return tokens_col(col)
    if analyzer == "text_en":
        return tokens_text_en_col(col)
    if analyzer == "text_en_porter":
        return tokens_text_en_porter_pandas(
            F.col(col) if isinstance(col, str) else col
        )
    raise ValueError(f"unknown analyzer: {analyzer}")


def analyzer_tokenize_py(text: str | None, analyzer: str = "code") -> list[str]:
    if analyzer == "code":
        return tokenize_py(text)
    if analyzer == "text_en":
        return tokenize_text_en_py(text)
    if analyzer == "text_en_porter":
        return tokenize_text_en_porter_py(text)
    raise ValueError(f"unknown analyzer: {analyzer}")


def analyzer_tokens_sql(col: str, analyzer: str = "code") -> str:
    if analyzer == "code":
        return duckdb_tokens_sql(col)
    if analyzer == "text_en":
        return duckdb_tokens_text_en_sql(col)
    raise ValueError(f"no DuckDB twin for analyzer: {analyzer}")
