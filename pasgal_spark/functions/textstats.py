"""Text analytics for training-data pipelines over the ``documents`` table.

All operators are pure column expressions (JVM-side, whole-stage codegen —
no Python in the hot path). Tokenization, hashing and scoring are defined
portably so DuckDB oracles can recompute them exactly:

- tokens:   split(lower(text), '[^a-z0-9]+') minus empties
- hash:     first 15 hex chars of md5 → int64 (identical in Spark/DuckDB)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007
TOK_MOD = 1_000_003

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "pour", "que"],
    "es": ["el", "los", "de", "y", "es", "un", "una", "para", "con", "se"],
}


def tokens(col: Column) -> Column:
    """Lowercase word tokens (whitespace/punct split, empties removed)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """k-token shingles over an ALREADY-MATERIALIZED token array column.

    ``t`` must be a plain attribute (e.g. the output of a prior projection
    ``.select(tokens(col).alias("t"))``): the transform lambda references it
    ~3x per shingle position, and Catalyst inlines subexpressions into each
    reference — handing it the raw ``tokens(text)`` expression re-runs the
    regex tokenizer O(k·n_tokens) times per row (measured 5x the whole
    pipeline cost at sf0.1).
    """
    n = F.size(t)
    win = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + off) for off in range(k)]
        ),
    )
    return F.when(n >= k, win).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, k: int = 3) -> Column:
    """k-token shingles (space-joined windows) — the dedup unit for MinHash.

    Single-expression convenience form; empty array when fewer than k
    tokens. DuckDB twin uses 1-based list indexing with range().
    HOT PATHS should tokenize in a separate projection and call
    ``shingles_from_tokens`` instead (see its docstring).
    """
    return shingles_from_tokens(tokens(col), k)


def portable_hash(col: Column) -> Column:
    """Deterministic cross-engine string hash → non-negative int64.

    First 15 hex chars of md5 (< 2^60). DuckDB twin:
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace/regex token counting."""
    return docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )


def _stop_hits(toks: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, distinct_ratio, stop_ratio, quality).

    Heuristic document-quality features: token count, vocabulary diversity,
    stopword density; quality = linear blend, rounded for cross-engine
    comparability.
    """
    t = tokens(F.col("text"))
    docs = docs.select("doc_id", t.alias("toks"))
    n = F.size("toks")
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct("toks")) / n).otherwise(0.0)
    stop_ratio = F.when(n > 0, _stop_hits(F.col("toks"), "en") / n).otherwise(0.0)
    quality = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.2) * F.least(n / F.lit(100.0), F.lit(1.0))
    )

    # Portable 4-decimal round: floor(x * 1e4 + 0.5) / 1e4. Engine round()
    # implementations disagree on decimal-halfway doubles (0.23275 rounded
    # to 0.2327 by Spark's HALF_UP-on-exact-binary but 0.2328 by DuckDB —
    # first seen at the sf1 tier); floor over the identical IEEE product
    # is bit-deterministic across engines. Ratios are non-negative, so
    # floor(+0.5) == round-half-up exactly.
    def r4(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        r4(distinct_ratio).alias("distinct_ratio"),
        r4(stop_ratio).alias("stop_ratio"),
        r4(quality).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — stopword-overlap language heuristic.

    Deterministic argmax with fixed priority en > de > fr > es on ties.
    """
    t = tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("toks"))
    en, de, fr, es = [ _stop_hits(F.col("toks"), l) for l in ("en", "de", "fr", "es") ]
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — position-weighted rolling-hash fingerprint.

    fp = Σ_pos (pos+1) * (H(tok) mod TOK_MOD)  mod FP_MOD  (pos 1-based).
    Order-sensitive (unlike a bag-of-words hash) yet cross-engine exact.
    """
    t = tokens(F.col("text"))
    exploded = docs.select("doc_id", F.posexplode(t).alias("pos", "tok"))
    contrib = (F.col("pos") + 1) * (portable_hash(F.col("tok")) % TOK_MOD)
    return (
        exploded.groupBy("doc_id")
        .agg((F.sum(contrib) % FP_MOD).alias("fingerprint"))
    )
