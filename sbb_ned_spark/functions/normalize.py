"""Content normalization + tokenization as native Catalyst expressions.

Analog of the reference's surface normalization
(`/root/reference/qurator/sbb_ned/embeddings/base.py:49-105`: lowercase,
split on separators, strip non-word chars) re-targeted at source code and
kept entirely JVM-side (whole-stage codegen; no Python in this hot path).

Produces, per file row:
- ``norm_content``  — comments stripped, lowercased, whitespace collapsed
- ``tokens``        — identifier/word tokens (F1/F3 analogs)
- ``skeleton``      — tokens with identifiers canonicalized to ``ID`` and
  numbers to ``N`` (rename-invariant structure; plays the role the
  reference's anagram/embedding normalization plays for OCR'd surfaces,
  `embeddings/anagram.py:21-38`)
- ``shingles`` / ``skeleton_shingles`` — k-gram shingle hash arrays
  (bigint) feeding MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language keywords kept verbatim in the skeleton (identifier-vs-keyword
# distinction; closed set spanning the fixture langs)
KEYWORDS = (
    "def return if else elif for while class import from package func var let const "
    "public private static void int float double string bool true false null none "
    "new try except catch finally switch case break continue range len print struct "
    "type interface map chan go defer lambda yield async await with pass raise in is "
    "not and or limit"
).split()


def norm_content(content: Column) -> Column:
    """Strip line comments, lowercase, collapse whitespace runs."""
    no_comments = F.regexp_replace(content, r"(?m)(#|//).*$", "")
    collapsed = F.regexp_replace(no_comments, r"\s+", " ")
    return F.trim(F.lower(collapsed))


def tokens(norm: Column, min_len: int = 2) -> Column:
    """Split normalized content on non-word runs; keep tokens >= min_len."""
    parts = F.split(norm, r"[^a-z0-9_]+")
    return F.filter(parts, lambda t: F.length(t) >= min_len)


def skeleton(toks: Column) -> Column:
    """Rename-invariant token stream: keywords and numeric literals kept
    verbatim, identifiers canonicalized to ``ID``.

    Keeping literal constants makes the skeleton rename-invariant but still
    discriminative between structurally-similar non-duplicates (the same
    role `match_uniqueness` plays in the reference ranking,
    `index.py:692-703`)."""
    kw = F.lit(KEYWORDS)  # array literal, broadcast as part of the plan
    return F.transform(
        toks,
        lambda t: F.when(F.array_contains(kw, t), t)
        .when(t.rlike(r"^[0-9]+$"), t)
        .otherwise(F.lit("ID")),
    )


def shingle_hashes(toks: Column, k: int = 3) -> Column:
    """k-gram shingles over a token array, hashed to bigint (xxhash64).

    Entirely native: sequence + slice + concat_ws + xxhash64. Returns
    array<bigint>; distinct-ness is applied by the caller.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws("\x01", F.slice(toks, i + 1, k)))
    hashed = F.transform(grams, lambda g: F.xxhash64(g))
    return F.when(n >= k, F.array_distinct(hashed)).otherwise(
        F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t)))
    )


def token_hashes(toks: Column) -> Column:
    """Distinct sorted token hash set (bigint) — compact set representation
    shipped through shuffles instead of raw content (SURVEY.md §7.4.4)."""
    return F.array_sort(F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t))))


def with_normalized_columns(df, content_col: str = "content", k: int = 3, min_len: int = 2):
    """Attach all derived normalization columns in one projection."""
    norm = norm_content(F.col(content_col))
    toks = tokens(norm, min_len)
    skel = skeleton(toks)
    return (
        df.withColumn("norm_content", norm)
        .withColumn("tokens", toks)
        .withColumn("skeleton", skel)
        .withColumn("shingles", shingle_hashes(F.col("tokens"), k))
        .withColumn("skeleton_shingles", shingle_hashes(F.col("skeleton"), k + 1))
        .withColumn("token_set", token_hashes(F.col("tokens")))
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("norm_sha", F.sha2(norm, 256))
    )
