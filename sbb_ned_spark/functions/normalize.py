"""Content normalization + tokenization as native Catalyst expressions.

Analog of the reference's surface normalization
(`/root/reference/qurator/sbb_ned/embeddings/base.py:49-105`: lowercase,
split on separators, strip non-word chars) re-targeted at source code and
kept entirely JVM-side (whole-stage codegen; no Python in this hot path).

Division of labor (re-measured round 3, bench 117k files / 8 cores):
Catalyst does ONLY what it is fast at — regex extraction and xxhash64 —
and everything derived from the token hashes (skeleton, shingles, token
set, MinHash, trigram profile) happens in ONE fused numpy UDF
(`hashing.make_fused_features_udf`). Three measured Catalyst pitfalls
drove this split:

- ``split`` + length-filter lambda tokenization: 15.7 s; a single
  ``regexp_extract_all('[a-z0-9_]{2,}')`` pass produces the identical
  array in 2.0 s (regex is precompiled; no empty-string entries, no
  second pass);
- per-token ``try_cast('bigint')`` numeric test: +16 s over the hash
  pass alone — a precompiled ``rlike('^[0-9]+$')`` is ~7x cheaper (the
  semantic difference is >19-digit integer tokens, which try_cast
  rejects by overflow and rlike accepts — both rare and F1-neutral);
- ``zip_with``/``array_contains(lit([...]))`` inside lambdas allocate
  per ELEMENT (the keyword array literal is rebuilt per evaluation);
  ``isin`` compiles to a static InSet, and the skeleton substitution
  moved into the fused UDF entirely.
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
    """All ``[a-z0-9_]`` runs of length >= min_len, one regex pass."""
    return F.regexp_extract_all(norm, F.lit(f"[a-z0-9_]{{{min_len},}}"), 0)


def fixed_token_mask(toks: Column) -> Column:
    """Per-token boolean: keeps its own hash in the skeleton (keyword or
    numeric literal) vs collapses to the ID hash. Keywords via a static
    InSet, numerals via one precompiled regex."""
    return F.transform(
        toks, lambda t: t.isin(*KEYWORDS) | t.rlike("^[0-9]+$")
    )


def with_normalized_columns(df, content_col: str = "content", min_len: int = 2):
    """Attach the Catalyst-side normalization columns consumed by the
    fused feature UDF: norm_content, tokens, tok_hashes, fixed_mask,
    n_tokens, norm_sha.

    Built as a withColumn chain of NON-cheap aliases on purpose:
    CollapseProject keeps multiply-referenced expensive aliases
    materialized, so ``tokens`` is evaluated once per row even though
    three downstream columns consume it."""
    df = df.withColumn("norm_content", norm_content(F.col(content_col)))
    df = df.withColumn("tokens", tokens(F.col("norm_content"), min_len))
    return (
        df.withColumn("tok_hashes", F.transform("tokens", lambda t: F.xxhash64(t)))
        .withColumn("fixed_mask", fixed_token_mask(F.col("tokens")))
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("norm_sha", F.sha2("norm_content", 256))
    )
