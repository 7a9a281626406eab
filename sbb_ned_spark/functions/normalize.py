"""Content normalization + tokenization as native Catalyst expressions.

Analog of the reference's surface normalization
(`/root/reference/qurator/sbb_ned/embeddings/base.py:49-105`: lowercase,
split on separators, strip non-word chars) re-targeted at source code and
kept entirely JVM-side (whole-stage codegen; no Python in this hot path).

Hot-path design: token strings are hashed ONCE (`tok_hashes`); skeleton,
shingles and token sets are all derived in hash space. Two measured
pitfalls drove this shape (117k files, local[8]):

- per-token regex (`rlike('^[0-9]+$')`) in the skeleton cost ~16s —
  replaced by an exception-free ``try_cast``;
- per-shingle string building (`concat_ws(slice(...))` inside a lambda)
  is quadratic-ish and allocation-bound (300s vs 17s on a 20k sample) —
  replaced by shift/XOR combination of consecutive token hashes via
  ``zip_with`` over shifted slices.
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
    """Rename-invariant token stream (string form — reference parity /
    debugging; the hot path uses :func:`skeleton_hashes`).

    Keywords and numeric literals kept verbatim, identifiers
    canonicalized to ``ID``. Keeping literal constants makes the skeleton
    rename-invariant but still discriminative between structurally-similar
    non-duplicates (the same role `match_uniqueness` plays in the
    reference ranking, `index.py:692-703`)."""
    kw = F.lit(KEYWORDS)  # array literal, broadcast as part of the plan
    return F.transform(
        toks,
        lambda t: F.when(F.array_contains(kw, t), t)
        .when(t.try_cast("bigint").isNotNull(), t)
        .otherwise(F.lit("ID")),
    )


def skeleton_hashes(toks: Column, th: Column) -> Column:
    """Hash-space skeleton: keywords and numeric literals keep their own
    token hash, identifiers collapse to a single ID hash. No skeleton
    string array is materialized; the numeric test is ``try_cast``
    (exception-free JVM parse), not a per-token regex."""
    kw = F.lit(KEYWORDS)
    id_hash = F.xxhash64(F.lit("\x00__ID__"))  # constant-folded literal
    return F.zip_with(
        toks,
        th,
        lambda t, h: F.when(F.array_contains(kw, t), h)
        .when(t.try_cast("bigint").isNotNull(), h)
        .otherwise(id_hash),
    )


def shingle_hashes_from_hashes(th: Column, k: int = 3) -> Column:
    """k-gram shingle hashes (bigint) from an already-hashed token array.

    A k-gram hash is the positional shift/XOR combination of k
    consecutive token hashes, built with ``zip_with`` over shifted
    ``slice``s so every input is evaluated once per row (O(n·k)).
    Collision quality is ample for blocking keys."""
    n = F.size(th)

    def _mix(shift: int):
        # factory: zip_with inspects lambda arity, so the shift must be
        # closed over, not passed as a defaulted third parameter
        return lambda x, y: x.bitwiseXOR(F.shiftleft(y, shift))

    acc = F.transform(th, lambda x: F.shiftleft(x, k - 1))
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(th, j + 1, n), _mix(k - 1 - j))
    grams = F.array_distinct(F.filter(acc, lambda x: x.isNotNull()))
    return F.when(n >= k, grams).otherwise(F.array_distinct(th))


def shingle_hashes(toks: Column, k: int = 3) -> Column:
    """k-gram shingle hashes over a (string) token array."""
    return shingle_hashes_from_hashes(F.transform(toks, lambda t: F.xxhash64(t)), k)


def token_hashes(toks: Column) -> Column:
    """Distinct sorted token hash set (bigint) — compact set representation
    shipped through shuffles instead of raw content (SURVEY.md §7.4.4)."""
    return F.array_sort(F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t))))


def with_normalized_columns(df, content_col: str = "content", k: int = 3, min_len: int = 2):
    """Attach all derived normalization columns.

    Built as a withColumn chain of NON-cheap aliases on purpose:
    CollapseProject keeps multiply-referenced expensive aliases
    materialized, so ``tokens`` and ``tok_hashes`` are evaluated once per
    row even though four downstream columns consume them."""
    df = df.withColumn("norm_content", norm_content(F.col(content_col)))
    df = df.withColumn("tokens", tokens(F.col("norm_content"), min_len))
    df = df.withColumn("tok_hashes", F.transform("tokens", lambda t: F.xxhash64(t)))
    df = df.withColumn("skel_hashes", skeleton_hashes(F.col("tokens"), F.col("tok_hashes")))
    return (
        df.withColumn("shingles", shingle_hashes_from_hashes(F.col("tok_hashes"), k))
        .withColumn(
            "skeleton_shingles", shingle_hashes_from_hashes(F.col("skel_hashes"), k + 1)
        )
        .withColumn("token_set", F.array_sort(F.array_distinct("tok_hashes")))
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("norm_sha", F.sha2("norm_content", 256))
    )
