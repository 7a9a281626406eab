"""Corpus-level cleaning operators for LLM training-data pipelines.

Three families, all oracle-checkable DataFrame plans:

- chunk_dedup        : C4-style cross-document boilerplate removal — split
                       each document into fixed-width token chunks, drop
                       every chunk that occurs in >= min_docs distinct
                       documents, reassemble the survivors in order.  The
                       same plan shape as C4's "discard any line seen more
                       than once in the corpus" rule (Raffel et al. 2020,
                       §2.2), over token chunks because the synthetic
                       corpus has no newlines.
- repetition_stats   : Gopher-style within-document repetition signals
                       (Rae et al. 2021, appendix A1.1) — duplicated-token
                       fraction, top-bigram fraction, duplicated-trigram
                       fraction — the standard "drop pathologically
                       repetitive documents" filter inputs.
- pii_scrub          : regex scrubbing of emails / phone numbers / IPv4
                       addresses with per-document match counts — the
                       C4/Dolma-style PII redaction pass, entirely native
                       regexp_replace / regexp_count (JVM-side, no UDF).

Design note (100 TB): chunk_dedup and repetition_stats shuffle on 60-bit
sha hash keys (:func:`~sbb_ned_spark.operators.dedup._sha60`) rather than
raw strings, so the wide exchanges carry 8-byte keys; the boilerplate
lookup is a plain equi-join Catalyst can shuffle-partition (AQE handles
the hot-chunk skew), never a broadcast of an unbounded chunk table.
pii_scrub is a narrow map — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sbb_ned_spark.operators.dedup import _sha60, _token_array
from sbb_ned_spark.functions.partitioning import ensure_min_parallelism


def _chunk_array(text_col: str, chunk_tokens: int):
    """Non-overlapping chunk_tokens-wide token chunks (last chunk may be
    short); the corpus analog of C4's line unit."""
    toks = _token_array(text_col)
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(chunk_tokens))).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens))
    )
    return F.when(n > 0, chunks).otherwise(F.array().cast("array<string>"))


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """C4-style cross-document boilerplate removal.

    Every chunk occurring in >= min_docs DISTINCT documents is boilerplate
    and dropped from every document that carries it; the survivors are
    reassembled in original order.  Returns one row per input document:
    (doc_id, n_chunks, n_boiler, kept_text).

    Plan: posexplode -> 60-bit sha chunk key -> groupBy(key) countDistinct
    -> equi-join the boilerplate keys back -> one groupBy(doc) reassembly
    via array_sort(collect_list(struct(pos, chunk))).  Two shuffles total,
    both on 8-byte keys; the reassembly groupBy is partial-aggregated
    map-side.  countDistinct is exact (needed for the >= min_docs cut and
    the DuckDB oracle); at 10^12 chunks the documented relaxation is
    approx_count_distinct with a small over-cut tolerance.
    """
    chunks = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(_chunk_array(text_col, chunk_tokens)).alias("pos", "chunk"),
    ).withColumn("ck", _sha60(F.col("chunk")))
    boiler = (
        chunks.groupBy("ck")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("ck", F.lit(True).alias("is_boiler"))
    )
    flagged = chunks.join(boiler, "ck", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False))
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_boiler"), F.struct(F.col("pos"), F.col("chunk")))
        )
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("is_boiler").cast("long")).alias("n_boiler"),
            F.concat_ws(" ", F.transform(kept, lambda s: s["chunk"])).alias("kept_text"),
        )
        .select(F.col("id").alias("doc_id"), "n_chunks", "n_boiler", "kept_text")
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (doc_id, n_tokens, dup_token_frac, top_bigram_frac,
    dup_trigram_frac):

    - dup_token_frac   : fraction of token occurrences whose token occurs
                         more than once in the document
    - top_bigram_frac  : occurrences of the most frequent bigram / total
                         bigrams (0 when < 2 tokens)
    - dup_trigram_frac : fraction of trigram occurrences whose trigram
                         occurs more than once (0 when < 3 tokens)

    Plan: ONE tagged explode over {1,2,3}-grams -> groupBy(doc, n, 60-bit
    gram key) count -> one conditional groupBy(doc) -> left-join back to
    the document spine (empty documents keep zero signals).  Both wide
    stages partial-aggregate map-side and shuffle 8-byte keys; per-doc
    cardinality bounds every group.
    """
    def _grams(n: int):
        toks = F.col("toks")
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1)))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        tagged = F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
        return F.transform(
            tagged, lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))
        )

    spine = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"), _token_array(text_col).alias("toks")
    )
    exploded = spine.select(
        "id",
        F.explode(F.flatten(F.array(_grams(1), _grams(2), _grams(3)))).alias("g"),
    ).select("id", F.col("g.n").alias("n"), _sha60(F.col("g.gram")).alias("gk"))
    counts = exploded.groupBy("id", "n", "gk").agg(F.count("*").alias("c"))
    stats = counts.groupBy("id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("tot1"),
        F.sum(F.when((F.col("n") == 1) & (F.col("c") > 1), F.col("c"))).alias("dup1"),
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("top2"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("tot2"),
        F.sum(F.when((F.col("n") == 3) & (F.col("c") > 1), F.col("c"))).alias("dup3"),
        F.sum(F.when(F.col("n") == 3, F.col("c"))).alias("tot3"),
    )

    def _frac(num, den):
        return F.round(
            F.when(
                F.coalesce(den, F.lit(0)) > 0,
                F.coalesce(num, F.lit(0)).cast("double") / den,
            ).otherwise(F.lit(0.0)),
            6,
        )

    return (
        spine.select("id")
        .join(stats, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("tot1", F.lit(0)).cast("long").alias("n_tokens"),
            _frac(F.col("dup1"), F.col("tot1")).alias("dup_token_frac"),
            _frac(F.col("top2"), F.col("tot2")).alias("top_bigram_frac"),
            _frac(F.col("dup3"), F.col("tot3")).alias("dup_trigram_frac"),
        )
    )


# RE2-compatible (and java.util.regex-compatible) so the DuckDB oracle can
# run the IDENTICAL patterns: no backreferences, no lookaround.
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b555-[0-9]{4}\b",
}
PII_TOKENS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}
# fixed application order — email first (its char class overlaps the ip
# digits-and-dots shape), then ip, then phone; the oracle replays the
# same order so intermediate rewrites can never diverge
PII_ORDER = ("email", "ip", "phone")


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction pass: count then replace emails / IPv4s / phone
    numbers with typed placeholder tokens.

    Returns (doc_id, n_emails, n_ips, n_phones, n_chars, scrubbed_sha) —
    the sha256 of the scrubbed text stands in for the (large) text column
    so the value oracle stays compact.  Entirely native regexp_count /
    regexp_replace: a narrow map with no shuffle, fused into whole-stage
    codegen.
    """
    text = F.col(text_col)
    counts = {
        k: F.regexp_count(text, F.lit(p)).alias(f"n_{k}s")
        for k, p in PII_PATTERNS.items()
    }
    scrubbed = text
    for k in PII_ORDER:
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[k], PII_TOKENS[k])
    return ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        counts["email"],
        counts["ip"],
        counts["phone"],
        F.length(scrubbed).alias("n_chars"),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"),
    )
