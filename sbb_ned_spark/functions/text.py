"""Text-analysis functions for training-data pipelines — all native
Catalyst expressions (language-ID heuristic, quality scoring, token
counting, document fingerprinting).

Each helper returns Columns so it fuses into whole-stage codegen; the
matching ANSI-SQL oracles live in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language for the rule-based
# language-ID heuristic (n-gram/stopword approach)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "des"],
}


def doc_token_array(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace tokenization count (the cheap token estimator)."""
    return F.size(doc_token_array(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish sub-word estimate: alphanumeric runs + punctuation marks
    each count as one token."""
    runs = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return F.size(runs) + punct


def language_id(text: Column) -> Column:
    """Stopword-overlap language guess; deterministic tie-break by
    language code order (en > de > es > fr on equal counts)."""
    toks = doc_token_array(text)
    scores = {
        lang: F.size(F.array_intersect(toks, F.lit(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse priority so earlier langs win ties
    for lang in ["fr", "es", "de", "en"]:
        s = scores[lang]
        cond = s >= best_score
        best = F.when(cond & (s > 0), F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword ratios (quality scoring)."""
    n_chars = F.length(text)
    toks = doc_token_array(text)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    all_stop = F.lit(sorted({w for ws in LANG_STOPWORDS.values() for w in ws}))
    stop_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(all_stop, t))) / n_tokens,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_tok_len": mean_tok_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
    }


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long-enough docs with normal token lengths and low
    punctuation score high — deterministic, oracle-replicable."""
    f = quality_features(text)
    len_ok = F.least(f["n_tokens"] / F.lit(20.0), F.lit(1.0))
    tok_ok = F.when(
        (f["mean_tok_len"] >= 3) & (f["mean_tok_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(f["punct_ratio"] * 5, F.lit(1.0))
    return F.round((len_ok * 0.4 + tok_ok * 0.3 + punct_ok * 0.3), 6)


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: sha256 over lowercased,
    whitespace-collapsed text (rolling-hash slot; F14 analog
    `/root/reference/qurator/sbb_ned/webapp/app.py:289-291`)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.sha2(norm, 256)
