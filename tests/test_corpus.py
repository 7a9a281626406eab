"""Unit semantics for the corpus-cleaning operators (operators/corpus.py):
crafted inputs with hand-computed expectations, independent of the DuckDB
oracle replica (tests/test_entry_oracle.py covers those end to end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sbb_ned_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_dedup_removes_cross_doc_chunks(spark):
    boiler = " ".join(f"b{i}" for i in range(8))  # one full 8-token chunk
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"c{i}" for i in range(5))  # short tail chunk
    rows = [
        (1, f"{boiler} {uniq_a}"),
        (2, f"{boiler} {uniq_b}"),
        (3, uniq_a.replace("a", "z")),  # no shared chunks
    ]
    out = {
        r["doc_id"]: r
        for r in corpus.chunk_dedup(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["kept_text"] == uniq_a
    assert out[2]["n_boiler"] == 1 and out[2]["kept_text"] == uniq_b
    assert out[3]["n_boiler"] == 0 and out[3]["kept_text"] == out[3]["kept_text"].strip()


def test_chunk_dedup_all_boiler_doc_keeps_empty_string(spark):
    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [(1, boiler), (2, boiler), (3, "solo text here")]
    out = {
        r["doc_id"]: r
        for r in corpus.chunk_dedup(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out[1]["kept_text"] == "" and out[1]["n_boiler"] == 1
    assert out[3]["kept_text"] == "solo text here"


def test_chunk_dedup_respects_min_docs(spark):
    # the SAME chunk repeated within ONE doc is not cross-doc boilerplate
    c = " ".join(f"x{i}" for i in range(8))
    rows = [(1, f"{c} {c}"), (2, "other words only")]
    out = {
        r["doc_id"]: r
        for r in corpus.chunk_dedup(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out[1]["n_boiler"] == 0 and out[1]["n_chunks"] == 2


def test_repetition_stats_hand_computed(spark):
    # "a a b" -> tokens: a x2 dup, b x1 -> dup_token_frac 2/3
    # bigrams: "a a", "a b" -> top 1/2; trigrams: "a a b" x1 -> dup 0
    rows = [(1, "a a b"), (2, "w x y z")]
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(_docs(spark, rows), "doc_id", "text").collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 3
    assert abs(r1["dup_token_frac"] - 2 / 3) < 1e-6
    assert abs(r1["top_bigram_frac"] - 0.5) < 1e-6
    assert r1["dup_trigram_frac"] == 0.0
    r2 = out[2]
    assert r2["dup_token_frac"] == 0.0
    assert abs(r2["top_bigram_frac"] - 1 / 3) < 1e-6


def test_repetition_stats_degenerate_repeat(spark):
    # fully repetitive doc maxes every signal
    out = corpus.repetition_stats(
        _docs(spark, [(1, "spam spam spam spam")]), "doc_id", "text"
    ).collect()[0]
    assert out["dup_token_frac"] == 1.0
    assert out["top_bigram_frac"] == 1.0
    assert out["dup_trigram_frac"] == 1.0


def test_repetition_stats_short_docs_zero_not_null(spark):
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(
            _docs(spark, [(1, "solo"), (2, "two words")]), "doc_id", "text"
        ).collect()
    }
    assert out[1]["top_bigram_frac"] == 0.0 and out[1]["dup_trigram_frac"] == 0.0
    assert out[2]["dup_trigram_frac"] == 0.0


def test_pii_scrub_counts_and_replaces(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.org thanks"),
        (2, "call 555-0199 or visit 192.168.1.77 now"),
        (3, "clean text with no pii at all"),
    ]
    out = corpus.pii_scrub(_docs(spark, rows), "doc_id", "text")
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_ips"] == 0
    assert got[2]["n_phones"] == 1 and got[2]["n_ips"] == 1
    assert got[3]["n_emails"] == got[3]["n_ips"] == got[3]["n_phones"] == 0
    # replacement really happened: scrubbed sha differs from raw sha only
    # where PII was present
    raw = {
        r["doc_id"]: r["sha"]
        for r in _docs(spark, rows).select("doc_id", F.sha2("text", 256).alias("sha")).collect()
    }
    assert got[1]["scrubbed_sha"] != raw[1]
    assert got[2]["scrubbed_sha"] != raw[2]
    assert got[3]["scrubbed_sha"] == raw[3]


def test_pii_scrub_is_narrow_no_shuffle(spark):
    df = _docs(spark, [(1, "a@b.co")])
    plan = corpus.pii_scrub(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
