"""Quality-filter signals: PII, intra-doc repetition, keep/drop gate.

The catalog's docs_text_profile round-3 columns are hash-checked
against DuckDB by the driver; these tests pin the SEMANTICS on crafted
fixtures the synthetic corpus cannot exercise (real PII strings,
pathological repetition) so a regression in the expressions fails with
a readable assertion rather than a hash mismatch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    PII_PATTERNS,
    pii_count,
    redact_pii,
    word_ngrams,
    words_of,
)


def _one(spark, text: str, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0][0]
    )


@pytest.mark.parametrize(
    "text,expected",
    [
        ("contact me at jane.doe+spam@example-mail.co.uk today", 1),
        ("ssn 123-45-6789 and phone 555-867-5309 now", 2),
        # Trailing word char kills the \b boundary: NOT a phone match.
        ("phone 555-867-5309x is malformed", 0),
        ("server at 10.0.255.3 port open", 1),
        ("call 212-555-0123 or 212 5550 1234", 2),
        ("no pii here, just words and numbers 123456", 0),
        ("", 0),
    ],
)
def test_pii_count_patterns(spark, text, expected):
    assert _one(spark, text, pii_count(F.col("text"))) == expected


def test_redact_pii_replaces_spans_and_preserves_rest(spark):
    text = "mail a@b.io, ssn 123-45-6789, ip 1.2.3.4 end"
    out = _one(spark, text, redact_pii(F.col("text")))
    assert out == "mail <EMAIL>, ssn <SSN>, ip <IPV4> end"
    # Email runs first: the digits of a redacted email never leak into
    # the phone/SSN patterns.
    assert "<" in out and "@" not in out


def test_pii_patterns_are_re2_safe_in_duckdb():
    """The exact pattern strings must behave identically in DuckDB's
    RE2 engine — this is what makes the oracle column comparable."""
    duckdb = pytest.importorskip("duckdb")
    cases = [
        ("contact me at jane.doe+spam@example-mail.co.uk today", 1),
        ("ssn 123-45-6789 and phone 555-867-5309 now", 2),
        ("phone 555-867-5309x is malformed", 0),
        ("no pii here, just words and numbers 123456", 0),
    ]
    expr = " + ".join(
        f"len(regexp_extract_all(lower(t), '{p}'))"
        for p in PII_PATTERNS.values()
    )
    con = duckdb.connect()
    for text, expected in cases:
        got = con.execute(
            f"select {expr} from (select ? as t)", [text]
        ).fetchone()[0]
        assert got == expected, text


def _profile_row(spark, text: str):
    toks = words_of(F.col("text"))
    ngrams = word_ngrams(toks, 3)
    df = spark.createDataFrame([(text,)], "text string").select(
        F.when(
            F.size(ngrams) > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(ngrams))
                / F.size(ngrams).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
        F.round(
            F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$")))
            / F.size(toks).cast("double"),
            6,
        ).alias("digit_token_frac"),
    )
    return df.collect()[0]


def test_dup_ngram_fraction_detects_repetition(spark):
    # "spam spam spam ..." x 20: every 3-gram identical -> frac -> 1.
    row = _profile_row(spark, " ".join(["spam"] * 20))
    assert row.dup_3gram_frac == pytest.approx(1 - 1 / 18, abs=1e-6)
    # All-distinct trigrams -> 0.
    row = _profile_row(spark, "one two three four five six")
    assert row.dup_3gram_frac == 0.0
    # Fewer than 3 tokens -> no ngrams -> defined as 0, not null.
    row = _profile_row(spark, "hi there")
    assert row.dup_3gram_frac == 0.0


def test_digit_token_fraction(spark):
    row = _profile_row(spark, "a 1 b 2 c 3")
    assert row.digit_token_frac == pytest.approx(0.5)
    # Mixed alnum tokens like 'a1' are NOT digit tokens.
    row = _profile_row(spark, "a1 b2")
    assert row.digit_token_frac == 0.0


def test_passes_quality_gate_boundaries(spark, tmp_path):
    """Drive the registered catalog query over a crafted corpus and
    check each gate trips for its designed reason."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans import (
        all_queries,
    )

    docs = [
        # (doc_id, text, expected_pass, reason)
        (0, "the quick brown fox jumps over a lazy dog near the river", True, "clean"),
        (1, "too short", False, "n_tokens < 5"),
        (2, " ".join(["spam"] * 40), False, "dup_3gram_frac > 0.5"),
        (3, "the " + " ".join(str(i) for i in range(20)), False, "digit frac"),
        (4, "the mail is jane@corp.com and more words here now", False, "pii"),
        (5, " ".join(["abcdefghijklmnop"] * 6) + " the end", False,
         "avg_token_len > 12"),
        (6, "alpha beta gamma delta epsilon zeta", False, "no stopwords"),
    ]
    rows = [(i, t, "en", "srcT", len(t)) for i, t, _, _ in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["passes_quality"]
        for r in all_queries()["docs_text_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    for doc_id, _, expected, reason in docs:
        assert out[doc_id] is expected, f"doc {doc_id}: {reason}"


def test_contamination_branch_flags_planted_overlap(spark, tmp_path):
    """Plant an eval doc and a train doc sharing exactly one 3-gram;
    a disjoint train doc must not be flagged."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans import (
        all_queries,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "srcT", 30),  # eval
        (1, "zeta eta theta iota kappa", "en", "srcT", 25),       # eval
        # shares "alpha beta gamma" and "beta gamma delta" with doc 0:
        (25, "intro alpha beta gamma delta outro", "en", "srcT", 34),
        # shares nothing contiguous:
        (26, "alpha gamma beta delta epsilon zeta", "en", "srcT", 35),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = all_queries()["docs_top_terms"](spark, str(tmp_path))
    contam = {
        r["doc_id"]: (r["n_occurrences"], r["n_docs"])
        for r in out.filter("branch = 'contam'").collect()
    }
    assert contam == {25: (2, 1)}  # 2 shared 3-grams, 1 eval doc matched
    # term branch still carries the vocabulary rows alongside.
    terms = out.filter("branch = 'term'").count()
    assert terms > 0


def test_mixture_weights_are_temperature_scaled(spark, tmp_path):
    from travelpulse_spark_stream_tourism_analytics_spark.plans import (
        all_queries,
    )

    rows = [(i, f"word{i} text body", "en", "big", 10) for i in range(100)]
    rows += [(100 + i, f"w{i} other text", "en", "small", 10) for i in range(25)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = all_queries()["docs_stratified_sample"](spark, str(tmp_path))
    mix = {
        r["source"]: (r["n_docs"], r["weight"])
        for r in out.filter("branch = 'mixture'").collect()
    }
    # alpha=0.5: weights sqrt(100):sqrt(25) = 10:5 -> 2/3 : 1/3.
    assert mix["big"][0] == 100 and mix["small"][0] == 25
    assert mix["big"][1] == pytest.approx(0.666667, abs=1e-6)
    assert mix["small"][1] == pytest.approx(0.333333, abs=1e-6)
    # Upweighting: the small source gets MORE than its 20% natural share.
    assert mix["small"][1] > 25 / 125


def test_pack_chunks_budget_binning_invariants(spark):
    """pack_chunks: per-shard layout order, exact next-fit-approx
    definition, and the bounded-overflow guarantee."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(11 + (i * 7) % 90)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8)
    capacity, n_shards = 100, 4
    packed = pack_chunks(
        chunks, capacity=capacity, n_shards=n_shards
    ).collect()

    by_shard: dict[int, list] = {}
    for r in packed:
        assert r["shard_id"] == r["doc_id"] % n_shards
        by_shard.setdefault(r["shard_id"], []).append(r)

    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))
        run = 0
        totals: dict[int, int] = {}
        for r in rs:
            expected = run // capacity
            assert r["pack_id"] == expected, (shard, r)
            run += r["n_chunk_tokens"]
            totals[r["pack_id"]] = (
                totals.get(r["pack_id"], 0) + r["n_chunk_tokens"]
            )
        # Non-final bins overflow by at most one chunk and are at
        # least capacity minus one chunk full (no fragmentation).
        last = max(totals)
        for pid, tot in totals.items():
            assert tot < capacity + 32, (shard, pid, tot)
            if pid != last:
                assert tot > capacity - 32, (shard, pid, tot)
