"""Quality-filter signals: PII, intra-doc repetition, keep/drop gate.

The catalog's docs_text_profile round-3 columns are hash-checked
against DuckDB by the driver; these tests pin the SEMANTICS on crafted
fixtures the synthetic corpus cannot exercise (real PII strings,
pathological repetition) so a regression in the expressions fails with
a readable assertion rather than a hash mismatch.
"""

from __future__ import annotations

import os

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
    # the entry's bm25/rrf retrieval branches (round 10) scan the
    # embeddings table at build time — every driver sf dir carries
    # one, so the synthetic dir must too (a tiny one; this test reads
    # only the contam and term branches)
    spark.createDataFrame(
        [(i, [float(i % 7 + 1)] * 8) for i in range(20)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
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
    # the entry's cluster_cap branch (round 9) scans the embeddings
    # table at build time — every driver sf dir carries one, so the
    # synthetic dir must too (a tiny one; this test reads only the
    # mixture branch)
    spark.createDataFrame(
        [(i, [float(i % 7 + 1)] * 8) for i in range(20)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
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


def test_curate_corpus_chain(spark):
    """Gate -> redact -> dedup -> chunk -> pack end to end: low-quality
    and PII docs are dropped/redacted, exact dupes collapse to the
    lowest id, survivors come out chunked and packed."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
        quality_signals,
    )

    base = "the quick brown fox jumps over a lazy dog and runs to the river "
    docs = [
        (0, base + "variant one ending"),
        (1, base + "variant one ending"),     # exact dup of 0 -> dropped
        (2, base + "another distinct ending"),
        (3, "too short"),                      # gate: n_tokens < 5
        (4, " ".join(["spam"] * 60)),          # gate: repetition
        # PII redacts away; text otherwise identical to doc 2 AFTER
        # redaction is NOT possible here (different spans), so it stays.
        (5, base + "mail jane@corp.com for details"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # Raw gate: the PII doc fails as-is; the curation chain redacts
    # BEFORE gating, so it survives curation below.
    sig = {r["doc_id"]: r["passes_quality"] for r in quality_signals(df).collect()}
    assert sig == {0: True, 1: True, 2: True, 3: False, 4: False, 5: False}

    packed = curate_corpus(
        df, chunk_tokens=16, overlap=4, capacity=64, n_shards=2
    )
    rows = packed.collect()
    kept_docs = {r["doc_id"] for r in rows}
    assert kept_docs == {0, 2, 5}
    # Redaction happened before chunking: no raw address in any chunk.
    all_text = " ".join(r["chunk_text"] for r in rows)
    assert "jane" not in all_text and "corp.com" not in all_text
    assert "email" in all_text  # words_of-tokenized <EMAIL> placeholder
    # Packing metadata is present and within shard bounds.
    assert {r["shard_id"] for r in rows} <= {0, 1}
    assert all(r["pack_id"] >= 0 for r in rows)


def test_curate_cli_mode(spark, tmp_path):
    """The run_pipeline --mode curate surface over a JSONL docs dir."""
    import json as _json

    import run_pipeline

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    base = "the quick brown fox jumps over a lazy dog near the river "
    with open(docs_dir / "part-0.jsonl", "w") as f:
        for i in range(20):
            f.write(
                _json.dumps({"doc_id": i, "text": base + f"doc {i} tail"})
                + "\n"
            )
        f.write(_json.dumps({"doc_id": 99, "text": "too short"}) + "\n")
    out = tmp_path / "packed"
    stats = run_pipeline.run_curate(spark, str(docs_dir), str(out))
    assert stats["docs"] == 21
    assert stats["kept"] == 20          # the short doc is gated out
    assert stats["samples"] >= 20
    assert stats["packs"] >= 1
    # Output is the shard-partitioned layout.
    assert any(p.name.startswith("shard_id=") for p in out.iterdir())


def test_tfidf_top_keywords_semantics_and_duckdb_parity(spark, tmp_path):
    """tf-idf ranks distinctive terms above ubiquitous ones, and the
    whole result matches a DuckDB twin value-for-value."""
    import duckdb

    from travelpulse_spark_stream_tourism_analytics_spark.operators.keywords import (
        tfidf_top_keywords,
    )

    docs = [
        (0, "common words plus whale whale whale"),
        (1, "common words plus galaxy"),
        (2, "common words plus glacier glacier"),
        (3, "common words plus whale once"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_keywords(df, top_k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}

    # Distinctive terms win their documents; 'common' (df=4, idf=ln(5/5)=0)
    # scores zero and never outranks them.
    assert rows[(0, 1)]["term"] == "whale"
    assert rows[(1, 1)]["term"] == "galaxy"
    assert rows[(2, 1)]["term"] == "glacier"
    assert rows[(3, 1)]["term"] == "once"  # df=1 beats whale's df=2
    assert rows[(3, 2)]["term"] == "whale"

    df.write.mode("overwrite").parquet(str(tmp_path / "d.parquet"))
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH terms AS (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            FROM '{tmp_path}/d.parquet/*.parquet'
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM terms GROUP BY 1, 2),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
                   round(tf.tf * ln(5.0 / (dfx.df + 1.0)), 6) AS tfidf
            FROM tf JOIN dfx USING (term)
        )
        SELECT doc_id, rank, term, tf, df, tfidf FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term
            ) AS rank FROM scored
        ) WHERE rank <= 2
        """
    ).df()
    got = out.toPandas()
    cols = ["doc_id", "rank", "term", "tf", "df", "tfidf"]
    got = got[cols].sort_values(["doc_id", "rank"]).reset_index(drop=True)
    want = (
        oracle[cols].sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    for c in cols:
        assert got[c].astype(want[c].dtype).equals(want[c]), c


def test_unigram_lm_scoring_ranks_fluent_text_and_matches_duckdb(
    spark, tmp_path
):
    """CCNet-shape LM filtering with the unigram proxy: documents made
    of trusted-corpus vocabulary score lower NLL than out-of-vocab
    gibberish, and the whole (train + score) chain matches a DuckDB
    twin value-for-value."""
    import duckdb

    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        lm_score_docs,
        unigram_lm,
    )

    trusted_rows = [
        (i, "the quick brown fox jumps over the lazy dog again")
        for i in range(10)
    ]
    trusted = spark.createDataFrame(trusted_rows, "doc_id long, text string")
    lm = unigram_lm(trusted, alpha=0.5)

    docs = [
        (0, "the quick brown fox"),          # pure in-vocab
        (1, "the quick zorblat fnord"),      # half OOV
        (2, "zzz qqq xxx vvv"),              # pure OOV
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score_docs(df, lm).collect()}
    assert got[0]["nll"] < got[1]["nll"] < got[2]["nll"]
    assert got[0]["n_scored_tokens"] == 4

    # DuckDB twin of the full chain (train on trusted, score docs).
    trusted.write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    df.write.mode("overwrite").parquet(str(tmp_path / "d.parquet"))
    words = (
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH tc AS (
            SELECT unnest({words}) AS term
            FROM '{tmp_path}/t.parquet/*.parquet'
        ),
        counts AS (SELECT term, count(*) AS n FROM tc GROUP BY 1),
        tot AS (SELECT sum(n)::DOUBLE AS total, count(*)::DOUBLE AS vocab
                FROM counts),
        lm AS (
            SELECT term, ln((n + 0.5) / (total + 0.5 * (vocab + 1)))
                       AS logp
            FROM counts, tot
        ),
        unk AS (SELECT ln(0.5 / (total + 0.5 * (vocab + 1))) AS unk_logp
                FROM tot),
        toks AS (
            SELECT doc_id, unnest({words}) AS term
            FROM '{tmp_path}/d.parquet/*.parquet'
        )
        SELECT doc_id, count(*) AS n_scored_tokens,
               round(-avg(coalesce(lm.logp, unk.unk_logp)), 6) AS nll
        FROM toks LEFT JOIN lm USING (term), unk
        GROUP BY doc_id
        """
    ).df()
    want = {
        int(r["doc_id"]): (int(r["n_scored_tokens"]), float(r["nll"]))
        for _, r in oracle.iterrows()
    }
    for d in (0, 1, 2):
        assert got[d]["n_scored_tokens"] == want[d][0]
        assert got[d]["nll"] == pytest.approx(want[d][1], abs=1e-9)


def test_curate_corpus_fuzzy_neardup_stage(spark):
    """fuzzy=True: near-duplicates (not exact copies) collapse to one
    member per family, and the survivor is the HIGHEST-quality one."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    base = (
        "the quick brown fox jumps over a lazy dog and runs to the "
        "river bank where the otter sleeps near a willow tree"
    )
    docs = [
        # near-dup family: doc 1 has MORE stopword-free bulk -> doc 0's
        # quality_score (fewer stopwords removed) differs; engineer the
        # winner by making doc 1 LONGER (higher length factor).
        (0, base),
        (1, base + " and then the otter wakes and swims away happily"),
        (2, "completely unrelated content about spark shuffles and "
            "partitions in a distributed execution engine today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # Without fuzzy: all three docs survive (no exact dupes).
    plain = curate_corpus(df, chunk_tokens=16, overlap=4)
    assert {r["doc_id"] for r in plain.collect()} == {0, 1, 2}

    fuzzy = curate_corpus(
        df, chunk_tokens=16, overlap=4, fuzzy=True, jaccard_threshold=0.5
    )
    kept = {r["doc_id"] for r in fuzzy.collect()}
    assert 2 in kept
    assert len(kept & {0, 1}) == 1  # the near-dup family collapsed


def test_corpus_report_per_source_health(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        corpus_report,
    )

    clean = "the quick brown fox jumps over a lazy dog near the river"
    docs = [
        (0, clean, "good"),
        (1, clean + " again", "good"),
        (2, "too short", "bad"),
        (3, "the mail is a@b.io plus some more words here", "bad"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    rep = {r["source"]: r for r in corpus_report(df).collect()}
    assert rep["good"]["n_docs"] == 2 and rep["good"]["pass_rate"] == 1.0
    assert rep["bad"]["n_docs"] == 2 and rep["bad"]["pass_rate"] == 0.0
    assert rep["bad"]["pii_rate"] == 0.5
    assert rep["good"]["mean_tokens"] == pytest.approx(12.5)


def test_quality_signals_match_profile_columns(spark, tmp_path):
    """operators/curate.quality_signals and the oracled
    docs_text_profile compute the SAME signal formulas — this guard
    fails if one copy drifts."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        quality_signals,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.plans import (
        all_queries,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    profile = (
        all_queries()["docs_text_profile"](spark, str(tmp_path))
        .select(
            "doc_id", "n_tokens", "avg_token_len", "stopword_ratio",
            "quality_score", "dup_3gram_frac", "digit_token_frac",
            "n_pii_hits", "passes_quality",
        )
        .collect()
    )
    sig = {
        r["doc_id"]: r
        for r in quality_signals(src).select(
            "doc_id", "n_tokens", "avg_token_len", "stopword_ratio",
            "quality_score", "dup_3gram_frac", "digit_token_frac",
            "n_pii_hits", "passes_quality",
        ).collect()
    }
    assert len(profile) == len(sig) > 0
    for r in profile:
        assert r == sig[r["doc_id"]], r["doc_id"]


def test_pattern_matches_finds_planted_shape_and_matches_duckdb(
    spark, tmp_path
):
    """Time-series similarity: a scaled+shifted copy of the query
    pattern ranks first (z-normalization makes it distance ~0), noise
    ranks behind it, constant windows are skipped — and the whole
    scoring matches a DuckDB twin."""
    import datetime as dt

    import duckdb

    from travelpulse_spark_stream_tourism_analytics_spark.operators.timeseries import (
        pattern_matches,
    )

    pattern = [1.0, 3.0, 2.0, 5.0]
    # user 1 carries the planted shape (x10 + 100) at offset 3;
    # user 2 is flat (all windows constant -> skipped).
    u1 = [7.0, 7.5, 110.0, 130.0, 120.0, 150.0, 8.0, 7.2, 7.9]
    u2 = [4.0] * 8
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, v in enumerate(u1):
        rows.append((1, t0 + dt.timedelta(minutes=i), v))
    for i, v in enumerate(u2):
        rows.append((2, t0 + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = pattern_matches(df, pattern, k=5).collect()
    assert (out[0]["user_id"], out[0]["offset"]) == (1, 3)
    assert out[0]["zdist"] == 0.0
    assert all(r["user_id"] == 1 for r in out)  # user 2 fully skipped

    # DuckDB twin over the same parquet rows.
    df.write.mode("overwrite").parquet(str(tmp_path / "ev.parquet"))
    import math

    m = len(pattern)
    mu = sum(pattern) / m
    sd = math.sqrt(sum((x - mu) ** 2 for x in pattern) / m)
    qlit = "[" + ", ".join(str((x - mu) / sd) for x in pattern) + "]"
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH series AS (
            SELECT user_id,
                   list(value ORDER BY ts) AS vals
            FROM '{tmp_path}/ev.parquet/*.parquet'
            GROUP BY user_id
        ),
        wins AS (
            SELECT user_id, i AS "offset", vals[i:i+{m - 1}] AS w
            FROM series, LATERAL unnest(
                generate_series(1, len(vals) - {m - 1})) t(i)
            WHERE len(vals) >= {m}
        ),
        scored AS (
            SELECT user_id, "offset",
                   list_avg(w) AS mu,
                   sqrt(list_sum(list_transform(w,
                        x -> (x - list_avg(w)) * (x - list_avg(w)))) / {m})
                       AS sd,
                   w
            FROM wins
        )
        SELECT user_id, "offset",
               round(sqrt(list_sum(list_transform(
                   list_zip(list_transform(w, x -> (x - mu) / sd),
                            {qlit}::DOUBLE[]),
                   p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS zdist
        FROM scored
        WHERE sd > 0
        ORDER BY zdist, user_id, "offset"
        LIMIT 5
        """
    ).df()
    got = [(r["user_id"], r["offset"], r["zdist"]) for r in out]
    want = [
        (int(r["user_id"]), int(r["offset"]), float(r["zdist"]))
        for _, r in oracle.iterrows()
    ]
    assert got == pytest.approx(want)


def test_segmented_pattern_matches_equals_unsegmented(spark):
    """segment_series / pattern_matches_segmented (round 5, VERDICT r4
    item 3): one key x 100k events segmented into 1000-event spans
    gives the SAME top-k (offsets and zdists) as the unsegmented
    operator — including planted matches that sit right at segment
    boundaries — while no task ever materializes more than `span`
    events of any key."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.timeseries import (
        pattern_matches,
        pattern_matches_segmented,
        segment_series,
    )

    pattern = [1.0, 3.0, 2.0, 5.0]
    n, span = 100_000, 1000
    m = len(pattern)
    stride = span - (m - 1)  # 997
    # Deterministic noise series; plant exact scaled copies of the
    # pattern at a mid-series offset and at offsets hugging the first
    # segment boundary from both sides (window 995 is the second-last
    # start fitting segment 0; window 1001 starts inside segment 1) —
    # non-overlapping so neither plant clobbers the other.
    plants = {54_321: 10.0, 995: 20.0, 1001: 30.0}
    base = spark.range(n).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        ((F.col("id") * 37 % 997) / 10.0).alias("value"),
        (F.col("id") + 1).alias("r"),
    )
    expr = F.col("value")
    for off, scale in plants.items():
        for j, p in enumerate(pattern):
            expr = F.when(
                F.col("r") == off + j, F.lit(p * scale + 7.0)
            ).otherwise(expr)
    ev = base.select("user_id", "ts", expr.alias("value"))

    plain = [
        (r["user_id"], r["offset"], r["zdist"])
        for r in pattern_matches(ev, pattern, k=8).collect()
    ]
    seg = [
        (r["user_id"], r["offset"], r["zdist"])
        for r in pattern_matches_segmented(
            ev, pattern, span=span, k=8
        ).collect()
    ]
    assert seg == plain
    found = {(off, z) for _u, off, z in seg}
    for off in plants:
        assert (off, 0.0) in found, (off, seg)

    # Bounded state: every (key, segment) holds at most `span` events,
    # the overlap fan-out is the expected <= 2x row multiplier, and
    # segment count matches the closed form.
    segs = segment_series(ev, span, m - 1)
    sizes = segs.groupBy("user_id", "segment").count().collect()
    assert max(r["count"] for r in sizes) <= span
    import math as _math

    assert len(sizes) == _math.ceil((n - (m - 1)) / stride)
    assert segs.count() <= n + (len(sizes) - 1) * (m - 1)


def test_report_cli_mode(spark, capsys):
    """run_pipeline --mode report over the fixture documents table:
    one JSON row per source with the health columns."""
    import json as _json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline

    rows = run_pipeline.run_report(spark, "/root/testdata/sf0.001")
    assert len(rows) == 20 and all(0 <= r["pass_rate"] <= 1 for r in rows)
    printed = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert printed == sorted(rows, key=lambda r: r["source"])


def test_quality_signals_zero_token_doc_is_dropped_not_fatal(spark):
    """ADVICE r3 (high): an empty or punctuation-only doc used to throw
    DIVIDE_BY_ZERO under ANSI mode inside quality_signals and kill the
    whole curate/report job. It must instead yield NULL ratio signals
    and passes_quality=false."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
        quality_signals,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "!!! ... ---"),
            (3, "the quick brown fox jumps over a lazy dog of the town"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_signals(docs).collect()}
    for d in (1, 2):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["avg_token_len"] is None
        assert rows[d]["stopword_ratio"] is None
        assert rows[d]["digit_token_frac"] is None
        assert rows[d]["quality_score"] is None
        assert rows[d]["passes_quality"] is False
    assert rows[3]["passes_quality"] is True
    # The full chain survives the degenerate docs too.
    kept = {r["doc_id"] for r in curate_corpus(docs).collect()}
    assert kept == {3}


def test_curate_repetition_gate_batch_twin(spark):
    """curate_corpus(repetition_gate=True) — the batch twin of the
    streaming --repetition-gate: a scattered-phrase spam doc that
    passes the heuristic gate is dropped; default behavior unchanged."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    clean = (
        "the quick brown fox jumps over a lazy dog near the old "
        "stone bridge while morning light settles on the quiet river"
    )
    spam = " ".join(f"click here w{i} of the" for i in range(12))
    docs = spark.createDataFrame(
        [(0, clean), (1, spam)], "doc_id long, text string"
    )
    default_kept = {
        r["doc_id"] for r in curate_corpus(docs, chunk_tokens=16, overlap=4).collect()
    }
    assert default_kept == {0, 1}  # heuristic gate keeps the spam
    gated_kept = {
        r["doc_id"]
        for r in curate_corpus(
            docs, chunk_tokens=16, overlap=4, repetition_gate=True
        ).collect()
    }
    assert gated_kept == {0}


def test_repetition_gate_thresholds_are_parameters(spark):
    """Round 7 (VERDICT r6 item 7): the Gopher thresholds are function/
    CLI parameters with the table-A1 defaults pinned — corpus-specific
    tuning must not fork the operator. Loosened thresholds keep the
    scattered-phrase doc the defaults drop; typo'd keys raise."""
    import pytest as _pytest

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        GOPHER_REPETITION_DEFAULTS,
        passes_repetition_gate,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    assert GOPHER_REPETITION_DEFAULTS == {
        "top_2gram_char_frac": 0.20,
        "dup_5gram_char_frac": 0.15,
        "dup_line_frac": 0.30,
        "dup_line_char_frac": 0.20,
    }
    spam = " ".join(f"click here w{i} of the" for i in range(12))
    docs = spark.createDataFrame(
        [(1, spam)], "doc_id long, text string"
    )
    # expression level: defaults drop it, loosened masses keep it
    got = docs.select(
        passes_repetition_gate(F.col("text")).alias("d"),
        passes_repetition_gate(
            F.col("text"),
            {"top_2gram_char_frac": 0.9, "dup_5gram_char_frac": 0.9},
        ).alias("loose"),
    ).first()
    assert got["d"] is False and got["loose"] is True
    # chain level: the override threads through curate_corpus
    kept = {
        r["doc_id"]
        for r in curate_corpus(
            docs, chunk_tokens=16, overlap=4, repetition_gate=True,
            repetition_thresholds={
                "top_2gram_char_frac": 0.9,
                "dup_5gram_char_frac": 0.9,
            },
        ).collect()
    }
    assert kept == {1}
    with _pytest.raises(ValueError, match="unknown threshold"):
        passes_repetition_gate(F.col("text"), {"dup_2gram_frac": 0.5})


def test_docs_text_profile_zero_token_guard(spark, tmp_path):
    """Same ANSI-mode guard on the oracled docs_text_profile columns."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans import text_queries

    docs = spark.createDataFrame(
        [(1, "", "en", "src0", 0), (2, "plain words here", "en", "src0", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in text_queries.docs_text_profile(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_tokens"] == 0
    assert rows[1]["avg_token_len"] is None
    assert rows[1]["passes_quality"] is False
    assert rows[2]["n_tokens"] == 3


def test_pii_case_insensitive_count_equals_redacted_spans(spark):
    """ADVICE r3 (medium): mixed-case PII must be fully redacted, and
    the counted hits must be exactly the redacted spans."""
    cases = [
        "John@example.com wrote this",          # mixed-case local part
        "contact John.Doe@Gmail.COM today",     # mixed-case domain too
        "plain lowercase mail a@b.io here",
        "IP 10.0.0.1 and SSN 123-45-6789",
    ]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    out = df.select(
        pii_count(F.col("text")).alias("n"),
        redact_pii(F.col("text")).alias("red"),
        pii_count(redact_pii(F.col("text"))).alias("n_after"),
    ).collect()
    for row, text in zip(out, cases):
        assert row["n"] >= 1
        # every counted span was redacted: nothing left to count, and
        # no fragment of the original addresses survives
        assert row["n_after"] == 0, (text, row["red"])
    assert out[0]["red"] == "<EMAIL> wrote this"
    assert out[1]["red"] == "contact <EMAIL> today"
    assert "John" not in out[0]["red"] and "John" not in out[1]["red"]


def test_pii_case_insensitive_patterns_match_in_duckdb():
    """The (?i)-flagged patterns count identically in DuckDB's RE2."""
    import duckdb

    texts = [
        "John@Example.COM wrote this",
        "ip 10.0.0.1 ssn 123-45-6789 phone 333-444-5555",
    ]
    for text in texts:
        duck = sum(
            len(
                duckdb.sql(
                    "SELECT regexp_extract_all(?, ?)", params=[text, p]
                ).fetchone()[0]
            )
            for p in PII_PATTERNS.values()
        )
        py_hits = sum(
            len(__import__("re").findall(p, text))
            for p in PII_PATTERNS.values()
        )
        assert duck == py_hits >= 1


def test_count_min_sketch_mergeable_term_frequencies(spark):
    """Count-min frequency sketches (round 4): per-source sketches
    merged == whole-corpus estimates within the eps*N guarantee, and
    every estimate >= the true count (the CM one-sided bound)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.sketches import (
        estimate_counts,
        merge_sketches,
        read_sketch,
        term_count_sketches,
    )

    rows = []
    did = 0
    for src, reps in (("a", 40), ("b", 25)):
        for i in range(reps):
            rows.append((did, f"common shared w{i % 5} rare{did}", src))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    per_source = term_count_sketches(docs, "source", eps=0.001, seed=7)
    got = {r["source"]: r for r in per_source.collect()}
    assert set(got) == {"a", "b"}
    n_total = sum(r["n_terms"] for r in got.values())
    assert n_total == 65 * 4

    # true counts
    # w0 appears for i % 5 == 0: 8 times in source a (40 docs), 5 in b
    truth = {"common": 65, "shared": 65, "w0": 8 + 5, "rare5": 1}
    merged = merge_sketches(
        [bytes(got["a"]["sketch"]), bytes(got["b"]["sketch"])]
    )
    est = estimate_counts(merged, list(truth))
    for term, true_n in truth.items():
        assert est[term] >= true_n  # never underestimates
        assert est[term] <= true_n + 0.001 * n_total + 1

    # merged sketch == sketch of the whole corpus (same estimates)
    whole_raw = bytes(
        term_count_sketches(
            docs.withColumn("source", F.lit("all")), "source", eps=0.001, seed=7
        ).collect()[0]["sketch"]
    )
    whole = read_sketch(whole_raw)
    for term in truth:
        assert whole.estimateCount(term) == merged.estimateCount(term)


def test_count_min_python_reader_matches_jvm(spark):
    """Round 5 (VERDICT r4 nit 1): the sketch read/merge/estimate path
    is pure Python — no ``sparkContext._jvm``, so it exists under
    Spark Connect — and must agree bit-for-bit with the JVM
    CountMinSketch on every term, including multi-byte UTF-8 and
    unseen terms. The classic session available here IS the parity
    oracle for the reimplemented murmur/bucket scheme."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.sketches import (
        read_sketch,
        term_count_sketches,
    )

    rows = [
        (i, f"alpha beta w{i % 7} émoji€ {'x' * (i % 4)}", "s")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    raw = bytes(
        term_count_sketches(docs, "source", eps=0.01, seed=11)
        .collect()[0]["sketch"]
    )
    view = read_sketch(raw)
    jvm = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(raw)
    )
    probes = ["alpha", "beta", "w0", "w3", "émoji€", "x", "xxx",
              "absent", "ünïcode-ß", ""]
    for t in probes:
        assert view.estimate_count(t) == jvm.estimateCount(t), t
    assert view.total == jvm.totalCount()


def test_extract_html_text_semantics_and_duckdb_parity(spark, tmp_path):
    """HTML text extraction (round 5): script/style/comment blocks
    vanish, tags strip to spaces, entities decode AFTER stripping
    (escaped markup in text survives literally), whitespace collapses
    — and the whole expression replays identically in DuckDB (the
    patterns are RE2-safe: no backreferences, no lookarounds)."""
    import duckdb
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        _HTML_ENTITIES,
        extract_html_text,
    )

    rows = [
        (0, "<html><head><style>p{color:red}</style>"
            "<script type='t'>var x = '<p>';</script></head>"
            "<body><h1>Hotel Roma</h1><p>Sea   view &amp; pool.</p>"
            "<!-- tracking --><ul><li>wifi</li><li>bar</li></ul>"
            "</body></html>"),
        (1, "plain text, no markup"),
        (2, "escaped &lt;div&gt; stays &quot;literal&quot; &#65; &#9731;"),
        (3, "<ScRiPt>alert(1)</ScRiPt>edge<BR/>case &nbsp;&#39;q&#39;"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", extract_html_text(F.col("html")).alias("t")
        ).collect()
    }
    assert got[0] == "Hotel Roma Sea view & pool. wifi bar"
    assert got[1] == "plain text, no markup"
    # entity decode AFTER tag strip: escaped markup survives as text
    assert got[2] == 'escaped <div> stays "literal"'
    assert got[3] == "edge case 'q'"
    assert got[4] == ""

    # DuckDB twin: identical chained regexp_replace semantics.
    df.write.mode("overwrite").parquet(str(tmp_path / "h.parquet"))
    expr = (
        "regexp_replace(regexp_replace(regexp_replace(html, "
        "'(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g'), "
        "'(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g'), "
        "'(?s)<!--.*?-->', ' ', 'g')"
    )
    expr = f"regexp_replace({expr}, '(?i)<[^>]*>', ' ', 'g')"
    for e, rep in _HTML_ENTITIES.items():
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{e}', '{r}', 'g')"
    expr = f"regexp_replace({expr}, '&#[0-9]{{1,7}};', ' ', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    duck = {
        int(i): t
        for i, t in duckdb.sql(
            f"SELECT doc_id, {expr} FROM '{tmp_path}/h.parquet/*.parquet'"
        ).fetchall()
    }
    assert duck == got


def test_kll_quantile_sketch_rollup_rank_error_bound(spark):
    """KLL quantile sketches (round 5): per-group sketches answer
    quantile queries within the KLL normalized rank-error bound, and
    the associative rollup of per-group sketches answers for the whole
    corpus without rescanning it — the quantile member of the
    HLL/count-min mergeable-summary trio. KLL compaction is
    randomized, so the pin is the RANK error of each estimate against
    the exact distribution, not value determinism."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.sketches import (
        merge_quantile_sketches,
        sketch_quantiles,
        value_quantile_sketches,
    )

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        # deterministic non-uniform values with a long tail
        ((F.col("id") * 37 % 1000) + (F.col("id") % 7) * 500.0).alias("v"),
    )
    fracs = [0.1, 0.5, 0.9, 0.99]
    per_group = value_quantile_sketches(df, "g", "v")
    assert per_group.count() == 4

    vals = sorted(r["v"] for r in df.select("v").collect())

    def rank_of(x: float) -> float:
        import bisect

        return bisect.bisect_right(vals, x) / len(vals)

    # rollup: merged per-group sketches answer for the whole corpus
    merged = sketch_quantiles(merge_quantile_sketches(per_group), fracs)
    qs = list(merged.collect()[0]["quantiles"])
    assert len(qs) == len(fracs)
    for f, est in zip(fracs, qs):
        err = abs(rank_of(float(est)) - f)
        assert err <= 0.05, (f, est, err)  # k=200 bound ~1.65%, margin 3x

    # per-group estimates respect the bound within their own group
    g0 = sorted(
        r["v"] for r in df.filter(F.col("g") == "0").select("v").collect()
    )
    got = sketch_quantiles(
        per_group.filter(F.col("g") == "0"), [0.5]
    ).collect()[0]
    import bisect

    est = float(got["quantiles"][0])
    assert abs(bisect.bisect_right(g0, est) / len(g0) - 0.5) <= 0.05
    # the sketch is a KB-scale summary, not the data
    assert len(bytes(got["sketch"])) < 50_000


def test_psi_drift_detection(spark, tmp_path):
    """PSI (round 4): identical distributions score ~0; a location
    shift scores far past the 0.25 action threshold; the bucket shares
    match a DuckDB twin exactly."""
    import duckdb

    from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
        bucket_shares,
        psi,
        quantile_edges,
    )

    base = spark.createDataFrame(
        [(i, (i * 37 % 100) / 10.0) for i in range(400)], "id long, v double"
    )
    same = spark.createDataFrame(
        [(i, (i * 53 % 100) / 10.0) for i in range(300)], "id long, v double"
    )
    shifted = spark.createDataFrame(
        [(i, 6.0 + (i * 37 % 100) / 25.0) for i in range(300)],
        "id long, v double",
    )
    assert abs(psi(base, same, "v")) < 0.02
    assert psi(base, shifted, "v") > 1.0

    # DuckDB twin of the bucket shares on the same edges.
    edges = quantile_edges(base, "v", 10)
    base.write.mode("overwrite").parquet(f"{tmp_path}/base.parquet")
    bucket_expr = " + ".join(
        f"CASE WHEN v >= {e!r} THEN 1 ELSE 0 END" for e in edges
    )
    duck = {
        int(b): s
        for b, s in duckdb.sql(
            f"""
            SELECT ({bucket_expr}) AS bucket,
                   round(count(*) / sum(count(*)) OVER (), 6) AS share
            FROM '{tmp_path}/base.parquet/*.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    got = {
        r["bucket"]: r["share"]
        for r in bucket_shares(base, "v", edges).collect()
    }
    assert got == duck


def _ref_registrable_domain(url, rules):
    """Straight-line publicsuffix.org algorithm over the same rule
    set — the parity reference for registrable_domain."""
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?:#]*)", url.strip())
    host = (m.group(1) if m else "").lower()
    host = re.sub(r":[0-9]*$", "", host)
    labels = [x for x in host.split(".") if x]
    table = {
        r.lstrip("!"): ("exc" if r.startswith("!") else "norm")
        for r in rules
    }
    n = len(labels)
    exc = match = None
    for i in range(1, n + 1):
        suf = ".".join(labels[i - 1:])
        if table.get(suf) == "exc" and exc is None:
            exc = i
        hit = table.get(suf) == "norm" or (
            i < n and table.get("*." + ".".join(labels[i:])) == "norm"
        )
        if hit and match is None:
            match = i
    if n == 0:
        reg = 0
    elif exc is not None:
        reg = exc
    elif match is not None:
        reg = match - 1
    else:
        reg = n - 1
    return ".".join(labels[reg - 1:]) if reg >= 1 else ""


def test_registrable_domain_full_psl_semantics(spark):
    """registrable_domain (round 6): full publicsuffix.org rule
    semantics — normal, wildcard and exception rules — against the
    spec's canonical cases, then randomized parity vs the
    straight-line reference."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        PSL_SNAPSHOT,
        registrable_domain,
    )

    cases = [
        ("https://sub.example.com/x", "example.com"),
        ("http://www.example.co.uk", "example.co.uk"),  # www = plain label
        ("https://example.co.uk:8443/p?q=1", "example.co.uk"),
        ("https://foo.bar.ck/", "foo.bar.ck"),  # *.ck wildcard
        ("http://bar.ck", ""),  # whole host IS a public suffix
        ("https://www.ck/page", "www.ck"),  # !www.ck exception
        ("http://sub.www.ck", "www.ck"),
        ("https://user.github.io/repo", "user.github.io"),  # private registry
        ("https://a.user.github.io", "user.github.io"),
        ("http://example.xyz", "example.xyz"),  # unknown TLD: default '*'
        ("https://xyz", ""),  # single unknown label
        ("not a url", ""),
        ("https://com", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select(
            "url", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    for url, want in cases:
        assert got[url] == want, (url, got[url], want)
        assert _ref_registrable_domain(url, PSL_SNAPSHOT) == want, url

    # randomized parity vs the straight-line reference
    pools = ["sub", "www", "a", "example", "foo"]
    tails = ["com", "co.uk", "ck", "github.io", "xyz", "uk", "io"]
    urls = []
    for i in range(200):
        nlab = 1 + (i % 3)
        host = ".".join(pools[(i + j) % len(pools)] for j in range(nlab))
        urls.append(f"https://{host}.{tails[i % len(tails)]}/p{i}")
    rdf = spark.createDataFrame([(u,) for u in urls], "url string")
    rgot = {
        r["url"]: r["d"]
        for r in rdf.select(
            "url", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    for u in urls:
        assert rgot[u] == _ref_registrable_domain(u, PSL_SNAPSHOT), u


def test_gopher_repetition_signals_hand_computed(spark):
    """ngram_repetition_masses / line_repetition (round 6): the Gopher
    repetition rules against hand-computed fixtures."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        line_repetition,
        ngram_repetition_masses,
        words_of,
    )

    # toks: a b a b a b c -> 2-grams: 'a b'x3, 'b a'x2, 'b c'x1
    # charlen('a b') = 2; top mass = 3*2 = 6; dup mass = 2*2 + 1*2 = 6
    # word chars = 7
    df = spark.createDataFrame([("a b a b a b c",)], "text string")
    row = df.select(
        ngram_repetition_masses(words_of(F.col("text")), 2).alias("m")
    ).first()
    assert row["m"]["top"] == 6 and row["m"]["dup"] == 6

    # 5-gram repeat: 'x y z w v' twice with a break
    txt = "x y z w v q x y z w v"
    # 5-grams: positions 1..7; 'x y z w v' occurs at 1 and 7 -> dup
    # mass = (2-1) * charlen('x y z w v') = 5; top = 2*5 = 10
    row5 = spark.createDataFrame([(txt,)], "text string").select(
        ngram_repetition_masses(words_of(F.col("text")), 5).alias("m")
    ).first()
    assert row5["m"]["top"] == 10 and row5["m"]["dup"] == 5

    # fewer words than n -> empty ngram list -> zero masses
    tiny = spark.createDataFrame([("one two",)], "text string").select(
        ngram_repetition_masses(words_of(F.col("text")), 5).alias("m")
    ).first()
    assert tiny["m"]["top"] == 0 and tiny["m"]["dup"] == 0

    # lines: 4 non-blank lines (blank dropped), 'x' duplicated once ->
    # dup_line_frac 1/4; chars: total 4+3+1 chars? lines are
    # ['xx','y','xx',' z'] -> trim drops none here; dup char mass =
    # len('xx') = 2 of total 2+1+2+2 = 7
    lr = spark.createDataFrame(
        [("xx\ny\n\nxx\n z",)], "text string"
    ).select(line_repetition(F.col("text")).alias("l")).first()
    assert lr["l"]["dup_line_frac"] == 0.25
    assert lr["l"]["dup_line_char_frac"] == round(2 / 7, 6)

    # no newline structure -> both 0.0
    flat = spark.createDataFrame([("just one line",)], "text string").select(
        line_repetition(F.col("text")).alias("l")
    ).first()
    assert flat["l"]["dup_line_frac"] == 0.0
    assert flat["l"]["dup_line_char_frac"] == 0.0

    # CRLF corpus scores identically to its LF twin (ADVICE r6: a bare
    # \n split leaves '\r' on every line, so 'xx\r' vs 'xx' counted as
    # distinct and Windows crawls systematically under-scored)
    crlf = spark.createDataFrame(
        [("xx\r\ny\r\n\r\nxx\r\n z",)], "text string"
    ).select(line_repetition(F.col("text")).alias("l")).first()
    assert crlf["l"]["dup_line_frac"] == 0.25
    assert crlf["l"]["dup_line_char_frac"] == round(2 / 7, 6)


def test_quantile_edges_approx_within_rank_error(spark):
    """The approx=True scale path (round 6, VERDICT r5 item 6): every
    sketch-placed edge must be a data value whose empirical rank sits
    within the documented 1/accuracy band of its target fraction — the
    Greenwald-Khanna contract percentile_approx ships. PSI computed on
    approx edges must agree with the exact-edge PSI on both the null
    and the planted-shift case."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
        psi,
        quantile_edges,
    )

    n = 4000
    vals = sorted(((i * 7919) % n) / 40.0 for i in range(n))
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    accuracy = 100  # rank error <= 1%: coarse enough to be a real test
    approx_edges = quantile_edges(base, "v", 10, approx=True,
                                  accuracy=accuracy)
    assert len(approx_edges) == 9
    err = 1.0 / accuracy
    for i, e in enumerate(approx_edges, start=1):
        target = i / 10.0
        rank_le = sum(1 for v in vals if v <= e) / n
        rank_lt = sum(1 for v in vals if v < e) / n
        # GK guarantee: some rank in [count(<e), count(<=e)] is within
        # err of the target (+1/n discretization slack)
        assert rank_lt <= target + err + 1.0 / n
        assert rank_le >= target - err - 1.0 / n
    # monotone edge list (bucket_shares assumes sorted edges)
    assert approx_edges == sorted(approx_edges)

    shifted = spark.createDataFrame(
        [(i, 60.0 + ((i * 37) % 100) / 25.0) for i in range(1000)],
        "id long, v double",
    )
    same = spark.createDataFrame(
        [(i, ((i * 53) % n) / 40.0) for i in range(1000)],
        "id long, v double",
    )
    assert abs(psi(base, same, "v", approx=True)) < 0.05
    assert psi(base, shifted, "v", approx=True) > 1.0
    # approx-vs-exact PSI agreement on the same candidate
    assert abs(
        psi(base, same, "v", approx=True) - psi(base, same, "v")
    ) < 0.05


def test_ppl_buckets_approx_agreement_within_rank_error(spark):
    """ppl_buckets(approx=True): a document may change bucket vs the
    exact split ONLY if its NLL rank lies within the sketch's
    1/accuracy band of a boundary fraction — the executable form of
    the '100 TB: swap approx_percentile in' recipe."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        ppl_buckets,
    )

    n = 3000
    rows = [(i, float((i * 7919) % n) / 100.0 + 1.0) for i in range(n)]
    scored = spark.createDataFrame(rows, "doc_id long, nll double")
    accuracy = 100
    exact = {
        r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(scored).collect()
    }
    approx = {
        r["doc_id"]: r["ppl_bucket"]
        for r in ppl_buckets(scored, approx=True, accuracy=accuracy).collect()
    }
    # rank of each doc's nll (ties broken by value equality: dataset
    # values are distinct by construction)
    order = sorted(rows, key=lambda t: t[1])
    rank = {doc: (i + 1) / n for i, (doc, _v) in enumerate(order)}
    err = 1.0 / accuracy + 1.0 / n
    moved = [d for d in exact if approx[d] != exact[d]]
    for d in moved:
        near_boundary = min(
            abs(rank[d] - 1.0 / 3), abs(rank[d] - 2.0 / 3)
        )
        assert near_boundary <= err, (
            f"doc {d} changed bucket at rank {rank[d]:.4f}, outside the "
            f"{err:.4f} band of any boundary"
        )
    # the split is still ~thirds
    from collections import Counter

    c = Counter(approx.values())
    for lab in ("head", "middle", "tail"):
        assert abs(c[lab] / n - 1.0 / 3) < 0.02


def test_report_cli_with_baseline_drift(spark, tmp_path, capsys):
    """--mode report --baseline: the report gains a PSI drift line; a
    same-distribution baseline stays under the investigate threshold,
    a degraded batch (numbers-heavy docs) trips it."""
    import json

    from run_pipeline import run_report

    # base docs VARY in length and stopword mix (a real corpus has a
    # spread — PSI needs non-degenerate baseline quantiles)
    base_rows = [
        (
            i,
            "the quick brown fox jumps over a lazy dog near town "
            + " ".join(f"w{j}" for j in range(i % 9)),
            "web",
            50,
        )
        for i in range(120)
    ]
    bad_rows = [
        (i, "the old server logs 404 500 301 999 123 867 5309 777 " * 4,
         "web", 30)
        for i in range(120)
    ]
    for name, rows in (("base", base_rows), ("same", base_rows),
                       ("bad", bad_rows)):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / name / "documents.parquet")
        )

    out = run_report(
        spark, str(tmp_path / "same"), baseline_path=str(tmp_path / "base")
    )
    drift = out[-1]
    # identical corpus: both distributions sit inside 'investigate'
    assert drift["psi_quality_score"] < 0.1
    assert drift["psi_n_tokens"] < 0.1

    out = run_report(
        spark, str(tmp_path / "bad"), baseline_path=str(tmp_path / "base")
    )
    drift = out[-1]
    # degraded batch (4x-longer numbers-heavy docs): past 'act'
    assert max(drift["psi_quality_score"], drift["psi_n_tokens"]) > 0.25
    # the drift line is printed as JSON for the operator
    printed = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert any("psi_quality_score" in p for p in printed)


def test_curate_strip_boilerplate_drops_tainted_chunks(spark):
    """strip_boilerplate=K (round 4): chunks containing a verbatim
    window shared by >= K kept docs are dropped before packing; clean
    chunks of the same documents survive."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    boiler = (
        "this material is provided under the common license terms here"
    )
    uniq = [
        " ".join(
            f"the body{d}{j} is a tale of word{d}{j} and item{j}{d} in town{j}"
            for j in range(6)
        )
        for d in range(4)
    ]
    rows = [(d, uniq[d] + " " + boiler) for d in range(3)]
    rows.append((3, uniq[3]))  # clean doc, no boilerplate
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kept_plain = curate_corpus(docs, chunk_tokens=16, overlap=0, fuzzy=False)
    kept_strip = curate_corpus(
        docs, chunk_tokens=16, overlap=0, fuzzy=False, strip_boilerplate=3
    )
    plain = [(r["doc_id"], r["chunk_text"]) for r in kept_plain.collect()]
    strip = [(r["doc_id"], r["chunk_text"]) for r in kept_strip.collect()]
    assert len(strip) < len(plain)
    # no surviving chunk contains the boilerplate span
    assert all("common license terms" not in t for _, t in strip)
    # the clean doc and the clean chunks of tainted docs survive
    assert {d for d, _ in strip} == {0, 1, 2, 3}


def test_curate_despan_removes_spans_keeps_remainder(spark):
    """despan_min_copies=K (round 10): the duplicated span is CUT from
    every kept document's token stream (one global keeper occurrence
    survives) while the unique remainder continues into chunking —
    where strip_boilerplate would drop whole chunks, this keeps every
    document's own words. Composes with strip_boilerplate: after
    removal no span clears the >= K bar, so the chunk filter drops
    nothing further."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.curate import (
        curate_corpus,
    )

    boiler = (
        "this material is provided under the common license terms here"
    )
    uniq = [
        " ".join(
            f"the body{d}{j} is a tale of word{d}{j} and item{j}{d} in town{j}"
            for j in range(6)
        )
        for d in range(4)
    ]
    rows = [(d, uniq[d] + " " + boiler) for d in range(3)]
    rows.append((3, uniq[3]))  # clean doc, no boilerplate
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kept = curate_corpus(
        docs, chunk_tokens=16, overlap=0, fuzzy=False, despan_min_copies=3
    )
    despan = [(r["doc_id"], r["chunk_text"]) for r in kept.collect()]
    joined = {
        d: " ".join(t for dd, t in despan if dd == d) for d in range(4)
    }
    # exactly one global keeper occurrence of the span survives
    assert (
        sum(t.count("common license terms") for _, t in despan) == 1
    )
    # every document keeps its own unique words
    for d in range(4):
        assert f"body{d}0" in joined[d] and f"word{d}5" in joined[d]
    # strip_boilerplate composes as a no-op on the rewritten stream
    both = curate_corpus(
        docs, chunk_tokens=16, overlap=0, fuzzy=False,
        despan_min_copies=3, strip_boilerplate=3,
    )
    assert sorted(
        (r["doc_id"], r["chunk_text"]) for r in both.collect()
    ) == sorted(despan)


def test_canonicalize_url_semantics_and_duckdb_parity(spark, tmp_path):
    """URL canonicalization (round 5): lowercased scheme/host, fragment
    dropped, default ports stripped, empty path -> '/', trailing
    slashes stripped, tracking params dropped and survivors SORTED so
    parameter order never splits identical pages — and the whole
    expression replays identically in DuckDB (RE2-safe patterns)."""
    import duckdb
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        TRACKING_PARAM_RE,
        canonicalize_url,
        url_domain,
    )

    rows = [
        (0, "HTTP://WWW.Example.COM:80/path/?utm_source=x&b=2&a=1#frag"),
        (1, "https://shop.example.co.uk:443/a/b//"),
        (2, "http://example.com"),
        (3, "not a url"),
        (4, "https://example.com/?gclid=zzz&fbclid=1"),
        (5, "http://example.com:8080/x?z=1&y=2"),
        (6, "  https://Sub.Domain.ORG/Keep/Case#x  "),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", canonicalize_url(F.col("url")).alias("u")
        ).collect()
    }
    assert got[0] == "http://www.example.com/path?a=1&b=2"
    assert got[1] == "https://shop.example.co.uk/a/b"
    assert got[2] == "http://example.com/"
    assert got[3] == "not a url"       # no scheme: pass through trimmed
    assert got[4] == "https://example.com/"
    assert got[5] == "http://example.com:8080/x?y=2&z=1"
    assert got[6] == "https://sub.domain.org/Keep/Case"  # path case kept
    assert got[7] == ""

    doms = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", url_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert doms[0] == "example.com"     # www. stripped, port dropped
    assert doms[1] == "example.co.uk"   # shared second-level registry
    assert doms[3] == ""                # not a URL
    assert doms[6] == "domain.org"      # subdomain reduced to eTLD+1

    # DuckDB twin: the identical regexp/list chain.
    df.write.mode("overwrite").parquet(str(tmp_path / "u.parquet"))
    tp = TRACKING_PARAM_RE.replace("'", "''")
    duck = {
        int(i): (u, d)
        for i, u, d in duckdb.sql(f"""
            WITH s AS (
              SELECT doc_id, trim(url) AS t,
                     regexp_replace(trim(url), '(?s)#.*$', '') AS u
              FROM '{tmp_path}/u.parquet/*.parquet'
            ), parts AS (
              SELECT doc_id, t,
                lower(regexp_extract(u,
                    '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS raw_scheme,
                lower(regexp_extract(u,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]*)', 1)) AS hp,
                regexp_extract(u,
                    '(?s)^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*(.*)$', 1) AS rest
              FROM s
            ), norm AS (
              SELECT doc_id, t, scheme, raw_scheme,
                CASE WHEN scheme = 'http'
                     THEN regexp_replace(hp, ':80$', '')
                     WHEN scheme = 'https'
                     THEN regexp_replace(hp, ':443$', '')
                     ELSE hp END AS hp,
                CASE WHEN regexp_replace(
                         regexp_extract(rest, '^([^?]*)', 1),
                         '/+$', '') = '' THEN '/'
                     ELSE regexp_replace(
                         regexp_extract(rest, '^([^?]*)', 1),
                         '/+$', '') END AS path,
                array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(rest, '(?s)\\?(.*)$', 1),
                                 '&'),
                    x -> x <> '' AND NOT regexp_matches(x, '{tp}'))),
                    '&') AS kept
              FROM parts
            )
            SELECT doc_id,
                   CASE WHEN raw_scheme = '' THEN t
                        ELSE scheme || '://' || hp || path ||
                             CASE WHEN kept <> '' THEN '?' || kept
                                  ELSE '' END
                   END AS u,
                   regexp_extract(
                     regexp_replace(
                       lower(regexp_extract(t,
                         '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?:#]*)', 1)),
                       '^www\\.', ''),
                     '([^.]+\\.(?:co|com|net|org|ac|gov|edu)\\.[a-z][a-z]|[^.]+\\.[^.]+)$',
                     1) AS d
            FROM norm
        """).fetchall()
    }
    assert duck == {i: (got[i], doms[i]) for i in got}


def test_cap_per_key_per_domain(spark):
    """Per-domain cap (round 5, RefinedWeb shape): at most k docs
    survive per registered domain, chosen by the given ordering with a
    deterministic tiebreak."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        url_domain,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
        cap_per_key,
    )

    rows = [
        (0, "http://a.example.com/1", 0.9),
        (1, "http://b.example.com/2", 0.7),
        (2, "http://example.com/3", 0.8),
        (3, "http://example.com/4", 0.7),   # 4 docs on example.com
        (4, "http://other.org/x", 0.1),
        (5, "http://www.other.org/y", 0.2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")
    capped = cap_per_key(
        df.withColumn("domain", url_domain(F.col("url"))),
        "domain", 2, [F.desc("q"), F.asc("doc_id")],
    )
    kept = sorted(r["doc_id"] for r in capped.collect())
    # example.com keeps 0 (0.9) and 2 (0.8); other.org keeps both
    assert kept == [0, 2, 4, 5]


def test_curate_cli_cap_key_regdomain(spark, tmp_path, capsys, monkeypatch):
    """--mode curate --cap-per-domain --cap-key regdomain (VERDICT r6
    item 6 / r7 item 3): under the PSL key two *.github.io publishers
    get SEPARATE caps, while the raw-host heuristic key pools them
    under one github.io cap; --psl swaps the rule set and observably
    changes the keying."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    # 6 docs each from two github.io publishers + example.com; texts
    # are irrelevant to the cap (it runs FIRST) — stats['docs'] is the
    # post-cap corpus entering the chain.
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    body = (
        "Sunny beaches and quiet mountain trails make this island a "
        "favorite for travelers seeking calm weather in spring %d."
    )
    with open(docs_dir / "part-0.jsonl", "w") as fh:
        for i in range(18):
            host = ["alice.github.io", "bob.github.io", "example.com"][i % 3]
            fh.write(json.dumps({
                "doc_id": i,
                "text": body % i,
                "url": f"https://{host}/post/{i}",
            }) + "\n")

    runs = iter(range(10))

    def run(extra):
        out = str(tmp_path / f"out{next(runs)}")
        monkeypatch.setattr(sys, "argv", [
            "run_pipeline.py", "--mode", "curate", "--path", str(docs_dir),
            "--out", out, "--cap-per-domain", "2", *extra,
        ])
        run_pipeline.main()
        line = [
            ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith(">>> curated;")
        ][0]
        return int(line.split(";")[1].split()[0])  # docs entering chain

    # regdomain: github.io is a PRIVATE-section suffix in the built-in
    # snapshot -> alice/bob are distinct registrable domains: 3 keys.
    assert run(["--cap-key", "regdomain"]) == 6
    # raw-host heuristic key: alice/bob both reduce to github.io: 2 keys.
    assert run(["--cap-key", "domain"]) == 4
    # --psl with a rule list where github.io is NOT a suffix (only io):
    # both publishers share registrable domain github.io again: 2 keys.
    psl = tmp_path / "tiny.dat"
    psl.write_text("// ===BEGIN ICANN DOMAINS===\nio\ncom\n"
                   "// ===END ICANN DOMAINS===\n", encoding="utf-8")
    assert run(["--cap-key", "regdomain", "--psl", str(psl)]) == 4


def test_curate_cli_cap_exempts_keyless_docs(spark, tmp_path, capsys, monkeypatch):
    """ADVICE r8: docs whose cap key is null (no url) or '' (non-URL
    string) are NOT one publisher — they must be exempt from the
    per-domain cap with a printed count, not silently pooled under one
    pseudo-domain and truncated to K."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    docs_dir = tmp_path / "docs_keyless"
    docs_dir.mkdir()
    body = (
        "Sunny beaches and quiet mountain trails make this island a "
        "favorite for travelers seeking calm weather in spring %d."
    )
    with open(docs_dir / "part-0.jsonl", "w") as fh:
        for i in range(12):
            rec = {"doc_id": i, "text": body % i}
            if i % 3 == 0:
                rec["url"] = f"https://example.com/post/{i}"  # 4 docs
            elif i % 3 == 1:
                rec["url"] = None  # null key
            else:
                rec["url"] = "not a url at all"  # '' key
            fh.write(json.dumps(rec) + "\n")

    out = str(tmp_path / "out_keyless")
    monkeypatch.setattr(sys, "argv", [
        "run_pipeline.py", "--mode", "curate", "--path", str(docs_dir),
        "--out", out, "--cap-per-domain", "2", "--cap-key", "domain",
    ])
    run_pipeline.main()
    got = capsys.readouterr().out
    # 8 keyless docs exempt; example.com capped 4 -> 2; chain sees 10
    assert ">>> cap-per-domain: 8 docs carry no usable cap key" in got
    line = [
        ln for ln in got.splitlines() if ln.startswith(">>> curated;")
    ][0]
    assert int(line.split(";")[1].split()[0]) == 10


def test_dsir_importance_and_ppl_buckets_semantics(spark):
    """DSIR importance weighting + CCNet perplexity bucketing (round
    5): a doc made of trusted-corpus vocabulary scores a HIGHER
    log-ratio (and a lower NLL -> head bucket) than one made of
    out-of-domain terms; bucket sizes follow the terciles."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        importance_weights,
        lm_score_docs,
        ppl_buckets,
        unigram_lm,
    )

    trusted = spark.createDataFrame(
        [(i, "travel hotel beach sun resort booking") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "travel hotel beach sun"),          # fully in-domain
            (1, "hotel booking resort lattice"),    # one unknown term
            (2, "quantum chromodynamics lattice"),  # out-of-domain
        ],
        "doc_id long, text string",
    )
    raw = trusted.unionByName(docs)
    tlm, rlm = unigram_lm(trusted), unigram_lm(raw)
    w = {
        r["doc_id"]: r["log_ratio"]
        for r in importance_weights(docs, tlm, rlm).collect()
    }
    assert w[0] > w[2] and w[1] > w[2]
    assert w[2] < 0  # out-of-domain: raw explains it better than target

    scored = lm_score_docs(docs, tlm)
    buckets = {
        r["doc_id"]: r["ppl_bucket"]
        for r in ppl_buckets(scored).collect()
    }
    assert buckets[2] == "tail"          # unknown-heavy doc: worst NLL
    assert sorted(buckets.values()) == ["head", "middle", "tail"]


def test_trained_quality_classifier_separates_and_matches_reference(
    spark, tmp_path
):
    """fastText-shape trained quality classifier (round 5): hashed
    bag-of-words features + distributed full-batch logistic
    regression. On a separable planted corpus the trained gate
    classifies a held-out set perfectly; the distributed training
    matches a straight-line pure-Python reference to float tolerance;
    and the feature relation replays exactly in DuckDB (md5 bucket,
    engine-portable by construction)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.classifier import (
        classifier_parity_reference,
        hashed_bow_features,
        score_quality,
        train_quality_classifier,
    )

    rng = random.Random(3)
    good_vocab = [f"travel{i}" for i in range(30)]
    bad_vocab = [f"spamword{i}" for i in range(30)]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(12))

    rows = [(i, doc(good_vocab), 1) for i in range(40)]
    rows += [(i, doc(bad_vocab), 0) for i in range(40, 80)]
    train = [r for r in rows if r[0] % 4 != 0]
    hold = [r for r in rows if r[0] % 4 == 0]

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in train], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in train], "doc_id long, label int"
    )
    dim = 256
    feats = hashed_bow_features(docs, dim=dim).persist()
    w, b = train_quality_classifier(feats, labels, dim=dim, iters=8)

    hold_df = spark.createDataFrame(
        [(i, t) for i, t, _ in hold], "doc_id long, text string"
    )
    probs = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(hold_df, w, b, dim=dim).collect()
    }
    want = {i: y for i, _, y in hold}
    assert all((probs[i] > 0.5) == (want[i] == 1) for i in probs)

    # distributed training == straight-line reference (same feature
    # rows, same schedule) to float tolerance
    feat_rows = [
        (r["doc_id"], r["bucket"], r["x"]) for r in feats.collect()
    ]
    w2, b2 = classifier_parity_reference(
        feat_rows, {i: float(y) for i, _, y in train}, dim, iters=8
    )
    assert abs(b - b2) < 1e-9
    assert max(abs(a - c) for a, c in zip(w, w2)) < 1e-9

    # DuckDB twin of the feature relation (md5 bucket + L1 normalize)
    docs.write.mode("overwrite").parquet(str(tmp_path / "d.parquet"))
    duck = {
        (int(i), int(k)): x
        for i, k, x in duckdb.sql(f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM '{tmp_path}/d.parquet/*.parquet'
            ), c AS (
                SELECT doc_id,
                       ('0x' || substr(md5(term), 1, 15))::BIGINT % {dim}
                           AS bucket,
                       count(*) AS n
                FROM toks GROUP BY 1, 2
            )
            SELECT doc_id, bucket,
                   n / sum(n) OVER (PARTITION BY doc_id) AS x
            FROM c
        """).fetchall()
    }
    got = {(i, k): x for i, k, x in feat_rows}
    assert set(duck) == set(got)
    assert all(abs(duck[k] - got[k]) < 1e-12 for k in got)
    feats.unpersist()


def test_canonicalize_url_idempotent_and_invariant(spark):
    """Canonicalization must be IDEMPOTENT (canonical URLs are fixed
    points — the dedup key property) and its outputs must satisfy the
    invariants downstream relies on: no fragment, no default port, no
    tracking params, query params sorted. Checked over a constructed
    fuzz matrix of scheme/host/port/path/query/fragment combinations."""
    import itertools

    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        canonicalize_url,
    )

    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["Example.com", "www.ex.co.uk", "a.b.c"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/x/", "//y//"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?gclid=1&z=9&utm_a=2",
               "?a=1&a=1&"]
    frags = ["", "#f", "#a?b=1"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{fr}"
        for s, h, po, pa, q, fr in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], r["url"]          # idempotent
        c = r["c1"]
        assert "#" not in c, r["url"]                # fragment gone
        assert "utm_" not in c and "gclid" not in c, r["url"]
        assert not c.startswith("http://") or ":80/" not in c
        assert not c.startswith("https://") or ":443/" not in c
        if "?" in c:
            params = c.split("?", 1)[1].split("&")
            assert params == sorted(params), r["url"]  # sorted, no ''
            assert "" not in params
        # scheme+host lowercased
        head = c.split("://", 1)
        assert head[0] == head[0].lower()
        assert head[1].split("/", 1)[0] == head[1].split("/", 1)[0].lower()


def test_curate_ppl_tail_stage_drops_outliers(spark, tmp_path):
    """CCNet perplexity stage in the curate chain (round 5,
    --ppl-tail): gibberish documents that PASS the heuristic gate
    (fluent-looking lengths, stopwords present, no repetition) but are
    statistical outliers under the corpus LM land in the NLL tail and
    are dropped; the fluent majority survives. Also drives the CLI
    path end to end."""
    import json
    import random
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_curate

    rng = random.Random(9)
    common = ("the and of travel hotel beach summer season booking "
              "resort coast room view sun guest price city tour day "
              "trip plan stay").split()
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    rows = []
    for i in range(40):  # fluent: drawn from a shared vocabulary
        rows.append((i, "the " + " ".join(
            rng.choice(common) for _ in range(30)
        )))
    for i in range(40, 44):  # outliers: singleton pseudo-words
        rows.append((i, "the " + " ".join(
            f"zzq{i}x{j}" for j in range(30)
        )))
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    stats = run_curate(
        spark, str(docs_dir), str(tmp_path / "out"), ppl_tail=0.1
    )
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert stats["docs"] == 44
    assert not kept & {40, 41, 42, 43}   # the planted tail is gone
    assert len(kept & set(range(40))) >= 36  # fluent docs survive

    # without the stage the outliers pass the heuristic gate
    stats2 = run_curate(spark, str(docs_dir), str(tmp_path / "out2"))
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert {40, 41, 42, 43} <= kept2


def test_train_classifier_and_curate_gate_cli(spark, tmp_path):
    """Two-command classifier workflow (round 5): --mode
    train-classifier learns a {dim, weights, bias} JSON from labeled
    seeds, then --mode curate --classifier-model gates with it —
    spam-vocabulary docs that pass the heuristic gate are dropped,
    the in-domain corpus survives."""
    import json
    import random
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_curate, run_train_classifier

    rng = random.Random(5)
    good = ("the travel hotel beach summer season booking resort "
            "coast room view sun guest price city tour day").split()
    bad = ("the buy cheap pills casino winner claim prize click "
           "free offer bonus jackpot deal now urgent cash").split()

    def doc(vocab):
        return "the " + " ".join(rng.choice(vocab) for _ in range(25))

    # labeled seed set (ids 0-39) + unlabeled corpus (ids 100+)
    seed_rows = [(i, doc(good)) for i in range(20)]
    seed_rows += [(i, doc(bad)) for i in range(20, 40)]
    labels = [(i, 1 if i < 20 else 0) for i in range(40)]
    corpus_rows = [(100 + i, doc(good)) for i in range(30)]
    corpus_rows += [(200 + i, doc(bad)) for i in range(5)]

    seeds_dir = tmp_path / "seeds"
    spark.createDataFrame(
        seed_rows, "doc_id long, text string"
    ).write.parquet(str(seeds_dir))
    labels_dir = tmp_path / "labels"
    spark.createDataFrame(
        labels, "doc_id long, label int"
    ).write.parquet(str(labels_dir))
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in corpus_rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    model_path = str(tmp_path / "model.json")
    stats = run_train_classifier(
        spark, str(seeds_dir), str(labels_dir), model_path,
        dim=256, iters=8,
    )
    assert stats["docs"] == 40 and stats["train_acc"] == 1.0
    model = json.load(open(model_path))
    assert model["dim"] == 256 and len(model["weights"]) == 256

    cstats = run_curate(
        spark, str(docs_dir), str(tmp_path / "out"),
        classifier_model_path=model_path,
    )
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert cstats["docs"] == 35
    assert not any(i >= 200 for i in kept)       # spam gated out
    assert len([i for i in kept if 100 <= i < 200]) >= 28


def test_cavnar_trenkle_langid_classifies_and_matches_duckdb(
    spark, tmp_path
):
    """Trainable language ID (round 5, Cavnar & Trenkle 1994): train
    rank-order char-3-gram profiles on three planted 'languages' with
    distinct character statistics, classify held-out sentences
    correctly (empty text -> NULL), and replay the ENTIRE
    rank/distance/argmin computation in DuckDB."""
    import duckdb

    from travelpulse_spark_stream_tourism_analytics_spark.operators.langid import (
        classify_language,
        train_language_profiles,
    )

    seeds = [
        ("aa", "the quick brown fox jumps over the lazy dog and then "
               "the dog sleeps while the fox runs through the green "
               "fields with the happy children watching them play"),
        ("bb", "zzyzx qzkv wxqz zkzz vqzx zzqw kzxv zqzz xwzk vzqx "
               "qzzk zxvw zzkq xqzv kwzz zqxz vzzk qxwz zkvz xzqw"),
        ("cc", "aeiou aioue eauio uoiea ioaue aeuoi oaiue euoia "
               "iuaoe oueai aoeiu uiaeo eoaiu oiuae aueio ieoau"),
    ]
    seed_df = spark.createDataFrame(seeds, "lang string, text string")
    profiles = train_language_profiles(seed_df, top_k=100)
    assert profiles.groupBy("lang").count().filter(
        "count > 100"
    ).count() == 0

    queries = [
        (0, "the brown dog jumps over the green field"),
        (1, "zzqk vqzz wxzk zzvq kqzx"),
        (2, "aeiuo oieau uaeio eioua"),
        (3, ""),
    ]
    qdf = spark.createDataFrame(queries, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lang"], r["distance"])
        for r in classify_language(qdf, profiles, top_k=100).collect()
    }
    assert got[0][0] == "aa"
    assert got[1][0] == "bb"
    assert got[2][0] == "cc"
    assert got[3] == (None, None)

    # DuckDB twin of the full train+classify computation.
    seed_df.write.mode("overwrite").parquet(str(tmp_path / "s.parquet"))
    qdf.write.mode("overwrite").parquet(str(tmp_path / "q.parquet"))
    ng = """
        SELECT {ids}, g AS ngram, count(*) AS cnt
        FROM (
            SELECT {ids},
                   '_' || regexp_replace(lower(text), '\\s+', '_', 'g')
                       || '_' AS t
            FROM '{src}'
        ), unnest(CASE WHEN length(t) >= 3 THEN
                list_transform(generate_series(1, length(t) - 2),
                               i -> substr(t, i, 3))
                ELSE [] END) u(g)
        GROUP BY ALL
    """
    duck = {
        int(i): (lg, int(d) if d is not None else None)
        for i, lg, d in duckdb.sql(f"""
            WITH pc AS ({ng.format(ids="lang", src=f"{tmp_path}/s.parquet/*.parquet")}),
            prof AS (
                SELECT lang, ngram, rank FROM (
                    SELECT lang, ngram, row_number() OVER (
                        PARTITION BY lang ORDER BY cnt DESC, ngram
                    ) AS rank FROM pc
                ) WHERE rank <= 100
            ),
            dc AS ({ng.format(ids="doc_id", src=f"{tmp_path}/q.parquet/*.parquet")}),
            dr AS (
                SELECT doc_id, ngram, dr FROM (
                    SELECT doc_id, ngram, row_number() OVER (
                        PARTITION BY doc_id ORDER BY cnt DESC, ngram
                    ) AS dr FROM dc
                ) WHERE dr <= 100
            ),
            dist AS (
                SELECT x.doc_id, x.lang,
                       sum(CASE WHEN p.rank IS NOT NULL
                                THEN abs(x.dr - p.rank)
                                ELSE 100 END) AS distance
                FROM (
                    SELECT dr.doc_id, dr.ngram, dr.dr, l.lang
                    FROM dr CROSS JOIN
                         (SELECT DISTINCT lang FROM prof) l
                ) x
                LEFT JOIN prof p ON p.lang = x.lang
                                AND p.ngram = x.ngram
                GROUP BY 1, 2
            ),
            win AS (
                SELECT doc_id, lang, distance FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY doc_id
                        ORDER BY distance ASC, lang ASC
                    ) AS rn FROM dist
                ) WHERE rn = 1
            )
            SELECT q.doc_id, w.lang, w.distance
            FROM (SELECT DISTINCT doc_id
                  FROM '{tmp_path}/q.parquet/*.parquet') q
            LEFT JOIN win w ON w.doc_id = q.doc_id
        """).fetchall()
    }
    want = {i: (lg, int(d) if d is not None else None)
            for i, (lg, d) in got.items()}
    assert duck == want


def test_sample_to_token_budget_semantics(spark):
    """Greedy md5-order budget sampling: never overshoots, takes an
    md5-order PREFIX per source, and the two-phase bucketed running sum
    equals the naive per-source window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        sample_to_token_budget,
    )

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        (F.col("id") % 37 + 5).cast("long").alias("n_tokens"),
    )
    weights = spark.createDataFrame(
        [("s0", 0.5), ("s1", 0.3), ("s2", 0.2)], "source string, weight double"
    )
    kept = sample_to_token_budget(
        docs, weights, budget_tokens=2000
    ).collect()
    assert kept  # non-degenerate

    budgets = {"s0": int(0.5 * 2000), "s1": int(0.3 * 2000), "s2": int(0.2 * 2000)}
    per_src_max = {}
    for r in kept:
        assert r["__cum_tokens"] <= r["__budget_tokens"]
        assert r["__budget_tokens"] == budgets[r["source"]]
        per_src_max[r["source"]] = max(
            per_src_max.get(r["source"], 0), r["__cum_tokens"]
        )
    # never overshoots but fills to within one doc of the budget
    for s, hi in per_src_max.items():
        assert budgets[s] - hi < 37 + 5

    # two-phase == naive single-window cumulative sum (exact rows)
    naive = (
        docs.withColumn("__ok", F.md5(F.col("doc_id").cast("string")))
        .withColumn(
            "__cum",
            F.sum("n_tokens").over(
                Window.partitionBy("source")
                .orderBy("__ok", "doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    want = {
        (r["doc_id"], r["__cum"])
        for r in naive.collect()
        if r["__cum"] <= budgets[r["source"]]
    }
    got = {(r["doc_id"], r["__cum_tokens"]) for r in kept}
    assert got == want

    # prefix property: kept set per source is an md5-order prefix
    order = {
        s: [r["doc_id"] for r in naive.filter(F.col("source") == s)
            .orderBy("__ok", "doc_id").collect()]
        for s in budgets
    }
    for s in budgets:
        kept_ids = [d for d, _ in sorted(
            ((r["doc_id"], r["__cum_tokens"]) for r in kept
             if r["source"] == s), key=lambda t: t[1])]
        assert kept_ids == order[s][: len(kept_ids)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_to_token_budget(docs, weights)
    with _pytest.raises(ValueError):
        sample_to_token_budget(docs, weights, budget_tokens=1, budget_frac=0.1)


def test_compression_signals_flag_repetitive_text(spark):
    """zlib compression ratio separates template spam from prose and is
    exactly reproducible (parity with driver-side zlib)."""
    import zlib

    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
        compression_signals,
    )

    prose = (
        "The harbour town kept its narrow streets cool through summer; "
        "fishermen sold the morning catch beside the old customs house "
        "while visitors climbed toward the lighthouse on the ridge."
    )
    spam = "buy cheap tickets now " * 40
    rows = [(1, prose), (2, spam), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_signals(df).collect()}

    # exact parity with driver-side zlib at the same level
    for did, text in rows:
        if text:
            assert got[did]["zlib_len"] == len(
                zlib.compress(text.encode("utf-8"), 6)
            )
    # spam compresses far better than prose; empty/null never NULL
    assert got[2]["compression_ratio"] > 2 * got[1]["compression_ratio"]
    # short prose barely beats the deflate header overhead; the point
    # is the GAP to spam, not the absolute level
    assert got[1]["compression_ratio"] > 1.2
    assert got[3]["compression_ratio"] == 0.0 and got[4]["compression_ratio"] == 0.0
    # usable as a gate predicate without NULL-semantics surprises
    kept = compression_signals(df).filter(F.col("compression_ratio") <= 6.0)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4}


def test_embedding_drift_semantics(spark):
    """Occupancy flip between snapshots raises PSI; identical
    snapshots give zero PSI and unit centroid-shift cosine; never-
    occupied cells still emit a (0, 0, floored) row; degenerate
    vectors are excluded, not fatal."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
        embedding_drift,
        embedding_psi,
    )

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]),
         (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        "cell_id long, sv array<double>",
    )

    def snap(spec):
        # spec: list of (id, cell_axis, wobble)
        rows = [
            (i, [1.0 if d == ax else (0.1 * w if d == (ax + 1) % 4 else 0.0)
                 for d in range(4)])
            for i, ax, w in spec
        ]
        return spark.createDataFrame(rows, "vec_id long, v array<double>")

    base = snap([(i, 0, 1) for i in range(6)] + [(i + 10, 1, 1) for i in range(2)])
    cand = snap([(i, 0, 2) for i in range(2)] + [(i + 10, 1, 2) for i in range(6)])

    rows = {r["cell_id"]: r for r in embedding_drift(
        base, cand, seeds, id_col="vec_id", vec_col="v"
    ).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["base_n"] == 6 and rows[0]["cand_n"] == 2
    assert rows[1]["base_n"] == 2 and rows[1]["cand_n"] == 6
    assert rows[2]["base_n"] == 0 and rows[2]["cand_n"] == 0
    assert rows[2]["psi_term"] == 0.0  # floored shares are equal
    assert rows[2]["centroid_shift_cosine"] is None
    # occupancy flipped 0.75/0.25 -> 0.25/0.75 in both cells
    assert rows[0]["psi_term"] > 0.1 and rows[1]["psi_term"] > 0.1
    # members wobbled within their cells -> shift below 1, above 0.9
    for c in (0, 1):
        assert 0.9 < rows[c]["centroid_shift_cosine"] < 1.0

    # identical snapshots: PSI exactly 0, shift exactly 1
    same = {r["cell_id"]: r for r in embedding_drift(
        base, base, seeds, id_col="vec_id", vec_col="v"
    ).collect()}
    assert all(r["psi_term"] == 0.0 for r in same.values())
    assert same[0]["centroid_shift_cosine"] == 1.0
    assert embedding_psi(base, base, seeds, id_col="vec_id", vec_col="v") == 0.0

    # degenerate snapshot rows excluded from counts, not fatal
    bad = spark.createDataFrame(
        [(90, [0.0] * 4), (91, [float("nan")] * 4),
         (92, [float("inf"), 1.0, 0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    with_bad = {r["cell_id"]: r for r in embedding_drift(
        base.unionByName(bad), cand, seeds, id_col="vec_id", vec_col="v"
    ).collect()}
    assert with_bad[0]["base_n"] == 6 and with_bad[1]["base_n"] == 2


def test_embedding_drift_matches_duckdb(spark):
    """Full replay in DuckDB over the sf0.001 embeddings (even ids =
    baseline, odd ids = candidate, first-6 seeds): assignment, shares,
    PSI terms and the quantized-sum centroid shift all value-exact."""
    import duckdb
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
        embedding_drift,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        as_double_vec,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    seeds = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("sv")
    )
    got = sorted(
        (
            tuple(r)
            for r in embedding_drift(
                emb.filter(F.col("vec_id") % 2 == 0),
                emb.filter(F.col("vec_id") % 2 == 1),
                seeds,
                id_col="vec_id",
                vec_col="v",
            ).collect()
        ),
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{SF_SMOKE}/embeddings.parquet')"
    )
    sql = """
    WITH ebase AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE list_dot_product(embedding::DOUBLE[],
                               embedding::DOUBLE[]) > 0
          AND NOT isnan(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[]))
          AND NOT isinf(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[]))
    ),
    eseeds AS (SELECT vec_id AS cell_id, v AS sv FROM ebase WHERE vec_id < 6),
    assigned AS (
        SELECT vec_id, v, cell_id, (vec_id % 2 = 0) AS is_base FROM (
            SELECT b.vec_id, b.v, s.cell_id,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY round(list_dot_product(b.v, s.sv)
                                / (sqrt(list_dot_product(b.v, b.v))
                                   * sqrt(list_dot_product(s.sv, s.sv))),
                                6) DESC, s.cell_id
                   ) AS rn
            FROM ebase b, eseeds s
        ) WHERE rn = 1
    ),
    counts AS (
        SELECT cell_id,
               count(*) FILTER (is_base) AS base_n,
               count(*) FILTER (NOT is_base) AS cand_n
        FROM assigned GROUP BY cell_id
    ),
    totals AS (
        SELECT count(*) FILTER (is_base)::DOUBLE AS bt,
               count(*) FILTER (NOT is_base)::DOUBLE AS ct
        FROM assigned
    ),
    sums AS (
        SELECT cell_id, is_base,
               list(qsum ORDER BY pos) AS sumvec
        FROM (
            SELECT cell_id, is_base, pos,
                   CAST(sum(CAST(floor(v[pos] * 1e15) AS DECIMAL(38,0)))
                        AS DOUBLE) AS qsum
            FROM assigned, generate_series(1, 64) t(pos)
            GROUP BY 1, 2, 3
        ) GROUP BY 1, 2
    ),
    pivoted AS (
        SELECT c.cell_id, c.base_n, c.cand_n, sb.sumvec AS bs, sc.sumvec AS cs
        FROM counts c
        LEFT JOIN sums sb ON sb.cell_id = c.cell_id AND sb.is_base
        LEFT JOIN sums sc ON sc.cell_id = c.cell_id AND NOT sc.is_base
    )
    SELECT s.cell_id,
           coalesce(p.base_n, 0) AS base_n,
           coalesce(p.cand_n, 0) AS cand_n,
           round(coalesce(p.base_n, 0) / t.bt, 6) AS base_share,
           round(coalesce(p.cand_n, 0) / t.ct, 6) AS cand_share,
           round((greatest(round(coalesce(p.base_n, 0) / t.bt, 6), 1e-4)
                  - greatest(round(coalesce(p.cand_n, 0) / t.ct, 6), 1e-4))
                 * ln(greatest(round(coalesce(p.base_n, 0) / t.bt, 6), 1e-4)
                      / greatest(round(coalesce(p.cand_n, 0) / t.ct, 6),
                                 1e-4)), 6) AS psi_term,
           CASE WHEN p.bs IS NOT NULL AND p.cs IS NOT NULL THEN
               round(list_dot_product(p.bs, p.cs)
                     / (sqrt(list_dot_product(p.bs, p.bs))
                        * sqrt(list_dot_product(p.cs, p.cs))), 6)
           END AS centroid_shift_cosine
    FROM eseeds s
    LEFT JOIN pivoted p ON p.cell_id = s.cell_id
    CROSS JOIN totals t
    ORDER BY s.cell_id
    """
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_report_cli_embedding_drift_line(spark, tmp_path):
    """--mode report --baseline emits psi_embedding when BOTH corpora
    carry embeddings tables: rotated snapshots trip it while identical
    snapshots stay at ~0 — drift the scalar PSI lines cannot see (the
    doc texts are IDENTICAL in both corpora)."""
    import random

    from run_pipeline import run_report

    docs = [
        (i, "the quick brown fox jumps over the lazy dog", "web", 44)
        for i in range(200)
    ]
    def vecs(rotate):
        rng = random.Random(7)  # fresh per snapshot: 'same' == 'base'
        rows = []
        for i in range(200):
            # two clusters along axes 0/1; 'rotate' flips the mix AND
            # nudges members — occupancy and centroid drift together
            ax = 0 if (i % 4 != 0) ^ rotate else 1
            v = [rng.uniform(-0.05, 0.05) for _ in range(8)]
            v[ax] += 1.0
            rows.append((i, v))
        return rows

    for name, rotate in (("base", False), ("same", False), ("rot", True)):
        spark.createDataFrame(
            docs, "doc_id long, text string, source string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / name / "documents.parquet")
        )
        spark.createDataFrame(
            vecs(rotate), "vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(
            str(tmp_path / name / "embeddings.parquet")
        )

    same = run_report(
        spark, str(tmp_path / "same"), baseline_path=str(tmp_path / "base")
    )[-1]
    rot = run_report(
        spark, str(tmp_path / "rot"), baseline_path=str(tmp_path / "base")
    )[-1]
    # scalar marginals identical in all three corpora
    assert same["psi_quality_score"] < 0.1 and rot["psi_quality_score"] < 0.1
    # embedding space: same distribution ~0, rotated mix past 'act'
    assert same["psi_embedding"] < 0.1
    assert rot["psi_embedding"] > 0.25

    # no embeddings table -> no psi_embedding key (scalar-only report)
    import shutil

    shutil.rmtree(str(tmp_path / "rot" / "embeddings.parquet"))
    noemb = run_report(
        spark, str(tmp_path / "rot"), baseline_path=str(tmp_path / "base")
    )[-1]
    assert "psi_embedding" not in noemb


def test_ngram_decontaminate_semantics(spark):
    """Text-side decontamination: a train doc sharing >= min_shared
    distinct n-gram windows with ANY eval doc is flagged with exact
    counts; disjoint docs are absent; min_shared raises the bar;
    repeated windows inside one doc count once (array_distinct)."""
    import pytest

    from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
        ngram_decontaminate,
    )

    ev = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            # shares "alpha beta gamma" + "beta gamma delta" with eval 0
            (25, "intro alpha beta gamma delta outro"),
            # shares one window with EACH eval doc
            (26, "alpha beta gamma stop zeta eta theta end"),
            # nothing contiguous
            (27, "alpha gamma beta delta epsilon zeta"),
            # the shared window occurs twice -> still counts once
            (28, "alpha beta gamma pad alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in ngram_decontaminate(tr, ev, n=3).collect()
    }
    assert got == {25: (2, 1), 26: (2, 2), 28: (1, 1)}
    strict = {
        r["doc_id"]
        for r in ngram_decontaminate(tr, ev, n=3, min_shared=2).collect()
    }
    assert strict == {25, 26}
    with pytest.raises(ValueError, match="min_shared"):
        ngram_decontaminate(tr, ev, min_shared=0)


def test_decontam_cli_ngram_side(spark, tmp_path, capsys, monkeypatch):
    """--mode decontam --ngrams N runs the text-side operator over
    docs dirs and writes the flagged parquet."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    spark.createDataFrame(
        [
            (25, "intro alpha beta gamma delta outro"),
            (27, "nothing shared here at all friend"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(tmp_path / "train" / "documents.parquet"))
    spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    ).write.parquet(str(tmp_path / "eval" / "documents.parquet"))

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "decontam",
         "--path", str(tmp_path / "train"),
         "--eval", str(tmp_path / "eval"),
         "--out", str(tmp_path / "flagged"),
         "--ngrams", "3"],
    )
    run_pipeline.main()
    assert "1 training docs flagged" in capsys.readouterr().out
    rows = spark.read.parquet(str(tmp_path / "flagged")).collect()
    assert [(r["doc_id"], r["n_shared_ngrams"]) for r in rows] == [(25, 2)]

    # --bloom-bits routes through the bloom prefilter; same output
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "decontam",
         "--path", str(tmp_path / "train"),
         "--eval", str(tmp_path / "eval"),
         "--out", str(tmp_path / "flagged_bloom"),
         "--ngrams", "3", "--bloom-bits", "4096"],
    )
    run_pipeline.main()
    capsys.readouterr()
    brows = spark.read.parquet(str(tmp_path / "flagged_bloom")).collect()
    assert sorted(map(str, brows)) == sorted(map(str, rows))


def test_ngram_decontaminate_bloom_equals_broadcast(spark):
    """strategy='bloom' is a prefilter, not an approximation: output
    equals strategy='broadcast' exactly — including at an absurdly
    dense 64-bit filter where nearly every probe collides (the exact
    verify stage kills every false positive); the word-table joins
    are broadcast (no train-side shuffle)."""
    import pytest
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
        ngram_decontaminate,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") < 20)
    tr = docs.filter(F.col("doc_id") >= 20)

    base = {
        (r["doc_id"], r["n_shared_ngrams"], r["n_eval_docs"])
        for r in ngram_decontaminate(tr, ev, n=3).collect()
    }
    assert base  # the fixture plants shared windows

    bloom = ngram_decontaminate(
        tr, ev, n=3, strategy="bloom", bloom_bits=1 << 20
    )
    got = {
        (r["doc_id"], r["n_shared_ngrams"], r["n_eval_docs"])
        for r in bloom.collect()
    }
    assert got == base

    # word-table probes are BROADCAST hash joins — the train side
    # must not shuffle for the prefilter
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4

    # degenerate 64-bit filter: everything collides, the prefilter
    # passes almost all windows, the verify stage still makes the
    # result exact
    dense = {
        (r["doc_id"], r["n_shared_ngrams"], r["n_eval_docs"])
        for r in ngram_decontaminate(
            tr, ev, n=3, strategy="bloom", bloom_bits=64, bloom_hashes=2
        ).collect()
    }
    assert dense == base

    # min_shared carries through the bloom path
    k2 = ngram_decontaminate(
        tr, ev, n=3, min_shared=2, strategy="bloom", bloom_bits=1 << 20
    ).collect()
    assert all(r["n_shared_ngrams"] >= 2 for r in k2)

    with pytest.raises(ValueError, match="strategy"):
        ngram_decontaminate(tr, ev, strategy="xor")
    with pytest.raises(ValueError, match="bloom_bits"):
        ngram_decontaminate(tr, ev, strategy="bloom", bloom_bits=32)
