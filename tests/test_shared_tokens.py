"""Round-11 contracts: the shared-tokenize ``tokens_col`` parameter
(every word-token operator must produce bit-identical output when fed
a pre-tokenized ``words_of`` array instead of tokenizing inline) and
the thread-ownership guard on ``scoped_persist``."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)

DOCS = [
    (0, "a", "en", "the quick brown fox jumps over the lazy dog"),
    (1, "a", "en", "pack my box with five dozen liquor jugs"),
    (2, "b", "it", "the dog sleeps; the quick dog eats the fox"),
    (3, "b", "en", "spark hash join beats sort merge join here"),
    (4, "c", "en", ""),
    (5, "c", "en", "dup window sort dup window sort dup window sort"),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, source string, lang string, text string"
    )
    return df.withColumn("__toks", words_of(F.col("text")))


def _rows(df):
    # repr-keyed sort: rows may contain NULLs (the LM unknown slot)
    return sorted(map(tuple, df.collect()), key=repr)


def test_unigram_lm_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        unigram_lm,
    )

    assert _rows(unigram_lm(docs)) == _rows(
        unigram_lm(docs, tokens_col="__toks")
    )


def test_lm_score_docs_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        lm_score_docs,
        unigram_lm,
    )

    lm = unigram_lm(docs.filter(F.col("doc_id") < 3))
    assert _rows(lm_score_docs(docs, lm)) == _rows(
        lm_score_docs(docs, lm, tokens_col="__toks")
    )


def test_importance_weights_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.lm import (
        importance_weights,
        unigram_lm,
    )

    t = unigram_lm(docs.filter(F.col("doc_id") < 3))
    r = unigram_lm(docs)
    assert _rows(importance_weights(docs, t, r)) == _rows(
        importance_weights(docs, t, r, tokens_col="__toks")
    )


def test_tfidf_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.keywords import (
        tfidf_top_keywords,
    )

    assert _rows(tfidf_top_keywords(docs, top_k=3)) == _rows(
        tfidf_top_keywords(docs, top_k=3, tokens_col="__toks")
    )


def test_bm25_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.retrieval import (
        bm25_rank,
    )

    q = spark.createDataFrame(
        [(0, "quick dog"), (1, "liquor box")],
        "query_id long, query_text string",
    )
    assert _rows(bm25_rank(docs, q, top_n=5)) == _rows(
        bm25_rank(docs, q, top_n=5, tokens_col="__toks")
    )


def test_term_count_sketches_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.sketches import (
        term_count_sketches,
    )

    a = term_count_sketches(docs, "source", eps=0.01, seed=7).collect()
    b = term_count_sketches(
        docs, "source", eps=0.01, seed=7, tokens_col="__toks"
    ).collect()
    assert sorted(
        (r["source"], bytes(r["sketch"]), r["n_terms"]) for r in a
    ) == sorted((r["source"], bytes(r["sketch"]), r["n_terms"]) for r in b)


def test_word_counts_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        word_counts,
    )

    assert _rows(word_counts(docs)) == _rows(
        word_counts(docs, tokens_col="__toks")
    )


def test_ngram_decontaminate_tokens_col_identical(docs, spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
        ngram_decontaminate,
    )

    train = docs.filter(F.col("doc_id") >= 2)
    ev = docs.filter(F.col("doc_id") < 2)
    assert _rows(ngram_decontaminate(train, ev, n=2)) == _rows(
        ngram_decontaminate(train, ev, n=2, tokens_col="__toks")
    )


# --- scoped_persist thread-ownership guard (round 11) ----------------------


def test_scoped_persist_rejects_cross_thread_repersist_of_live_site(spark):
    """A site persisted by a still-running WORKER thread must not be
    silently evicted by another thread (the unpersist would race the
    owner's reads); the second persist fails loudly instead."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        clear_operator_caches,
        scoped_persist,
    )

    clear_operator_caches()
    site = "test.cache.guard"
    holding = threading.Event()
    release = threading.Event()
    errs = []

    def owner():
        scoped_persist(spark.range(5), site)
        holding.set()
        release.wait(timeout=30)

    def intruder():
        try:
            scoped_persist(spark.range(7), site)
        except RuntimeError as e:
            errs.append(e)

    t = threading.Thread(target=owner, name="owner-thread")
    t.start()
    try:
        assert holding.wait(timeout=30)
        t2 = threading.Thread(target=intruder, name="intruder-thread")
        t2.start()
        t2.join()
        assert len(errs) == 1 and site in str(errs[0])
    finally:
        release.set()
        t.join()
        clear_operator_caches()


def test_scoped_persist_main_thread_owner_is_exempt(spark):
    """Entries run sequentially from the main thread and it joins its
    workers before reading — a later worker re-persisting a
    main-thread-owned site is the normal sequential-entry pattern and
    must keep working (the triangle_counts fixed-site case)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        clear_operator_caches,
        scoped_persist,
    )

    clear_operator_caches()
    site = "test.cache.mainexempt"
    scoped_persist(spark.range(5), site)  # main thread owns it
    out = []

    def worker():
        out.append(scoped_persist(spark.range(7), site).count())

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out == [7]
    clear_operator_caches()


# --- pair_jaccard hashed-intersection parity (round 11) ---------------------


def test_pair_jaccard_hashed_join_matches_string_reference(spark):
    """The verify join carries xxhash64(shingle) instead of the raw
    n-gram string (shuffle-byte reduction); on a collision-free corpus
    the jaccard values must equal the raw-string formulation exactly."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators import (
        dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight nine"),
            (4, "one two three four five six seven eight ten"),
            (5, "totally unrelated words appear in this document"),
        ],
        "doc_id long, text string",
    )
    shingled = dedup.exploded_shingles(docs, "doc_id", "text", 3)
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 5)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.pair_jaccard(pairs, shingled, "doc_id").collect()
    }
    # reference: exact set jaccard computed in python
    rows = shingled.collect()
    sets: dict = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    for a, b in [(1, 2), (3, 4), (1, 5)]:
        inter = len(sets[a] & sets[b])
        if inter == 0:
            assert (a, b) not in got
            continue
        ref = round(inter / float(len(sets[a] | sets[b])), 6)
        assert got[(a, b)] == ref, (a, b, got[(a, b)], ref)
