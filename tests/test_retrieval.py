"""Full-text retrieval operators: BM25 ranking, reciprocal-rank
fusion, and metadata-filtered vector search.

BM25's score math is pinned value-for-value against a DuckDB twin
(the same oracle-portability contract as tf-idf); RRF semantics are
hand-computed (exact small-integer divisions); filtered_knn's two
strategies are pinned against each other (post == pre once the
shortlist covers the corpus) and against the predicate contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from travelpulse_spark_stream_tourism_analytics_spark.operators import (
    retrieval,
    similarity,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
)


def _fixture_docs(spark):
    docs = [
        (0, "spark join"),
        (1, "spark spark spark table"),
        (2, "table scan"),
        (3, "join join table scan scan"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_bm25_semantics(spark):
    """Matching both query terms from a short doc outranks repeating
    one term in a longer doc; docs sharing no term never appear."""
    docs = _fixture_docs(spark)
    queries = spark.createDataFrame(
        [(0, "spark join")], "query_id long, query_text string"
    )
    out = retrieval.bm25_rank(docs, queries).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 2 shares no query term -> absent (BM25 never returns
    # no-match docs)
    assert set(by_doc) == {0, 1, 3}
    assert by_doc[0]["n_terms_matched"] == 2
    assert by_doc[1]["n_terms_matched"] == 1
    assert by_doc[3]["n_terms_matched"] == 1
    # doc 0 matches both terms at dl below avgdl -> rank 1
    assert by_doc[0]["rank"] == 1
    # scores are positive (non-negative idf variant) and ranks ordered
    ordered = sorted(out, key=lambda r: r["rank"])
    assert all(r["score"] > 0 for r in ordered)
    assert all(
        a["score"] >= b["score"] for a, b in zip(ordered, ordered[1:])
    )


def test_bm25_duckdb_parity(spark, tmp_path):
    """Value-for-value BM25 parity with a DuckDB twin on a corpus with
    repeated terms, varying lengths, and two queries."""
    import duckdb

    docs = [
        (0, "spark join"),
        (1, "spark spark spark table"),
        (2, "table scan"),
        (3, "join join table scan scan"),
        (4, "window sort window sort window spark"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "spark join"), (1, "window scan scan")],
        "query_id long, query_text string",
    )
    out = retrieval.bm25_rank(df, queries, top_n=10)
    df.write.mode("overwrite").parquet(str(tmp_path / "d.parquet"))
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH toks AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS toks
            FROM '{tmp_path}/d.parquet/*.parquet'
        ),
        dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
        stats AS (
            SELECT count(*)::DOUBLE AS n,
                   sum(dl)::DOUBLE / count(*) AS avgdl
            FROM dl
        ),
        terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM terms GROUP BY 1, 2),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        q AS (
            SELECT query_id, unnest(list_distinct(list_filter(
                string_split_regex(lower(query_text), '[^a-z0-9]+'),
                x -> x <> ''))) AS term
            FROM (VALUES (0, 'spark join'), (1, 'window scan scan'))
                 AS t(query_id, query_text)
        ),
        contrib AS (
            SELECT q.query_id, tf.doc_id,
                   round(ln(1 + (stats.n - dfx.df + 0.5)
                                / (dfx.df + 0.5))
                         * ((tf.tf * 2.2)
                            / (tf.tf + 1.2 * (0.25
                               + 0.75 * dl.dl / stats.avgdl))),
                         6) AS c
            FROM tf
            JOIN dfx USING (term)
            JOIN dl USING (doc_id)
            JOIN q ON q.term = tf.term, stats
        ),
        scored AS (
            SELECT query_id, doc_id, count(*) AS n_terms_matched,
                   round(sum(c::DECIMAL(20,6))::DOUBLE, 6) AS score
            FROM contrib GROUP BY 1, 2
        )
        SELECT query_id, rank, doc_id, n_terms_matched, score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id
            ) AS rank FROM scored
        ) WHERE rank <= 10
        ORDER BY query_id, rank
        """
    ).fetchall()
    got = [
        (
            r["query_id"], r["rank"], r["doc_id"],
            r["n_terms_matched"], r["score"],
        )
        for r in out.orderBy("query_id", "rank").collect()
    ]
    assert got == [tuple(r) for r in oracle]


def test_bm25_refusals(spark):
    queries = spark.createDataFrame(
        [(0, "x")], "query_id long, query_text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        retrieval.bm25_rank(empty, queries)
    no_tokens = spark.createDataFrame(
        [(0, ""), (1, "!!!")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no tokens"):
        retrieval.bm25_rank(no_tokens, queries)


def test_rrf_fusion_semantics(spark):
    """A doc ranked by both systems beats every single-system doc at
    these depths; contributions are exact 1/(k0+rank) sums; absent
    docs contribute nothing; <2 rankings refused."""
    lex = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)],
        "query_id long, rank long, doc_id long",
    )
    vec = spark.createDataFrame(
        [(0, 1, 11), (0, 2, 20), (0, 3, 21)],
        "query_id long, rank long, doc_id long",
    )
    out = retrieval.rrf_fuse([lex, vec]).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 11: rank 2 lexically + rank 1 vectorially -> two systems
    assert by_doc[11]["n_systems"] == 2
    assert by_doc[11]["rank"] == 1
    # exact contributions: round(1/62,6) + round(1/61,6)
    assert by_doc[11]["score"] == pytest.approx(
        round(1 / 62, 6) + round(1 / 61, 6), abs=1e-9
    )
    # single-system docs carry one term only
    assert by_doc[10]["n_systems"] == 1
    assert by_doc[10]["score"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    # tie between doc 10 (lex rank 1) and doc 20 (vec rank 2)? no:
    # 1/61 > 1/62 -> doc 10 above doc 20
    assert by_doc[10]["rank"] < by_doc[20]["rank"]
    with pytest.raises(ValueError, match="at least two"):
        retrieval.rrf_fuse([lex])


def test_filtered_knn_strategies(spark):
    """prefilter == exact ranking over the filtered corpus; postfilter
    respects the predicate, returns at most k, and converges to
    prefilter once the shortlist covers the corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        similarity.as_double_vec(F.col("embedding")).alias("v"),
        "label",
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pred = F.col("label") == 2
    pre = similarity.filtered_knn(
        emb, queries, "vec_id", "query_id", pred, k=5,
        strategy="prefilter",
    )
    # exact over the filtered corpus by definition
    expect = similarity.brute_force_knn(
        emb.filter(pred), queries, "vec_id", "query_id", "v", k=5
    )
    assert sorted(map(tuple, pre.collect())) == sorted(
        map(tuple, expect.collect())
    )
    labels = {
        r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()
    }
    n_corpus = len(labels)
    # small oversample: predicate honored, never more than k per query
    post = similarity.filtered_knn(
        emb, queries, "vec_id", "query_id", pred, k=5,
        strategy="postfilter", oversample=2,
    ).collect()
    per_q: dict = {}
    for r in post:
        assert labels[r["neighbor_id"]] == 2
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(n <= 5 for n in per_q.values())
    # shortlist covering the whole corpus -> identical to prefilter
    post_full = similarity.filtered_knn(
        emb, queries, "vec_id", "query_id", pred, k=5,
        strategy="postfilter", oversample=n_corpus,
    )
    assert sorted(map(tuple, post_full.collect())) == sorted(
        map(tuple, expect.collect())
    )
    with pytest.raises(ValueError, match="unknown strategy"):
        similarity.filtered_knn(
            emb, queries, "vec_id", "query_id", pred, strategy="mid"
        )


def test_retrieval_plan_shapes(spark):
    """Plan pins: filtered_knn's prefilter predicate must reach the
    parquet scan (a projection materializing the vector column first
    would silently kill the pushdown), and bm25's plan must broadcast
    the query terms and do a map-side partial top-k — never a
    cartesian/nested-loop join."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        similarity.as_double_vec(F.col("embedding")).alias("v"),
        "label",
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pre = similarity.filtered_knn(
        emb, queries, "vec_id", "query_id", F.col("label") == 2, k=5
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(label,2)" in plan, "predicate not pushed to scan"

    docs = load_table(spark, SF_SMOKE, "documents")
    qs = spark.createDataFrame(
        [(0, "spark hash join")], "query_id long, query_text string"
    )
    bplan = (
        retrieval.bm25_rank(docs, qs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in bplan
    assert "WindowGroupLimit" in bplan  # map-side partial top-k
    assert "CartesianProduct" not in bplan
    assert "BroadcastNestedLoopJoin" not in bplan


def test_search_cli_bm25_and_hybrid(spark, tmp_path, capsys, monkeypatch):
    """--mode search: keyword BM25 writes a parquet ranking equal to
    the library call; --by-doc with an embeddings table fuses lexical
    and vector ranks (hybrid-rrf) with the fused scores matching
    rrf_fuse's contract."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "search",
         "--path", SF_SMOKE, "--query", "spark hash join",
         "--top-n", "5", "--out", str(tmp_path / "r")],
    )
    run_pipeline.main()
    assert "bm25, 5 results" in capsys.readouterr().out
    got = spark.read.parquet(str(tmp_path / "r"))
    docs = load_table(spark, SF_SMOKE, "documents")
    qs = spark.createDataFrame(
        [(0, "spark hash join")], "query_id long, query_text string"
    )
    want = retrieval.bm25_rank(docs, qs, top_n=5)
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "search",
         "--path", SF_SMOKE, "--by-doc", "7", "--top-n", "5"],
    )
    run_pipeline.main()
    out = capsys.readouterr().out
    assert "hybrid-rrf, 5 results" in out
    # a missing --by-doc id is a crisp CLI error, not a silent empty
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "search",
         "--path", SF_SMOKE, "--by-doc", "99999999"],
    )
    with pytest.raises(SystemExit):
        run_pipeline.main()
    assert "not found" in capsys.readouterr().err
