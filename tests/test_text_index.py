"""Persistent inverted text index (operators/text_index.py): the
search path must equal bm25_rank bit-for-bit, incremental adds must
equal a bulk build bit-for-bit, and the probed scan must prune to the
query terms' bucket partitions.
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.operators import (
    retrieval,
    text_index,
)


def _docs(spark, rows=None):
    rows = rows or [
        (0, "spark join"),
        (1, "spark spark spark table"),
        (2, "table scan"),
        (3, "join join table scan scan"),
        (4, "parquet shuffle exchange"),
        (5, "broadcast join hint shuffle"),
        (6, "window rank over partition"),
        (7, "spark window partition table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "spark join"), (1, "table scan window"), (2, "shuffle")],
        "query_id long, query_text string",
    )


def _collect_sorted(df):
    return [
        tuple(r)
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_search_equals_bm25_rank_bitwise(spark, tmp_path):
    """The persisted-index search is the SAME operator as bm25_rank —
    identical rows, ranks and 1e-6-rounded scores."""
    docs = _docs(spark)
    queries = _queries(spark)
    idx = str(tmp_path / "tidx")
    stats = text_index.build_text_index(docs, idx, n_buckets=8)
    assert stats["n_docs"] == 8
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=5)
    )
    want = _collect_sorted(retrieval.bm25_rank(docs, queries, top_n=5))
    assert got == want


def test_incremental_add_equals_bulk_build(spark, tmp_path):
    """Chained adds == one bulk build, bit-for-bit: every BM25 input
    (tf, dl, df, N, avgdl) is exact, so folding batches in must not
    move a single score."""
    all_rows = _docs(spark).collect()
    first = spark.createDataFrame(all_rows[:3], "doc_id long, text string")
    second = spark.createDataFrame(all_rows[3:6], "doc_id long, text string")
    third = spark.createDataFrame(all_rows[6:], "doc_id long, text string")
    queries = _queries(spark)

    inc_dir = str(tmp_path / "inc")
    bulk_dir = str(tmp_path / "bulk")
    text_index.build_text_index(first, inc_dir, n_buckets=8)
    text_index.add_to_text_index(spark, inc_dir, second)
    text_index.add_to_text_index(spark, inc_dir, third)
    text_index.build_text_index(_docs(spark), bulk_dir, n_buckets=8)

    inc_stats = text_index.load_text_index_stats(inc_dir)
    bulk_stats = text_index.load_text_index_stats(bulk_dir)
    assert inc_stats == bulk_stats

    got = _collect_sorted(
        text_index.search_text_index(spark, inc_dir, queries, top_n=8)
    )
    want = _collect_sorted(
        text_index.search_text_index(spark, bulk_dir, queries, top_n=8)
    )
    assert got == want


def test_add_validate_raises_on_id_overlap(spark, tmp_path):
    idx = str(tmp_path / "tidx")
    text_index.build_text_index(_docs(spark), idx, n_buckets=8)
    redelivered = spark.createDataFrame(
        [(3, "join join table")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="id-disjoint"):
        text_index.add_to_text_index(
            spark, idx, redelivered, validate=True
        )
    # default (validate=False) keeps the metadata-only plan: no raise
    fresh = spark.createDataFrame(
        [(100, "fresh doc")], "doc_id long, text string"
    )
    stats = text_index.add_to_text_index(spark, idx, fresh)
    assert stats["n_docs"] == 9


def test_search_scan_prunes_to_query_buckets(spark, tmp_path):
    """The postings scan must carry a PartitionFilters entry on the
    bucket column (partition pruning — the layout IS the index) and
    push the term equality into the data filters."""
    idx = str(tmp_path / "tidx")
    text_index.build_text_index(_docs(spark), idx, n_buckets=8)
    queries = spark.createDataFrame(
        [(0, "spark")], "query_id long, query_text string"
    )
    out = text_index.search_text_index(spark, idx, queries)
    plan = out._jdf.queryExecution().executedPlan().toString()
    bucket = zlib.crc32(b"spark") % 8
    # every parquet scan in this plan carries a bucket partition filter
    # naming exactly the probed bucket
    segs = plan.split("PartitionFilters:")[1:]
    assert segs, plan
    for seg in segs:
        head = seg[:200]
        # a single probed bucket renders as an equality, several as IN
        assert "bucket" in head and (
            f"= {bucket})" in head or f"({bucket})" in head
        ), head
    # term pushdown reaches the parquet row groups
    assert "PushedFilters:" in plan and "term" in plan.split(
        "PushedFilters:"
    )[1][:200]


def test_refusals_and_edge_cases(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        text_index.build_text_index(empty, str(tmp_path / "a"))
    blank = spark.createDataFrame(
        [(0, "!!!")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no tokens"):
        text_index.build_text_index(blank, str(tmp_path / "b"))
    idx = str(tmp_path / "c")
    text_index.build_text_index(_docs(spark), idx, n_buckets=8)
    bad_q = spark.createDataFrame(
        [(0, "???")], "query_id long, query_text string"
    )
    with pytest.raises(ValueError, match="no query terms"):
        text_index.search_text_index(spark, idx, bad_q)
    # an empty add is a no-op that leaves stats untouched
    stats = text_index.add_to_text_index(
        spark,
        idx,
        spark.createDataFrame([], "doc_id long, text string"),
    )
    assert stats["n_docs"] == 8


def test_search_matches_duckdb_twin(spark, tmp_path):
    """End-to-end value parity: the persisted-index search replayed in
    DuckDB (the same SQL shape the bm25 catalog branch uses)."""
    duckdb = pytest.importorskip("duckdb")
    docs = _docs(spark)
    queries = _queries(spark)
    idx = str(tmp_path / "tidx")
    text_index.build_text_index(docs, idx, n_buckets=8)
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=5)
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({r['doc_id']}, '{r['text']}')" for r in docs.collect()
        )
        + ") t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE qs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({r['query_id']}, '{r['query_text']}')"
            for r in queries.collect()
        )
        + ") t(query_id, query_text)"
    )
    sql = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM docs
    ),
    stats AS (SELECT count(*) AS n, sum(len(ts)) AS total FROM toks),
    tf AS (
        SELECT doc_id, len(ts) AS dl, t.term, count(*) AS tf
        FROM toks, unnest(ts) AS t(term)
        GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    qterms AS (
        SELECT DISTINCT query_id, t.term
        FROM qs, unnest(list_filter(
            string_split_regex(lower(query_text), '[^a-z0-9]+'),
            x -> x <> '')) AS t(term)
    ),
    contrib AS (
        SELECT q.query_id, tf.doc_id,
               round(ln(1.0 + ((SELECT n FROM stats) - df + 0.5)
                              / (df + 0.5))
                     * (tf * 2.2)
                     / (tf + 1.2 * (0.25 + 0.75 * dl
                          / ((SELECT total FROM stats)
                             * 1.0 / (SELECT n FROM stats)))),
                     6) AS c
        FROM tf JOIN dfreq USING (term) JOIN qterms q USING (term)
    ),
    scored AS (
        SELECT query_id, doc_id, count(*) AS n_terms_matched,
               round(CAST(sum(CAST(c AS DECIMAL(20,6))) AS DOUBLE), 6)
                   AS score
        FROM contrib GROUP BY 1, 2
    )
    SELECT query_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rank,
           doc_id, n_terms_matched, score
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want


def test_text_index_cli_build_add_and_search(
    spark, tmp_path, capsys, monkeypatch
):
    """--mode text-index builds/extends the persisted index; --mode
    search --index serves the SAME ranking bm25_rank computes from the
    raw corpus."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline
    from tests.conftest import SF_SMOKE
    from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
        load_table,
    )

    idx = str(tmp_path / "tidx")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index",
         "--path", SF_SMOKE, "--out", idx, "--n-buckets", "16"],
    )
    run_pipeline.main()
    assert "text index built" in capsys.readouterr().out

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "search",
         "--path", SF_SMOKE, "--index", idx,
         "--query", "spark hash join", "--top-n", "5",
         "--out", str(tmp_path / "r")],
    )
    run_pipeline.main()
    assert "bm25-index, 5 results" in capsys.readouterr().out
    got = spark.read.parquet(str(tmp_path / "r"))
    docs = load_table(spark, SF_SMOKE, "documents")
    qs = spark.createDataFrame(
        [(0, "spark hash join")], "query_id long, query_text string"
    )
    want = retrieval.bm25_rank(docs, qs, top_n=5)
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )

    # fold a disjoint-batch add through the CLI (validated)
    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(
        [(10_000_000, "spark hash join revisited")],
        "doc_id long, text string",
    ).write.parquet(batch_dir)
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index",
         "--path", batch_dir, "--index", idx],
    )
    run_pipeline.main()
    assert "text index updated" in capsys.readouterr().out
    n_docs = text_index.load_text_index_stats(idx)["n_docs"]
    assert n_docs == docs.count() + 1

    # both --out and --index (or neither) is a crisp usage error
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index", "--path", SF_SMOKE],
    )
    with pytest.raises(SystemExit):
        run_pipeline.main()
    # self-overwrite guard applies to the build path
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index",
         "--path", SF_SMOKE, "--out", SF_SMOKE],
    )
    with pytest.raises(SystemExit):
        run_pipeline.main()


def _table_rows(spark, path, cols):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select(*cols).collect()
    )


def test_delete_equals_rebuild_over_survivors(spark, tmp_path):
    """Deletion repair == bulk rebuild over the surviving corpus,
    bit-for-bit: stats, vocabulary table, postings CONTENT and every
    served score agree; untouched bucket directories keep their files
    byte-for-byte (only victim buckets rewrite)."""
    import os

    docs = _docs(spark)
    queries = _queries(spark)
    idx = str(tmp_path / "del")
    rebuilt = str(tmp_path / "rebuilt")
    text_index.build_text_index(docs, idx, n_buckets=8)

    victims = spark.createDataFrame([(1,), (3,)], "doc_id long")
    victim_terms = {
        t
        for r in docs.filter("doc_id in (1, 3)").collect()
        for t in r["text"].split()
    }
    victim_buckets = {zlib.crc32(t.encode()) % 8 for t in victim_terms}
    untouched = sorted(set(range(8)) - victim_buckets)
    before = {
        b: sorted(os.listdir(f"{idx}/postings.parquet/bucket={b}"))
        for b in untouched
        if os.path.isdir(f"{idx}/postings.parquet/bucket={b}")
    }

    stats = text_index.delete_from_text_index(spark, idx, victims)
    survivors = docs.filter("doc_id not in (1, 3)")
    text_index.build_text_index(survivors, rebuilt, n_buckets=8)

    assert stats == text_index.load_text_index_stats(rebuilt)
    assert _table_rows(
        spark, f"{idx}/terms.parquet", ["term", "df"]
    ) == _table_rows(spark, f"{rebuilt}/terms.parquet", ["term", "df"])
    cols = ["doc_id", "dl", "term", "tf"]
    assert _table_rows(
        spark, f"{idx}/postings.parquet", cols
    ) == _table_rows(spark, f"{rebuilt}/postings.parquet", cols)
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=8)
    )
    want = _collect_sorted(
        text_index.search_text_index(spark, rebuilt, queries, top_n=8)
    )
    assert got == want
    # untouched buckets were not rewritten (same files on disk)
    for b, files in before.items():
        assert sorted(
            os.listdir(f"{idx}/postings.parquet/bucket={b}")
        ) == files


def test_delete_then_add_chain_equals_rebuild(spark, tmp_path):
    """The full lifecycle composes: build -> add -> delete -> add
    equals one bulk build over the net corpus, bit-for-bit (the
    chained-add pin extended through a deletion)."""
    all_rows = _docs(spark).collect()
    first = spark.createDataFrame(all_rows[:5], "doc_id long, text string")
    second = spark.createDataFrame(all_rows[5:], "doc_id long, text string")
    queries = _queries(spark)

    idx = str(tmp_path / "chain")
    net = str(tmp_path / "net")
    text_index.build_text_index(first, idx, n_buckets=8)
    text_index.delete_from_text_index(
        spark, idx, spark.createDataFrame([(0,), (2,)], "doc_id long")
    )
    text_index.add_to_text_index(spark, idx, second)
    net_docs = _docs(spark).filter("doc_id not in (0, 2)")
    text_index.build_text_index(net_docs, net, n_buckets=8)

    assert text_index.load_text_index_stats(
        idx
    ) == text_index.load_text_index_stats(net)
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=8)
    )
    want = _collect_sorted(
        text_index.search_text_index(spark, net, queries, top_n=8)
    )
    assert got == want


def test_delete_refusals_leave_index_intact(spark, tmp_path):
    """Unknown ids and corpus-emptying deletions refuse BEFORE any
    rewrite: the index must keep serving the same results after."""
    docs = _docs(spark)
    queries = _queries(spark)
    idx = str(tmp_path / "refuse")
    text_index.build_text_index(docs, idx, n_buckets=8)
    baseline = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=8)
    )

    with pytest.raises(ValueError, match="no postings"):
        text_index.delete_from_text_index(
            spark, idx, spark.createDataFrame([(99,)], "doc_id long")
        )
    with pytest.raises(ValueError, match="empties the corpus"):
        text_index.delete_from_text_index(
            spark,
            idx,
            spark.createDataFrame([(i,) for i in range(8)], "doc_id long"),
        )
    # empty id set is a no-op, not an error
    stats = text_index.delete_from_text_index(
        spark, idx, spark.createDataFrame([], "doc_id long")
    )
    assert stats["n_docs"] == 8
    assert (
        _collect_sorted(
            text_index.search_text_index(spark, idx, queries, top_n=8)
        )
        == baseline
    )


def test_text_index_cli_delete(spark, tmp_path, capsys, monkeypatch):
    """--mode text-index --index IDX --delete-ids P prunes in place and
    serves the rebuilt-over-survivors results."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    docs = _docs(spark)
    spark.createDataFrame([(1,), (3,)], "doc_id long").write.parquet(
        str(tmp_path / "victims")
    )
    idx = str(tmp_path / "idx")
    text_index.build_text_index(docs, idx, n_buckets=8)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index",
         "--index", idx, "--delete-ids", str(tmp_path / "victims")],
    )
    run_pipeline.main()
    out = capsys.readouterr().out
    assert ">>> text index pruned; now 6 docs" in out
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, _queries(spark), top_n=8)
    )
    want = _collect_sorted(
        retrieval.bm25_rank(
            docs.filter("doc_id not in (1, 3)"), _queries(spark), top_n=8
        )
    )
    assert got == want


def test_text_index_streaming_ingest_equals_bulk(
    spark, tmp_path, capsys, monkeypatch
):
    """--mode text-index --stream folds a JSONL docs stream into the
    index one micro-batch at a time (first batch builds, later add);
    the streamed index equals a bulk build over the same corpus
    bit-for-bit — the chained-add contract composed through
    foreachBatch."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    all_rows = _docs(spark).collect()
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for part, lo in enumerate(range(0, 8, 3)):
        with open(stream_dir / f"part-{part}.json", "w") as fh:
            for r in all_rows[lo : lo + 3]:
                fh.write(
                    json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                    + "\n"
                )

    idx = str(tmp_path / "streamed")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "text-index", "--stream",
         "--path", str(stream_dir), "--index", idx,
         "--max-files-per-trigger", "1"],
    )
    run_pipeline.main()
    out = capsys.readouterr().out
    assert "text index streamed; 3 batches, now 8 docs" in out

    bulk = str(tmp_path / "bulk")
    text_index.build_text_index(_docs(spark), bulk, n_buckets=64)
    # streamed default n_buckets == build default, so stats line up
    assert text_index.load_text_index_stats(
        idx
    ) == text_index.load_text_index_stats(bulk)
    queries = _queries(spark)
    got = _collect_sorted(
        text_index.search_text_index(spark, idx, queries, top_n=8)
    )
    want = _collect_sorted(
        text_index.search_text_index(spark, bulk, queries, top_n=8)
    )
    assert got == want


def test_delete_refuses_duplicate_ingest_corruption(spark, tmp_path):
    """An index holding the same id twice with different document
    lengths (a double-ingest that bypassed validate) must refuse
    deletion with the duplicate named — subtracting either dl would
    corrupt the constants further."""
    docs = _docs(spark)
    idx = str(tmp_path / "dup")
    text_index.build_text_index(docs, idx, n_buckets=8)
    # simulate the corruption: re-add doc 1 with DIFFERENT text
    text_index.add_to_text_index(
        spark,
        idx,
        spark.createDataFrame(
            [(1, "completely different longer text body now")],
            "doc_id long, text string",
        ),
        validate=False,
    )
    with pytest.raises(ValueError, match="multiple distinct document"):
        text_index.delete_from_text_index(
            spark, idx, spark.createDataFrame([(1,)], "doc_id long")
        )
