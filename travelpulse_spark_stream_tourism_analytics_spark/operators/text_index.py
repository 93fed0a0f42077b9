"""Persistent inverted text index: build once, search many (BM25 on
disk) — the full-text twin of :mod:`.ann_index`.

:func:`~.retrieval.bm25_rank` tokenizes and aggregates the corpus
inside every query — right for an oracle-checked benchmark, wrong for
production, where a 100 TB corpus is indexed ONCE and then served many
keyword searches. This module persists the inverted index as plain
parquet + JSON artifacts (the same lake-artifact shape as the ANN
index: no server, any engine can read it):

* ``postings.parquet/bucket=B/`` (term, doc_id, tf, dl) — the inverted
  lists, PARTITIONED BY ``bucket = crc32(term) % n_buckets`` and
  sorted by term within each file, so a search that touches q terms
  reads only those buckets' directories (partition pruning at the
  scan) and, inside each bucket, only the row groups whose term
  min/max straddle a query term (parquet predicate pushdown on the
  sorted column);
* ``terms.parquet/bucket=B/`` (term, df) — document frequencies, kept
  SEPARATE from the postings (a denormalized df would go stale on
  every incremental add; df deltas are computable from the new batch
  alone, so the split is what makes :func:`add_to_text_index` exact);
* ``stats.json`` (n_docs, total_tokens, n_buckets, id_col) — the
  corpus constants BM25 folds in as plan literals.

Search composes the exact scoring contract of ``bm25_rank`` (same
Lucene-variant idf, same 1e-6 rounding + DECIMAL accumulation, same
tie-breaks) over the pruned scan, so ``search_text_index == bm25_rank``
bit-for-bit on any corpus — test-pinned. Queries are bounded by
contract and collected driver-side to compute their bucket set (the
same bounded-queries contract as ``ann_search``); everything
corpus-sized stays distributed.

Incremental ingest (:func:`add_to_text_index`) appends the batch's
postings into only the buckets it touches and MERGES df deltas into the
vocabulary-sized terms table; n_docs/total_tokens accumulate in
stats.json. Because every BM25 input (tf, dl, df, N, avgdl) is an exact
integer or an int/int division, chained adds equal a bulk build
BIT-FOR-BIT — test-pinned, like ``add_to_ann_index``'s frozen-model
contract but with no drift caveat (an inverted index has no trained
model to go stale). Doc ids must be new to the index (same
disjointness contract as ``incremental_knn_graph``; ``validate=True``
runs one bounded semi-join check). Deletions
(:func:`delete_from_text_index`) rewrite only the victim buckets and
decrement the vocab/constants exactly, so chained deletes equal a
rebuild over the survivors — tombstones were rejected because they
would make df a lie.

100 TB sizing: the postings build is the one (doc, term) shuffle with
map-side combine that tf-idf already pays; ``n_buckets`` bounds the
scanned fraction at ~|query terms| / n_buckets — at web scale use
1024+ so a 10-term query lists ~1% of the directories (the default 64
keeps test layouts small).
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)

_STATS = "stats.json"


def _bucket_py(term: str, n_buckets: int) -> int:
    """Python twin of the Spark-side bucket expression (crc32 of the
    utf-8 term, mod n_buckets) — both are the unsigned 32-bit CRC, so
    driver-side query planning and the stored layout always agree."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _bucket_col(term_col, n_buckets: int):
    return (F.crc32(F.col(term_col).cast("binary")) % n_buckets).cast("int")


def build_text_index(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Tokenize ``docs`` and persist the inverted index artifacts.

    One (doc, term) partial-agg shuffle builds tf; one vocabulary-sized
    re-agg builds df; one bounded 1-row aggregate collects the corpus
    constants. Postings are written partitioned by term bucket and
    sorted by term within partitions (row-group stats then prune
    non-query terms inside a bucket). Returns the stats dict (also
    written to stats.json)."""
    if n_buckets < 1:
        raise ValueError("build_text_index: n_buckets must be >= 1")
    toks = docs.select(
        F.col(id_col), words_of(F.col(text_col)).alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").alias("dl"))
    row = toks.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(row["n"])
    if n_docs == 0:
        raise ValueError("build_text_index: empty corpus")
    total_tokens = int(row["total"] or 0)
    if total_tokens == 0:
        raise ValueError(
            "build_text_index: corpus has no tokens — every BM25 score "
            "would be a 0/0 length normalization"
        )

    tf = (
        toks.select(
            F.col(id_col), F.col("dl"), F.explode("__toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = tf.withColumn("bucket", _bucket_col("term", n_buckets))
    os.makedirs(out_dir, exist_ok=True)
    (
        postings.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/postings.parquet")
    )
    terms = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("bucket", _bucket_col("term", n_buckets))
    )
    (
        terms.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/terms.parquet")
    )
    stats = {
        "id_col": id_col,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "n_buckets": n_buckets,
    }
    with open(f"{out_dir}/{_STATS}", "w") as fh:
        json.dump(stats, fh)
    return stats


def load_text_index_stats(index_dir: str) -> dict:
    with open(f"{index_dir}/{_STATS}") as fh:
        return json.load(fh)


def search_text_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """Per-query BM25 top-n served from the persisted index.

    Output and scoring contract are IDENTICAL to
    :func:`~.retrieval.bm25_rank` (``(query_id, rank, doc_id,
    n_terms_matched, score)``; non-negative idf; 1e-6-rounded
    contributions summed as DECIMAL; ties on ascending doc id) — the
    difference is the plan: instead of tokenizing the corpus, the scan
    reads only the query terms' bucket directories (partition filter)
    with the term equality pushed into the parquet row groups, joins
    the (query-term-count)-sized pruned df table broadcast, and scores
    in pure exprs. Queries are bounded by contract (collected here to
    plan the bucket set, exactly like ``ann_search``)."""
    stats = load_text_index_stats(index_dir)
    id_col = stats["id_col"]
    n_buckets = int(stats["n_buckets"])
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["total_tokens"]) / float(n_docs)

    qrows = queries.select(
        F.col(query_id_col),
        F.array_distinct(words_of(F.col(query_text_col))).alias("__t"),
    ).collect()
    pairs = [
        (r[query_id_col], t) for r in qrows for t in (r["__t"] or [])
    ]
    if not pairs:
        raise ValueError(
            "search_text_index: no query terms survive tokenization"
        )
    terms_set = sorted({t for _, t in pairs})
    buckets = sorted({_bucket_py(t, n_buckets) for t in terms_set})
    qterms = spark.createDataFrame(
        pairs, f"{query_id_col} long, term string"
    )

    postings = spark.read.parquet(f"{index_dir}/postings.parquet").filter(
        F.col("bucket").isin(buckets)  # partition pruning
        & F.col("term").isin(terms_set)  # row-group stats inside bucket
    )
    dfreq = (
        spark.read.parquet(f"{index_dir}/terms.parquet")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms_set))
        .select("term", "df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * tf_norm, 6)
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum(contrib.cast("decimal(20,6)")).alias("__s"),
        )
        .select(
            query_id_col,
            F.col(id_col),
            "n_terms_matched",
            F.round(F.col("__s").cast("double"), 6).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select(query_id_col, "rank", id_col, "n_terms_matched", "score")
    )


def add_to_text_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    validate: bool = False,
) -> dict:
    """Incremental ingest: fold a new document batch into the index.

    The batch's postings append into only the term buckets it touches;
    its per-term df DELTAS merge into the vocabulary-sized terms table
    (read + full-outer sum + rewrite — vocab-sized, never corpus-sized);
    n_docs/total_tokens accumulate. Chained adds == one bulk build
    BIT-FOR-BIT (every BM25 input is exact — test-pinned).

    New doc ids must not already exist in the index (a re-delivered
    batch would double-count tf into the same doc id and understate its
    df). ``validate=True`` runs one bounded semi-join against the
    stored postings' doc ids and raises on the first overlap; default
    off so callers who enforce disjointness upstream keep a
    metadata-only plan. Deletions: :func:`delete_from_text_index`."""
    stats = load_text_index_stats(index_dir)
    id_col = stats["id_col"]
    n_buckets = int(stats["n_buckets"])

    toks = new_docs.select(
        F.col(id_col), words_of(F.col(text_col)).alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").alias("dl"))
    row = toks.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_new = int(row["n"])
    if n_new == 0:
        return stats

    if validate:
        old_ids = spark.read.parquet(
            f"{index_dir}/postings.parquet"
        ).select(id_col)
        clash = (
            new_docs.select(id_col)
            .join(old_ids, id_col, "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"add_to_text_index: doc id {clash[0][id_col]!r} already "
                "exists in the index — batches must be id-disjoint "
                "(re-delivery would double-count tf and understate df)"
            )

    tf = (
        toks.select(
            F.col(id_col), F.col("dl"), F.explode("__toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", _bucket_col("term", n_buckets))
    )
    (
        tf.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/postings.parquet")
    )

    # df merge: old vocab table + this batch's deltas. The batch df for
    # a term is exactly the number of NEW docs containing it, so
    # df_new = df_old + delta needs nothing corpus-sized. Rewrite goes
    # through a temp dir because the union plan reads the live table.
    delta = tf.groupBy("term").agg(F.count("*").alias("df"))
    old_terms = spark.read.parquet(f"{index_dir}/terms.parquet").select(
        "term", "df"
    )
    merged = (
        old_terms.unionByName(delta)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .withColumn("bucket", _bucket_col("term", n_buckets))
    )
    tmp = f"{index_dir}/terms.parquet.__tmp"
    (
        merged.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    import shutil

    shutil.rmtree(f"{index_dir}/terms.parquet")
    os.rename(tmp, f"{index_dir}/terms.parquet")

    stats["n_docs"] = int(stats["n_docs"]) + n_new
    stats["total_tokens"] = int(stats["total_tokens"]) + int(
        row["total"] or 0
    )
    with open(f"{index_dir}/{_STATS}", "w") as fh:
        json.dump(stats, fh)
    return stats


def delete_from_text_index(
    spark: SparkSession,
    index_dir: str,
    doc_ids: DataFrame,
) -> dict:
    """Deletion repair: remove documents from the persisted index so
    that chained deletes equal a bulk rebuild over the survivors
    BIT-FOR-BIT — the text twin of ``delete_from_knn_graph``, closing
    the index lifecycle (build / add / delete) the module docstring
    previously deferred to "filter-and-rewrite or rebuild".

    ``doc_ids`` is an id relation (one column named like the index's
    ``id_col``). Only the term buckets that actually contain a victim
    posting are rewritten (victim buckets come from one bounded
    distinct over the victims' partition column — at most n_buckets
    values); untouched bucket directories keep their files byte-for-
    byte. The vocabulary table decrements per-term df by the victims'
    per-term distinct-doc counts (each (doc, term) holds one postings
    row, so that is a count per term) and drops terms reaching df 0;
    n_docs / total_tokens decrement from the victims' (id, dl) pairs.
    Every adjusted input is an exact integer — hence the rebuild
    parity (test-pinned, like ``add_to_text_index``'s chained-add
    contract).

    Every requested id must exist in the postings: an unknown id is
    indistinguishable from a zero-token document, whose only footprint
    is the n_docs constant (no postings rows carry its dl), so its
    deletion cannot be reconciled — the refusal names the rebuild
    path. Ids must also be distinct (a doubled id would double-count
    the constants).

    The id relation BROADCASTS (the semi/anti join sides): deletion
    batches are operationally bounded — a corpus-scale purge should
    ``build_text_index`` over the survivors instead, which is also
    cheaper than rewriting almost every bucket here."""
    import shutil

    stats = load_text_index_stats(index_dir)
    id_col = stats["id_col"]

    ids = doc_ids.select(id_col).distinct()
    n_req = ids.count()
    if n_req == 0:
        return stats

    postings_path = f"{index_dir}/postings.parquet"
    postings = spark.read.parquet(postings_path)
    victims = postings.join(F.broadcast(ids), id_col, "left_semi")

    # (id, dl) is constant across a doc's postings rows; one distinct
    # recovers the corpus-constant decrements and the found-id set
    per_doc = victims.select(id_col, "dl").distinct()
    found = per_doc.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_found = int(found["n"])
    if n_found > n_req:
        # more (id, dl) pairs than requested ids: some id carries TWO
        # distinct dls — the index holds the same id twice (a
        # double-ingest that bypassed add's validate), and subtracting
        # either dl would corrupt the constants further
        dup = (
            per_doc.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"delete_from_text_index: doc id {dup[0][id_col]!r} appears "
            "in the postings with multiple distinct document lengths — "
            "the index holds duplicate ingests of this id (the add-time "
            "id-disjointness contract was bypassed); rebuild with "
            "build_text_index over the corrected corpus"
        )
    if n_found != n_req:
        missing = (
            ids.join(per_doc.select(id_col), id_col, "left_anti")
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"delete_from_text_index: doc id {missing[0][id_col]!r} has "
            "no postings in the index — either it was never ingested or "
            "it is a zero-token document (whose dl cannot be recovered "
            "from postings); rebuild with build_text_index over the "
            "surviving corpus instead"
        )

    # refuse BEFORE any rewrite: an emptied corpus cannot serve BM25
    # (0/0 length normalization) and the index must stay intact when
    # this raises
    stats["n_docs"] = int(stats["n_docs"]) - n_found
    stats["total_tokens"] = int(stats["total_tokens"]) - int(
        found["total"] or 0
    )
    if stats["n_docs"] <= 0 or stats["total_tokens"] <= 0:
        raise ValueError(
            "delete_from_text_index: deletion empties the corpus — an "
            "empty index cannot serve BM25 (0/0 length normalization); "
            "remove the index directory instead"
        )

    touched = sorted(
        r["bucket"] for r in victims.select("bucket").distinct().collect()
    )

    # EVERY plan below reads the live files, so both tmp tables are
    # written BEFORE either live directory mutates (the df-delta plan
    # re-reads postings — swapping buckets first would erase the
    # victims it is about to count)
    survivors = (
        postings.filter(F.col("bucket").isin(touched))
        .join(F.broadcast(ids), id_col, "left_anti")
    )
    tmp = f"{postings_path}.__tmp"
    (
        survivors.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )

    # vocab decrement: df delta per term = victims' postings rows per
    # term (one row per (doc, term)); terms reaching df 0 drop out
    delta = victims.groupBy("term").agg((-F.count("*")).alias("df"))
    old_terms = spark.read.parquet(f"{index_dir}/terms.parquet").select(
        "term", "df"
    )
    n_buckets = int(stats["n_buckets"])
    merged = (
        old_terms.unionByName(delta)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .filter(F.col("df") > 0)
        .withColumn("bucket", _bucket_col("term", n_buckets))
    )
    terms_tmp = f"{index_dir}/terms.parquet.__tmp"
    (
        merged.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(terms_tmp)
    )

    # both tmp tables on disk — now swap
    for b in touched:
        live = f"{postings_path}/bucket={b}"
        fresh = f"{tmp}/bucket={b}"
        shutil.rmtree(live, ignore_errors=True)
        if os.path.isdir(fresh):
            os.rename(fresh, live)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(f"{index_dir}/terms.parquet")
    os.rename(terms_tmp, f"{index_dir}/terms.parquet")

    with open(f"{index_dir}/{_STATS}", "w") as fh:
        json.dump(stats, fh)
    return stats
