"""Full-text retrieval over the documents table: BM25 ranking and
reciprocal-rank fusion (RRF) for hybrid lexical + vector search.

A 100 TB curation stack retrieves as much as it filters: near-dup
mining by example, eval-set expansion ("find the training docs that
answer this benchmark question"), and targeted decontamination all
start from a ranked lexical search, and production search quality
comes from FUSING that lexical ranking with an embedding ranking
(hybrid search). BM25 (Robertson/Spärck Jones probabilistic weighting)
is the lexical standard; RRF (Cormack et al. 2009) is the fusion
standard because it needs no score calibration across systems — only
ranks.

Scale shape (the whole point of doing this in Spark):
- the postings table ``(term, doc_id, tf, dl)`` is ONE shuffle on
  (doc, term) with map-side combine — the same aggregation
  :func:`~..operators.keywords.tfidf_top_keywords` already pays;
- document frequencies re-aggregate the postings output on term (a
  second, vocabulary-sized shuffle);
- the query set is bounded by contract and BROADCAST; scoring is the
  postings scan joined to the broadcast query terms — no corpus-side
  shuffle beyond the postings build;
- corpus constants (N, avgdl) fold in as plan literals from one
  bounded 1-row aggregate, exactly like the tf-idf operator's N;
- per-query top-n is a window over each query's own candidate docs
  (docs sharing >= 1 term), never a global sort;
- RRF joins two RANK tables (query_id, doc_id, rank) — each top-n
  sized, so the fusion join is (queries x n)-bounded regardless of
  corpus size.

Determinism contract (oracle-portable): every per-term BM25
contribution is rounded to 1e-6 and summed as DECIMAL(20,6), so the
per-document score is independent of summation order and engine
(float += in a groupBy is neither); ln() is transcendental (libm vs
JVM may differ 1 ulp) but a 1-ulp error lands on a 1e-6 rounding
boundary with probability ~1e-9 per row. RRF contributions
1/(k0+rank) are exact IEEE divisions of small integers — identical in
both engines — rounded 1e-6 before the decimal sum. Ranks tie-break
on ascending doc id everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)


def bm25_rank(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-query BM25 top-n over a document corpus.

    ``score(q, d) = sum over distinct terms t of q:
    idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1 * (1 - b + b*dl/avgdl))``
    with the non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (the Lucene/standard variant — plain Robertson idf goes negative
    for terms in more than half the corpus, which breaks the
    "matching more terms never hurts" invariant). Repeated query
    terms count once (``array_distinct`` — the common practical
    choice for short queries; per-term query weighting is a caller
    concern).

    Returns ``(query_id, rank, doc_id, n_terms_matched, score)`` —
    rank is 1-based per query by (score DESC, doc id ASC), cast to
    long (Spark's row_number is int32, DuckDB's int64). Documents
    sharing no query term never appear (BM25 of an empty match set is
    0, and retrieval never returns no-match docs).

    ``queries`` is bounded by contract (it is broadcast); ``docs`` is
    corpus-sized. N and avgdl are computed by one bounded 1-row
    aggregate at plan-build time and folded in as literals — same
    plan-constant treatment as tf-idf's N and the LSH hyperplanes.

    ``tokens_col`` names a pre-tokenized array<string> column of
    ``docs`` to use instead of tokenizing ``text_col`` (the
    shared-tokenize contract — see operators/lm.py ``_tok_expr``).
    Query-side tokenization is unchanged (queries are bounded).
    """
    doc_tok = (
        F.col(tokens_col) if tokens_col else words_of(F.col(text_col))
    )
    toks = docs.select(
        F.col(id_col), doc_tok.alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").alias("__dl"))
    # one bounded 1-row aggregate: corpus size + total token count.
    # avgdl = exact int/int double division — identical in any engine.
    stats = toks.agg(
        F.count("*").alias("n"), F.sum("__dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        raise ValueError("bm25_rank: empty corpus")
    avgdl = float(stats["total"] or 0) / float(n_docs)
    if avgdl <= 0:
        raise ValueError(
            "bm25_rank: corpus has no tokens — every BM25 score would "
            "be a 0/0 length normalization"
        )

    terms = toks.select(
        F.col(id_col), F.col("__dl"), F.explode("__toks").alias("term")
    )
    tf = terms.groupBy(id_col, "__dl", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    postings = tf.join(F.broadcast(df_), "term")

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(words_of(F.col(query_text_col)))).alias(
            "term"
        ),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * tf_norm, 6)
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.count("*").alias("n_terms_matched"),
            # DECIMAL accumulation of 1e-6-rounded contributions: the
            # per-doc score is exact and summation-order independent
            # (float += in a groupBy is neither — verify-notes money
            # rule)
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


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    rank_col: str = "rank",
    k0: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of 2+ per-query rankings:
    ``rrf(q, d) = sum over systems s ranking d of 1/(k0 + rank_s)``.

    Standard hybrid-search fusion (Cormack et al. 2009; k0=60
    throughout the literature): rank-only, so a BM25 ranking and a
    cosine ranking fuse without score calibration. A document absent
    from a system's top-n contributes nothing for that system — the
    conventional top-n-fusion semantics (no corpus-wide rank exists
    once a system truncates).

    Input frames need (query_id, id, rank) columns; each is top-n
    sized per query by contract, so the union + one (query, doc)
    shuffle here is (queries x n x systems)-bounded — independent of
    corpus size. Output: ``(query_id, rank, doc_id, n_systems,
    score)``, rank 1-based per query by (score DESC, doc id ASC).
    Contributions are exact IEEE divisions rounded 1e-6 and summed as
    DECIMAL(20,6) (order-independent, engine-portable)."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least two rankings to fuse")
    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col)), 6
            ).alias("__c"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = (
        unioned.groupBy(query_id_col, id_col)
        .agg(
            F.count("*").alias("n_systems"),
            F.sum(F.col("__c").cast("decimal(20,6)")).alias("__s"),
        )
        .select(
            query_id_col,
            F.col(id_col),
            "n_systems",
            F.round(F.col("__s").cast("double"), 6).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select(query_id_col, "rank", id_col, "n_systems", "score")
    )
