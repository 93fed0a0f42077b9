"""Text / embedding pipeline catalog (documents, embeddings tables).

The LLM-training-data operators the engine adds beyond the reference
(BASELINE.json north star): dedup, fingerprinting, token/quality
analysis, similarity search. All portable-hash logic uses md5 hex
strings (identical in Spark and DuckDB) rather than engine-specific
hash functions, so every step is oracle-checkable.

Scale notes: shingling explodes rows but never shuffles until the
group-by on (hash) — partial aggregation keeps the shuffle small;
brute-force kNN broadcasts only the query set (bounded), streaming the
corpus side; the LSH variants in operators/dedup.py bucket first so the
pairwise stage is per-bucket local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    word_ngrams,
    words_of,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
    query,
)

# DuckDB mirrors of words_of / word_ngrams(3)
_WORDS_SQL = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"
_NGRAMS3_SQL = (
    "list_transform(generate_series(1, greatest(len({w}) - 2, 0)),"
    " i -> array_to_string({w}[i:i+2], ' '))"
)


@query(
    "docs_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep lowest doc_id. At 100 TB this is
    one shuffle on a 16-byte key with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "docs_token_stats",
    oracle=f"""
    SELECT doc_id, n_chars, n_tokens,
           round(sum_tok_len / n_tokens::DOUBLE, 6) AS avg_token_len,
           round(n_stop / n_tokens::DOUBLE, 6) AS stopword_ratio,
           round(least(1.0, n_tokens / 200.0)
                 * (1.0 - n_stop / n_tokens::DOUBLE), 6) AS quality_score
    FROM (
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               length(array_to_string(toks, '')) AS sum_tok_len,
               len(list_filter(toks, x -> list_contains(
                   ['the', 'a', 'of', 'and', 'in', 'to', 'is'], x))) AS n_stop
        FROM (SELECT doc_id, n_chars, {_WORDS_SQL.format(c="text")} AS toks
              FROM documents)
    )
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length/stopword ratios) — the
    text-analysis ops of the north star, all codegen'd array exprs."""
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "in", "to", "is"]])
    toks = words_of(F.col("text"))
    d = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.length(F.concat_ws("", toks)).alias("sum_tok_len"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).alias("n_stop"),
    )
    n_tok = F.col("n_tokens").cast("double")
    return d.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(F.col("sum_tok_len") / n_tok, 6).alias("avg_token_len"),
        F.round(F.col("n_stop") / n_tok, 6).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / F.lit(200.0))
            * (F.lit(1.0) - F.col("n_stop") / n_tok),
            6,
        ).alias("quality_score"),
    )


@query(
    "docs_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len(ngrams) > 0
                THEN list_min(list_transform(ngrams, s -> md5(s)))
                ELSE md5(text) END AS fingerprint
    FROM (
        SELECT doc_id, text, {_NGRAMS3_SQL.format(w=_WORDS_SQL.format(c="text"))}
               AS ngrams
        FROM documents
    )
    """,
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash (k=1) over word 3-gram shingles,
    portable md5 ordering; falls back to whole-text hash for short
    docs."""
    docs = load_table(spark, sf_dir, "documents")
    ngrams = word_ngrams(words_of(F.col("text")), 3)
    fp = F.when(
        F.size(ngrams) > 0,
        F.array_min(F.transform(ngrams, lambda s: F.md5(s))),
    ).otherwise(F.md5("text"))
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "embedding_knn",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5
    ), scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               round(list_dot_product(qv, v)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(v, v))), 6) AS cosine
        FROM q, base
        WHERE vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id
               ) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: broadcast the (small)
    query set, stream the corpus, per-query top-k window. Cosine is
    rounded to 1e-6 BEFORE ranking so summation-order ulps cannot flip
    the ordering; ties break on neighbor_id."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    a, b = F.col("qv"), F.col("v")
    cosine = F.round(dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 6)
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine")
    )
