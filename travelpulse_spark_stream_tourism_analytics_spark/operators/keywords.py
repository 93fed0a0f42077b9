"""TF-IDF keyword extraction — per-document distinctive terms.

The classic corpus-statistics op between raw token counts and
embeddings: rank each document's terms by tf * idf and keep the top k.
Used in training-data pipelines for topic tagging, cluster labeling,
and per-source vocabulary drift monitoring.

Scale shape: tf is one shuffle on (doc, term) with map-side combine;
df re-aggregates the tf output on term (second, smaller shuffle); the
corpus size N folds in as a literal (one count job, a plan constant
like broadcast LSH planes); the df side of the final join is
vocabulary-sized — broadcast below ~100M distinct terms' worth of
bytes, shuffle join above. The top-k window partitions by doc over
each doc's own terms only, never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)


def tfidf_top_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-k terms per document by smoothed tf-idf.

    score = tf * ln((N + 1) / (df + 1)), rounded to 1e-6 BEFORE the
    per-document ranking (summation-order ulps must not flip ranks);
    ties break on the term string. Deterministic and engine-portable —
    the DuckDB twin in tests/test_text_quality.py reproduces it
    hash-exactly.

    ``tokens_col`` names a pre-tokenized array<string> column to use
    instead of tokenizing ``text_col`` (the shared-tokenize contract —
    see operators/lm.py ``_tok_expr``)."""
    n_docs = docs.select(id_col).distinct().count()
    tok = F.col(tokens_col) if tokens_col else words_of(F.col(text_col))
    terms = docs.select(F.col(id_col), F.explode(tok).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1.0))),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )
