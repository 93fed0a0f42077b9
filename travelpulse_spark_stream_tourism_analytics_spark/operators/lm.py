"""Language-model quality scoring (CCNet-shape, unigram proxy).

CCNet-style pipelines rank documents by LM perplexity under a model
trained on a trusted corpus and keep the head/middle of the
distribution. The engine implements the same SHAPE with a unigram LM —
train = one aggregation over the trusted corpus (term -> smoothed log
probability, a broadcast-sized table exactly like a dimension), score =
mean per-token negative log-likelihood per document. Swapping in a
real KenLM is a scorer-UDF change; the distributed plan (train agg,
broadcast join, per-doc agg) is identical.

Scale shape: training is one shuffle on term with partial aggregation;
scoring explodes tokens map-side, joins the broadcast vocabulary, and
aggregates per doc_id — one shuffle keyed by doc. Nothing quadratic,
nothing driver-side except the vocabulary size check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)


def unigram_lm(
    trusted: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Train the unigram table: (term, logp) with add-alpha smoothing.

    logp = ln((count + alpha) / (total + alpha * (vocab + 1))); the
    '+1' slot reserves mass for unknown terms, whose logp =
    ln(alpha / (total + alpha * (vocab + 1))) — emitted as the row
    term = NULL so scorers can coalesce a lookup miss to it.
    """
    counts = (
        trusted.select(F.explode(words_of(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("vocab")
    ).collect()[0]
    denom = float(tot["total"]) + alpha * (float(tot["vocab"]) + 1.0)
    known = counts.select(
        "term", F.log((F.col("n") + F.lit(alpha)) / F.lit(denom)).alias("logp")
    )
    unk = trusted.sparkSession.range(1).select(
        F.lit(None).cast("string").alias("term"),
        F.log(F.lit(alpha) / F.lit(denom)).alias("logp"),
    )
    return known.unionByName(unk)


def lm_score_docs(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood (lower = more fluent
    under the trusted corpus — CCNet keeps the low-NLL head). Returns
    (id, n_scored_tokens, nll), nll rounded at 1e-6 for portability."""
    unk = lm.filter(F.col("term").isNull()).select(
        F.col("logp").alias("__unk_logp")
    )
    toks = docs.select(
        F.col(id_col), F.explode(words_of(F.col(text_col))).alias("term")
    )
    scored = (
        toks.join(F.broadcast(lm.filter(F.col("term").isNotNull())), "term", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("__unk_logp")).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_scored_tokens"),
        F.round(-F.avg("logp"), 6).alias("nll"),
    )
