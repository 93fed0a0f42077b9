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


def _tok_expr(text_col: str, tokens_col: str | None):
    """Token-array expression: ``tokens_col`` names a PRE-TOKENIZED
    array<string> column (the shared-tokenize contract — callers that
    fan one corpus into several token consumers materialize
    ``words_of(text)`` once and pass it in, so N operators cost one
    tokenize pass instead of N); otherwise tokenize ``text_col``
    inline. Same values either way — ``words_of`` is deterministic."""
    return F.col(tokens_col) if tokens_col else words_of(F.col(text_col))


def unigram_lm(
    trusted: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    tokens_col: str | None = None,
) -> DataFrame:
    """Train the unigram table: (term, logp) with add-alpha smoothing.

    logp = ln((count + alpha) / (total + alpha * (vocab + 1))); the
    '+1' slot reserves mass for unknown terms, whose logp =
    ln(alpha / (total + alpha * (vocab + 1))) — emitted as the row
    term = NULL so scorers can coalesce a lookup miss to it.
    """
    counts = (
        trusted.select(F.explode(_tok_expr(text_col, tokens_col)).alias("term"))
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
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood (lower = more fluent
    under the trusted corpus — CCNet keeps the low-NLL head). Returns
    (id, n_scored_tokens, nll), nll rounded at 1e-6 for portability."""
    unk = lm.filter(F.col("term").isNull()).select(
        F.col("logp").alias("__unk_logp")
    )
    toks = docs.select(
        F.col(id_col), F.explode(_tok_expr(text_col, tokens_col)).alias("term")
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


def importance_weights(
    docs: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document
    importance of the TARGET distribution over the RAW crawl, as the
    mean per-token log-likelihood ratio under two unigram LMs
    (DSIR's hashed-ngram bag-of-words form with n=1; swapping in
    hashed n-gram features changes only the token projection).
    Positive log_ratio = looks more like the target corpus;
    ``exp(n_tokens * log_ratio)`` is the unnormalized resampling
    weight — kept in log space here because the weights span hundreds
    of orders of magnitude at corpus scale.

    One token explode, ONE pass against both broadcast vocabularies
    (each LM is a dimension-sized (term, logp) table with the NULL
    unknown slot of ``unigram_lm``), one shuffle keyed by doc."""
    t_unk = target_lm.filter(F.col("term").isNull()).select(
        F.col("logp").alias("__t_unk")
    )
    r_unk = raw_lm.filter(F.col("term").isNull()).select(
        F.col("logp").alias("__r_unk")
    )
    toks = docs.select(
        F.col(id_col), F.explode(_tok_expr(text_col, tokens_col)).alias("term")
    )
    joined = (
        toks.join(
            F.broadcast(
                target_lm.filter(F.col("term").isNotNull()).select(
                    "term", F.col("logp").alias("__t")
                )
            ),
            "term",
            "left",
        )
        .join(
            F.broadcast(
                raw_lm.filter(F.col("term").isNotNull()).select(
                    "term", F.col("logp").alias("__r")
                )
            ),
            "term",
            "left",
        )
        .crossJoin(F.broadcast(t_unk))
        .crossJoin(F.broadcast(r_unk))
        .select(
            id_col,
            (
                F.coalesce(F.col("__t"), F.col("__t_unk"))
                - F.coalesce(F.col("__r"), F.col("__r_unk"))
            ).alias("__ratio"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_scored_tokens"),
        F.round(F.avg("__ratio"), 6).alias("log_ratio"),
    )


def ppl_buckets(
    scored: DataFrame,
    nll_col: str = "nll",
    fracs: tuple = (1.0 / 3, 2.0 / 3),
    labels: tuple = ("head", "middle", "tail"),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head/middle/tail by NLL quantiles — CCNet keeps
    head+middle for training and uses tail as the low-quality reject
    pile. The quantile edges ride as a broadcast 1-row aggregate (the
    plan stays lazy, no driver collect). ``approx=False`` (default)
    uses exact ``percentile`` — deterministic, DuckDB-twinnable (the
    docs_chunked ppl_bucket branch). ``approx=True`` is the 100 TB
    path: ``percentile_approx`` replaces the per-group sort with one
    mergeable-sketch pass at rank error <= 1/accuracy, so a document
    can only change bucket if its NLL rank sits within that band of a
    boundary (pinned in tests/test_text_quality.py). Adds a
    ``ppl_bucket`` column; boundary docs land LEFT (<= edge)."""
    pct = (
        F.percentile_approx(
            F.col(nll_col),
            F.array(*[F.lit(f) for f in fracs]),
            F.lit(accuracy),
        )
        if approx
        else F.percentile(F.col(nll_col), F.array(*[F.lit(f) for f in fracs]))
    )
    edges = scored.agg(pct.alias("__e"))
    b = F.lit(labels[-1])
    for i in range(len(fracs) - 1, -1, -1):
        b = F.when(
            F.col(nll_col) <= F.col("__e")[i], F.lit(labels[i])
        ).otherwise(b)
    return scored.crossJoin(F.broadcast(edges)).withColumn(
        "ppl_bucket", b
    ).drop("__e")
