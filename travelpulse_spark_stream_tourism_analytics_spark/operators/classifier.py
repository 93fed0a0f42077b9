"""Trained quality classification (fastText shape, Joulin et al. 2017).

The third member of the quality-scoring trio: the heuristic gate
(operators/quality.py) and the LM perplexity score (operators/lm.py)
are UNsupervised; production pipelines (GPT-3, LLaMA, RedPajama-v2
recipes) additionally train a LINEAR classifier on labeled seed sets
("looks like Wikipedia/books" vs "random crawl") and gate on its
probability. This module implements that shape distributively:
hashed bag-of-words features (fastText's hashing trick; the md5-based
bucket is engine-portable) and FULL-BATCH logistic regression trained
by gradient descent, where each iteration is two narrow shuffles —
score per doc (features join broadcast weights, agg by doc), gradient
per bucket (residuals join features, agg by bucket) — and a
driver-side update of the dim-sized weight vector. Deterministic: no
sampling, fixed iteration count, closed-form initialization.

Scale shape: the corpus is touched ONCE to build (doc, bucket, x)
feature rows; every iteration reuses them (persist). Weights are a
broadcast array (dim <= 2^20 doubles = 8 MB); nothing quadratic,
driver memory is O(dim). A real fastText swap-in changes only the
feature projection (subword n-grams) and the update rule (SGD + lr
decay) — the data movement is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    hash_u60,
    words_of,
)


def hashed_bow_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
) -> DataFrame:
    """(id, bucket, x): L1-normalized hashed bag-of-words — fastText's
    hashing trick with an md5 bucket (hash_u60 % dim), so any engine
    reproduces the features bit-for-bit. One explode + one (id,
    bucket) shuffle with partial aggregation; x = term_count /
    doc_token_count as DOUBLE."""
    toks = docs.select(
        F.col(id_col), F.explode(words_of(F.col(text_col))).alias("term")
    )
    counts = (
        toks.select(
            id_col, (hash_u60(F.col("term")) % dim).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.groupBy(id_col).agg(F.sum("n").alias("__tot"))
    return counts.join(tot, id_col).select(
        id_col,
        "bucket",
        (F.col("n") / F.col("__tot")).cast("double").alias("x"),
    )


def _scores(features: DataFrame, weights: list, bias: float,
            id_col: str) -> DataFrame:
    """(id, margin): dot(x, w) + b via a broadcast (bucket, w) join —
    the per-doc half of an iteration (and the whole of inference)."""
    spark = features.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weights) if w != 0.0],
            "bucket int, w double",
        )
    )
    return (
        features.join(wdf, "bucket", "left")
        .groupBy(id_col)
        .agg(
            (F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0)))
             + F.lit(float(bias))).alias("margin")
        )
    )


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    label_col: str = "label",
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[list, float]:
    """Full-batch logistic regression over hashed-BoW features:
    returns (weights, bias). ``labels`` is (id, label in {0, 1}).
    Each iteration: margins per doc (one shuffle), residuals
    p - y, gradient per bucket (one shuffle), driver update with L2.
    The feature relation is persisted by the CALLER if it is not
    already materialized — every iteration rescans it."""
    n = labels.count()
    w = [0.0] * dim
    b = 0.0
    lab = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    for _ in range(iters):
        resid = (
            _scores(features, w, b, id_col)
            .join(lab, id_col)
            .select(
                id_col,
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.col("margin")))
                    - F.col("__y")
                ).alias("__r"),
            )
        )
        grad_rows = (
            features.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("__r")).alias("g"))
            .collect()
        )
        b_grad = resid.agg(F.sum("__r").alias("g")).collect()[0]["g"]
        for row in grad_rows:
            k = row["bucket"]
            w[k] -= lr * (row["g"] / n + l2 * w[k])
        b -= lr * (float(b_grad) / n)
    return w, b


def score_quality(
    docs: DataFrame,
    weights: list,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
) -> DataFrame:
    """(id, quality_prob): sigmoid of the trained linear score —
    inference is ONE feature pass + one broadcast join, the gate
    compares quality_prob to a threshold exactly like the heuristic
    gate's boolean."""
    feats = hashed_bow_features(docs, id_col, text_col, dim)
    return _scores(feats, weights, bias, id_col).select(
        id_col,
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
        ).alias("quality_prob"),
    )


def classifier_parity_reference(
    feats: list, labs: list, dim: int, iters: int = 30,
    lr: float = 2.0, l2: float = 1e-4,
) -> tuple[list, float]:
    """Straight-line pure-Python twin of train_quality_classifier for
    parity tests: feats = [(id, bucket, x)], labs = {id: y}."""
    w = [0.0] * dim
    b = 0.0
    n = len(labs)
    ids = sorted(labs)
    by_doc: dict = {i: [] for i in ids}
    for i, k, x in feats:
        by_doc[i].append((k, x))
    for _ in range(iters):
        resid = {}
        for i in ids:
            m = b + sum(x * w[k] for k, x in by_doc[i])
            resid[i] = 1.0 / (1.0 + math.exp(-m)) - labs[i]
        grad = [0.0] * dim
        for i in ids:
            for k, x in by_doc[i]:
                grad[k] += x * resid[i]
        for k in range(dim):
            if grad[k] != 0.0 or w[k] != 0.0:
                w[k] -= lr * (grad[k] / n + l2 * w[k])
        b -= lr * (sum(resid.values()) / n)
    return w, b
