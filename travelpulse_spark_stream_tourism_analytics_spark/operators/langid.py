"""Trainable language identification (Cavnar & Trenkle 1994).

The classic rank-order character-n-gram method behind every
pre-neural langid tool: each language is summarized by the RANKED
top-K character n-grams of a seed corpus, and a document is classified
by the "out-of-place" distance — for each of the document's own top
n-grams, how far its rank sits from that n-gram's rank in the
language profile (absent -> a flat K penalty); smallest total wins.
This upgrades the engine's regexp bigram heuristic
(docs_text_profile's guessed_lang, which needs no training data) to a
PROPER trainable classifier when per-language seed corpora exist.

Scale shape: profiles are one aggregation per seed corpus -> a
(lang, ngram, rank) table of L*K rows — dimension-sized, broadcast
like a vocabulary. Scoring explodes each document's character
n-grams map-side, ranks them per doc with a bounded window (top_k
rows survive), joins the broadcast profile once, and aggregates one
(doc, lang) distance shuffle. Nothing quadratic; adding a language
adds K broadcast rows, not a pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _char_ngrams(col, n: int):
    """All character n-grams of lowercased text with whitespace
    normalized to '_' (the paper's convention, making word boundaries
    visible to the profile)."""
    norm = F.regexp_replace(F.lower(col), r"\s+", "_")
    padded = F.concat(F.lit("_"), norm, F.lit("_"))
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
    # empty array — short texts need the explicit guard.
    return F.expr(
        f"CASE WHEN length(__t) >= {n} THEN "
        f"transform(sequence(1, length(__t) - {n - 1}), "
        f"i -> substring(__t, i, {n})) "
        f"ELSE array() END"
    ), padded


def _doc_ngram_counts(
    df: DataFrame, id_cols: list, text_col: str, n: int
) -> DataFrame:
    expr, padded = _char_ngrams(F.col(text_col), n)
    return (
        df.withColumn("__t", padded)
        .select(*id_cols, F.explode(expr).alias("ngram"))
        .groupBy(*id_cols, "ngram")
        .agg(F.count("*").alias("cnt"))
    )


def train_language_profiles(
    seeds: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """(lang, ngram, rank): each language's top-K character n-grams
    ranked by frequency (count desc, ngram asc tiebreak — rank 1 =
    most frequent). One shuffle on (lang, ngram) with partial
    aggregation; the result is broadcast-sized by construction."""
    counts = _doc_ngram_counts(seeds, [lang_col], text_col, n)
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("cnt"), F.asc("ngram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(lang_col, "ngram", F.col("rank").cast("long").alias("rank"))
    )


def classify_language(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """(id, lang, distance): argmin out-of-place distance over the
    trained profiles; deterministic tiebreak on lang. A doc with no
    n-grams (empty text) classifies as NULL with NULL distance.

    distance(doc, lang) = sum over the doc's top-K n-grams of
    |doc_rank - profile_rank|, with ``top_k`` for n-grams absent from
    the profile — the paper's measure verbatim."""
    counts = _doc_ngram_counts(docs, [id_col], text_col, n)
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("ngram"))
    doc_ranks = (
        counts.withColumn("__dr", F.row_number().over(w))
        .filter(F.col("__dr") <= top_k)
        .select(id_col, "ngram", "__dr")
    )
    langs = F.broadcast(profiles.select("lang").distinct())
    scored = (
        doc_ranks.crossJoin(langs)
        .join(F.broadcast(profiles), ["lang", "ngram"], "left")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.when(
                    F.col("rank").isNotNull(),
                    F.abs(F.col("__dr") - F.col("rank")),
                ).otherwise(F.lit(top_k))
            ).alias("distance")
        )
    )
    best = Window.partitionBy(id_col).orderBy(
        F.asc("distance"), F.asc("lang")
    )
    winners = (
        scored.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .select(id_col, "lang", "distance")
    )
    return docs.select(id_col).join(winners, id_col, "left")
