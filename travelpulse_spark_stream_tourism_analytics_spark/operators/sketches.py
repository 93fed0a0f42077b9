"""Mergeable frequency sketches: count-min over term streams.

The frequency-side companion of the HLL distinct sketches
(window_queries hll rollup): per-partition/per-day COUNT-MIN sketches
of term frequencies persist as small binary summaries and re-aggregate
to any coarser grain WITHOUT rescanning the corpus — the pattern a
100 TB vocabulary monitor needs (exact heavy hitters = docs_top_terms;
this is the "frequency of ANY term, later, from summaries" path).

Spark's built-in `count_min_sketch` aggregate (Tungsten-side, one
shuffle with partial aggregation) produces the binary; sketches merge
associatively (`CountMinSketch.mergeInPlace`), and estimates carry the
standard CM guarantee: estimate >= true count, estimate <= true +
eps * N with probability >= confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    words_of,
)


def term_count_sketches(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One count-min sketch of the term stream per ``group_col`` value
    — (group, sketch binary, n_terms). Map-side explode, one shuffle
    with partial (sketch) aggregation; each sketch is O(1/eps *
    ln(1/(1-confidence))) bytes regardless of corpus size."""
    terms = docs.select(
        F.col(group_col), F.explode(words_of(F.col(text_col))).alias("term")
    )
    return terms.groupBy(group_col).agg(
        F.count_min_sketch(
            "term", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sketch"),
        F.count("*").alias("n_terms"),
    )


def read_sketch(spark: SparkSession, raw: bytes):
    """Deserialize a sketch binary into a queryable CountMinSketch
    (driver-side; sketches are KB-sized summaries by contract)."""
    return spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(raw)
    )


def merge_sketches(spark: SparkSession, raws: list):
    """Associatively merge sketch binaries (same eps/confidence/seed)
    into one — the day->month->year rollup that never rescans facts."""
    if not raws:
        raise ValueError("no sketches to merge")
    out = read_sketch(spark, raws[0])
    for raw in raws[1:]:
        out.mergeInPlace(read_sketch(spark, raw))
    return out


def estimate_counts(sketch, terms: list) -> dict:
    """Point-query the sketch for each term."""
    return {t: int(sketch.estimateCount(t)) for t in terms}
