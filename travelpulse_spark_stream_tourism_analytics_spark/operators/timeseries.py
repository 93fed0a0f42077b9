"""Time-series similarity search over event value series.

The streaming-analytics counterpart of embedding ANN (cf. the
EDBT'19 line of distributed time-series similarity search): find where
a query PATTERN occurs inside per-key event series, under z-normalized
Euclidean distance (shape match — invariant to each window's offset
and scale, the UCR-suite convention).

Scale shape: series are assembled per key with one shuffle
(collect_list over the key's events, ordered by time); every sliding
window is then scored map-side with pure array expressions — the
per-key series is the parallelism unit, exactly like the per-doc
token arrays in the text profile. The top-k is TakeOrderedAndProject
over (key, offset) scores. Keys with unbounded history would segment
into overlapping spans upstream (chunk_documents-style) — per-key
series length is the documented contract here.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _znorm_literal(pattern: list[float]) -> list[float]:
    m = len(pattern)
    mu = sum(pattern) / m
    var = sum((x - mu) ** 2 for x in pattern) / m
    sd = math.sqrt(var)
    if sd == 0:
        raise ValueError("constant pattern has no shape to match")
    return [(x - mu) / sd for x in pattern]


def pattern_matches(
    events: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 10,
) -> DataFrame:
    """Top-k (key, offset) windows most similar to ``pattern``.

    Returns (key, offset, zdist) with offset the 1-based position of
    the window in the key's time-ordered series and zdist the
    z-normalized Euclidean distance rounded at 1e-6 before ranking
    (ties: key, then offset). Constant windows (sd = 0) have no shape
    and are skipped. The pattern is z-normalized driver-side and
    embedded as a literal array — a plan constant like LSH planes.
    """
    m = len(pattern)
    q = F.array(*[F.lit(float(x)) for x in _znorm_literal(pattern)])

    series = (
        events.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(ts_col, value_col))
            ).alias("__pts")
        )
        .select(
            key_col,
            F.transform(
                "__pts", lambda p: p[value_col].cast("double")
            ).alias("vals"),
        )
        .filter(F.size("vals") >= m)
    )

    def window_dist(vals, i):
        w = F.slice(vals, i, m)
        mu = F.aggregate(w, F.lit(0.0), lambda a, x: a + x) / m
        var = (
            F.aggregate(w, F.lit(0.0), lambda a, x: a + (x - mu) * (x - mu))
            / m
        )
        sd = F.sqrt(var)
        zw = F.transform(w, lambda x: (x - mu) / sd)
        d2 = F.aggregate(
            F.zip_with(zw, q, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(sd > 0, F.round(F.sqrt(d2), 6)).otherwise(F.lit(None))

    offsets = F.sequence(F.lit(1), F.size("vals") - F.lit(m - 1))
    scored = (
        series.select(
            key_col,
            F.posexplode(
                F.transform(offsets, lambda i: window_dist(F.col("vals"), i))
            ).alias("__pos", "zdist"),
        )
        .filter(F.col("zdist").isNotNull())
        .select(
            key_col,
            (F.col("__pos") + 1).cast("long").alias("offset"),
            "zdist",
        )
    )
    return scored.orderBy(
        F.asc("zdist"), F.asc(key_col), F.asc("offset")
    ).limit(k)
