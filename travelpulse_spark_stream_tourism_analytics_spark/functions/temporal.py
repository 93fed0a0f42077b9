"""Temporal Column expressions: seasons and window helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Meteorological seasons, as in the reference's season bucketing
# (reference spark/kafka_to_metrics.py:315-323).
_WINTER = (12, 1, 2)
_SPRING = (3, 4, 5)
_SUMMER = (6, 7, 8)


def season_of(ts: Column) -> Column:
    """Map a timestamp/date to {winter, spring, summer, autumn}."""
    m = F.month(ts)
    return (
        F.when(m.isin(*_WINTER), F.lit("winter"))
        .when(m.isin(*_SPRING), F.lit("spring"))
        .when(m.isin(*_SUMMER), F.lit("summer"))
        .otherwise(F.lit("autumn"))
    )


def tumbling(df: DataFrame, ts: str, duration: str, slide: str | None = None) -> DataFrame:
    """Attach epoch-aligned window_start/window_end columns.

    Thin wrapper over ``F.window`` (tumbling when ``slide`` is None,
    sliding otherwise) that flattens the window struct so downstream
    grouping keys are plain timestamp columns — directly comparable to
    a SQL ``time_bucket``.
    """
    w = F.window(F.col(ts), duration, slide) if slide else F.window(F.col(ts), duration)
    return (
        df.withColumn("__w", w)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )
