"""Wire decode + dual-clock repair + enrichment.

The single most load-bearing semantic of the reference (SURVEY.md
§1.4): every event carries three clocks —

- ``event_time``  = parsed event_ts, falling back to the broker
  timestamp when NULL (reference spark/kafka_to_metrics.py:184);
- ``ingest_time`` = parsed ingest_ts, replaced by the broker timestamp
  when NULL **or earlier than it** (:185);
- ``kafka_ts``    = broker append time (:178).

Operational 1-minute windows run on ingest time; 30d/365d analytical
windows run on event time; both share one watermark (:206-214).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_events(df: DataFrame, schema: T.StructType) -> DataFrame:
    """from_json decode + unwrap + dual-clock repair (reference
    spark/kafka_to_metrics.py:174-192, exact semantics)."""
    parsed = df.select(
        F.col("key"),
        F.from_json(F.col("value"), schema).alias("js"),
        F.col("kafka_ts"),
    ).select("key", "js.*", "kafka_ts")

    # try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4
    # default) a malformed timestamp string would otherwise kill the
    # query; malformed -> NULL -> broker-timestamp fallback below, which
    # is exactly the repair semantics. (The reference's plain
    # to_timestamp crashes on such input under ANSI — a robustness fix,
    # not a semantics change: valid inputs parse identically.)
    event_time_raw = F.try_to_timestamp(F.col("event_ts"))
    ingest_time_raw = F.try_to_timestamp(F.col("ingest_ts"))
    event_time = F.when(event_time_raw.isNull(), F.col("kafka_ts")).otherwise(
        event_time_raw
    )
    ingest_time = F.when(
        ingest_time_raw.isNull() | (ingest_time_raw < F.col("kafka_ts")),
        F.col("kafka_ts"),
    ).otherwise(ingest_time_raw)
    return parsed.withColumn("event_time", event_time).withColumn(
        "ingest_time", ingest_time
    )


def enrich_bookings(df: DataFrame) -> DataFrame:
    """spend_eur + date projections (reference
    spark/kafka_to_metrics.py:195-202)."""
    return (
        df.withColumn(
            "spend_eur",
            F.coalesce(F.col("adr_proxy"), F.lit(0.0))
            * F.coalesce(F.col("rooms"), F.lit(1))
            * F.coalesce(F.col("nights"), F.lit(1)),
        )
        .withColumn(
            "arrival_day", F.try_to_timestamp(F.col("checkin_date")).cast("date")
        )
        .withColumn("event_day", F.to_date(F.col("event_time")))
    )


def fork_watermarks(
    df: DataFrame, watermark: str = "45 seconds"
) -> tuple[DataFrame, DataFrame]:
    """(ingest-clock, event-clock) variants — each downstream query
    picks one, giving it independent state/offsets per the reference's
    watermark fork (spark/kafka_to_metrics.py:206-214)."""
    if not df.isStreaming:
        # Batch parity runs: watermarks are streaming-only no-ops.
        return df, df
    return (
        df.withWatermark("ingest_time", watermark),
        df.withWatermark("event_time", watermark),
    )


def add_season(df: DataFrame, date_col) -> DataFrame:
    """Season bucketing (reference spark/kafka_to_metrics.py:315-323);
    delegates to the shared functions.temporal.season_of expression."""
    from travelpulse_spark_stream_tourism_analytics_spark.functions.temporal import (
        season_of,
    )

    return df.withColumn("season", season_of(date_col))


def dedup_stream(
    df: DataFrame, keys: list[str], within_watermark: bool = True
) -> DataFrame:
    """Streaming exact dedup on key columns (engine extension; the
    reference has no stream dedup — SURVEY.md §2.8 'not present').

    With ``within_watermark`` (requires a watermark upstream) state for
    a key is dropped once the watermark passes it — bounded state, the
    only form that survives unbounded streams. The unbounded variant
    keeps all keys forever and exists for short-lived backfills only.
    On batch inputs both reduce to dropDuplicates (parity testing).
    """
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    if within_watermark:
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
