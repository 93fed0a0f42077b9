"""Stream sources, all normalized to the WIRE_SCHEMA contract
(key string, value string, kafka_ts timestamp) so every downstream
transform is source-agnostic — Kafka in production, files/rate/memory
in tests (the reference is Kafka-only; reference
spark/kafka_to_metrics.py:156-169)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from travelpulse_spark_stream_tourism_analytics_spark.schemas import WIRE_SCHEMA


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    fail_on_data_loss: str = "false",
) -> DataFrame:
    """Kafka source (requires the spark-sql-kafka connector jar on the
    classpath; not bundled in this container — the file/rate sources
    below exercise identical downstream code)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", fail_on_data_loss)
        .load()
        .selectExpr(
            "CAST(key AS STRING) AS key",
            "CAST(value AS STRING) AS value",
            "timestamp AS kafka_ts",
        )
    )


def file_stream(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """JSONL directory source producing the wire contract. Each line:
    {"key": ..., "value": "<embedded event JSON>", "kafka_ts": ...}.
    Deterministic replacement for a Kafka topic in tests. Extra reader
    options pass through (e.g. maxFilesPerTrigger=1 to force micro-batch
    boundaries so watermark progression is observable)."""
    reader = spark.readStream.schema(WIRE_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.json(path)


def file_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same fixture files — used to prove
    stream/batch parity of every KPI transform."""
    return spark.read.schema(WIRE_SCHEMA).json(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Throughput-test source mapped onto the wire contract."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").cast("string").alias("key"),
            F.to_json(
                F.struct(
                    F.lit("1").alias("schema_version"),
                    F.lit("rate").alias("event_type"),
                    F.date_format(
                        "timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                    ).alias("event_ts"),
                )
            ).alias("value"),
            F.col("timestamp").alias("kafka_ts"),
        )
    )
