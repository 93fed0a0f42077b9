"""SQL surface: register the table set as temp views so users can run
plain ``spark.sql`` against the engine's data model (the reference has
no SQL entry point; this engine exposes one for free via Catalyst)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    TABLES,
    load_table,
)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace a temp view per table (ns-timestamp repair
    included via load_table)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(sql)
