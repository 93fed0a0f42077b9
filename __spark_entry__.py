"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full catalog
(travelpulse_spark_stream_tourism_analytics_spark.plans) for the
driver's DuckDB side-by-side correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from travelpulse_spark_stream_tourism_analytics_spark.plans import (  # noqa: E402
    all_oracles,
    all_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> None:
    """Apply runtime-settable engine defaults to a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # AQE coalesces the default 200 shuffle partitions down to fit the
    # data; both are runtime-settable.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        # events.ts is parquet TIMESTAMP(NANOS); Spark needs this to scan it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return all_queries()["user_spend_snapshots"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return all_oracles()
