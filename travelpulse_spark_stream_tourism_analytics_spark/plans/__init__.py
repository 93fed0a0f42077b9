from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    all_oracles,
    all_queries,
    load_table,
    query,
)

__all__ = ["query", "all_queries", "all_oracles", "load_table"]
