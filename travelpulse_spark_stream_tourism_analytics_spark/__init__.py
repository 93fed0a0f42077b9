"""TravelPulse-Spark: a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of NavidTavakoli/TravelPulse-spark-stream-tourism-analytics
(reference studied read-only at /root/reference; see SURVEY.md).

Design stance (SURVEY.md §7.0): every query is a pure
``DataFrame -> DataFrame`` transform so the same logic runs on batch
fixtures (DuckDB-oracle-checkable) and on Structured Streaming inputs.
All hot-path expressions use built-in ``pyspark.sql.functions`` (JVM
side, whole-stage codegen); Python crosses the boundary only in
Arrow-batched Pandas UDFs for the few genuinely non-relational
operators (spatial dedup, multimodal decode).
"""

from travelpulse_spark_stream_tourism_analytics_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
