"""Salted aggregation/join must be result-equivalent to the plain
forms (skew affects performance, never answers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from travelpulse_spark_stream_tourism_analytics_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import load_table


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r["event_type"],): (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["sum_value"])
        for r in salted_count_sum(ev, ["event_type"], "value").collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "k"),
            cust.withColumnRenamed("c_custkey", "k"),
            "k",
        )
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_sql_surface(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.plans.sql_surface import (
        run_sql,
    )

    df = run_sql(
        spark,
        SF_SMOKE,
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1",
    )
    assert df.count() == 5
