"""Bucketed co-located join: the join must plan without any Exchange."""

from __future__ import annotations

from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import load_table
from travelpulse_spark_stream_tourism_analytics_spark.sinks.bucketed import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "tp_orders_b", ["k"], 8
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "k"), "tp_lineitem_b", ["k"], 8
    )
    joined, shuffle_free = bucketed_join_is_shuffle_free(
        spark, "tp_orders_b", "tp_lineitem_b", "k"
    )
    assert shuffle_free, "bucketed join should not shuffle"
    # Sanity: the join still returns real rows.
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS tp_orders_b")
    spark.sql("DROP TABLE IF EXISTS tp_lineitem_b")
