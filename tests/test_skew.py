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


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE's runtime skew-join split is the engine's first line of
    defense (salting in operators/skew.py is the manual fallback for
    single-key aggregation skew AQE cannot split). This pins that the
    session's AQE config actually engages it: a join whose shuffle
    puts ~83% of rows in one partition must come back with the
    SortMergeJoin marked skew=true and a skewed AQEShuffleRead —
    i.e. the hot partition was split across tasks, not processed by
    one straggler. Thresholds are lowered to make the fixture 'big';
    production uses the defaults (256 MB advisory)."""
    scoped = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    prev = {k: spark.conf.get(k, None) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        fact = spark.range(0, 600_000).select(
            F.when(F.col("id") < 500_000, F.lit(7))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("padpadpadpadpadpadpad-"), F.col("id")).alias(
                "payload"
            ),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dval")
        )
        joined = fact.join(dim, "k")
        assert len(joined.collect()) == 600_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
