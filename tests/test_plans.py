"""Physical-plan regression tests: the scale-critical plan properties
(pushdown, pruning, broadcast, TakeOrderedAndProject, partial
aggregation) must not silently regress as queries evolve."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMOKE
from travelpulse_spark_stream_tourism_analytics_spark.plans import all_queries

_CATALOG = all_queries()


def plan_of(spark, name: str) -> str:
    df = _CATALOG[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filters_push_down_to_scan(spark):
    plan = plan_of(spark, "filter_predicates")
    assert "GreaterThanOrEqual(p_size,10)" in plan
    assert "In(p_type, [ECONOMY,SMALL]" in plan
    assert "StringContains(p_name,re)" in plan


def test_columns_prune_to_read_schema(spark):
    plan = plan_of(spark, "events_per_minute")
    # The scan must read ONLY the timestamp column.
    assert "ReadSchema: struct<ts:bigint>" in plan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region dims
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_global_topn_is_take_ordered(spark):
    plan = plan_of(spark, "top_revenue_customers")
    assert "TakeOrderedAndProject" in plan  # never a full global sort
    assert "GlobalSort" not in plan


def test_aggregation_is_partial_before_exchange(spark):
    plan = plan_of(spark, "pricing_summary")
    # HashAggregate (partial) -> Exchange -> HashAggregate (final)
    first_agg = plan.find("HashAggregate")
    first_exchange = plan.find("Exchange")
    assert first_agg != -1 and first_exchange != -1
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name", ["shipping_priority", "orders_with_late_items"]
)
def test_date_filters_reach_scans(spark, name):
    plan = plan_of(spark, name)
    assert "PushedFilters" in plan
    assert "Exchange" in plan  # sanity: plan rendered fully
