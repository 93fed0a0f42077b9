"""Driver-contract invariants: the properties the grading driver
depends on, pinned so a refactor cannot silently break them."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_catalog_keys_and_size():
    """queries() and oracle_sql() expose the SAME keys, exactly 50
    entries — the driver scores ONLY the first 50 registered queries
    (CORRECTNESS_r08 proved a 51st registers but silently falls
    outside the gate, VERDICT r8 item 1), so 50 registered == every
    registered entry is driver-checked."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o)
    assert len(q) == 50
    assert "graph_rank_entities" in q
    assert "scalar_aggregates" not in q  # folded into nation_key_set_ops


def test_scalar_aggregate_arms_ride_in_nation_key_set_ops(spark):
    """The retired scalar_aggregates entry's arms (SURVEY A1/A12/T6 +
    the Q17 subquery) are driver-oracled as scalar_* branches of
    nation_key_set_ops, and their values equal the standalone
    constituent functions they fold in."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans import (
        relational_queries as R,
    )

    rows = {
        r["set_op"]: r["nationkey"]
        for r in R.nation_key_set_ops(spark, SF_SMOKE)
        .filter(F.col("set_op").startswith("scalar_"))
        .collect()
    }
    assert set(rows) == {
        "scalar_n_lineitem",
        "scalar_n_orders",
        "scalar_n_parts",
        "scalar_avg_yearly_1e6",
        "scalar_n_unique_brand_type",
    }
    wide = R.scalar_aggregates(spark, SF_SMOKE).collect()[0]
    assert rows["scalar_n_lineitem"] == wide["n_lineitem"]
    assert rows["scalar_n_orders"] == wide["n_orders"]
    assert rows["scalar_n_parts"] == wide["n_parts"]
    assert rows["scalar_n_unique_brand_type"] == wide["n_unique_brand_type"]
    import math

    assert rows["scalar_avg_yearly_1e6"] == math.floor(
        wide["avg_yearly"] * 1e6
    )


def test_branch_tagged_entries_expose_expected_branches(spark):
    """Every branch/variant tag that bench.py times (and COVERAGE.md
    documents) actually exists in the entry's output — renaming a
    branch would otherwise silently turn its bench timing into an
    empty-plan measurement."""
    from bench import BRANCHES

    import __spark_entry__ as E

    q = E.queries()
    for name, (col, tags) in BRANCHES.items():
        got = {
            r[col]
            for r in q[name](spark, SF_SMOKE).select(col).distinct().collect()
        }
        assert set(tags) <= got, (name, got)


def test_headline_entries_are_all_resolvable(spark):
    """Every bench HEADLINE name resolves to a catalog entry or an
    EXTRA surface and yields a non-degenerate DataFrame."""
    from bench import EXTRA, HEADLINE

    import __spark_entry__ as E

    q = E.queries()
    for name in HEADLINE:
        fn = EXTRA.get(name) or q[name]
        df = fn(spark, SF_SMOKE)
        assert len(df.columns) > 0
