"""Every catalog query must match its DuckDB oracle — the same gate the
driver applies at sf0.01 (run here at sf0.001 for speed; set
SPARK_GRAFT_ORACLE_SF=sf0.01 to run the full size locally)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import TESTDATA
from tests.oracle_harness import compare, duck_connection
from travelpulse_spark_stream_tourism_analytics_spark.plans import (
    all_oracles,
    all_queries,
)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "sf0.001")
SF_DIR = f"{TESTDATA}/{SF}"

_queries = all_queries()
_oracles = all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_queries))
def test_query_matches_oracle(name, spark, duck):
    if name not in _oracles:
        # Non-SQL-expressible op: weaker check — query must run.
        df = _queries[name](spark, SF_DIR)
        assert df.columns
        df.limit(1).collect()
        return
    spark_df = _queries[name](spark, SF_DIR)
    oracle_df = duck.sql(_oracles[name]).df()
    errors = compare(spark_df, oracle_df, name)
    assert not errors, "\n".join(errors)


def test_harness_detects_mismatches(spark, duck):
    """Meta-test: the oracle comparison must actually fail on wrong
    row counts, wrong values, and wrong column names."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
        load_table,
    )

    nation = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    ok = duck.sql("SELECT n_nationkey, n_name FROM nation").df()
    assert compare(nation, ok, "meta") == []
    # wrong value
    bad_val = duck.sql(
        "SELECT n_nationkey, upper(n_name) || 'X' AS n_name FROM nation"
    ).df()
    assert compare(nation, bad_val, "meta")
    # wrong row count
    bad_rows = duck.sql(
        "SELECT n_nationkey, n_name FROM nation LIMIT 3"
    ).df()
    assert compare(nation, bad_rows, "meta")
    # wrong column name
    bad_cols = duck.sql(
        "SELECT n_nationkey, n_name AS nm FROM nation"
    ).df()
    assert compare(nation, bad_cols, "meta")


def test_harness_allows_all_null_dtype_artifacts(spark, duck):
    """ADVICE r2: an all-NULL Spark column reaches pandas as object
    dtype while DuckDB types it float64/datetime — the driver hash
    agrees on all-NULL values, so the local mirror must not flag the
    transport artifact. A REAL class mismatch on a non-null column
    must still be flagged."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
        load_table,
    )

    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", F.lit(None).cast("double").alias("gap")
    )
    ok = duck.sql(
        "SELECT n_nationkey, NULL::TIMESTAMP AS gap FROM nation"
    ).df()
    assert compare(nation, ok, "meta_nulls") == []

    # Control: int-vs-float on a NON-null column still flags.
    typed = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", F.lit(1).alias("v")
    )
    bad = duck.sql("SELECT n_nationkey, 1.0 AS v FROM nation").df()
    assert any("dtype class differs" in e for e in compare(typed, bad, "meta_ctl"))
