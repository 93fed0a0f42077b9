"""ETL operator catalog entries: staged fallback merge (J5),
missingness reports (A13/T4), spatial greedy dedup (§2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.etl.spatial import radius_dedup
from travelpulse_spark_stream_tourism_analytics_spark.operators.joins import (
    staged_fallback_merge,
)
from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
    top_missing_report,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
    query,
)


@query(
    "staged_fallback_enrich",
    oracle="""
    WITH r AS (
        SELECT s_suppkey AS rk,
               min(s_acctbal) AS sup_acctbal,
               min(s_name) AS sup_name
        FROM supplier GROUP BY 1
    )
    SELECT c_custkey,
           coalesce(r1.sup_acctbal, r2.sup_acctbal) AS sup_acctbal,
           coalesce(r1.sup_name, r2.sup_name) AS sup_name
    FROM customer
    LEFT JOIN r r1 ON c_custkey = r1.rk
    LEFT JOIN r r2 ON c_custkey % 100 = r2.rk
    """,
)
def staged_fallback_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalescing join cascade (reference J5,
    scripts/rebuild_and_merge_cities_it.py:175-224): stage 1 joins on
    the precise key, stage 2 fills still-NULL payload via the loose
    key; earlier matches are never overwritten."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_custkey").alias("k_exact"),
        (F.col("c_custkey") % 100).alias("k_loose"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").alias("sup_acctbal"),
        F.col("s_name").alias("sup_name"),
    )
    merged = staged_fallback_merge(
        cust,
        sup,
        key_pairs=[("k_exact", "k"), ("k_loose", "k")],
        payload_cols=["sup_acctbal", "sup_name"],
    )
    return merged.select("c_custkey", "sup_acctbal", "sup_name")


@query(
    "orders_missingness_report",
    oracle="""
    SELECT o_orderkey, o_totalprice, missing_count
    FROM (
        SELECT o_orderkey, o_totalprice,
               (CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END
                + CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END
                + CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)::BIGINT
                   AS missing_count
        FROM orders
    )
    WHERE missing_count > 0
    ORDER BY missing_count DESC, o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
)
def orders_missingness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise missingness score + worst-N report (reference A13/T4,
    scripts/rebuild_and_merge_cities_it.py:306-319); NULLs synthesized
    via nullif since the fixture tables are dense."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("f_status"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("f_prio"),
        F.when(F.col("o_totalprice") > 150000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("f_price"),
    )
    report = top_missing_report(
        orders,
        check_cols=["f_status", "f_prio", "f_price"],
        rank_col="o_totalprice",
        n=500,
        id_cols=["o_orderkey"],
    )
    return report.select("o_orderkey", "o_totalprice", "missing_count")


@query(
    "spatial_radius_dedup",
    # Greedy keep-first is not SQL-expressible in general, but this
    # fixture's geometry (two >1 km clusters per brand, points within
    # a cluster ~11-100 m apart, radius 150 m) makes the greedy result
    # provably "min partkey per (brand, cluster)" — so the oracle can
    # still pin the operator's output exactly.
    oracle="""
    SELECT p_brand, p_partkey, lat, lon FROM (
        SELECT p_brand, p_partkey,
               40.0 + (p_partkey % 2) * 0.01 + (p_partkey % 10) * 0.0001 AS lat,
               12.0 + (p_partkey % 7) * 0.0001 AS lon,
               row_number() OVER (
                   PARTITION BY p_brand, p_partkey % 2 ORDER BY p_partkey
               ) AS rn
        FROM part
    ) WHERE rn = 1
    """,
)
def spatial_radius_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-based greedy spatial dedup via applyInPandas grouped map
    (reference §2.9, scripts/build_hotels_yaml.py:261-283) over
    synthesized clustered points (~11 m spacing within brand groups, so
    each cluster collapses to its lowest id)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        (
            F.lit(40.0)
            + (F.col("p_partkey") % 2) * 0.01  # two clusters ~1.1 km apart
            + (F.col("p_partkey") % 10) * 0.0001
        ).alias("lat"),
        (F.lit(12.0) + (F.col("p_partkey") % 7) * 0.0001).alias("lon"),
    )
    return radius_dedup(
        part, group_cols=["p_brand"], id_col="p_partkey", radius_m=150.0
    ).select("p_brand", "p_partkey", "lat", "lon")
