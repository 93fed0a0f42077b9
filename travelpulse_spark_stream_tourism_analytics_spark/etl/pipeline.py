"""End-to-end dimension-build pipeline (reference SURVEY.md §3.3):
raw GeoNames/hotels/airports inputs -> curated artifacts, as one
orchestrated Spark job with the same output contracts as the
reference's script sequence (cities CSV, hotels CSV + YAML, airports
CSV, unmatched-report CSV)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.etl.cities import (
    build_airports,
    build_cities,
    build_hotels,
)
from travelpulse_spark_stream_tourism_analytics_spark.etl.spatial import radius_dedup
from travelpulse_spark_stream_tourism_analytics_spark.operators.quality import (
    top_missing_report,
)
from travelpulse_spark_stream_tourism_analytics_spark.sinks.files import (
    write_curated_csv,
    write_yaml,
)


# The reference's curated artifact contracts — exact column names and
# order of data/curated/hotels_clean.csv (reference
# scripts/build_hotels_yaml.py) and data/curated/airports_it.csv
# (scripts/clean_airports_it.py:58-60). tests/test_etl.py re-derives
# these lists from the reference CSV headers so silent drift on either
# side fails the parity test.
HOTELS_CONTRACT = [
    "hotel_id", "name", "kind", "stars_num", "city_id", "city_name",
    "region", "lat", "lon", "addr_street", "phone", "website",
]
AIRPORTS_CONTRACT = [
    "airport_code", "icao_code", "name", "type", "lat", "lon",
    "city_name", "region_code", "ident",
]


def _opt(df: DataFrame, name: str, dtype: str = "string"):
    """Column if the source carries it, else a typed NULL (the
    reference pads absent columns with empty values — contract keeps
    the slot either way)."""
    return F.col(name) if name in df.columns else F.lit(None).cast(dtype)


def to_reference_hotels_contract(
    hotels: DataFrame, cities: DataFrame
) -> DataFrame:
    """Project curated hotels onto the reference's hotels_clean.csv
    contract (scripts/build_hotels_yaml.py output): city dimension
    re-attached for display name/region, engine ids renamed to the
    reference's column names."""
    cd = cities.select(
        F.col("city_id").alias("__cid"),
        F.col("city_name").alias("__city_name"),
        F.col("region").alias("__region"),
    )
    j = hotels.join(
        F.broadcast(cd), hotels["matched_city_id"] == F.col("__cid"), "left"
    )
    return j.select(
        F.col("hotel_uid").alias("hotel_id"),
        F.col("name"),
        _opt(hotels, "kind"),
        _opt(hotels, "stars_num", "double"),
        F.col("matched_city_id").cast("string").alias("city_id"),
        F.col("__city_name").alias("city_name"),
        F.col("__region").alias("region"),
        F.col("lat").cast("double"),
        F.col("lon").cast("double"),
        _opt(hotels, "addr_street"),
        _opt(hotels, "phone"),
        _opt(hotels, "website"),
    )


def to_reference_airports_contract(airports: DataFrame) -> DataFrame:
    """Project curated airports onto the reference's airports_it.csv
    contract (scripts/clean_airports_it.py colmap: iata->airport_code,
    gps_code->icao_code, municipality->city_name,
    iso_region->region_code)."""
    return airports.select(
        F.col("iata_code").alias("airport_code"),
        _opt(airports, "gps_code").alias("icao_code"),
        _opt(airports, "name"),
        F.col("type"),
        F.col("latitude_deg").cast("double").alias("lat"),
        F.col("longitude_deg").cast("double").alias("lon"),
        _opt(airports, "municipality").alias("city_name"),
        _opt(airports, "iso_region").alias("region_code"),
        _opt(airports, "ident"),
    )


def run_dimension_build(
    geonames: DataFrame,
    hotels_raw: DataFrame,
    airports_raw: DataFrame,
    out_dir: str,
    hotel_dedup_radius_m: float = 150.0,
) -> dict[str, DataFrame]:
    """Full chain: cities -> hotels (match + spatial dedup) ->
    airports -> curated artifacts + quality report. Returns the curated
    DataFrames keyed by artifact name."""
    os.makedirs(out_dir, exist_ok=True)

    cities = build_cities(geonames)
    hotels = build_hotels(hotels_raw, cities)
    hotels = radius_dedup(
        hotels.withColumn("__grp", hotels["matched_city_id"].cast("string")),
        group_cols=["__grp"],
        id_col="osm_id",
        radius_m=hotel_dedup_radius_m,
    ).drop("__grp")
    airports = build_airports(airports_raw)
    report = top_missing_report(
        cities,
        check_cols=["region", "population"],
        rank_col="population",
        n=500,
        id_cols=["city_id"],
    )

    write_curated_csv(cities, os.path.join(out_dir, "cities_curated"))
    write_curated_csv(hotels, os.path.join(out_dir, "hotels_curated"))
    write_curated_csv(airports, os.path.join(out_dir, "airports_curated"))
    # Reference-contract exports: the artifacts a consumer of the
    # reference's data/curated/ directory would read.
    write_curated_csv(
        to_reference_hotels_contract(hotels, cities),
        os.path.join(out_dir, "hotels_clean"),
    )
    write_curated_csv(
        to_reference_airports_contract(airports),
        os.path.join(out_dir, "airports_it"),
    )
    write_curated_csv(report, os.path.join(out_dir, "unmatched_report"))
    write_yaml(
        hotels.select("hotel_uid", "name", "matched_city_id", "lat", "lon"),
        os.path.join(out_dir, "hotels.yaml"),
        root_key="hotels",
    )
    return {
        "cities": cities,
        "hotels": hotels,
        "airports": airports,
        "report": report,
    }
