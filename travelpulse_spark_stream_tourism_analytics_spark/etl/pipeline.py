"""End-to-end dimension-build pipeline (reference SURVEY.md §3.3):
raw GeoNames/hotels/airports inputs -> curated artifacts, as one
orchestrated Spark job with the same output contracts as the
reference's script sequence (cities CSV, hotels CSV + YAML, airports
CSV, unmatched-report CSV)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

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
