"""Dimension-build ETL chain (reference SURVEY.md §3.3), Spark-first.

Rebuilds the observable contracts of the reference's pandas scripts as
DataFrame transforms: GeoNames -> cities (filter/dedup/recode,
scripts/clean_cities_geonames.py), hotels -> normalized + city-matched
+ spatially deduped + stable ids (scripts/build_hotels_yaml.py),
airports (regex/range filters + keep-largest,
scripts/clean_airports_it.py). Everything is a pure transform over
input DataFrames — no file-path coupling — so the chain tests on small
fixtures and scales unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    fold_accents,
    slugify,
)
from travelpulse_spark_stream_tourism_analytics_spark.operators.joins import (
    nearest_neighbor_join,
)

# Region recodes (F11 dict-map recode): province (admin2) -> region
# with admin1 fallback — same two-stage semantics and public ISTAT /
# GeoNames data as the reference (scripts/clean_cities_geonames.py:19-87).
_REGION_PROVINCES = {
    "Piemonte": "AL AT BI CN NO TO VB VC",
    "Valle d'Aosta/Vallée d'Aoste": "AO",
    "Lombardia": "BG BS CO CR LC LO MB MI MN PV SO VA",
    "Trentino-Alto Adige/Südtirol": "BZ TN",
    "Veneto": "BL PD RO TV VE VR VI",
    "Friuli-Venezia Giulia": "GO PN TS UD",
    "Liguria": "GE IM SP SV",
    "Emilia-Romagna": "BO FC FE MO PR PC RA RE RN",
    "Toscana": "AR FI GR LI LU MS PI PT PO SI",
    "Umbria": "PG TR",
    "Marche": "AN AP FM MC PU",
    "Lazio": "FR LT RI RM VT",
    "Abruzzo": "AQ CH PE TE",
    "Molise": "CB IS",
    "Campania": "AV BN CE NA SA",
    "Puglia": "BA BT BR FG LE TA",
    "Basilicata": "MT PZ",
    "Calabria": "CS CZ KR RC VV",
    "Sicilia": "AG CL CT EN ME PA RG SR TP",
    "Sardegna": "CA NU OR OT OG VS SS SU",
}
PROVINCE_REGION = {
    prov: region
    for region, provs in _REGION_PROVINCES.items()
    for prov in provs.split()
}
ADMIN1_REGION = {
    "01": "Piemonte", "02": "Valle d'Aosta/Vallée d'Aoste", "03": "Lombardia",
    "04": "Trentino-Alto Adige/Südtirol", "05": "Veneto",
    "06": "Friuli-Venezia Giulia", "07": "Liguria", "08": "Emilia-Romagna",
    "09": "Toscana", "10": "Umbria", "11": "Marche", "12": "Lazio",
    "13": "Abruzzo", "14": "Molise", "15": "Campania", "16": "Puglia",
    "17": "Basilicata", "18": "Calabria", "19": "Sicilia", "20": "Sardegna",
    "00": "(Unknown)",
}
CITY_FEATURE_CODES = ("PPLC", "PPLA", "PPLA2", "PPLA3", "PPLA4", "PPL")


def build_cities(geonames: DataFrame) -> DataFrame:
    """GeoNames -> curated cities: category/range filters (P11/P12),
    keep-highest-population dedup per (name, admin1) (T2), region
    recode (F11), normalized key (F1)."""
    def literal_map(d: dict[str, str]):
        items = []
        for k, v in d.items():
            items += [F.lit(k), F.lit(v)]
        return F.create_map(*items)

    prov_map = literal_map(PROVINCE_REGION)
    admin1_map = literal_map(ADMIN1_REGION)

    filtered = geonames.filter(
        (F.col("feature_class") == "P")
        & F.col("feature_code").isin(*CITY_FEATURE_CODES)
        & F.col("latitude").between(-90, 90)
        & F.col("longitude").between(-180, 180)
        & (F.col("population") > 0)
    )
    w = Window.partitionBy("name", "admin1_code").orderBy(
        F.desc("population"), F.asc("geonameid")
    )
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select(
            F.col("geonameid").alias("city_id"),
            F.col("name").alias("city_name"),
            fold_accents(F.col("name")).alias("city_name_norm"),
            F.lpad("admin1_code", 2, "0").alias("admin1_code"),
            # Province recode first, admin1 fallback, then "(Unknown)"
            # (reference scripts/clean_cities_geonames.py:108-113).
            F.coalesce(
                F.element_at(prov_map, F.col("admin2_code")),
                F.element_at(admin1_map, F.lpad("admin1_code", 2, "0")),
                F.lit("(Unknown)"),
            ).alias("region"),
            "latitude",
            "longitude",
            "population",
        )
        .orderBy(F.asc("region"), F.desc("population"), F.asc("city_id"))
    )


def build_hotels(hotels_raw: DataFrame, cities: DataFrame) -> DataFrame:
    """OSM-ish hotels -> curated: normalized-name city match (J4) with
    nearest-city spatial fallback (J6), stable id synthesis (F14)."""
    h = hotels_raw.withColumn("addr_city_norm", fold_accents(F.col("addr_city")))
    c = cities.select(
        F.col("city_id").alias("matched_city_id"),
        F.col("city_name_norm"),
        F.col("latitude").alias("c_lat"),
        F.col("longitude").alias("c_lon"),
    )
    by_name = h.join(
        F.broadcast(c), h["addr_city_norm"] == c["city_name_norm"], "left"
    ).drop("city_name_norm")

    matched = by_name.filter(F.col("matched_city_id").isNotNull()).drop(
        "c_lat", "c_lon"
    )
    unmatched = by_name.filter(F.col("matched_city_id").isNull()).drop(
        "matched_city_id", "c_lat", "c_lon"
    )
    # Spatial fallback: squared-degree distance argmin, like the
    # reference's brute force (build_hotels_yaml.py:237-257).
    dim = cities.select(
        F.col("city_id").alias("matched_city_id"),
        F.col("latitude").alias("c_lat"),
        F.col("longitude").alias("c_lon"),
    )
    rescued = nearest_neighbor_join(
        unmatched,
        dim,
        probe_id="osm_id",
        distance=lambda: (F.col("lat") - F.col("c_lat")) ** 2
        + (F.col("lon") - F.col("c_lon")) ** 2,
        tiebreak="matched_city_id",
    ).drop("__dist", "c_lat", "c_lon")

    all_hotels = matched.unionByName(rescued)
    return all_hotels.withColumn(
        "hotel_uid",
        F.concat_ws(
            "-",
            F.col("matched_city_id").cast("string"),
            slugify(F.col("name")),
            F.lpad(F.regexp_replace(F.col("osm_id"), "[^0-9]", "").substr(-6, 6), 6, "0"),
        ),
    )


def build_airports(airports_raw: DataFrame, country: str = "IT") -> DataFrame:
    """OurAirports -> curated IT airports: country filter, IATA regex
    fullmatch (P13), coordinate range filter (P11), keep-largest per
    IATA via type rank (T2, scripts/clean_airports_it.py:43-55).

    The reference hard-requires an ``iso_country`` column
    (clean_airports_it.py:31-32) and filters ``== "IT"``; the engine
    parameterizes the country and treats an absent column as
    pre-filtered input (the country predicate pushes to the scan)."""
    type_rank = (
        F.when(F.col("type") == "large_airport", 3)
        .when(F.col("type") == "medium_airport", 2)
        .when(F.col("type") == "small_airport", 1)
        .otherwise(0)
    )
    pred = (
        F.col("iata_code").rlike("^[A-Z]{3}$")
        & F.col("latitude_deg").between(-90, 90)
        & F.col("longitude_deg").between(-180, 180)
    )
    if country is not None and "iso_country" in airports_raw.columns:
        pred = pred & (F.col("iso_country") == country)
    filtered = airports_raw.filter(pred).withColumn("__rank", type_rank)
    w = Window.partitionBy("iata_code").orderBy(F.desc("__rank"), F.asc("id"))
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rank")
    )
