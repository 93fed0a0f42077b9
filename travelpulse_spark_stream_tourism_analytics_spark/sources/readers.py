"""Robust file readers for messy open-data inputs.

Spark-first rebuilds of the reference's pandas ingest tricks
(SURVEY.md §2.1): separator sniffing (S3,
scripts/istat_utils.py:5-26), multi-encoding fallback (S4,
scripts/merge_istat_cities.py:24-32), positional TSV schemas (S5,
scripts/rebuild_and_merge_cities_it.py:97-105) and line-delimited
GeoJSON (S8, scripts/build_hotels_yaml.py:157-214).

The sniff/retry passes read only a small driver-side prefix — the full
scan is always a distributed spark.read; chunked iteration (reference
S6) is unnecessary because partitioning bounds memory natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANDIDATE_SEPS = (";", ",", "\t", "|")
CANDIDATE_ENCODINGS = ("utf-8", "utf-8-sig", "cp1252", "latin1")


def sniff_sep(path: str, n_bytes: int = 8192, candidates=CANDIDATE_SEPS) -> str:
    """Count candidate separators in the file head (driver-side, one
    small read) — same trick as the reference; Spark cannot sniff."""
    with open(path, "rb") as f:
        head = f.read(n_bytes)
    for enc in CANDIDATE_ENCODINGS:
        try:
            text = head.decode(enc)
            break
        except UnicodeDecodeError:
            continue
    else:
        text = head.decode("utf-8", errors="replace")
    first_lines = "\n".join(text.splitlines()[:5])
    return max(candidates, key=first_lines.count)


def sniff_encoding(path: str, n_bytes: int = 65536) -> str:
    """utf-8 -> utf-8-sig -> cp1252 -> latin1 retry ladder (S4)."""
    with open(path, "rb") as f:
        head = f.read(n_bytes)
    for enc in CANDIDATE_ENCODINGS:
        try:
            head.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    return "latin1"  # decodes anything


# Spark's CSV reader only accepts a fixed charset list (no cp1252).
# Strategy: read cp1252/latin1 files as iso-8859-1 (byte-identical for
# 0xA0-0xFF), then repair the 0x80-0x9F range — where cp1252 differs —
# with a 1:1 codepoint translate, all JVM-side.
_SPARK_CHARSET = {
    "utf-8": "utf-8",
    "utf-8-sig": "utf-8",
    "cp1252": "iso-8859-1",
    "latin1": "iso-8859-1",
}
_CP1252_DEFINED = [b for b in range(0x80, 0xA0) if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_CP1252_SRC = "".join(chr(b) for b in _CP1252_DEFINED)
_CP1252_DST = bytes(_CP1252_DEFINED).decode("cp1252")


def read_csv_auto(
    spark: SparkSession,
    path: str,
    header: bool = True,
    all_string: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    """CSV scan with sniffed separator + encoding; columns arrive as
    strings (schema resolution happens downstream, as in the reference
    ETL which reads everything as str then coerces).

    ``multi_line`` parses quoted fields containing embedded newlines —
    pandas (the reference's reader) does this natively, and the
    reference's own hotels_clean.csv artifact contains such rows, so
    parity requires it on by default. The cost is scan splittability:
    a multiLine CSV file is read as ONE task per file. That is the
    right default for the messy-dimension-CSV sizes this reader exists
    for (≤ tens of MB); for bulk row-oriented data at engine scale use
    parquet, or pass ``multi_line=False`` when inputs are known
    newline-free to restore intra-file parallelism."""
    sep = sniff_sep(path)
    enc = sniff_encoding(path)
    reader = (
        spark.read.option("sep", sep)
        .option("encoding", _SPARK_CHARSET[enc])
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", multi_line)
    )
    if not all_string:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    # Strip a UTF-8 BOM that survives into the first header name.
    if df.columns and df.columns[0].startswith("﻿"):
        df = df.withColumnRenamed(df.columns[0], df.columns[0].lstrip("﻿"))
    if enc == "cp1252":
        for field in df.schema.fields:
            if isinstance(field.dataType, T.StringType):
                df = df.withColumn(
                    field.name,
                    F.translate(F.col(field.name), _CP1252_SRC, _CP1252_DST),
                )
    return df


GEONAMES_SCHEMA = T.StructType(
    [
        T.StructField(n, t())
        for n, t in [
            ("geonameid", T.LongType),
            ("name", T.StringType),
            ("asciiname", T.StringType),
            ("alternatenames", T.StringType),
            ("latitude", T.DoubleType),
            ("longitude", T.DoubleType),
            ("feature_class", T.StringType),
            ("feature_code", T.StringType),
            ("country_code", T.StringType),
            ("cc2", T.StringType),
            ("admin1_code", T.StringType),
            ("admin2_code", T.StringType),
            ("admin3_code", T.StringType),
            ("admin4_code", T.StringType),
            ("population", T.LongType),
            ("elevation", T.StringType),
            ("dem", T.StringType),
            ("timezone", T.StringType),
            ("modification_date", T.StringType),
        ]
    ]
)


def read_tsv_positional(
    spark: SparkSession, path: str, schema: T.StructType = GEONAMES_SCHEMA
) -> DataFrame:
    """Headerless TSV with a fixed positional schema, no quoting
    (GeoNames contract: 19 columns, QUOTE_NONE)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", False)
        .option("quote", "")  # QUOTE_NONE
        .schema(schema)
        .csv(path)
    )


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited GeoJSON: native spark.read.json + Point
    coordinate unwrap with the reference's fallback key aliases
    (name/name:it/official_name, addr:city/addr_city)."""
    raw = spark.read.json(path)

    def first_present(*names):
        cols = [F.col(n) for n in names if _has_field(raw, n)]
        return F.coalesce(*cols) if cols else F.lit(None).cast("string")

    lon = F.col("geometry.coordinates").getItem(0).cast("double")
    lat = F.col("geometry.coordinates").getItem(1).cast("double")
    return raw.select(
        first_present(
            "properties.name", "properties.`name:it`", "properties.official_name"
        ).alias("name"),
        first_present("properties.`addr:city`", "properties.addr_city").alias(
            "addr_city"
        ),
        first_present("properties.tourism", "properties.building").alias("kind"),
        first_present("properties.`@id`", "properties.osm_id").alias("osm_id"),
        lat.alias("lat"),
        lon.alias("lon"),
    ).filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())


def _has_field(df: DataFrame, dotted: str) -> bool:
    parts = [p.strip("`") for p in dotted.split(".")]
    schema: T.DataType = df.schema
    for p in parts:
        if not isinstance(schema, T.StructType) or p not in schema.fieldNames():
            return False
        schema = schema[p].dataType
    return True
