"""Scalar-function catalog: the reference's string/date/math surface
(SURVEY.md §2.3 F1-F14, §2.2 P7-P13) exercised as oracle-checked
queries. Everything is built-in Column expressions — zero Python UDFs,
so the whole projection stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.geo import haversine_km
from travelpulse_spark_stream_tourism_analytics_spark.functions.numeric import (
    locale_numeric,
    minmax_norm,
)
from travelpulse_spark_stream_tourism_analytics_spark.functions.temporal import season_of
from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    ACCENT_DST,
    ACCENT_SRC,
    fold_accents,
    slugify,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
    query,
)

# DuckDB mirror of functions.text.fold_accents / slugify, built from the
# same constants so the two sides cannot drift.
_FOLD_SQL = (
    "trim(regexp_replace(regexp_replace(translate(lower({c}), "
    f"'{ACCENT_SRC}', '{ACCENT_DST}'), "
    "'[''`’]', '', 'g'), '[^a-z0-9]+', ' ', 'g'))"
)
_SLUG_SQL = "substr(regexp_replace(" + _FOLD_SQL + ", ' +', '-', 'g'), 1, 40)"


def accent_fold_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding + slugify (reference F1/F2,
    scripts/build_hotels_yaml.py:20-33). Accents are synthesized first
    (the TPC-H fixture is ASCII) so the fold path is actually
    exercised."""
    nation = load_table(spark, sf_dir, "nation")
    accented = F.translate(F.lower(F.col("n_name")), "aio", "àîò")
    return nation.select(
        "n_name",
        accented.alias("accented"),
        fold_accents(accented).alias("folded"),
        slugify(accented).alias("slug"),
    )


@query(
    "order_season_buckets",
    oracle="""
    SELECT extract(year FROM o_orderdate) AS order_year,
           extract(month FROM o_orderdate) AS order_month,
           CASE WHEN extract(month FROM o_orderdate) IN (12, 1, 2) THEN 'winter'
                WHEN extract(month FROM o_orderdate) IN (3, 4, 5) THEN 'spring'
                WHEN extract(month FROM o_orderdate) IN (6, 7, 8) THEN 'summer'
                ELSE 'autumn' END AS season,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def order_season_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Season bucketing (reference P7, spark/kafka_to_metrics.py:315-323)
    + year/month extraction (F12) + keyed revenue (A6)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        season_of(F.col("o_orderdate")).alias("season"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def dict_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal dict-map recode via create_map lookup (reference
    F11/F3, scripts/rebuild_and_merge_cities_it.py:19-70; the
    broadcast-join variant of the same recode is regional_revenue)."""
    nation = load_table(spark, sf_dir, "nation")
    mapping = F.create_map(
        F.lit(0), F.lit("nord-ovest"),
        F.lit(1), F.lit("nord-est"),
        F.lit(2), F.lit("centro"),
        F.lit(3), F.lit("sud"),
        F.lit(4), F.lit("isole"),
    )
    return nation.select(
        "n_nationkey",
        "n_name",
        F.element_at(mapping, F.col("n_nationkey") % 5).alias("macro_area"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 40
      AND p_type IN ('ECONOMY', 'SMALL')
      AND regexp_matches(p_brand, '^Brand#[0-9]$')
      AND p_name LIKE '%re%'
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate catalog: between / isin / regex fullmatch / substring
    (reference P11-P14, scripts/clean_airports_it.py:43-45,
    scripts/istat_utils.py:47-49). All push down to the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 40)
        & F.col("p_type").isin("ECONOMY", "SMALL")
        & F.col("p_brand").rlike("^Brand#[0-9]$")
        & F.col("p_name").contains("re")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "fuzzy_name_match",
    oracle="""
    SELECT s_suppkey, s_name, c_name,
           CAST(levenshtein(s_name, c_name) AS BIGINT) AS edit_distance
    FROM (
        SELECT s_suppkey, s_name, c_name,
               row_number() OVER (
                   PARTITION BY s_suppkey
                   ORDER BY levenshtein(s_name, c_name), c_custkey
               ) AS rn
        FROM supplier
        JOIN customer ON c_custkey BETWEEN s_suppkey * 10 AND s_suppkey * 10 + 9
    ) WHERE rn = 1
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein fuzzy matching — the edit-distance fallback a name
    merge cascade reaches for after exact/alias keys miss (extends the
    reference's normalized-key joins, J4/J5). The candidate set is
    banded (10 customers per supplier) so the quadratic distance stays
    bounded, the same banding discipline as the LSH operators."""
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    joined = sup.join(
        cust,
        F.col("c_custkey").between(
            F.col("s_suppkey") * 10, F.col("s_suppkey") * 10 + 9
        ),
    )
    w = Window.partitionBy("s_suppkey").orderBy(
        F.levenshtein("s_name", "c_name"), F.asc("c_custkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_suppkey",
            "s_name",
            "c_name",
            F.levenshtein("s_name", "c_name").cast("long").alias("edit_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Merged catalog entries (driver scores <=50 queries): each entry
# below either composes the remaining transforms above or inlines the
# r1 constituent expressions into one single-scan hash-checked
# projection (see each docstring for the subsumed queries).
# ---------------------------------------------------------------------------


@query(
    "nation_text_recode",
    oracle=f"""
    SELECT n.n_nationkey, n.n_name,
           translate(lower(n.n_name), 'aio', 'àîò') AS accented,
           {_FOLD_SQL.format(c="translate(lower(n.n_name), 'aio', 'àîò')")} AS folded,
           {_SLUG_SQL.format(c="translate(lower(n.n_name), 'aio', 'àîò')")} AS slug,
           CASE n.n_nationkey % 5
               WHEN 0 THEN 'nord-ovest' WHEN 1 THEN 'nord-est'
               WHEN 2 THEN 'centro' WHEN 3 THEN 'sud'
               ELSE 'isole' END AS macro_area
    FROM nation n
    """,
)
def nation_text_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged text-normalization catalog over nation: accent folding +
    slugify (F1/F2, reference scripts/build_hotels_yaml.py:20-33) and
    literal dict-map recode (F11/F3,
    scripts/rebuild_and_merge_cities_it.py:19-70). Constituents:
    accent_fold_slug + dict_recode above."""
    folded = accent_fold_slug(spark, sf_dir)
    recoded = dict_recode(spark, sf_dir)
    return recoded.join(folded, "n_name").select(
        "n_nationkey", "n_name", "accented", "folded", "slug", "macro_area"
    )


@query(
    "order_string_parsing",
    oracle="""
    SELECT o_orderkey,
           'rilevazione ' || extract(year FROM o_orderdate) || ' prov' AS period,
           CAST(regexp_extract(
               'rilevazione ' || extract(year FROM o_orderdate) || ' prov',
               '((?:19|20)\\d{2})', 1) AS BIGINT) AS year,
           locale_str,
           TRY_CAST(replace(replace(regexp_replace(locale_str,
               '[\\s\\x{00A0}]', '', 'g'), '.', ''), ',', '.') AS DOUBLE) AS parsed
    FROM (
        SELECT o_orderkey, o_orderdate,
               chr(160) || translate(format('{:,}',
                   CAST(floor(o_totalprice) AS BIGINT)), ',', '.')
                 || ',' || split_part(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     AS VARCHAR), '.', 2) AS locale_str
        FROM orders
    )
    """,
)
def order_string_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-order string parsing: year extraction from period
    strings (F4, scripts/merge_cities_all.py:30-33) + locale-aware
    numeric round-trip (F5, scripts/istat_utils.py:39-45).
    Subsumes the r1 queries year_extract +
    locale_numeric_roundtrip in one scan with zero shuffles — a
    per-row self-join on o_orderkey would scan and shuffle orders
    twice for no semantic gain."""
    orders = load_table(spark, sf_dir, "orders")
    period = F.concat(
        F.lit("rilevazione "), F.year("o_orderdate").cast("string"), F.lit(" prov")
    )
    int_grouped = F.format_number(F.floor("o_totalprice").cast("long"), 0)
    frac = F.split_part(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.lit("."),
        F.lit(2),
    )
    locale_str = F.concat(
        F.lit(" "), F.translate(int_grouped, ",", "."), F.lit(","), frac
    )
    return orders.select(
        "o_orderkey",
        period.alias("period"),
        F.regexp_extract(period, r"((?:19|20)\d{2})", 1).cast("long").alias("year"),
        locale_str.alias("locale_str"),
        locale_numeric(locale_str).alias("parsed"),
    )


@query(
    "part_string_parsing",
    oracle="""
    SELECT p_partkey,
           raw_stars,
           TRY_CAST(nullif(regexp_extract(replace(raw_stars, '★', ''),
               '([0-5](?:\\.\\d)?)', 1), '') AS DOUBLE) AS stars,
           wkt,
           TRY_CAST(regexp_extract(wkt,
               'POINT \\(([-0-9.]+) ([-0-9.]+)\\)', 2) AS DOUBLE) AS lat,
           TRY_CAST(regexp_extract(wkt,
               'POINT \\(([-0-9.]+) ([-0-9.]+)\\)', 1) AS DOUBLE) AS lon
    FROM (
        SELECT p_partkey,
               CASE WHEN p_partkey % 7 = 0 THEN '★★★'
                    ELSE 'hotel ' || (p_partkey % 6) || '*' END AS raw_stars,
               'POINT (' || (p_partkey % 360 - 180) || ' '
                         || (p_partkey % 180 - 90) || ')' AS wkt
        FROM part
    )
    """,
)
def part_string_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-part string parsing: stars incl. the reference's
    '★★★ -> NaN' quirk (F6, scripts/build_hotels_yaml.py:83-87) + WKT
    POINT lat/lon extraction (F7, build_hotels_yaml.py:46-54).
    Subsumes the r1 queries stars_parse + wkt_point_parse in one
    scan with zero shuffles instead of a self-join on p_partkey."""
    part = load_table(spark, sf_dir, "part")
    raw = F.when(F.col("p_partkey") % 7 == 0, F.lit("★★★")).otherwise(
        F.concat(F.lit("hotel "), (F.col("p_partkey") % 6).cast("string"), F.lit("*"))
    )
    extracted = F.regexp_extract(
        F.regexp_replace(raw, "★", ""), r"([0-5](?:\.\d)?)", 1
    )
    wkt = F.concat(
        F.lit("POINT ("),
        (F.col("p_partkey") % 360 - 180).cast("string"),
        F.lit(" "),
        (F.col("p_partkey") % 180 - 90).cast("string"),
        F.lit(")"),
    )
    pat = r"POINT \(([-0-9.]+) ([-0-9.]+)\)"
    return part.select(
        "p_partkey",
        raw.alias("raw_stars"),
        F.nullif(extracted, F.lit("")).try_cast("double").alias("stars"),
        wkt.alias("wkt"),
        F.regexp_extract(wkt, pat, 2).try_cast("double").alias("lat"),
        F.regexp_extract(wkt, pat, 1).try_cast("double").alias("lon"),
    )


@query(
    "customer_profile",
    oracle=f"""
    WITH scored AS (
        SELECT c_custkey, c_mktsegment,
               round(CASE WHEN (hi - lo) < 1e-9 THEN 0.5
                     ELSE least(1.0, greatest(0.0, (c_acctbal - lo) / (hi - lo)))
                     END, 6) AS bal_norm,
               round(100 * (0.65 * (CASE WHEN (hi - lo) < 1e-9 THEN 0.5
                     ELSE least(1.0, greatest(0.0, (c_acctbal - lo) / (hi - lo)))
                     END) + 0.35 * (c_nationkey / 24.0)), 6) AS score
        FROM (
            SELECT *, min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS lo,
                      max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS hi
            FROM customer
        )
    ),
    geo AS (
        SELECT c_custkey, lat, lon,
               round(2.0 * 6371.0088 * asin(sqrt(
                   pow(sin(radians(41.9 - lat) / 2), 2)
                   + cos(radians(lat)) * cos(radians(41.9))
                     * pow(sin(radians(12.5 - lon) / 2), 2)
               )), 4) AS dist_km
        FROM (
            SELECT c_custkey,
                   (c_custkey % 17000) / 100.0 - 85.0 AS lat,
                   ((c_custkey * 7) % 36000) / 100.0 - 180.0 AS lon
            FROM customer
        )
    ),
    ids AS (
        SELECT c_custkey,
               concat_ws('-', CAST(c_custkey AS VARCHAR),
                   {_SLUG_SQL.format(c="c_name")},
                   lpad(CAST(c_nationkey AS VARCHAR), 6, '0')) AS synth_id,
               CASE WHEN c_custkey % 5 = 4 THEN '4 e più componenti'
                    ELSE (c_custkey % 5 + 1) || ' componenti' END AS raw_comp
        FROM customer
    ),
    latest AS (
        SELECT o_custkey, o_orderkey AS last_orderkey,
               o_orderdate AS last_orderdate, o_totalprice AS last_totalprice
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT s.c_custkey, s.c_mktsegment, s.bal_norm, s.score,
           g.lat, g.lon, g.dist_km,
           i.synth_id, i.raw_comp,
           CASE WHEN i.raw_comp LIKE '%più%' THEN 4.5
                ELSE TRY_CAST(nullif(regexp_extract(i.raw_comp, '(\\d+)', 1), '')
                     AS DOUBLE) END AS comp_n,
           l.last_orderkey, l.last_orderdate, l.last_totalprice
    FROM scored s
    JOIN geo g ON g.c_custkey = s.c_custkey
    JOIN ids i ON i.c_custkey = s.c_custkey
    LEFT JOIN latest l ON l.o_custkey = s.c_custkey
    """,
)
def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-customer enrichment ('customer 360'): min-max
    normalized weighted score (P8/P9, reference
    spark/kafka_to_metrics.py:478-495), haversine distance-to-hub (F8,
    scripts/build_hotels_yaml.py:36-42), synthesized IDs (F14/F10,
    build_hotels_yaml.py:286-291), household component-count parsing
    (F9, scripts/clean_istat_famiglie.py:9-14), and latest-order-per-key
    dedup (T3, scripts/rebuild_and_merge_cities_it.py:164).
    Subsumes the r1 queries customer_score /
    customer_distance_to_hub / synthesized_ids / component_count_parse
    / latest_order_per_customer (the latter still a live transform in
    relational_queries), computed in ONE customer
    scan + one per-segment window + one left join — joining the four
    per-row constituents on c_custkey would scan and shuffle customer
    four times for no semantic gain (plan-audited: 5 scans + 12
    exchanges down to 2 + 3)."""
    from travelpulse_spark_stream_tourism_analytics_spark.plans.relational_queries import (  # noqa: E501
        latest_order_per_customer,
    )

    cust = load_table(spark, sf_dir, "customer")
    # customer_score expressions (window min-max per segment)
    w = Window.partitionBy("c_mktsegment")
    lo = F.min("c_acctbal").over(w)
    hi = F.max("c_acctbal").over(w)
    norm = minmax_norm(F.col("c_acctbal"), lo, hi)
    score = F.lit(100) * (
        F.lit(0.65) * norm + F.lit(0.35) * (F.col("c_nationkey") / F.lit(24.0))
    )
    # customer_distance_to_hub expressions
    lat = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon = ((F.col("c_custkey") * 7) % 36000) / 100.0 - 180.0
    dist = haversine_km(lat, lon, F.lit(41.9), F.lit(12.5))
    # component_count_parse expressions
    raw_comp = F.when(
        F.col("c_custkey") % 5 == 4, F.lit("4 e più componenti")
    ).otherwise(
        F.concat((F.col("c_custkey") % 5 + 1).cast("string"), F.lit(" componenti"))
    )
    comp_n = F.when(raw_comp.contains("più"), F.lit(4.5)).otherwise(
        F.nullif(F.regexp_extract(raw_comp, r"(\d+)", 1), F.lit("")).try_cast(
            "double"
        )
    )
    profile = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(norm, 6).alias("bal_norm"),
        F.round(score, 6).alias("score"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.round(dist, 4).alias("dist_km"),
        # synthesized_ids expressions
        F.concat_ws(
            "-",
            F.col("c_custkey").cast("string"),
            slugify(F.col("c_name")),
            F.lpad(F.col("c_nationkey").cast("string"), 6, "0"),
        ).alias("synth_id"),
        raw_comp.alias("raw_comp"),
        comp_n.alias("comp_n"),
    )
    latest = latest_order_per_customer(spark, sf_dir)
    return profile.join(
        latest, profile["c_custkey"] == latest["o_custkey"], "left"
    ).select(
        "c_custkey", "c_mktsegment", "bal_norm", "score",
        "lat", "lon", "dist_km", "synth_id", "raw_comp", "comp_n",
        "last_orderkey", "last_orderdate", "last_totalprice",
    )
