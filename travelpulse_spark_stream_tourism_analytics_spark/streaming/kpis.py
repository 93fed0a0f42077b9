"""The KPI catalog of the reference streaming job, as pure
``DataFrame -> DataFrame`` transforms.

Each function runs identically on a parsed batch DataFrame (for
deterministic fixture tests) and on a parsed streaming DataFrame (for
production) — the key architectural difference from the reference,
which fuses query logic into driver-side push closures
(SURVEY.md §7.0). Reference sites cited per function.

Semantic upgrade over the reference: top-N is computed per window
(`per_window_topn`) instead of a global orderBy+limit that mixes
windows within a micro-batch (documented quirk, SURVEY.md §4.3 item 2,
reference spark/kafka_to_metrics.py:293-301).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import add_season

MINUTE = "1 minute"
DAYS_30 = "30 days"
DAYS_365 = "365 days"


def ingest_counter(df: DataFrame) -> DataFrame:
    """Records per trigger (reference spark/kafka_to_metrics.py:216-221)."""
    return df.select(F.lit(1).alias("one")).groupBy().agg(
        F.count("one").alias("records_in_trigger")
    )


def weather_minute_counts(weather_ing: DataFrame, size: str = MINUTE) -> DataFrame:
    """(reference :224-225)"""
    return weather_ing.groupBy(F.window("ingest_time", size)).agg(
        F.count(F.lit(1)).alias("weather_count")
    )


def flight_minute_counts(flights_ing: DataFrame, size: str = MINUTE) -> DataFrame:
    """Counts + cancellations + null-aware delay avg (reference :227-231)."""
    return flights_ing.groupBy(F.window("ingest_time", size)).agg(
        F.count(F.lit(1)).alias("flights_count"),
        F.sum(F.when(F.col("status") == "cancelled", 1).otherwise(0)).alias(
            "flights_cancelled"
        ),
        F.avg(F.when(F.col("delay_min").isNotNull(), F.col("delay_min"))).alias(
            "avg_delay_min"
        ),
    )


def booking_minute_counts(bookings_ing: DataFrame, size: str = MINUTE) -> DataFrame:
    """(reference :233-235)"""
    return bookings_ing.groupBy(F.window("ingest_time", size)).agg(
        F.count(F.lit(1)).alias("bookings_count"),
        F.avg("adr_proxy").alias("avg_adr"),
    )


def airport_flow(flights_ing: DataFrame, direction: str, size: str = MINUTE) -> DataFrame:
    """Per-airport inbound/outbound per window (reference :237-244)."""
    src = "destination_iata" if direction == "inbound" else "origin_iata"
    return flights_ing.groupBy(
        F.window("ingest_time", size), F.col(src).alias("airport")
    ).agg(F.count(F.lit(1)).alias(direction))


def arrivals_today(bookings_enriched: DataFrame, as_of: Column | None = None) -> DataFrame:
    """'Today' snapshot (reference :265-269) with an injectable clock
    (`as_of`) — required for deterministic tests (SURVEY.md §7.3)."""
    today = as_of if as_of is not None else F.current_date()
    return (
        bookings_enriched.filter(F.col("arrival_day") == today)
        .groupBy("city_id", "city_name")
        .agg(
            F.count(F.lit(1)).alias("arrivals_today"),
            F.sum("spend_eur").alias("spend_today_eur"),
        )
    )


def city_bookings_windowed(
    bookings: DataFrame, ts_col: str, size: str, alias: str
) -> DataFrame:
    """Per-(window, city) booking counts — the 1m/30d/365d family
    (reference :287-290 minute on ingest_time, :303-311 rollups on
    event_time)."""
    return bookings.groupBy(
        F.window(ts_col, size), "city_id", "city_name"
    ).agg(F.count(F.lit(1)).alias(alias))


def month_rollup(bookings_evt: DataFrame, size: str = DAYS_365) -> DataFrame:
    """(reference :325-333)"""
    b = bookings_evt.withColumn("arr_month", F.month("arrival_day"))
    return b.groupBy(F.window("event_time", size), "arr_month").agg(
        F.count(F.lit(1)).alias("bookings_m"),
        F.sum("spend_eur").alias("spend_m_eur"),
    )


def season_rollup(bookings_evt: DataFrame, size: str = DAYS_365) -> DataFrame:
    """(reference :346-355)"""
    b = add_season(bookings_evt, F.col("arrival_day"))
    return b.groupBy(F.window("event_time", size), "season").agg(
        F.count(F.lit(1)).alias("bookings_s"),
        F.sum("spend_eur").alias("spend_s_eur"),
    )


def geo_enrich(city_counts: DataFrame, city_dim: DataFrame) -> DataFrame:
    """Stream-static broadcast left join + label fallback (reference
    J1, :396-400)."""
    return city_counts.join(F.broadcast(city_dim), on="city_id", how="left").withColumn(
        "g_name_final",
        F.when(F.col("g_name").isNotNull(), F.col("g_name")).otherwise(
            F.col("city_name")
        ),
    )


def per_window_topn(df: DataFrame, value_col: str, n: int, *extra_keys: str) -> DataFrame:
    """Top-N *within each window* — the in-engine replacement for the
    reference's driver-side orderBy+limit and PromQL topk
    (SURVEY.md §3.1 consequence). Tiebreak on the remaining grouping
    keys keeps it deterministic."""
    from pyspark.sql.window import Window

    order = [F.desc(value_col)] + [F.asc(k) for k in extra_keys]
    w = Window.partitionBy("window").orderBy(*order)
    return (
        df.withColumn("rank_in_window", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_window") <= n)
    )


# ---------------------------------------------------------------------------
# Season score (reference :419-507) — the most complex query: three
# per-(window, city, season) aggregations joined, per-(window, city)
# percentiles joined back, min-max indexes, weighted score.
# ---------------------------------------------------------------------------


def _minmax_norm(x: Column, lo: Column, hi: Column) -> Column:
    """Reference's guard: denom <= 1e-9 -> 0.5 (reference :478-481).

    Deliberately distinct from functions.numeric.minmax_norm (engine
    utility, strict `< eps` guard): this one is expression-level parity
    with the reference's season-score math, boundary inclusive."""
    denom = hi - lo
    return F.when(denom <= F.lit(1e-9), F.lit(0.5)).otherwise(
        F.least(F.greatest((x - lo) / denom, F.lit(0.0)), F.lit(1.0))
    )


def season_city_stats(
    bookings_evt: DataFrame,
    weather_evt: DataFrame,
    flights_evt: DataFrame,
    size: str = DAYS_365,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three (window, city_id, season) aggregations
    (reference :424-448). flights_evt must already have
    destination_city_id renamed to city_id (reference :213)."""
    w = add_season(weather_evt, F.to_date("event_time"))
    f = add_season(flights_evt, F.to_date("event_time"))
    b = add_season(bookings_evt, F.col("arrival_day"))

    flights_cs = (
        f.groupBy(F.window("event_time", size), "city_id", "season")
        .agg(
            F.count(F.lit(1)).alias("flights_total"),
            F.sum(F.when(F.col("status") == "cancelled", 1).otherwise(0)).alias(
                "flights_cancelled"
            ),
            F.avg("delay_min").alias("delay_avg"),
        )
        .withColumn(
            "cancel_rate",
            F.when(
                F.col("flights_total") > 0,
                F.col("flights_cancelled") / F.col("flights_total"),
            ).otherwise(F.lit(0.0)),
        )
    )
    weather_cs = w.groupBy(F.window("event_time", size), "city_id", "season").agg(
        F.avg((F.col("t_max") + F.col("t_min")) / 2.0).alias("t_avg"),
        F.avg("precip_mm").alias("precip_avg"),
    )
    bookings_cs = b.groupBy(
        F.window("event_time", size), "city_id", "season", "city_name"
    ).agg(
        F.count(F.lit(1)).alias("bookings"),
        F.avg("adr_proxy").alias("adr_avg"),
    )
    return bookings_cs, weather_cs, flights_cs


def season_score(
    bookings_cs: DataFrame, weather_cs: DataFrame, flights_cs: DataFrame
) -> DataFrame:
    """Join + percentiles + indexes + weighted score (reference
    :451-507, exact expression parity incl. percentile_approx and the
    0.40/0.35/0.15/0.10 weights)."""
    cs_join = bookings_cs.join(
        weather_cs, on=["window", "city_id", "season"], how="left"
    ).join(flights_cs, on=["window", "city_id", "season"], how="left")

    pct = cs_join.groupBy("window", "city_id").agg(
        *[
            F.expr(f"percentile_approx({m}, {q})").alias(f"{a}_p{int(q * 100)}")
            for m, a in [
                ("adr_avg", "adr"),
                ("bookings", "book"),
                ("precip_avg", "rain"),
                ("cancel_rate", "cancel"),
                ("delay_avg", "delay"),
            ]
            for q in (0.10, 0.90)
        ]
    )
    cs = cs_join.join(pct, on=["window", "city_id"], how="left")

    price_idx = F.lit(1.0) - _minmax_norm(
        F.col("adr_avg"), F.col("adr_p10"), F.col("adr_p90")
    )
    crowd_idx = F.lit(1.0) - _minmax_norm(
        F.col("bookings"), F.col("book_p10"), F.col("book_p90")
    )
    temp_penalty = F.least(
        F.abs(F.coalesce(F.col("t_avg"), F.lit(21.0)) - F.lit(21.0)) / F.lit(12.0),
        F.lit(1.0),
    )
    rain_norm = _minmax_norm(
        F.coalesce(F.col("precip_avg"), F.lit(0.0)),
        F.col("rain_p10"),
        F.col("rain_p90"),
    )
    weather_idx = F.lit(1.0) - (F.lit(0.6) * temp_penalty + F.lit(0.4) * rain_norm)
    cancel_norm = _minmax_norm(
        F.coalesce(F.col("cancel_rate"), F.lit(0.0)),
        F.col("cancel_p10"),
        F.col("cancel_p90"),
    )
    delay_norm = _minmax_norm(
        F.coalesce(F.col("delay_avg"), F.lit(0.0)),
        F.col("delay_p10"),
        F.col("delay_p90"),
    )
    reliab_idx = F.lit(1.0) - (F.lit(0.7) * cancel_norm + F.lit(0.3) * delay_norm)
    score = F.lit(100.0) * (
        F.lit(0.40) * price_idx
        + F.lit(0.35) * weather_idx
        + F.lit(0.15) * crowd_idx
        + F.lit(0.10) * reliab_idx
    )
    return cs.select(
        "window",
        "city_id",
        "season",
        "city_name",
        price_idx.alias("price_idx"),
        weather_idx.alias("weather_idx"),
        crowd_idx.alias("crowd_idx"),
        reliab_idx.alias("reliab_idx"),
        score.alias("season_score"),
    )


def chained_window_rollup(
    df: DataFrame, ts_col: str, inner: str = MINUTE, outer: str = "10 minutes"
) -> DataFrame:
    """TWO chained stateful aggregations in ONE streaming query —
    per-inner-window counts re-aggregated into outer windows via
    window-of-window (Spark 3.4+ multiple-stateful-operators, the
    capability SURVEY.md §3.2 flags as the season score's blocker;
    this is option (a) where the restricted form applies, the
    two-phase pipeline being option (b) for the general case).

    Append mode + a watermark on ts_col are required: inner windows
    only flow to the outer aggregation once the watermark closes them.
    """
    inner_agg = df.groupBy(F.window(ts_col, inner)).agg(
        F.count(F.lit(1)).alias("n_inner")
    )
    return (
        inner_agg.groupBy(F.window(F.col("window"), outer))
        .agg(
            F.sum("n_inner").alias("n_events"),
            F.max("n_inner").alias("max_per_inner"),
            F.count(F.lit(1)).alias("n_inner_windows"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "max_per_inner",
            "n_inner_windows",
        )
    )


def booking_flight_interval_join(
    bookings_evt: DataFrame,
    flights_evt: DataFrame,
    max_gap: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Row-level stream-stream join: bookings matched to flights into
    the same city within ±max_gap of event time — the join class the
    reference lacks entirely (SURVEY.md §2.8: 'stream-stream row-level
    joins (only agg-level)' absent).

    Both sides need watermarks; the time-range predicate is what lets
    Spark bound join state (rows age out once the other side's
    watermark passes event_time + max_gap). flights_evt must have
    destination_city_id already renamed to city_id.

    ``how='left_outer'`` additionally emits each UNMATCHED booking once
    — with NULL flight columns — but only after the GLOBAL watermark
    (the MIN across both inputs, Spark's multipleWatermarkPolicy
    default) passes ``b_time + max_gap``; a drained availableNow run
    holds not-yet-expired unmatched rows in checkpointed state and a
    later run flushes them once BOTH sides' watermarks advance (pinned
    in tests/test_streaming.py).
    """
    b = bookings_evt.select(
        F.col("city_id"),
        F.col("booking_id"),
        F.col("event_time").alias("b_time"),
        F.col("spend_eur"),
    ).withWatermark("b_time", "45 seconds")
    f = flights_evt.select(
        F.col("city_id").alias("f_city_id"),
        F.col("flight_id"),
        F.col("event_time").alias("f_time"),
        F.col("status").alias("flight_status"),
    ).withWatermark("f_time", "45 seconds")
    cond = (
        (F.col("city_id") == F.col("f_city_id"))
        & (F.col("b_time") >= F.col("f_time") - F.expr(f"INTERVAL {max_gap}"))
        & (F.col("b_time") <= F.col("f_time") + F.expr(f"INTERVAL {max_gap}"))
    )
    return b.join(f, cond, how).select(
        "city_id", "booking_id", "flight_id", "b_time", "f_time",
        "spend_eur", "flight_status",
    )
