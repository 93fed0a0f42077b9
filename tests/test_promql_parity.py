"""PromQL re-aggregation parity (VERDICT r3 item 8, SURVEY §3.1 step 10).

The reference's dashboards re-aggregate the pushed gauges with PromQL
(`Demo/Dashboard Grafana.JSON`, README.md:64-147):

  1. topk(10, sum without(instance, job)
            (tourism_airport_flights_per_min{direction=...}))
  2. sum without(instance, job)(tourism_flight_msgs_per_min)
  3. topk(10, tourism_city_bookings_top{period=...})
  4. sum by (city_id, city_name, lat, lon)(tourism_city_bookings_geo)

This family drives the ENGINE's mappers end to end — KPI transform ->
MetricDict -> Prometheus text exposition -> parse back as scraped
samples (with the instance/job labels the scrape layer attaches) ->
a faithful PromQL-subset evaluation — and asserts the serving-layer
result equals the engine's own in-engine per-window top-N. That pins
the one observable surface of the reference that previously had only
indirect evidence: what Grafana computes from our pushes matches what
the engine computed.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.streaming import kpis
from travelpulse_spark_stream_tourism_analytics_spark.streaming.pipeline import (
    map_airports_top,
    map_batch_counts,
    map_city_geomap,
    map_city_topn,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
    format_prometheus,
)

# --- a faithful PromQL-subset evaluator over scraped samples -------------

_LINE = re.compile(r'^(\w+)(?:\{(.*)\})? (.+)$')
_LABEL = re.compile(r'(\w+)="((?:[^"\\]|\\.)*)"')


def scrape(text: str, instance: str, job: str):
    """Parse exposition text into samples, attaching the instance/job
    labels Prometheus adds at scrape time."""
    samples = []
    for line in text.strip().splitlines():
        m = _LINE.match(line)
        assert m, line
        name, labelstr, value = m.groups()
        labels = {
            k: v.replace('\\"', '"').replace("\\n", "\n").replace("\\\\", "\\")
            for k, v in _LABEL.findall(labelstr or "")
        }
        labels["instance"], labels["job"] = instance, job
        samples.append((name, labels, float(value)))
    return samples


def _select(samples, name, matchers):
    return [
        (labels, v)
        for n, labels, v in samples
        if n == name and all(labels.get(k) == mv for k, mv in matchers.items())
    ]


def sum_without(samples, name, drop, **matchers):
    """sum without(<drop>)(name{matchers}) -> {label_tuple: value}."""
    out = {}
    for labels, v in _select(samples, name, matchers):
        key = tuple(sorted((k, lv) for k, lv in labels.items() if k not in drop))
        out[key] = out.get(key, 0.0) + v
    return out


def sum_by(samples, name, keep, **matchers):
    out = {}
    for labels, v in _select(samples, name, matchers):
        key = tuple(sorted((k, labels.get(k)) for k in keep))
        out[key] = out.get(key, 0.0) + v
    return out


def topk(k, series):
    """PromQL topk over a sum_* result; ties break on the label tuple
    (the engine's per_window_topn uses the analogous key tiebreak)."""
    return sorted(series.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


# --- fixtures ------------------------------------------------------------

_T0 = "2024-06-01 10:00:"


@pytest.fixture()
def flights(spark):
    # 12 airports with DISTINCT inbound counts (1..12) so top-10 has no
    # boundary ties; outbound is the reverse ranking. All within one
    # minute -> a single window.
    rows = []
    airports = [f"AP{i:02d}" for i in range(12)]
    k = 0
    for i, ap in enumerate(airports):
        for _ in range(i + 1):  # i+1 arrivals into ap
            rows.append(
                (f"{_T0}{k % 60:02d}", airports[(i + 5) % 12], ap, "landed", 3)
            )
            k += 1
    return spark.createDataFrame(
        rows,
        "ingest_time string, origin_iata string, destination_iata string,"
        " status string, delay_min int",
    ).withColumn("ingest_time", F.col("ingest_time").cast("timestamp"))


@pytest.fixture()
def bookings(spark):
    # 8 cities with distinct booking counts.
    rows = []
    k = 0
    for c in range(8):
        for _ in range(2 * c + 1):
            rows.append(
                (f"{_T0}{k % 60:02d}", c, f"City{c}", 100.0 + c)
            )
            k += 1
    return spark.createDataFrame(
        rows,
        "ingest_time string, city_id int, city_name string,"
        " adr_proxy double",
    ).withColumn("ingest_time", F.col("ingest_time").cast("timestamp"))


# --- the parity family ---------------------------------------------------


def test_airport_topk_sum_without_parity(spark, flights):
    """Family 1: topk(10, sum without(instance,job)(
    tourism_airport_flights_per_min{direction})) == the engine's
    per-window top-10 for both directions."""
    for direction in ("inbound", "outbound"):
        flow = kpis.airport_flow(flights, direction)
        pushed = format_prometheus(map_airports_top(flow, direction))
        samples = scrape(pushed, "pushgw:9091", "spark_metrics")

        served = topk(
            10,
            sum_without(
                samples,
                "tourism_airport_flights_per_min",
                {"instance", "job"},
                direction=direction,
            ),
        )
        engine = kpis.per_window_topn(flow, direction, 10, "airport").collect()
        assert len(engine) == 10
        expect = [
            (
                (("airport", r["airport"]), ("direction", direction)),
                float(r[direction]),
            )
            for r in sorted(engine, key=lambda r: r["rank_in_window"])
        ]
        assert served == expect


def test_flights_total_sum_without_two_instances(spark, flights):
    """Family 2 (the stat panel): two scrape instances each push their
    partition's gauge; sum without(instance, job) must equal the
    engine's count over the full stream."""
    a = flights.filter(F.col("destination_iata") < "AP06")
    b = flights.filter(F.col("destination_iata") >= "AP06")
    samples = []
    for part, inst, job in ((a, "gw-a:9091", "spark_a"), (b, "gw-b:9091", "spark_b")):
        pushed = format_prometheus(
            map_batch_counts(kpis.flight_minute_counts(part))
        )
        samples += scrape(pushed, inst, job)

    total = sum_without(samples, "tourism_flight_msgs_per_min", {"instance", "job"})
    assert total == {(): float(flights.count())}


def test_city_leaderboard_periods_parity(spark, bookings):
    """Family 3: topk(10, tourism_city_bookings_top{period}) for the
    1m/30d/365d leaderboard family equals the engine ranking."""
    samples = []
    for size, alias, period in (
        ("1 minute", "bookings_1m", "1m"),
        ("30 days", "bookings_30d", "30d"),
        ("365 days", "bookings_365d", "365d"),
    ):
        counts = kpis.city_bookings_windowed(bookings, "ingest_time", size, alias)
        pushed = format_prometheus(map_city_topn(counts, alias, period))
        samples += scrape(pushed, "pushgw:9091", "spark_metrics")

    for size, alias, period in (
        ("1 minute", "bookings_1m", "1m"),
        ("30 days", "bookings_30d", "30d"),
        ("365 days", "bookings_365d", "365d"),
    ):
        counts = kpis.city_bookings_windowed(bookings, "ingest_time", size, alias)
        engine = kpis.per_window_topn(counts, alias, 10, "city_id").collect()
        served = topk(
            10,
            sum_without(
                samples,
                "tourism_city_bookings_top",
                {"instance", "job", "city_name"},
                period=period,
            ),
        )
        expect = [
            ((("city_id", str(r["city_id"])), ("period", period)), float(r[alias]))
            for r in sorted(engine, key=lambda r: r["rank_in_window"])
        ]
        assert served == expect


def test_geomap_sum_by_parity(spark, bookings):
    """Family 4: sum by (city_id, city_name, lat, lon)
    (tourism_city_bookings_geo) equals the engine's geo-enriched
    per-window counts (label-escaping round-trip included: one city
    name carries a quote and a backslash)."""
    dim_rows = [
        (c, f'Geo"{c}\\', 40.0 + c, 9.0 + c) for c in range(8)
    ]
    dim = spark.createDataFrame(
        dim_rows, "city_id int, g_name string, g_lat double, g_lon double"
    )
    counts = kpis.city_bookings_windowed(
        bookings, "ingest_time", "1 minute", "bookings"
    )
    enriched = kpis.geo_enrich(counts, dim)
    pushed = format_prometheus(map_city_geomap(enriched))
    samples = scrape(pushed, "pushgw:9091", "spark_metrics")

    served = sum_by(
        samples,
        "tourism_city_bookings_geo",
        ["city_id", "city_name", "lat", "lon"],
    )
    engine = kpis.per_window_topn(enriched, "bookings", 10, "city_id").collect()
    expect = {
        (
            ("city_id", str(r["city_id"])),
            ("city_name", r["g_name_final"]),
            ("lat", f"{float(r['g_lat']):.5f}"),
            ("lon", f"{float(r['g_lon']):.5f}"),
        ): float(r["bookings"])
        for r in engine
    }
    assert served == expect
