"""Streaming semantics tests: dual-clock repair, stream/batch parity,
per-window top-N, Prometheus formatting, two-phase season score."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.schemas import (
    BOOKING_SCHEMA,
    FLIGHT_SCHEMA,
    WEATHER_SCHEMA,
    WIRE_SCHEMA,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming import kpis
from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import (
    enrich_bookings,
    parse_events,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.pipeline import (
    TwoPhaseSeasonScore,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.simulator import (
    simulate,
    write_wire_fixture,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
    MemoryMetricSink,
    format_prometheus,
    start_query,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
    file_batch,
    file_stream,
)

START = dt.datetime(2024, 6, 1)


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wire")
    events = simulate(START, n_days=3, events_per_day=40, seed=7)
    dirs = {}
    for kind in ("weather", "flight", "booking"):
        d = root / kind
        write_wire_fixture(events[kind], str(d / "part-0.json"))
        dirs[kind] = str(d)
    return dirs


def test_parse_dual_clock_repair(spark):
    """Exact reference semantics (spark/kafka_to_metrics.py:181-188):
    NULL event_ts -> kafka_ts; ingest_ts NULL or earlier than kafka_ts
    -> kafka_ts."""
    k = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # (event_ts, ingest_ts) both fine and ingest >= kafka
        ("a", '{"event_ts":"2024-06-01T11:00:00Z","ingest_ts":"2024-06-01T12:00:05Z"}', k),
        # event_ts NULL -> falls back to kafka_ts
        ("b", '{"ingest_ts":"2024-06-01T12:00:05Z"}', k),
        # ingest_ts earlier than kafka_ts -> clamped to kafka_ts
        ("c", '{"event_ts":"2024-06-01T11:00:00Z","ingest_ts":"2024-06-01T11:59:00Z"}', k),
        # ingest_ts NULL -> kafka_ts
        ("d", '{"event_ts":"2024-06-01T11:00:00Z"}', k),
    ]
    df = spark.createDataFrame(rows, WIRE_SCHEMA)
    got = {
        r["key"]: (r["event_time"], r["ingest_time"])
        for r in parse_events(df, WEATHER_SCHEMA).collect()
    }
    eleven = dt.datetime(2024, 6, 1, 11, 0, 0)
    five_past = dt.datetime(2024, 6, 1, 12, 0, 5)
    assert got["a"] == (eleven, five_past)
    assert got["b"] == (k, five_past)
    assert got["c"] == (eleven, k)
    assert got["d"] == (eleven, k)


def test_prometheus_text_format():
    body = format_prometheus(
        {
            "tourism_flights_total_per_min": (None, 12),
            "tourism_city_bookings_top": ({"city_id": "1", "period": "1m"}, 3.5),
            "bad": (None, "not-a-number"),
        }
    )
    assert body == (
        "tourism_flights_total_per_min 12.0\n"
        'tourism_city_bookings_top{city_id="1",period="1m"} 3.5\n'
    )
    # A top-N push keys rows by name|discriminator but emits ONE metric
    # family with varying labels (the reference loses all but the last
    # row here — fixed quirk).
    topn = format_prometheus(
        {
            "tourism_city_bookings_top|1:1m": ({"city_id": "1"}, 5),
            "tourism_city_bookings_top|2:1m": ({"city_id": "2"}, 3),
        }
    )
    assert topn == (
        'tourism_city_bookings_top{city_id="1"} 5.0\n'
        'tourism_city_bookings_top{city_id="2"} 3.0\n'
    )


def _collecting_sink_rows(spark, stream_df, mode, tmp_path, name):
    """Run a streaming DF to completion (availableNow) capturing all
    emitted rows."""
    rows = []

    def grab(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = start_query(
        stream_df,
        name,
        str(tmp_path / f"chk_{name}"),
        grab,
        mode=mode,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    return rows


def test_stream_batch_parity_minute_counts(spark, fixture_dirs, tmp_path):
    """The same transform over readStream and read must agree — the
    architecture's core claim (SURVEY.md §7.0)."""
    stream_parsed = parse_events(
        file_stream(spark, fixture_dirs["flight"]), FLIGHT_SCHEMA
    ).withWatermark("ingest_time", "45 seconds")
    batch_parsed = parse_events(file_batch(spark, fixture_dirs["flight"]), FLIGHT_SCHEMA)

    got = _collecting_sink_rows(
        spark, kpis.flight_minute_counts(stream_parsed), "update", tmp_path, "fcnt"
    )
    want = kpis.flight_minute_counts(batch_parsed).collect()

    def key(r):
        return (r["window"]["start"], r["flights_count"], r["flights_cancelled"])

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0


def test_stream_batch_parity_city_bookings(spark, fixture_dirs, tmp_path):
    stream_parsed = enrich_bookings(
        parse_events(file_stream(spark, fixture_dirs["booking"]), BOOKING_SCHEMA)
    ).withWatermark("event_time", "45 seconds")
    batch_parsed = enrich_bookings(
        parse_events(file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA)
    )
    got = _collecting_sink_rows(
        spark,
        kpis.city_bookings_windowed(stream_parsed, "event_time", kpis.DAYS_30, "bookings_30d"),
        "update",
        tmp_path,
        "bcity",
    )
    want = kpis.city_bookings_windowed(
        batch_parsed, "event_time", kpis.DAYS_30, "bookings_30d"
    ).collect()
    key = lambda r: (r["window"]["start"], r["city_id"], r["bookings_30d"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_per_window_topn_does_not_mix_windows(spark):
    """The reference's global orderBy+limit mixes windows in one batch
    (documented quirk); per_window_topn must not."""
    w1 = {"start": dt.datetime(2024, 1, 1), "end": dt.datetime(2024, 1, 2)}
    w2 = {"start": dt.datetime(2024, 1, 2), "end": dt.datetime(2024, 1, 3)}
    df = spark.createDataFrame(
        [
            (w1, "a", 100), (w1, "b", 90), (w1, "c", 80),
            (w2, "x", 3), (w2, "y", 2), (w2, "z", 1),
        ],
        "window struct<start:timestamp,end:timestamp>, airport string, inbound long",
    )
    top2 = kpis.per_window_topn(df, "inbound", 2, "airport").collect()
    by_window = {}
    for r in top2:
        by_window.setdefault(r["window"]["start"], []).append(r["airport"])
    assert sorted(by_window[w1["start"]]) == ["a", "b"]
    assert sorted(by_window[w2["start"]]) == ["x", "y"]  # small window still top-2


def test_two_phase_season_score_matches_batch(spark, fixture_dirs, tmp_path):
    """Streaming two-phase orchestration == direct batch computation of
    the same math on the same inputs (SURVEY.md §4.3 option b)."""
    sink = MemoryMetricSink()
    scorer = TwoPhaseSeasonScore(spark, str(tmp_path / "staging"), sink, topn=10)

    streams = {}
    for kind, schema in [
        ("booking", BOOKING_SCHEMA),
        ("weather", WEATHER_SCHEMA),
        ("flight", FLIGHT_SCHEMA),
    ]:
        parsed = parse_events(file_stream(spark, fixture_dirs[kind]), schema)
        if kind == "booking":
            parsed = enrich_bookings(parsed)
        if kind == "flight":
            parsed = parsed.withColumnRenamed("destination_city_id", "city_id")
        streams[kind] = parsed.withWatermark("event_time", "45 seconds")

    qs = scorer.queries(
        streams["booking"], streams["weather"], streams["flight"],
        str(tmp_path / "chk"), trigger={"availableNow": True},
    )
    try:
        for q in qs:
            # availableNow drains in seconds normally; the return value
            # must be checked — on a slow machine an ignored timeout
            # means score_batch() reads INCOMPLETE staging and the
            # batch-parity assert fails with a confusing diff.
            assert q.awaitTermination(600), "streaming query did not drain"
    finally:
        for q in qs:
            if q.isActive:
                q.stop()

    got = {
        (r["city_id"], r["season"]): round(r["season_score"], 6)
        for r in scorer.score_batch().collect()
    }

    # Direct batch computation from the raw fixtures.
    b = enrich_bookings(
        parse_events(file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA)
    )
    w = parse_events(file_batch(spark, fixture_dirs["weather"]), WEATHER_SCHEMA)
    f = parse_events(
        file_batch(spark, fixture_dirs["flight"]), FLIGHT_SCHEMA
    ).withColumnRenamed("destination_city_id", "city_id")
    bcs, wcs, fcs = kpis.season_city_stats(b, w, f)
    want = {
        (r["city_id"], r["season"]): round(r["season_score"], 6)
        for r in kpis.season_score(bcs, wcs, fcs).collect()
    }
    assert got == want
    assert len(got) > 0
    for v in got.values():
        assert 0.0 <= v <= 100.0
    # And the sink actually received pushes from the streaming side.
    assert any("tourism_season_score" in k for k in sink.latest())


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys inside the watermark window must collapse."""
    import json as _json

    from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import (
        dedup_stream,
    )

    d = tmp_path / "dupwire"
    d.mkdir()
    with open(d / "f0.json", "w") as f:
        for i, (key, ts) in enumerate(
            [("a", "12:00:00"), ("a", "12:00:10"), ("b", "12:00:20"), ("a", "12:00:25")]
        ):
            f.write(
                _json.dumps(
                    {
                        "key": key,
                        "value": _json.dumps(
                            {"trace_id": key, "event_ts": f"2024-06-01T{ts}Z"}
                        ),
                        "kafka_ts": f"2024-06-01T{ts}.000Z",
                    }
                )
                + "\n"
            )
    parsed = parse_events(file_stream(spark, str(d)), WEATHER_SCHEMA).withWatermark(
        "event_time", "10 minutes"
    )
    got = _collecting_sink_rows(
        spark,
        dedup_stream(parsed, ["trace_id"]).select("trace_id"),
        "append",
        tmp_path,
        "dedupq",
    )
    assert sorted(r["trace_id"] for r in got) == ["a", "b"]


def test_exactly_once_parquet_sink(spark, fixture_dirs, tmp_path):
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
        start_parquet_sink,
    )

    # Append mode requires the watermark on the windowed column.
    parsed = parse_events(
        file_stream(spark, fixture_dirs["weather"]), WEATHER_SCHEMA
    ).withWatermark("ingest_time", "45 seconds")
    agg = kpis.weather_minute_counts(parsed)
    out = str(tmp_path / "sinkout")
    q = start_parquet_sink(
        agg, "pqsink", out, str(tmp_path / "chk_pq"), trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    # Append emits exactly the windows the final watermark
    # (max ingest_time - 45s) has closed; open windows stay in state.
    batch_parsed = parse_events(
        file_batch(spark, fixture_dirs["weather"]), WEATHER_SCHEMA
    )
    max_ing = batch_parsed.agg(F.max("ingest_time")).collect()[0][0]
    watermark = max_ing - dt.timedelta(seconds=45)
    want = (
        kpis.weather_minute_counts(batch_parsed)
        .filter(F.col("window.end") <= F.lit(watermark))
        .count()
    )
    assert back.count() == want  # closed windows committed exactly once
    assert want > 0


def test_parse_survives_malformed_wire_records(spark):
    """Corrupt/truncated JSON values must degrade to NULL fields with
    kafka_ts fallbacks, never fail the query (from_json permissive mode
    + dual-clock repair; reference parses the same way)."""
    k = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        ("ok", '{"event_ts":"2024-06-01T11:00:00Z","city_id":"1"}', k),
        ("truncated", '{"event_ts":"2024-06-01T11:0', k),
        ("not-json", "garbage%%%", k),
        ("empty", "", k),
        ("null-value", None, k),
        ("wrong-types", '{"t_min":"not-a-number","event_ts":42}', k),
    ]
    out = parse_events(
        spark.createDataFrame(rows, WIRE_SCHEMA), WEATHER_SCHEMA
    ).collect()
    assert len(out) == len(rows)  # nothing dropped, nothing raised
    by_key = {r["key"]: r for r in out}
    assert by_key["ok"]["event_time"] == dt.datetime(2024, 6, 1, 11, 0, 0)
    for key in ("truncated", "not-json", "empty", "null-value"):
        # unparseable -> event_ts NULL -> broker-timestamp fallback
        assert by_key[key]["event_time"] == k, key
        assert by_key[key]["ingest_time"] == k, key


def test_chained_stateful_window_rollup(spark, fixture_dirs, tmp_path):
    """Two stateful aggs chained in one streaming query (Spark 4
    multiple-stateful-operators) must match the batch computation for
    every outer window the final watermark closed."""
    stream_parsed = parse_events(
        file_stream(spark, fixture_dirs["booking"]), BOOKING_SCHEMA
    ).withWatermark("event_time", "45 seconds")
    got = _collecting_sink_rows(
        spark,
        kpis.chained_window_rollup(stream_parsed, "event_time"),
        "append",
        tmp_path,
        "chained",
    )
    batch_parsed = parse_events(
        file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA
    )
    max_evt = batch_parsed.agg(F.max("event_time")).collect()[0][0]
    watermark = max_evt - dt.timedelta(seconds=45)
    want = (
        kpis.chained_window_rollup(batch_parsed, "event_time")
        .filter(F.col("window_end") <= F.lit(watermark))
        .collect()
    )
    key = lambda r: (r["window_start"], r["n_events"], r["max_per_inner"], r["n_inner_windows"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0


def test_timewarp_clock_mapping():
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.simulator import (
        timewarp_clock,
    )

    sim_start = dt.datetime(2024, 1, 1)
    wall_start = dt.datetime(2026, 8, 13, 12, 0, 0)
    to_sim = timewarp_clock(sim_start, warp=500.0)
    # 60 wall seconds at 500x -> 30,000 simulated seconds
    assert to_sim(wall_start + dt.timedelta(seconds=60), wall_start) == (
        sim_start + dt.timedelta(seconds=30_000)
    )
    assert to_sim(wall_start, wall_start) == sim_start


def test_flight_anchor_map_roundtrips(spark, fixture_dirs):
    """The wire's only nested type (map<string,int> flight_anchor,
    reference schema :141) must decode and index correctly."""
    parsed = parse_events(
        file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA
    )
    rows = parsed.select(
        F.element_at("flight_anchor", "delay_min").alias("anchored_delay")
    ).collect()
    assert len(rows) > 0
    assert all(r["anchored_delay"] is not None for r in rows)
    assert all(r["anchored_delay"] >= 0 for r in rows)


def test_stream_stream_interval_join_matches_batch(spark, fixture_dirs, tmp_path):
    """Row-level stream-stream join with a time-range state bound must
    produce exactly the batch join's matches once both streams drain."""

    def parsed(kind, schema, stream):
        src = file_stream(spark, fixture_dirs[kind]) if stream else file_batch(
            spark, fixture_dirs[kind]
        )
        df = parse_events(src, schema)
        if kind == "booking":
            df = enrich_bookings(df)
        if kind == "flight":
            df = df.withColumnRenamed("destination_city_id", "city_id")
        return df

    got = _collecting_sink_rows(
        spark,
        kpis.booking_flight_interval_join(
            parsed("booking", BOOKING_SCHEMA, True),
            parsed("flight", FLIGHT_SCHEMA, True),
        ),
        "append",
        tmp_path,
        "ssjoin",
    )
    want = kpis.booking_flight_interval_join(
        parsed("booking", BOOKING_SCHEMA, False),
        parsed("flight", FLIGHT_SCHEMA, False),
    ).collect()
    key = lambda r: (r["booking_id"], r["flight_id"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0


def test_prometheus_label_escaping():
    body = format_prometheus(
        {"m": ({"name": 'San "Marco"\nVenezia\\x'}, 1)}
    )
    assert body == 'm{name="San \\"Marco\\"\\nVenezia\\\\x"} 1.0\n'


def test_stream_static_pointintime_enrich(spark, fixture_dirs, tmp_path):
    """The point-in-time join (operators/joins.pointintime_join) is
    stateless, so enriching a STREAM of bookings against a static
    versioned dimension must equal the batch enrichment exactly."""
    import datetime as _dt

    from travelpulse_spark_stream_tourism_analytics_spark.operators.joins import (
        pointintime_join,
    )

    # versions for every city seen in the fixture
    cities = file_batch(spark, fixture_dirs["booking"])
    city_ids = sorted(
        r[0]
        for r in parse_events(cities, BOOKING_SCHEMA)
        .select("city_id")
        .distinct()
        .collect()
        if r[0] is not None
    )
    rows = []
    for c in city_ids:
        rows.append((c, START, START + _dt.timedelta(days=1), "v1"))
        rows.append((c, START + _dt.timedelta(days=1), None, "v2"))
    versions = spark.createDataFrame(
        rows,
        "city_id string, valid_from timestamp, "
        "valid_to timestamp, version string",
    )

    def enrich(src):
        parsed = parse_events(src, BOOKING_SCHEMA).select(
            "booking_id", "city_id", "event_time"
        )
        return pointintime_join(
            parsed,
            versions,
            on="city_id",
            fact_ts="event_time",
        ).select("booking_id", "city_id", "event_time", "version")

    got = _collecting_sink_rows(
        spark,
        enrich(file_stream(spark, fixture_dirs["booking"])),
        "append",
        tmp_path,
        "pit",
    )
    want = enrich(file_batch(spark, fixture_dirs["booking"])).collect()
    key = lambda r: (r["booking_id"], r["version"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0
    # every booking matched exactly one version (no fan-out, no leak)
    assert len(got) == len(set(r["booking_id"] for r in got))


def test_watermark_finalizes_and_drops_late_rows_append_mode(spark, tmp_path):
    """Append-mode windowed aggregation: a window finalizes exactly once
    when the watermark passes its end, and a row arriving in a later
    micro-batch behind the watermark is dropped — the one-directional
    guarantee Spark gives (update mode is deliberately best-effort for
    late input, so the reference's update-mode monitors may briefly
    revive an old window; documented here via the append contract)."""
    import os
    import time as _time

    def iso(ts):
        return ts.strftime("%Y-%m-%dT%H:%M:%SZ")

    def wire(ts):
        return {
            "event_type": "weather",
            "event_ts": iso(ts),
            "ingest_ts": iso(ts),
            "trace_id": f"t{ts.minute}{ts.second}",
        }

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    d = tmp_path / "wm"
    # batch 1: advances the watermark past window [12:00, 12:01)
    write_wire_fixture(
        [wire(base), wire(base + dt.timedelta(minutes=10))],
        str(d / "a.json"),
    )
    # batch 2: fresh row, watermark moves further; 12:00 window emits
    write_wire_fixture(
        [wire(base + dt.timedelta(minutes=20))], str(d / "b.json")
    )
    # batch 3: a row behind the watermark for the ALREADY-EMITTED window
    write_wire_fixture(
        [
            wire(base + dt.timedelta(seconds=30)),
            wire(base + dt.timedelta(minutes=21)),
        ],
        str(d / "c.json"),
    )
    now = _time.time()
    os.utime(str(d / "a.json"), (now - 200, now - 200))
    os.utime(str(d / "b.json"), (now - 100, now - 100))
    os.utime(str(d / "c.json"), (now, now))

    parsed = parse_events(
        file_stream(spark, str(d), maxFilesPerTrigger=1), WEATHER_SCHEMA
    ).withWatermark("event_time", "45 seconds")
    agg = parsed.groupBy(F.window("event_time", "1 minute")).count()

    rows = []

    def grab(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = start_query(
        agg,
        "wm_append",
        str(tmp_path / "chk_wm"),
        grab,
        mode="append",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )

    emitted = {r["window"]["start"]: r["count"] for r in rows}
    # the 12:00 window finalized exactly once with count 1; the late
    # 12:00:30 row arriving after finalization was dropped — append
    # mode never emits a duplicate or revised row for a closed window
    assert emitted[base] == 1
    assert len([r for r in rows if r["window"]["start"] == base]) == 1
    assert dropped == 1
    # windows not yet passed by the watermark never emitted (no partials)
    assert base + dt.timedelta(minutes=21) not in emitted


def test_kafka_frame_replay_byte_parity(spark, fixture_dirs, tmp_path):
    """The broker-less Kafka twin must exercise the PRODUCTION decode:
    binary key/value frames -> CAST AS STRING -> from_json. The replay
    shares decode_kafka_frame with the live source, and this test pins
    (a) byte-for-byte wire parity between the replayed frames and the
    original fixture, and (b) KPI parity through the full parse path
    (VERDICT r1 item 6)."""
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
        kafka_frame_replay,
        write_kafka_frame_fixture,
    )

    frame_dir = str(tmp_path / "frames")
    write_kafka_frame_fixture(
        spark, fixture_dirs["booking"], frame_dir, topic="bookings"
    )

    # The recorded frames really are binary Kafka-shaped rows.
    raw = spark.read.parquet(frame_dir)
    assert dict(raw.dtypes)["key"] == "binary"
    assert dict(raw.dtypes)["value"] == "binary"
    assert {"topic", "partition", "offset", "timestamp", "timestampType"} <= set(
        raw.columns
    )

    # (a) decoded wire records == the original JSONL fixture, byte for
    # byte (key, value payload string, broker timestamp).
    got_wire = _collecting_sink_rows(
        spark, kafka_frame_replay(spark, frame_dir), "append", tmp_path, "kwire"
    )
    want_wire = file_batch(spark, fixture_dirs["booking"]).collect()
    key = lambda r: (r["key"], r["value"], r["kafka_ts"])  # noqa: E731
    assert sorted(map(key, got_wire)) == sorted(map(key, want_wire))
    assert len(got_wire) > 0

    # (b) the full parse (from_json + dual-clock repair) + KPI over the
    # replayed frames matches the file-twin path.
    replay_parsed = parse_events(
        kafka_frame_replay(spark, frame_dir), BOOKING_SCHEMA
    ).withWatermark("ingest_time", "45 seconds")
    got = _collecting_sink_rows(
        spark,
        kpis.city_bookings_windowed(
            replay_parsed, "ingest_time", kpis.MINUTE, "bookings"
        ),
        "update",
        tmp_path,
        "kcnt",
    )
    batch_parsed = parse_events(
        file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA
    )
    want = kpis.city_bookings_windowed(
        batch_parsed, "ingest_time", kpis.MINUTE, "bookings"
    ).collect()
    rkey = lambda r: (r["window"]["start"], r["city_id"], r["bookings"])  # noqa: E731
    assert sorted(map(rkey, got)) == sorted(map(rkey, want))
    assert len(got) > 0


def test_chained_season_score_single_query_is_silently_wrong(spark, fixture_dirs, tmp_path):
    """SURVEY.md §3.2 option (a), full form, PINNED (VERDICT r1 item 7):
    Spark 4.1 ACCEPTS the whole season score as one streaming query —
    three windowed aggregations, two stream-stream left joins on the
    aggregated streams, a percentile re-aggregation, and a final join —
    no unsupported-operator error, and it emits finalized rows. But the
    output is SILENTLY WRONG: the chained outer-join feeds the
    downstream percentile aggregation a state stream that differs from
    its own append output (observed: flight-side percentile bases that
    batch semantics never produces), so cancel/delay norms collapse to
    0 and reliab_idx inflates to 1.0. Every other index is bit-exact.

    This test pins that behavior: if a future Spark fixes the chain,
    the `deltas` set collapses to {0.0} and this test fails loudly —
    at which point the chained form can replace the two-phase
    orchestration (TwoPhaseSeasonScore, tested above), which remains
    the production path precisely because its per-phase outputs are
    batch-exact."""
    streams = {}
    for kind, schema in [
        ("booking", BOOKING_SCHEMA),
        ("weather", WEATHER_SCHEMA),
        ("flight", FLIGHT_SCHEMA),
    ]:
        parsed = parse_events(file_stream(spark, fixture_dirs[kind]), schema)
        if kind == "booking":
            parsed = enrich_bookings(parsed)
        if kind == "flight":
            parsed = parsed.withColumnRenamed("destination_city_id", "city_id")
        streams[kind] = parsed.withWatermark("event_time", "45 seconds")

    bcs, wcs, fcs = kpis.season_city_stats(
        streams["booking"], streams["weather"], streams["flight"], size="1 day"
    )
    chained = kpis.season_score(bcs, wcs, fcs)
    # (1) Spark does NOT refuse the chain: the query starts, runs to
    # completion, and finalizes windows.
    got_rows = _collecting_sink_rows(
        spark, chained, "append", tmp_path, "chained_season"
    )
    assert len(got_rows) > 0

    b = enrich_bookings(
        parse_events(file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA)
    )
    w = parse_events(file_batch(spark, fixture_dirs["weather"]), WEATHER_SCHEMA)
    f = parse_events(
        file_batch(spark, fixture_dirs["flight"]), FLIGHT_SCHEMA
    ).withColumnRenamed("destination_city_id", "city_id")
    bb, wb, fb = kpis.season_city_stats(b, w, f, size="1 day")
    want = {
        (r["window"]["start"], r["city_id"], r["season"]): r
        for r in kpis.season_score(bb, wb, fb).collect()
    }

    deltas = set()
    for r in got_rows:
        k = (r["window"]["start"], r["city_id"], r["season"])
        # (2) append mode emits only watermark-closed windows, all of
        # which exist in the batch result...
        assert k in want
        wrow = want[k]
        # (3) ...and the booking/weather-side indexes are bit-exact;
        for c in ("price_idx", "weather_idx", "crowd_idx"):
            assert round(r[c], 9) == round(wrow[c], 9), c
        # (4) the entire score error is attributable to the flight-side
        # reliab term (weight 0.10) — the chained-percentile artifact.
        score_delta = r["season_score"] - wrow["season_score"]
        reliab_delta = 100.0 * 0.10 * (r["reliab_idx"] - wrow["reliab_idx"])
        assert abs(score_delta - reliab_delta) < 1e-6
        deltas.add(round(score_delta, 6))
    # (5) the wrongness is real today: at least one finalized window
    # diverges. When a Spark upgrade makes this set == {0.0}, the chain
    # has become trustworthy — promote it and retire this pin.
    assert deltas != {0.0}


def test_kafka_replay_starting_offsets_semantics(spark, fixture_dirs, tmp_path):
    """startingOffsets over recorded frames behaves as the broker
    option intends (VERDICT r2 item 6, reference
    spark/kafka_to_metrics.py:156-169): 'earliest' consumes the whole
    recording; explicit per-partition JSON bounds each partition with
    Kafka's -1/-2 sentinels honored; 'latest' skips the existing
    recording entirely and picks up only frames appended afterwards."""
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
        kafka_frame_replay,
        write_kafka_frame_fixture,
    )

    frame_dir = str(tmp_path / "frames3p")
    write_kafka_frame_fixture(
        spark, fixture_dirs["booking"], frame_dir, topic="bookings",
        n_partitions=3,
    )
    raw = spark.read.parquet(frame_dir)
    per_part = {
        int(r["partition"]): int(r["n"])
        for r in raw.groupBy("partition").agg(F.count("*").alias("n")).collect()
    }
    # Key-hash placement: at least two partitions populated (a fixture
    # with few distinct keys may leave one empty — that's faithful to
    # Kafka, where partition spread follows the key distribution).
    assert len(per_part) >= 2
    total = sum(per_part.values())
    pa = max(per_part, key=per_part.get)  # bounded below by offset 3
    pb = min(p for p in per_part if p != pa)  # earliest via -2 sentinel
    assert per_part[pa] > 3

    # earliest: everything.
    got = _collecting_sink_rows(
        spark, kafka_frame_replay(spark, frame_dir), "append", tmp_path, "so_e"
    )
    assert len(got) == total

    # explicit: pa from offset 3, pb from earliest (-2), every other
    # partition from latest (-1, i.e. nothing recorded).
    others = ", ".join(f'"{p}": -1' for p in range(3) if p not in (pa, pb))
    spec = '{"bookings": {"%d": 3, "%d": -2, %s}}' % (pa, pb, others)
    got = _collecting_sink_rows(
        spark,
        kafka_frame_replay(spark, frame_dir, starting_offsets=spec),
        "append",
        tmp_path,
        "so_x",
    )
    want = (per_part[pa] - 3) + per_part[pb]
    assert len(got) == want

    # Explicit bounds must select the SAME records a raw offset filter
    # selects, not merely the same count.
    want_keys = sorted(
        bytes(r["key"]).decode()
        for r in raw.filter(
            ((F.col("partition") == pa) & (F.col("offset") >= 3))
            | (F.col("partition") == pb)
        ).collect()
    )
    assert sorted(r["key"] for r in got) == want_keys

    # latest: resolve the stream against the current recording, then
    # append new frames — only those flow through.
    stream = kafka_frame_replay(spark, frame_dir, starting_offsets="latest")
    late = raw.filter(F.col("partition") == pa).withColumn(
        "offset", F.col("offset") + F.lit(per_part[pa])
    )
    late.coalesce(1).write.mode("append").parquet(frame_dir)
    got = _collecting_sink_rows(spark, stream, "append", tmp_path, "so_l")
    assert len(got) == per_part[pa]  # only the appended frames


def test_kafka_replay_fail_on_data_loss(spark, fixture_dirs, tmp_path):
    """failOnDataLoss over recorded frames (VERDICT r2 item 6): 'true'
    fails fast on both data-loss shapes — an offset gap inside the
    retained range (compaction) and a requested start below the
    earliest available offset (expired segment); 'false' consumes what
    exists, like the broker source after logging the loss."""
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
        kafka_frame_replay,
        write_kafka_frame_fixture,
    )

    clean_dir = str(tmp_path / "clean")
    write_kafka_frame_fixture(
        spark, fixture_dirs["booking"], clean_dir, topic="bookings"
    )
    raw = spark.read.parquet(clean_dir)
    n = raw.count()
    assert n > 8

    # Compaction shape: offsets 2..4 removed from the recording.
    gap_dir = str(tmp_path / "gap")
    raw.filter(~F.col("offset").between(2, 4)).coalesce(1).write.parquet(gap_dir)

    with pytest.raises(ValueError, match="missing"):
        kafka_frame_replay(spark, gap_dir, fail_on_data_loss="true")
    got = _collecting_sink_rows(
        spark,
        kafka_frame_replay(spark, gap_dir, fail_on_data_loss="false"),
        "append",
        tmp_path,
        "dl_f",
    )
    assert len(got) == n - 3

    # Expired-segment shape: recording starts at offset 5, consumer
    # asks for offset 1.
    exp_dir = str(tmp_path / "expired")
    raw.filter(F.col("offset") >= 5).coalesce(1).write.parquet(exp_dir)
    with pytest.raises(ValueError, match="earliest available"):
        kafka_frame_replay(
            spark, exp_dir,
            starting_offsets='{"bookings": {"0": 1}}',
            fail_on_data_loss="true",
        )
    got = _collecting_sink_rows(
        spark,
        kafka_frame_replay(
            spark, exp_dir,
            starting_offsets='{"bookings": {"0": 1}}',
            fail_on_data_loss="false",
        ),
        "append",
        tmp_path,
        "dl_e",
    )
    assert len(got) == n - 5


def test_kafka_replay_cross_partition_disorder_watermark_parity(
    spark, fixture_dirs, tmp_path
):
    """Frames spread over 3 simulated partitions arrive interleaved —
    the cross-partition disorder a real consumer observes. The
    watermarked event-time aggregation over the disordered replay must
    equal the batch recomputation over the ordered fixture: watermark
    semantics, not arrival order, decide the result (VERDICT r2 item
    6)."""
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
        kafka_frame_replay,
        write_kafka_frame_fixture,
    )

    frame_dir = str(tmp_path / "frames_ooo")
    write_kafka_frame_fixture(
        spark, fixture_dirs["booking"], frame_dir, topic="bookings",
        n_partitions=3,
    )
    # Same key set lands on the same partition (Kafka partitioner
    # property the engine's per-key assumptions rest on).
    raw = spark.read.parquet(frame_dir)
    key_parts = (
        raw.select(F.col("key").cast("string").alias("k"), "partition")
        .groupBy("k")
        .agg(F.countDistinct("partition").alias("np"))
        .agg(F.max("np"))
        .first()[0]
    )
    assert key_parts == 1

    parsed = parse_events(
        kafka_frame_replay(spark, frame_dir), BOOKING_SCHEMA
    ).withWatermark("event_time", "45 seconds")
    got = _collecting_sink_rows(
        spark,
        kpis.city_bookings_windowed(parsed, "event_time", kpis.MINUTE, "bookings"),
        "update",
        tmp_path,
        "ooo",
    )
    want = kpis.city_bookings_windowed(
        parse_events(file_batch(spark, fixture_dirs["booking"]), BOOKING_SCHEMA),
        "event_time",
        kpis.MINUTE,
        "bookings",
    ).collect()
    rkey = lambda r: (r["window"]["start"], r["city_id"], r["bookings"])  # noqa: E731
    assert sorted(map(rkey, got)) == sorted(map(rkey, want))
    assert len(got) > 0


def test_stream_stream_left_outer_join_flushes_unmatched_on_watermark(
    spark, tmp_path
):
    """left_outer interval join: an unmatched booking is emitted with
    NULL flight columns only once the GLOBAL watermark (min across both
    inputs) passes b_time + gap. Run 1 drains with the unmatched row
    still live in state; run 2 (same checkpoint) feeds both sides
    far-future events and must flush exactly that row."""

    def booking(bid, city, ts):
        return {
            "event_ts": ts, "ingest_ts": ts, "booking_id": bid,
            "city_id": city, "adr_proxy": 100.0, "nights": 2, "rooms": 1,
            "checkin_date": "2024-06-02",
        }

    def flight(fid, city, ts):
        return {
            "event_ts": ts, "ingest_ts": ts, "flight_id": fid,
            "destination_city_id": city, "status": "landed",
        }

    bdir, fdir = tmp_path / "b", tmp_path / "f"
    write_wire_fixture(
        [
            booking("BM", 1, "2024-06-01T12:00:00Z"),   # will match F1
            booking("BU", 2, "2024-06-01T12:00:00Z"),   # no flight to city 2
        ],
        str(bdir / "part-0.json"),
    )
    write_wire_fixture(
        [flight("F1", 1, "2024-06-01T12:30:00Z")], str(fdir / "part-0.json")
    )

    def run():
        joined = kpis.booking_flight_interval_join(
            enrich_bookings(
                parse_events(file_stream(spark, str(bdir)), BOOKING_SCHEMA)
            ),
            parse_events(
                file_stream(spark, str(fdir)), FLIGHT_SCHEMA
            ).withColumnRenamed("destination_city_id", "city_id"),
            how="left_outer",
        )
        return _collecting_sink_rows(spark, joined, "append", tmp_path, "ssoj")

    got1 = {(r["booking_id"], r["flight_id"]) for r in run()}
    assert got1 == {("BM", "F1")}  # match emitted; BU still in state

    # Advance BOTH watermarks beyond BU's expiry (12:00 + 2h gap):
    # without the booking-side event, the global min-watermark stays at
    # run-1's booking max and BU would never flush.
    write_wire_fixture(
        [booking("B3", 3, "2024-06-01T18:00:00Z")], str(bdir / "part-1.json")
    )
    write_wire_fixture(
        [flight("F2", 99, "2024-06-01T18:00:00Z")], str(fdir / "part-1.json")
    )
    rows2 = run()
    got2 = {(r["booking_id"], r["flight_id"]) for r in rows2}
    # BU flushes with NULL flight columns; BM is NOT re-emitted; B3's
    # own expiry (20:00) is beyond the new watermark so it stays held.
    assert got2 == {("BU", None)}
    bu = [r for r in rows2 if r["booking_id"] == "BU"][0]
    assert bu["f_time"] is None and bu["flight_status"] is None
    assert bu["spend_eur"] == 200.0  # left-side payload intact
