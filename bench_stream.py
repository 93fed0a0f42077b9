#!/usr/bin/env python3
"""Streaming throughput benchmark (self-imposed BASELINE.md target:
>= 10k events/s through parse -> window -> agg in local mode; the
reference producer ceiling is 1k msgs/s).

Generates wire JSONL via the seeded simulator, then drives the real
Structured Streaming path (file source -> from_json + dual-clock
repair -> watermark -> windowed agg -> foreachBatch) with an
availableNow trigger and reports events/second as one JSON line.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from travelpulse_spark_stream_tourism_analytics_spark.schemas import BOOKING_SCHEMA
from travelpulse_spark_stream_tourism_analytics_spark.session import get_spark
from travelpulse_spark_stream_tourism_analytics_spark.streaming import kpis
from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import (
    enrich_bookings,
    parse_events,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.simulator import (
    simulate,
    write_wire_fixture,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import start_query
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
    file_stream,
)


def main() -> None:
    n_days = int(os.environ.get("STREAM_BENCH_DAYS", "30"))
    per_day = int(os.environ.get("STREAM_BENCH_EVENTS_PER_DAY", "4000"))
    spark = get_spark("travelpulse-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tp_stream_bench_")
    try:
        events = simulate(dt.datetime(2024, 1, 1), n_days, per_day, seed=42)
        n_events = len(events["booking"])
        # Split across files so the source parallelizes like a
        # multi-partition Kafka topic.
        shard, n_shards = [], 8
        for i in range(n_shards):
            write_wire_fixture(
                events["booking"][i::n_shards],
                os.path.join(tmp, "wire", f"part-{i}.json"),
            )
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

        parsed = enrich_bookings(
            parse_events(file_stream(spark, os.path.join(tmp, "wire")), BOOKING_SCHEMA)
        ).withWatermark("event_time", "45 seconds")
        agg = kpis.city_bookings_windowed(
            parsed, "event_time", "1 day", "bookings"
        )
        out_rows = []

        t0 = time.perf_counter()
        q = start_query(
            agg,
            "bench",
            os.path.join(tmp, "chk"),
            lambda df, bid: out_rows.extend(df.collect()),
            mode="update",
            trigger={"availableNow": True},
        )
        q.awaitTermination(600)
        elapsed = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "stream_parse_window_agg_events_per_sec",
                    "value": round(n_events / elapsed, 1),
                    "unit": "events/sec",
                    "events": n_events,
                    "elapsed_sec": round(elapsed, 3),
                    "result_rows": len(out_rows),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
