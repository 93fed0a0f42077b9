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


def parse_window_agg_throughput(
    spark, n_days: int = 30, per_day: int = 4000
) -> dict:
    """Drive the real parse -> watermark -> windowed-agg streaming
    path over seeded simulator wire JSONL with an availableNow trigger
    and return {events_per_sec, events, elapsed_sec, result_rows}.
    Shared by this standalone stream bench and bench.py's per-round
    `stream` row, so BENCH_r{N}.json carries a streaming throughput
    number comparable round-over-round, not only batch timings."""
    tmp = tempfile.mkdtemp(prefix="tp_stream_row_")
    try:
        events = simulate(dt.datetime(2024, 1, 1), n_days, per_day, seed=42)
        n_events = len(events["booking"])
        # Split across files so the source parallelizes like a
        # multi-partition Kafka topic.
        n_shards = 8
        for i in range(n_shards):
            write_wire_fixture(
                events["booking"][i::n_shards],
                os.path.join(tmp, "wire", f"part-{i}.json"),
            )
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
        return {
            "events_per_sec": round(n_events / elapsed, 1),
            "events": n_events,
            "elapsed_sec": round(elapsed, 3),
            "result_rows": len(out_rows),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n_days = int(os.environ.get("STREAM_BENCH_DAYS", "30"))
    per_day = int(os.environ.get("STREAM_BENCH_EVENTS_PER_DAY", "4000"))
    spark = get_spark("travelpulse-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tp_stream_bench_")
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
        # Median-of-N with the per-run distribution, same convention as
        # bench.py's stream row (VERDICT r7 item 1): a single ~seconds
        # sample includes fixed startup/codegen costs and jitters ~2x.
        n_runs = int(os.environ.get("STREAM_BENCH_RUNS", "3"))
        stage1_runs = [
            parse_window_agg_throughput(spark, n_days, per_day)
            for _ in range(n_runs)
        ]
        by_rate = sorted(stage1_runs, key=lambda r: r["events_per_sec"])
        stage1 = by_rate[len(by_rate) // 2]  # median run
        n_events, elapsed = stage1["events"], stage1["elapsed_sec"]
        out_rows = [None] * stage1["result_rows"]  # count-only reporting

        # --- stage 2: online near-dup detection throughput ----------
        # documents stream -> stateless SimHash projection -> stateful
        # banded fingerprint index (streaming/stateful.py) -> per-doc
        # verdicts. The 16-bit fingerprint saturates at corpus scale
        # exactly as documented for the batch op (SOAK_r3), so this is
        # the WORST-case state-scan rate; production uses wider
        # fingerprints for smaller buckets.
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
            words_of,
        )
        from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
            simhash16_expr,
        )
        from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
            neardup_verdicts,
            streaming_neardup_evidence,
        )

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        docs.coalesce(8).write.mode("overwrite").json(
            os.path.join(tmp, "docs")
        )
        doc_stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(os.path.join(tmp, "docs"))
            .select(
                "doc_id",
                simhash16_expr(
                    F.array_distinct(words_of(F.col("text")))
                ).alias("fp"),
            )
        )
        flagged = []
        t1 = time.perf_counter()
        q2 = (
            streaming_neardup_evidence(doc_stream, "doc_id", "fp")
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid: flagged.extend(
                    r["doc_id"]
                    for r in neardup_verdicts(df).collect()
                    if r["is_dup"]
                )
            )
            .option("checkpointLocation", os.path.join(tmp, "chk_nd"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(600)
        nd_elapsed = time.perf_counter() - t1

        # --- stage 3: near-dup at the PRODUCTION fingerprint width --
        # Same stateful index, 64-bit xxhash64 SimHash (stateless
        # simhash64_expr projection, 4 x 16-bit pigeonhole bands).
        # Random 16-bit collisions disappear (flag count drops to the
        # corpus's TRUE template near-dups, ~half here); the rate stays
        # state-scan-bound because this fixture corpus genuinely is
        # half near-duplicates.
        from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
            simhash64_expr,
        )

        doc_stream64 = (
            spark.readStream.schema("doc_id long, text string")
            .json(os.path.join(tmp, "docs"))
            .select(
                "doc_id",
                simhash64_expr(
                    F.array_distinct(words_of(F.col("text")))
                ).alias("fp"),
            )
        )
        flagged64 = []
        t2 = time.perf_counter()
        q3 = (
            streaming_neardup_evidence(
                doc_stream64, "doc_id", "fp", bits=64, n_bands=4
            )
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid: flagged64.extend(
                    r["doc_id"]
                    for r in neardup_verdicts(df).collect()
                    if r["is_dup"]
                )
            )
            .option("checkpointLocation", os.path.join(tmp, "chk_nd64"))
            .trigger(availableNow=True)
            .start()
        )
        q3.awaitTermination(600)
        nd64_elapsed = time.perf_counter() - t2

        print(
            json.dumps(
                {
                    "metric": "stream_parse_window_agg_events_per_sec",
                    "value": stage1["events_per_sec"],
                    "unit": "events/sec",
                    "runs": [r["events_per_sec"] for r in stage1_runs],
                    "events": n_events,
                    "elapsed_sec": round(elapsed, 3),
                    "result_rows": len(out_rows),
                    "neardup_docs_per_sec": round(n_docs / nd_elapsed, 1),
                    "neardup_docs": n_docs,
                    "neardup_flagged": len(flagged),
                    "neardup_elapsed_sec": round(nd_elapsed, 3),
                    "neardup64_docs_per_sec": round(n_docs / nd64_elapsed, 1),
                    "neardup64_flagged": len(flagged64),
                    "neardup64_elapsed_sec": round(nd64_elapsed, 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
