"""Checkpoint-restart recovery: the reference's operating mode is
long-lived queries resuming from their checkpoint dirs after restarts
(reference spark/kafka_to_metrics.py:556,564-589 — every start_query
gets a per-query checkpoint dir precisely so a crashed job resumes
with no dupes and no loss). These tests stop/kill a query mid-stream
and restart it from the SAME checkpoint, asserting the resumed output
equals a from-scratch batch recomputation.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.schemas import (
    WEATHER_SCHEMA,
    WIRE_SCHEMA,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming import kpis
from travelpulse_spark_stream_tourism_analytics_spark.streaming.parse import (
    parse_events,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.simulator import (
    simulate,
    write_wire_fixture,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
    start_parquet_sink,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.sources import (
    file_batch,
    file_stream,
)
from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
    running_user_totals,
)


def _closed_window_count(spark, src_dir: str) -> int:
    """Batch recomputation of the windows the final watermark
    (max ingest_time - 45 s) has closed — what append mode must have
    committed exactly once by end-of-stream."""
    batch_parsed = parse_events(file_batch(spark, src_dir), WEATHER_SCHEMA)
    max_ing = batch_parsed.agg(F.max("ingest_time")).collect()[0][0]
    watermark = max_ing - dt.timedelta(seconds=45)
    return (
        kpis.weather_minute_counts(batch_parsed)
        .filter(F.col("window.end") <= F.lit(watermark))
        .count()
    )


def test_parquet_sink_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop the exactly-once parquet sink after draining run-1 data,
    restart it against the SAME checkpoint with new data present, and
    assert (a) the restarted query reads ONLY the new files, (b) the
    final output equals the batch recomputation over everything, with
    zero duplicate windows."""
    src = tmp_path / "wire"
    out = str(tmp_path / "sinkout")
    chk = str(tmp_path / "chk")

    events_a = simulate(dt.datetime(2024, 6, 1), n_days=1, events_per_day=40, seed=11)
    write_wire_fixture(events_a["weather"], str(src / "a.json"))

    def run_once(name: str):
        parsed = parse_events(
            file_stream(spark, str(src)), WEATHER_SCHEMA
        ).withWatermark("ingest_time", "45 seconds")
        q = start_parquet_sink(
            kpis.weather_minute_counts(parsed),
            name,
            out,
            chk,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        return q

    run_once("pq_run1")
    rows_run1 = spark.read.parquet(out).count()
    assert rows_run1 > 0  # run 1 committed some closed windows

    # New data lands while the query is down (later day -> advances the
    # watermark on restart, closing run-1's still-open windows too).
    events_b = simulate(dt.datetime(2024, 6, 2), n_days=1, events_per_day=40, seed=13)
    write_wire_fixture(events_b["weather"], str(src / "b.json"))

    q2 = run_once("pq_run2")

    # (a) no re-read: the restarted query's input rows are exactly the
    # new file's events — the checkpoint remembered file a.json.
    input_rows_run2 = sum(p["numInputRows"] for p in q2.recentProgress)
    assert input_rows_run2 == len(events_b["weather"])

    # (b) no loss, no dupes: final parquet == batch recompute over both
    # runs' data, and every committed window appears exactly once.
    back = spark.read.parquet(out)
    want = _closed_window_count(spark, str(src))
    assert back.count() == want
    assert back.select("window").distinct().count() == want
    assert back.count() > rows_run1  # restart actually appended


def _write_totals_file(path, batch: list[tuple[str, float]], minute: int) -> None:
    with open(path, "w") as f:
        for key, v in batch:
            f.write(
                json.dumps(
                    {
                        "key": key,
                        "value": json.dumps({"v": v}),
                        "kafka_ts": f"2024-06-01T12:{minute:02d}:00.000Z",
                    }
                )
                + "\n"
            )


def test_stateful_agg_recovers_state_after_midstream_crash(spark, tmp_path):
    """Kill running_user_totals mid-stream (sink raises in batch 1 of
    3) and restart from the same checkpoint: the state store must
    resume from the last committed batch — the failed batch replays,
    nothing is double-counted, and the final totals equal the batch
    recomputation over all files."""
    data_dir = tmp_path / "wire"
    data_dir.mkdir()
    batches = [
        [("u1", 10.0), ("u1", 5.0), ("u2", 1.0)],
        [("u1", 2.5), ("u2", 1.5), ("u3", 7.0)],
        [("u2", 4.0), ("u3", 3.0)],
    ]
    for i, batch in enumerate(batches):
        _write_totals_file(data_dir / f"f{i}.json", batch, i)

    def stream():
        return (
            spark.readStream.schema(WIRE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(data_dir))
            .select(
                F.col("key"),
                F.get_json_object("value", "$.v").cast("double").alias("v"),
            )
        )

    chk = str(tmp_path / "chk")
    emitted: list[tuple[int, list]] = []

    def crashing_sink(df, bid):
        rows = df.collect()
        if bid == 1:
            raise RuntimeError("injected sink crash in batch 1")
        emitted.append((bid, rows))

    q = (
        running_user_totals(stream(), "key", "v")
        .writeStream.outputMode("update")
        .foreachBatch(crashing_sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="injected sink crash"):
        q.awaitTermination(120)
    crash_batches = [bid for bid, _ in emitted]
    assert crash_batches == [0]  # batch 0 committed, batch 1 died

    # Restart from the same checkpoint with a healthy sink.
    q2 = (
        running_user_totals(stream(), "key", "v")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: emitted.append((bid, df.collect())))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    # The failed batch replays under its original id (offsets were
    # never committed), then the remaining file runs — no batch 0
    # re-emission, i.e. file f0 was not re-read into state.
    resumed_batches = [bid for bid, _ in emitted[1:]]
    assert resumed_batches == [1, 2]

    finals: dict[str, tuple[int, float]] = {}
    for _, rows in emitted:
        for r in rows:
            finals[r["key"]] = (r["total_events"], r["total_value"])

    # No loss, no double count: equals the batch group-by over ALL
    # files (state recovered; a reset state would undercount u1/u2, a
    # re-read of f0 would overcount them).
    want = {
        r["key"]: (r["n"], r["s"])
        for r in (
            spark.read.schema(WIRE_SCHEMA)
            .json(str(data_dir))
            .select(
                "key",
                F.get_json_object("value", "$.v").cast("double").alias("v"),
            )
            .groupBy("key")
            .agg(F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s"))
            .collect()
        )
    }
    assert finals == want
    assert finals["u1"] == (3, 17.5)
    assert finals["u2"] == (3, 6.5)
    assert finals["u3"] == (2, 10.0)


def test_streaming_neardup_state_survives_restart(spark, tmp_path):
    """The near-dup fingerprint index must RESUME from its state store:
    run phase 1 over half the corpus, stop the query, drop new files,
    restart from the SAME checkpoint — docs in phase 2 must still be
    flagged against phase-1 fingerprints (which only state recovery
    can know), and the combined verdicts must equal the batch pair
    ground truth."""
    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
        words_of,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        simhash16,
        simhash16_expr,
        simhash_neardup_pairs,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
        neardup_verdicts,
        streaming_neardup_evidence,
    )

    base = (
        "rooms by the coast fill quickly in summer while flights from "
        "the north arrive late and hotels reprice nightly for demand"
    )
    docs = []
    for i in range(24):
        words = base.split()
        if i % 2 == 0:
            words[i % len(words)] = f"tweak{i}"  # near-dup family
        else:
            words = [f"u{i}_{j}" for j in range(len(words))]
        docs.append((i, " ".join(words)))

    bdf = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = simhash_neardup_pairs(
        simhash16(bdf, "doc_id", "text"), "doc_id", max_hamming=3, bits=16
    )
    expected = {}
    for r in pairs.collect():
        a, b = sorted((r["id_a"], r["id_b"]))
        expected[b] = min(expected.get(b, a), a)
    # the test is only meaningful if some dup's witness is in phase 1
    assert any(e < 12 <= d for d, e in expected.items())

    data_dir = tmp_path / "docs"
    data_dir.mkdir()
    chk = str(tmp_path / "chk")
    got = {}

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(data_dir))
            .select(
                "doc_id",
                simhash16_expr(
                    F.array_distinct(words_of(F.col("text")))
                ).alias("fp"),
            )
        )
        q = (
            streaming_neardup_evidence(stream, "doc_id", "fp", max_hamming=3)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid: got.update(
                    {
                        r["doc_id"]: r["dup_of"]
                        for r in neardup_verdicts(df).collect()
                        if r["is_dup"]
                    }
                )
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def write_file(name, rows):
        with open(data_dir / name, "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    write_file("f0.json", docs[:12])
    drain()  # phase 1: index the first half, then the query STOPS
    phase1 = dict(got)
    write_file("f1.json", docs[12:])
    drain()  # phase 2: restart from the same checkpoint
    # cross-phase flags exist and required recovered phase-1 state
    assert any(e < 12 <= d for d, e in got.items() if d not in phase1)
    assert got == expected
