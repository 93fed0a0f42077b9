"""Custom stateful operator: state must carry across micro-batches."""

from __future__ import annotations

import os

import json

from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.schemas import WIRE_SCHEMA
from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
    running_user_totals,
)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    data_dir = tmp_path / "wire"
    data_dir.mkdir()
    # Two files -> two micro-batches (maxFilesPerTrigger=1).
    for i, batch in enumerate(
        [
            [("u1", 10.0), ("u1", 5.0), ("u2", 1.0)],
            [("u1", 2.5), ("u2", 1.5)],
        ]
    ):
        with open(data_dir / f"f{i}.json", "w") as f:
            for key, v in batch:
                f.write(
                    json.dumps(
                        {
                            "key": key,
                            "value": json.dumps({"v": v}),
                            "kafka_ts": f"2024-06-01T12:0{i}:00.000Z",
                        }
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
        .select(
            F.col("key"),
            F.get_json_object("value", "$.v").cast("double").alias("v"),
        )
    )
    emitted = []
    q = (
        running_user_totals(stream, "key", "v")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: emitted.append((bid, df.collect())))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {}
    for _, rows in emitted:
        for r in rows:
            finals[r["key"]] = (r["total_events"], r["total_value"])
    # Cumulative across both batches, not per-batch.
    assert finals["u1"] == (3, 17.5)
    assert finals["u2"] == (2, 2.5)
    assert len(emitted) >= 2  # state actually crossed a batch boundary


def test_streaming_neardup_matches_batch_pairs(spark, tmp_path):
    """Streaming SimHash near-dup detection must agree with the batch
    banded-pigeonhole operator: with docs arriving in id order, doc d
    is flagged (dup_of = e) exactly when the batch operator emits the
    pair (e, d) — state carries the fingerprint index across
    micro-batches."""
    from travelpulse_spark_stream_tourism_analytics_spark.functions.text import words_of
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
        "the quick brown fox jumps over the lazy dog while tourists "
        "book rooms near the coast in summer season with high demand"
    )
    docs = []
    for i in range(30):
        words = base.split()
        # family of near-dups: tweak 1 word; far docs: replace many
        if i % 3 == 0:
            words[i % len(words)] = f"tweak{i}"
        else:
            words = [f"w{i}_{j}" for j in range(len(words))]
        docs.append((i, " ".join(words)))

    # --- batch ground truth
    bdf = spark.createDataFrame(docs, "doc_id long, text string")
    sims = simhash16(bdf, "doc_id", "text")
    pairs = simhash_neardup_pairs(sims, "doc_id", max_hamming=3, bits=16)
    expected = {}
    for r in pairs.collect():
        a, b = sorted((r["id_a"], r["id_b"]))
        expected[b] = min(expected.get(b, a), a)

    # --- streaming: 3 files -> 3 micro-batches, ids in arrival order
    data_dir = tmp_path / "docs"
    data_dir.mkdir()
    for part in range(3):
        with open(data_dir / f"f{part}.json", "w") as f:
            for i, text in docs[part * 10 : (part + 1) * 10]:
                f.write(json.dumps({"doc_id": i, "text": text}) + "\n")

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
    emitted = []
    q = (
        streaming_neardup_evidence(stream, "doc_id", "fp", max_hamming=3)
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: emitted.append(
                (bid, neardup_verdicts(df).collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "chk_nd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {}
    for _, rows in emitted:
        for r in rows:
            assert r["doc_id"] not in got  # verdict complete per batch
            if r["is_dup"]:
                got[r["doc_id"]] = r["dup_of"]
    assert got == expected
    assert len(emitted) >= 3  # index crossed micro-batch boundaries
    # the dup family spans batches: some dup's source is in an earlier file
    assert any(d // 10 != e // 10 for d, e in got.items())


def test_run_dedup_pipeline_surface(spark, tmp_path):
    """--mode dedup production surface: JSONL docs in, verdict parquet
    out, counts consistent with the verdicts written."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base), (1, base + " lambda"), (2, "totally different words here x y z")]
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    out = str(tmp_path / "verdicts")
    stats = run_dedup(spark, str(docs_dir), out, once=True)
    v = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert stats["docs"] == 3 and len(v) == 3
    assert stats["dups"] == sum(1 for r in v.values() if r["is_dup"])
    assert v[1]["is_dup"] and v[1]["dup_of"] == 0  # one-word delta
    assert not v[0]["is_dup"] and not v[2]["is_dup"]


def test_run_dedup_with_ingest_quality_gate(spark, tmp_path):
    """--mode dedup --gate: the stateless quality gate (over redacted
    text) drops junk BEFORE the stateful index — gated docs never get
    a verdict row, clean docs still dedup against each other."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    base = "the alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base + " lambda"),                      # near-dup of 0
        (2, "too short"),                           # gated: n_tokens
        (3, " ".join(["spam"] * 50)),               # gated: repetition
        (4, base + " mail jane@corp.com included"),  # PII redacts, kept
    ]
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    out = str(tmp_path / "verdicts")
    stats = run_dedup(spark, str(docs_dir), out, once=True, gate=True)
    v = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(v) == {0, 1, 4}          # 2 and 3 never reached the index
    assert stats["docs"] == 3
    assert v[1]["is_dup"] and v[1]["dup_of"] == 0


def test_run_dedup_repetition_gate_catches_scattered_phrases(
    spark, tmp_path
):
    """--mode dedup --gate --repetition-gate (round 6): a doc whose
    repeated phrase is SCATTERED between unique filler words sails
    through the heuristic gate (every 3-gram is distinct, stopword and
    token stats are normal) but must be dropped by the Gopher
    top-2-gram character-mass rule; the same doc survives --gate
    alone, and clean docs are untouched either way."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pytest

    from run_pipeline import run_dedup

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    clean = (
        "the quick brown fox jumps over a lazy dog near the old "
        "stone bridge while morning light settles on the quiet river"
    )
    # 'click here' recurs 12x with UNIQUE filler between occurrences:
    # every 3-gram distinct -> dup_3gram_frac = 0, but the top-2-gram
    # character mass (12 * 9 chars) dominates the doc
    spam = " ".join(
        f"click here w{i} of the" for i in range(12)
    )
    rows = [(0, clean), (1, spam)]
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    out1 = str(tmp_path / "v_gate")
    stats1 = run_dedup(spark, str(docs_dir), out1, once=True, gate=True)
    assert stats1["docs"] == 2  # heuristic gate alone keeps the spam

    out2 = str(tmp_path / "v_rep")
    stats2 = run_dedup(
        spark, str(docs_dir), out2, once=True, gate=True,
        repetition_gate=True,
    )
    v = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert v == {0} and stats2["docs"] == 1  # spam never reaches the index

    with pytest.raises(ValueError, match="requires --gate"):
        run_dedup(spark, str(docs_dir), str(tmp_path / "x"), once=True,
                  repetition_gate=True)


def test_run_dedup_batch_incremental_index_surface(spark, tmp_path):
    """--mode dedup-batch (round 5): successive ingest batches dedupe
    against the persisted fingerprint index — a day-2 near-copy of a
    day-1 doc is flagged with dup_of pointing at the day-1 id, and the
    index grows to cover both batches (the corpus text is never
    rescanned: the artifact holds fingerprints only)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup_batch

    # Long docs so a one-word append lands within the hamming<=3
    # near-dup threshold (short docs flip too many simhash bits).
    base = " ".join(f"w{i}" for i in range(120))
    other = " ".join(f"u{i}" for i in range(120))
    idx = str(tmp_path / "fp_index")

    def write_batch(name, rows):
        d = tmp_path / name
        d.mkdir()
        with open(d / "part-0.json", "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        return str(d)

    day1 = write_batch("day1", [
        (0, base),
        (1, "totally different words over here x y z"),
    ])
    s1 = run_dedup_batch(spark, day1, str(tmp_path / "v1"), idx)
    assert s1 == {"docs": 2, "dups": 0, "index_rows": 2}

    day2 = write_batch("day2", [
        (10, base + " lambda"),     # near-dup of day-1 doc 0
        (11, other),
        (12, other + " tail"),      # intra-batch near-dup of 11
    ])
    s2 = run_dedup_batch(spark, day2, str(tmp_path / "v2"), idx)
    assert s2["docs"] == 3 and s2["index_rows"] == 5
    v = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "v2")).collect()}
    assert v[10]["is_dup"] and v[10]["dup_of"] == 0   # cross-batch
    assert v[12]["is_dup"] and v[12]["dup_of"] == 11  # intra-batch
    assert not v[11]["is_dup"]
    # fingerprint-only artifact
    assert set(spark.read.parquet(idx).columns) == {"doc_id", "simhash"}


def test_run_dedup_streaming_psi_gauge(spark, tmp_path):
    """--mode dedup --gate --baseline (round 5): the monitoring plane
    pushes a per-micro-batch ingest_psi_quality_score gauge — batches
    matching the baseline distribution stay under the 0.1 investigate
    threshold, and a planted quality shift (numbers-heavy scrape)
    crosses the 0.25 action threshold within its batch."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup

    from travelpulse_spark_stream_tourism_analytics_spark.streaming.sinks import (
        MemoryMetricSink,
    )

    def good(i):
        return (
            "the quick brown fox jumps over a lazy dog near town "
            + " ".join(f"w{j}" for j in range(i % 9))
        )

    def bad(i):
        return "the old server logs 404 500 301 999 123 867 5309 777 " * 4

    base_dir = tmp_path / "base"
    spark.createDataFrame(
        [(i, good(i)) for i in range(120)], "doc_id long, text string"
    ).write.parquet(str(base_dir / "documents.parquet"))

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    batches = [
        [(i, good(i)) for i in range(120)],          # matches baseline
        [(1000 + i, bad(i)) for i in range(120)],    # planted shift
    ]
    for b, rows in enumerate(batches):
        p = docs_dir / f"b{b}.json"
        with open(p, "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        os.utime(p, (1700000000 + b * 60, 1700000000 + b * 60))

    sink = MemoryMetricSink()
    out = str(tmp_path / "verdicts")
    stats = run_dedup(
        spark, str(docs_dir), out, once=True, gate=True,
        baseline_path=str(base_dir), metric_sink=sink,
        max_files_per_trigger=1,
    )
    assert stats["psi_batches"] == 2
    psis = [p["ingest_psi_quality_score"][1] for p in sink.pushes]
    assert len(psis) == 2
    assert psis[0] < 0.1, psis       # same distribution as baseline
    assert psis[1] > 0.25, psis      # the shift trips the action alarm
    assert all(
        p["ingest_batch_docs"][1] == 120.0 for p in sink.pushes
    )


def test_run_dedup_production_fingerprint_width(spark, tmp_path):
    """--bits 64: the production fingerprint runs through the same
    index; an exact duplicate (Hamming 0 at any width) is still
    caught, and distinct docs stop colliding."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base), (1, base), (2, "totally different words here x y z")]
    with open(docs_dir / "part-0.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    out = str(tmp_path / "verdicts")
    stats = run_dedup(spark, str(docs_dir), out, once=True, bits=64)
    v = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert stats["docs"] == 3
    assert v[1]["is_dup"] and v[1]["dup_of"] == 0
    assert not v[0]["is_dup"] and not v[2]["is_dup"]


def test_streaming_neardup_ttl_evicts_idle_buckets(spark, tmp_path):
    """ttl_ms bounds state for unbounded streams: a duplicate arriving
    AFTER the horizon is not flagged (its bucket was evicted), while
    the default keeps flagging it forever."""
    import time as _time

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

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    data_dir = tmp_path / "docs"
    data_dir.mkdir()
    with open(data_dir / "f0.json", "w") as f:
        f.write(json.dumps({"doc_id": 0, "text": text}) + "\n")

    def stream():
        return (
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

    def drain(ttl_ms, chk):
        verdicts = {}

        def grab(df, _bid):
            for r in neardup_verdicts(df).collect():
                verdicts[r["doc_id"]] = r["is_dup"]

        q = (
            streaming_neardup_evidence(
                stream(), "doc_id", "fp", ttl_ms=ttl_ms
            )
            .writeStream.outputMode("update")
            .foreachBatch(grab)
            .option("checkpointLocation", str(tmp_path / chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return verdicts

    # Seed doc 0 under both policies.
    v1 = drain(ttl_ms=1, chk="chk_ttl")
    v2 = drain(ttl_ms=None, chk="chk_forever")
    assert v1 == {0: False} and v2 == {0: False}

    # A duplicate lands AFTER the 1 ms horizon has long passed.
    _time.sleep(0.2)
    with open(data_dir / "f1.json", "w") as f:
        f.write(json.dumps({"doc_id": 7, "text": text}) + "\n")

    v1 = drain(ttl_ms=1, chk="chk_ttl")
    v2 = drain(ttl_ms=None, chk="chk_forever")
    assert v1[7] is False  # bucket evicted: no memory of doc 0
    assert v2[7] is True   # unbounded state still remembers doc 0


def test_streaming_image_ingest_dedup_across_batches(spark, tmp_path):
    """Streaming MEDIA ingest dedup (round 5): BMP payloads stream in,
    aHash fingerprints are computed IN-STREAM (image_ahashes is a
    stateless mapInPandas projection, so the banded index stays the
    query's only stateful op), and a later re-encode of an earlier
    image is flagged across the micro-batch boundary — the streaming
    twin of the cross-modality batch composition: any modality's
    fingerprint rides the one near-dup machinery."""
    import os
    import shutil
    import struct

    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        image_ahashes,
        synth_bmp,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
        neardup_verdicts,
        streaming_neardup_evidence,
    )

    def random_bmp(seed):
        rng = np.random.default_rng(seed)
        shell = bytearray(synth_bmp(16, 16))
        (offset,) = struct.unpack_from("<I", bytes(shell), 10)
        px = rng.integers(0, 256, size=len(shell) - offset, dtype=np.uint8)
        shell[offset:] = px.tobytes()
        return bytes(shell)

    base = random_bmp(4)
    corrupted = bytearray(base)
    for off in range(60, 66):
        corrupted[-off] ^= 0x07

    stream_dir = tmp_path / "imgs"
    stream_dir.mkdir()

    def write_day(name, rows, mtime):
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(
            rows, "doc_id long, payload binary"
        ).coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(
            p for p in os.listdir(staging) if p.endswith(".parquet")
        )
        dst = stream_dir / f"{name}.parquet"
        shutil.copy(staging / part, dst)
        os.utime(dst, (mtime, mtime))

    write_day("day1", [(0, base), (1, random_bmp(9))], 1_000_000_000)
    write_day(
        "day2",
        [(10, bytes(corrupted)), (11, random_bmp(23))],
        1_000_000_100,
    )

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    emitted = []
    q = (
        streaming_neardup_evidence(
            image_ahashes(stream), "doc_id", "simhash",
            max_hamming=3, bits=64,
        )
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: emitted.append(
                (bid, neardup_verdicts(df).collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "chk_img"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain"

    got = {}
    for _, rows in emitted:
        for r in rows:
            got[r["doc_id"]] = (r["is_dup"], r["dup_of"])
    assert got[10] == (True, 0)      # day-2 re-encode vs day-1 state
    assert got[0] == (False, None)
    assert got[1] == (False, None)
    assert got[11] == (False, None)
    assert len(emitted) >= 2         # the index crossed the boundary


def test_run_dedup_batch_index_retention(spark, tmp_path):
    """--index-retain-min-id (round 5): the batch twin of the
    streaming TTL — fingerprints below the floor leave the index after
    the ingest, so a later near-copy of an EVICTED doc is no longer
    flagged, while the index stays bounded by the dedup horizon."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run_pipeline import run_dedup_batch

    base = " ".join(f"w{i}" for i in range(120))
    idx = str(tmp_path / "fp_index")

    def write_batch(name, rows):
        d = tmp_path / name
        d.mkdir()
        with open(d / "part-0.json", "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        return str(d)

    day1 = write_batch("day1", [(0, base)])
    s1 = run_dedup_batch(
        spark, day1, str(tmp_path / "v1"), idx, retain_min_id=5
    )
    # doc 0 fell below the floor immediately after ingest
    assert s1 == {"docs": 1, "dups": 0, "index_rows": 0}

    day2 = write_batch("day2", [(10, base + " lambda")])
    s2 = run_dedup_batch(spark, day2, str(tmp_path / "v2"), idx)
    v = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "v2")).collect()}
    assert not v[10]["is_dup"]       # its twin was evicted
    assert s2["index_rows"] == 1     # only the new fingerprint remains
