"""Audio clip-in-corpus search (Haitsma-Kalker subfingerprints):
hop-aligned print reproduction, end-to-end retrieval with offset
recovery, noise robustness through BER verification, and a DuckDB
replay of the vote+verify relational stage."""

from __future__ import annotations

import numpy as np
import pytest

from travelpulse_spark_stream_tourism_analytics_spark.operators.audio_search import (
    audio_subfingerprints,
    match_audio_clip,
    subfingerprints_of,
)
from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
    synth_wav,
)

FRAME, HOP = 256, 128


def wav_of(samples: np.ndarray) -> bytes:
    shell = bytearray(synth_wav(len(samples), 8000, 1))
    arr = np.asarray(samples, dtype="<i2").tobytes()
    shell[-len(arr):] = arr
    return bytes(shell)


def tracks_fixture():
    rng = np.random.default_rng(11)
    return {
        t: (rng.standard_normal(8000) * 2500).astype(np.int64)
        for t in range(5)
    }


def test_hop_aligned_clip_reproduces_print_stream():
    """A clip cut at offset k*hop emits EXACTLY the track's prints
    k..k+len — the alignment contract the offset vote relies on."""
    tracks = tracks_fixture()
    x = tracks[3]
    k = 17
    clip = x[k * HOP : k * HOP + 3000]
    full = subfingerprints_of(x, 1, FRAME, HOP)
    got = subfingerprints_of(clip, 1, FRAME, HOP)
    assert len(got) > 10
    assert got == full[k : k + len(got)]
    # 31-bit range
    assert all(0 <= v < (1 << 31) for v in full)


def test_clip_search_recovers_track_and_offset(spark):
    """End to end: index 5 tracks, search an exact excerpt and a
    noised excerpt of track 3 at offset 17 — both verify at (3, 17)
    and nothing else verifies; an unseen clip verifies nowhere."""
    tracks = tracks_fixture()
    corpus = spark.createDataFrame(
        [(t, wav_of(x)) for t, x in tracks.items()],
        "doc_id long, payload binary",
    )
    index = audio_subfingerprints(corpus).persist()

    k = 17
    clip = tracks[3][k * HOP : k * HOP + 3000]

    def search(samples):
        q = audio_subfingerprints(
            spark.createDataFrame(
                [(0, wav_of(samples))], "doc_id long, payload binary"
            )
        )
        return {
            (r["doc_id"], r["offset"]): (r["votes"], r["ber"], r["verified"])
            for r in match_audio_clip(index, q).collect()
        }

    exact = search(clip)
    verified = {key for key, v in exact.items() if v[2]}
    assert verified == {(3, k)}
    assert exact[(3, k)][1] == 0.0  # exact excerpt: zero bit errors

    rng = np.random.default_rng(7)
    noisy = clip + rng.integers(-60, 60, size=len(clip))
    got = search(noisy)
    verified = {key for key, v in got.items() if v[2]}
    assert verified == {(3, k)}
    assert got[(3, k)][1] < 0.25

    unseen = (rng.standard_normal(3000) * 2500).astype(np.int64)
    assert not any(v[2] for v in search(unseen).values())
    index.unpersist()


def test_match_stage_duckdb_parity(spark, tmp_path):
    """The relational search stage (exact-print join -> offset votes ->
    aligned BER -> verdict) replays identically in DuckDB from the
    same print tables — pinning the join/vote/verify logic separately
    from the signal processing."""
    duckdb = pytest.importorskip("duckdb")

    tracks = tracks_fixture()
    corpus = spark.createDataFrame(
        [(t, wav_of(x)) for t, x in tracks.items()],
        "doc_id long, payload binary",
    )
    index = audio_subfingerprints(corpus)
    k = 9
    clip = tracks[1][k * HOP : k * HOP + 2500]
    rng = np.random.default_rng(3)
    q = audio_subfingerprints(
        spark.createDataFrame(
            [(0, wav_of(clip + rng.integers(-40, 40, size=len(clip))))],
            "doc_id long, payload binary",
        )
    )
    index.write.mode("overwrite").parquet(str(tmp_path / "idx.parquet"))
    q.write.mode("overwrite").parquet(str(tmp_path / "q.parquet"))

    got = {
        (r["doc_id"], r["offset"]): (
            r["votes"], r["n_aligned"], r["ber"], r["verified"]
        )
        for r in match_audio_clip(index, q).collect()
    }
    n_q = q.count()
    duck = {
        (int(d), int(o)): (int(v), int(na), b, bool(ver))
        for d, o, v, na, b, ver in duckdb.sql(f"""
            WITH idx AS (SELECT * FROM '{tmp_path}/idx.parquet/*.parquet'),
            q AS (SELECT frame_idx AS q_idx, subprint AS q_print
                  FROM '{tmp_path}/q.parquet/*.parquet'),
            cand AS (
                SELECT doc_id, i.frame_idx - q.q_idx AS offset,
                       count(*) AS votes
                FROM idx i JOIN q ON i.subprint = q.q_print
                WHERE i.frame_idx - q.q_idx >= 0
                GROUP BY 1, 2
                HAVING count(*) >= 3
            )
            SELECT i.doc_id, c.offset, c.votes,
                   count(*) AS n_aligned,
                   round(sum(bit_count(xor(i.subprint, q.q_print)))
                         / (31.0 * count(*)), 6) AS ber,
                   count(*) = {n_q}
                   AND round(sum(bit_count(xor(i.subprint, q.q_print)))
                             / (31.0 * count(*)), 6) <= 0.25 AS verified
            FROM idx i
            JOIN cand c ON c.doc_id = i.doc_id
            JOIN q ON q.q_idx = i.frame_idx - c.offset
            WHERE i.frame_idx - c.offset BETWEEN 1 AND {n_q}
            GROUP BY 1, 2, 3
        """).fetchall()
    }
    assert duck == got
    assert any(v[3] for v in got.values())  # the planted match verifies
