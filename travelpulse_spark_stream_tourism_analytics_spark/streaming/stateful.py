"""Custom stateful streaming operators via Arrow-batched
``applyInPandasWithState`` (north-star streaming surface; the
reference has no custom state at all — SURVEY.md §2.8 'not present').

``running_user_totals`` keeps a per-key (count, sum) accumulator in the
state store and emits the updated totals every micro-batch — the
building block for running leaderboards without recomputing windows.
On Spark 4 the same shape could move to ``transformWithStateInPandas``
(ValueState + timers), but in this environment its Python driver
worker exits unexpectedly even with the RocksDB state store provider
(probed 2026-08; "TransformWithStateInPySpark driver worker exited
unexpectedly"), so ``applyInPandasWithState`` — stable since 3.4 — is
the supported custom-state path here.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Cumulative per-key (count, sum) across micro-batches.

    State is O(keys); each batch shuffles only its own rows to the
    key's state partition — no window recomputation, no growing state
    per event.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"key": [str(key[0])], "total_events": [n], "total_value": [round(total, 6)]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Streaming near-duplicate detection ----------------------------------

NEARDUP_EVIDENCE = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("dup_of", T.LongType()),
    ]
)
_NEARDUP_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("fps", T.ArrayType(T.LongType())),
    ]
)

# 16-bit popcount lookup (numpy<2 lacks bitwise_count); int16 suffices
# for per-chunk counts and their 4-chunk sums (<= 64).
import numpy as _np  # noqa: E402

_POPCOUNT16 = _np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=_np.int16
)


def streaming_neardup_evidence(
    df: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    bits: int = 16,
    n_bands: int | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Online SimHash near-duplicate detection over a document stream —
    the ingest-time dedup a streaming training-data pipeline needs
    (batch twin: ``operators/dedup.simhash_neardup_pairs``).

    Input: a streaming DataFrame carrying ``id_col`` and a precomputed
    SimHash fingerprint ``fp_col`` (a stateless projection, e.g.
    ``simhash16_expr`` over the distinct-word array — no upstream
    stateful stage, so this operator is the query's ONLY stateful op).
    Each document fans out to its ``n_bands`` pigeonhole band keys
    (``n_bands > max_hamming`` gives exact recall: a pair within the
    Hamming radius must agree on some band). Per band-bucket state is
    the fingerprint index of every document seen; an arriving document
    emits one evidence row per band with ``dup_of`` = the smallest
    earlier doc id within ``max_hamming``, or NULL.

    CONTRACT (what the parity test pins): when documents arrive in
    id order, ``dup_of IS NOT NULL`` for some band of doc d exactly
    when the batch operator emits a pair (e, d) with e < d over the
    same corpus — the streaming view of the same banded pigeonhole.
    Reduce per-doc with :func:`neardup_verdicts` (runs complete inside
    each micro-batch: a doc's band rows never split across batches).

    Scale: state is O(corpus) split across ``n_bands * 2^(bits /
    n_bands)`` bucket keys — use a wider fingerprint at production
    scale exactly as in the batch operator (16-bit buckets saturate,
    documented in SOAK_r3). Buckets are independent, so state
    partitions by band key with no cross-key coordination; eviction
    policy (drop fingerprints older than the dedup horizon) would
    attach here as a state timeout.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError("n_bands must exceed max_hamming (pigeonhole)")
    band_bits = bits // n_bands
    if band_bits * n_bands != bits:
        raise ValueError(f"bits={bits} not divisible by n_bands={n_bands}")
    mask = (1 << band_bits) - 1

    from pyspark.sql import functions as F

    banded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(fp_col).alias("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(fp_col, b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id",
        "fp",
        F.col("band.band_idx").alias("band_idx"),
        (F.col("band.band_idx") * (mask + 1) + F.col("band.band_val")).alias(
            "band_key"
        ),
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "band_idx": pd.Series([], dtype="int32"),
                    "dup_of": pd.Series([], dtype="Int64"),
                }
            )
            return

        ids, fps = ([], []) if not state.exists else [
            list(v) for v in state.get
        ]
        # Growable numpy index: the per-doc scan is a vectorized
        # XOR + popcount over the whole bucket (a Python inner loop
        # measured ~60x slower on a saturated bucket). Popcount via
        # 16-bit table lookups (numpy<2 has no bitwise_count).
        n = len(ids)
        cap = max(64, 2 * n)
        id_buf = np.empty(cap, dtype=np.int64)
        fp_buf = np.empty(cap, dtype=np.int64)
        if n:
            id_buf[:n] = ids
            fp_buf[:n] = fps
        out_ids, out_bands, out_dups = [], [], []
        for pdf in pdfs:
            # id order = arrival order within the batch: matches the
            # batch operator's (id_a < id_b) pair orientation.
            for doc_id, fp, band_idx in sorted(
                zip(pdf["doc_id"], pdf["fp"], pdf["band_idx"])
            ):
                doc_id, fp = int(doc_id), int(fp)
                dup_of = None
                if n:
                    x = np.bitwise_xor(fp_buf[:n], np.int64(fp))
                    d = _POPCOUNT16[x & 0xFFFF]
                    for shift in (16, 32, 48):
                        d = d + _POPCOUNT16[(x >> shift) & 0xFFFF]
                    hit = d <= max_hamming
                    if hit.any():
                        dup_of = int(id_buf[:n][hit].min())
                if n == cap:
                    cap *= 2
                    id_buf = np.resize(id_buf, cap)
                    fp_buf = np.resize(fp_buf, cap)
                id_buf[n] = doc_id
                fp_buf[n] = fp
                n += 1
                out_ids.append(doc_id)
                out_bands.append(int(band_idx))
                out_dups.append(dup_of)
        state.update((id_buf[:n].tolist(), fp_buf[:n].tolist()))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "band_idx": pd.Series(out_bands, dtype="int32"),
                "dup_of": pd.Series(out_dups, dtype="Int64"),
            }
        )

    return banded.groupBy("band_key").applyInPandasWithState(
        update,
        outputStructType=NEARDUP_EVIDENCE,
        stateStructType=_NEARDUP_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def neardup_verdicts(evidence: DataFrame) -> DataFrame:
    """Per-document reduction of band evidence: (doc_id, is_dup,
    dup_of) where dup_of is the smallest matching earlier id across
    bands. Batch transform — inside a streaming query it runs per
    micro-batch (foreachBatch), which is complete because a document's
    band rows all land in its arrival batch."""
    from pyspark.sql import functions as F

    return evidence.groupBy("doc_id").agg(
        (F.count("dup_of") > 0).alias("is_dup"),
        F.min("dup_of").alias("dup_of"),
    )
