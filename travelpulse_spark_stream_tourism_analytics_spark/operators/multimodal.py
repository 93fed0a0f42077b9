"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row
objects. The actual codec step is STUBBED (no image/audio libs in this
container): `decode_stub=True` computes deterministic fake features
from the raw bytes so the Spark-side plumbing — schema, batching,
partition shape — is real and testable; with `decode_stub=False` the
operator raises NotImplementedError where PIL/librosa would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: utf-8 payload bytes + metadata
    struct (at real scale the binary comes from the source parquet)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def extract_blob_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real decoders (image resize, frame sampling, mel spectrograms)
    slot into `_features_of`; the stub derives deterministic numeric
    features from the bytes themselves so tests exercise identical
    plumbing.
    """

    import math

    def round6_half_up(v: float) -> float:
        # SQL engines round half AWAY from zero; Python's round() is
        # banker's (half-even) and disagrees on exact .xxxxxx5 ties
        # (which really occur: integer byte sums over power-of-two
        # lengths). Keep the Python path SQL-compatible.
        return math.floor(v * 1e6 + 0.5) / 1e6

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codecs unavailable in this container; "
                    "plug PIL/librosa here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda b: round6_half_up(sum(b) / len(b))
                        if len(b)
                        else 0.0
                    ).astype("float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, BLOB_FEATURE_SCHEMA)
