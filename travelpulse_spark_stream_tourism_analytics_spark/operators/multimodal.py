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


def round6_half_up(v: float) -> float:
    """SQL engines round half AWAY from zero; Python's round() is
    banker's (half-even) and disagrees on exact .xxxxxx5 ties (which
    really occur: integer byte sums over power-of-two lengths). Keeps
    the Python codec paths SQL-oracle-compatible."""
    import math

    return math.floor(v * 1e6 + 0.5) / 1e6


def extract_blob_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real decoders (image resize, frame sampling, mel spectrograms)
    slot into `_features_of`; the stub derives deterministic numeric
    features from the bytes themselves so tests exercise identical
    plumbing.
    """

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


# --- Real pure-Python codecs (VERDICT r2 item 7) -------------------------
#
# BMP and WAV are fully header-parseable with the stdlib, so the codec
# step is REAL for them — no stub, no external libs. Other formats
# (JPEG/PNG/MP3/...) still need PIL/librosa and raise.

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
WAV_HEADER_BYTES = 44  # RIFF + fmt(16) + data chunk headers


def bmp_row_stride(width: int, bpp: int = 24) -> int:
    """BMP pixel rows are padded to 4-byte boundaries."""
    return (width * (bpp // 8) + 3) // 4 * 4


def synth_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bpp bottom-up BMP (the classic Windows V3
    layout). Pixel bytes are a pure function of (x, y, seed) so two
    synthesis runs are byte-identical."""
    import struct

    stride = bmp_row_stride(width)
    image_size = stride * height
    file_size = BMP_HEADER_BYTES + image_size
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, BMP_HEADER_BYTES
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height):
        row = bytearray(stride)
        for x in range(width * 3):
            row[x] = (x * 3 + y * 7 + seed) % 256
        rows.append(bytes(row))
    return header + b"".join(rows)


def synth_wav(
    n_samples: int, sample_rate: int = 8000, channels: int = 1, seed: int = 0
) -> bytes:
    """Deterministic 16-bit PCM WAV."""
    import struct

    bytes_per_frame = channels * 2
    data_size = n_samples * bytes_per_frame
    header = (
        struct.pack("<4sI4s", b"RIFF", 36 + data_size, b"WAVE")
        + struct.pack(
            "<4sIHHIIHH",
            b"fmt ",
            16,
            1,  # PCM
            channels,
            sample_rate,
            sample_rate * bytes_per_frame,
            bytes_per_frame,
            16,
        )
        + struct.pack("<4sI", b"data", data_size)
    )
    frames = bytearray(data_size)
    for i in range(n_samples * channels):
        v = ((i * 37 + seed * 101) % 65536) - 32768
        struct.pack_into("<h", frames, i * 2, v)
    return header + bytes(frames)


def sniff_mime(payload: bytes) -> str:
    """Magic-byte mime detection for the formats the engine decodes."""
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return "application/octet-stream"


def decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """(width, height, bpp) from the BITMAPINFOHEADER. Height is
    stored signed (negative = top-down row order); dimensions are
    reported positive either way."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    return width, abs(height), bpp


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """(channels, sample_rate, n_samples, duration_s) from the fmt and
    data chunks; walks the chunk list so extra chunks (LIST/fact) before
    data are handled."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            _fmt, channels, rate = struct.unpack_from("<HHI", payload, pos + 8)
            (bits,) = struct.unpack_from("<H", payload, pos + 22)
        elif cid == b"data":
            if channels is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n_samples = size // (channels * bits // 8)
            return channels, rate, n_samples, n_samples / rate
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    raise ValueError("WAV missing data chunk")


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def extract_media_features(df: DataFrame) -> DataFrame:
    """REAL (non-stub) codec path: Arrow-batched mapInPandas over
    binary payloads, dispatching on magic bytes — BMP header parse for
    images, RIFF chunk walk for audio. Formats beyond the pure-Python
    decodable set raise (that is where PIL/librosa plug in at
    deployment). Dimension columns are NULL where the modality doesn't
    define them (no width for audio, no duration for stills)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in MEDIA_FEATURE_SCHEMA.names}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                mime = sniff_mime(payload)
                row = dict.fromkeys(MEDIA_FEATURE_SCHEMA.names)
                row.update(doc_id=doc_id, mime=mime, n_bytes=len(payload))
                if mime == "image/bmp":
                    w, h, _bpp = decode_bmp(payload)
                    row.update(width=w, height=h)
                elif mime == "audio/wav":
                    c, r, _n, dur = decode_wav(payload)
                    row.update(
                        channels=c, sample_rate=r,
                        duration_s=round6_half_up(dur),
                    )
                else:
                    raise NotImplementedError(
                        f"no pure-Python codec for {mime}; "
                        "plug PIL/librosa here"
                    )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    k: pd.Series(
                        out[k],
                        dtype="float64" if k == "duration_s" else
                        ("object" if k == "mime" else "Int64"),
                    )
                    for k in MEDIA_FEATURE_SCHEMA.names
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def attach_media_blob(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic multimodal ingest for the oracle round-trip: each
    id synthesizes a real BMP (even ids) or WAV (odd ids) whose
    dimensions are closed-form functions of the id — so a SQL oracle
    can recompute what the decoder must extract without seeing the
    bytes. Synthesis runs executor-side as an Arrow-batched UDF; the
    payload exists as a genuine binary column between synth and
    decode."""

    @F.pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        def make(d: int) -> bytes:
            d = int(d)
            if d % 2 == 0:
                return synth_bmp(1 + d % 7, 1 + d % 5, seed=d)
            n = 100 + d % 50
            channels = 1 if d % 4 == 1 else 2
            return synth_wav(n, 8000, channels, seed=d)

        return ids.map(make)

    return df.withColumn("payload", synth(F.col(id_col)))
