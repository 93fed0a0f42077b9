"""Exotic-codec plug-in adapter proof (round 6, VERDICT r5 item 7).

The pure-Python codecs raise ``NotImplementedError`` on exotic
features (progressive JPEG, interlaced GIF, ...); ``fallback=`` on
``image_ahashes``/``resize_images`` is the documented plug-in point.
This module EXECUTES that contract instead of asserting it in prose:

* the fake-fallback test runs everywhere and proves the routing — an
  interlaced-flagged GIF raises without a fallback and lands in the
  fallback (inside the real Arrow ``mapInPandas`` operator, i.e.
  across the Python-worker process boundary) with one;
* the PIL tests run whenever PIL is importable (skip otherwise) and
  assert placement-consistent aHash between the PIL-decoded exotic
  payload and the pure-Python baseline decode of the same raster.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
    ahash64,
    decode_gif,
    image_ahashes,
    synth_gif,
)

# GIF interlace pass order (GIF89a appendix E): row strides 8/8/4/2
# with starts 0/4/2/1.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_gif(width: int, height: int, seed: int = 0) -> bytes:
    """A REAL interlaced GIF: same raster as ``synth_gif`` but with
    rows stored in interlace pass order and the interlace flag set —
    a conforming decoder must de-interlace back to the baseline
    raster."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        _gif_palette,
        _lzw_compress,
    )

    n_colors = 4
    bits = max(2, (n_colors - 1).bit_length())
    table_n = 1 << bits
    palette = _gif_palette(n_colors, seed) + [(0, 0, 0)] * (table_n - n_colors)
    row_order = [
        y
        for start, step in _INTERLACE_PASSES
        for y in range(start, height, step)
    ]
    indices = bytes(
        (x + 3 * y + seed) % n_colors for y in row_order for x in range(width)
    )
    mcs = bits
    lzw = _lzw_compress(indices, mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF0 | (bits - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    # image descriptor with the interlace flag (0x40) set
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0x40)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _fake_gradient_fallback():
    """Deterministic stand-in decoder: any payload becomes the fixed
    16x16 gradient raster. Returned as a CLOSURE, not a module-level
    function — cloudpickle ships closures by value, while module-level
    functions pickle by (module, qualname) reference, and the test
    module is not importable on executor Python workers."""

    def decode(payload, mime):
        import numpy as np

        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        return np.stack([g, g, g], axis=2)

    return decode


def _pil_rgb_fallback():
    """The real adapter the operator docstring documents: PIL decode
    to RGB (closure for the same cloudpickle-by-value reason)."""

    def decode(payload, mime):
        from io import BytesIO

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(BytesIO(payload)).convert("RGB"))

    return decode


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _ahash_of(spark, payload: bytes, fallback=None) -> int:
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    [row] = image_ahashes(df, fallback=fallback).collect()
    return row["simhash"]


def test_interlaced_gif_raises_without_fallback_and_routes_with(spark):
    """The plumbing proof, no PIL needed: the interlaced payload must
    reach the fallback inside the distributed operator."""
    blob = _interlaced_gif(16, 16)
    with pytest.raises(Exception, match="interlaced GIF"):
        _ahash_of(spark, blob)
    fake = _fake_gradient_fallback()
    got = _ahash_of(spark, blob, fallback=fake)
    assert got == ahash64(fake(b"", "image/gif"))
    # baseline payloads must NOT divert through the fallback
    base = synth_gif(16, 16)
    assert _ahash_of(spark, base, fallback=fake) == _ahash_of(spark, base)


def test_interlaced_gif_via_pil_is_placement_consistent(spark):
    """PIL de-interlaces back to the exact baseline raster (GIF is
    lossless), so the aHash must be IDENTICAL to the pure-Python
    decode of the non-interlaced twin."""
    pytest.importorskip("PIL")
    base = synth_gif(24, 16, seed=3)
    inter = _interlaced_gif(24, 16, seed=3)
    # PIL must agree with the pure decoder on the baseline raster too
    _w, _h, px = decode_gif(base)
    pil = _pil_rgb_fallback()
    assert np.array_equal(pil(base, "image/gif"), px)
    assert _ahash_of(spark, inter, fallback=pil) == _ahash_of(spark, base)


def test_progressive_jpeg_via_pil_is_placement_consistent(spark):
    """A PROGRESSIVE JPEG of a per-8x8-block-constant raster decodes
    (via the PIL fallback) to an aHash placement-consistent with the
    pure-Python decode of PIL's BASELINE encoding of the same raster —
    block-constant rasters survive JPEG near-exactly (DC-only), so the
    two hashes may differ only in boundary-threshold bits."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from io import BytesIO

    from PIL import Image

    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, size=(4, 6), dtype=np.uint8)
    raster = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    img = Image.fromarray(raster, mode="L")
    prog, base = BytesIO(), BytesIO()
    img.save(prog, format="JPEG", quality=95, progressive=True)
    img.save(base, format="JPEG", quality=95, progressive=False)

    with pytest.raises(Exception, match="non-baseline JPEG"):
        _ahash_of(spark, prog.getvalue())
    h_prog = _ahash_of(spark, prog.getvalue(), fallback=_pil_rgb_fallback())
    h_base = _ahash_of(spark, base.getvalue())
    assert _hamming(h_prog, h_base) <= 2, (h_prog, h_base)
