"""Pure-Python codec tests (BMP/WAV header parsers) + the Spark-side
media feature plumbing. The synth->decode round-trip is also oracled
end-to-end in the catalog (multimodal_blob_pipeline 'media' branch);
these tests cover the parser edge cases a closed-form oracle cannot."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
    attach_media_blob,
    bmp_row_stride,
    decode_bmp,
    decode_bmp_pixels,
    decode_png,
    decode_wav,
    decode_wav_samples,
    extract_media_features,
    sniff_mime,
    synth_bmp,
    synth_png,
    synth_wav,
)


def test_bmp_roundtrip_and_stride_padding():
    # width 5 at 24bpp -> 15 payload bytes/row, padded to 16.
    assert bmp_row_stride(5) == 16
    b = synth_bmp(5, 3, seed=9)
    assert sniff_mime(b) == "image/bmp"
    assert decode_bmp(b) == (5, 3, 24)
    assert len(b) == 54 + 3 * 16
    # deterministic: same args, same bytes
    assert b == synth_bmp(5, 3, seed=9)
    assert b != synth_bmp(5, 3, seed=10)


def test_bmp_top_down_height_reported_positive():
    b = bytearray(synth_bmp(4, 2))
    struct.pack_into("<i", b, 22, -2)  # negative height = top-down order
    assert decode_bmp(bytes(b)) == (4, 2, 24)


def test_wav_matches_stdlib_wave_module():
    payload = synth_wav(120, 8000, 2, seed=3)
    assert sniff_mime(payload) == "audio/wav"
    c, r, n, dur = decode_wav(payload)
    wf = wave.open(io.BytesIO(payload))
    assert (c, r, n) == (
        wf.getnchannels(), wf.getframerate(), wf.getnframes()
    )
    assert dur == pytest.approx(120 / 8000)


def test_wav_chunk_walk_skips_extra_chunks():
    """Real-world WAVs carry LIST/fact chunks between fmt and data; the
    decoder walks the chunk list instead of assuming fixed offsets."""
    base = synth_wav(50, 16000, 1)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 7) + b"INFOxyz" + b"\x00"  # odd size, padded
    patched = base[:fmt_end] + extra + base[fmt_end:]
    assert decode_wav(patched) == (1, 16000, 50, 50 / 16000)


def test_codecs_reject_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    # RIFF/WAVE but truncated before any data chunk
    with pytest.raises(ValueError):
        decode_wav(struct.pack("<4sI4s", b"RIFF", 4, b"WAVE"))
    # a truncated PNG signature is not a PNG
    assert sniff_mime(b"\x89PNG\r\n") == "application/octet-stream"
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n....")  # signature but no IHDR


def test_png_roundtrip_all_filter_types():
    """The synthesizer encodes row y with filter (y + seed) % 5, so a
    height-5 image with seed 0 exercises None/Sub/Up/Average/Paeth in
    one payload; the decoder must invert every one to reproduce the
    gradient exactly."""
    import numpy as np

    for seed in range(7):
        w, h = 1 + seed % 6, 5 + seed % 5
        payload = synth_png(w, h, seed=seed)
        assert sniff_mime(payload) == "image/png"
        width, height, channels, px = decode_png(payload)
        assert (width, height, channels) == (w, h, 3)
        expected = np.array(
            [[(i * 3 + y * 7 + seed) % 256 for i in range(w * 3)]
             for y in range(h)],
            dtype=np.uint8,
        )
        assert (px.reshape(h, w * 3) == expected).all()
        assert payload == synth_png(w, h, seed=seed)  # deterministic


def test_png_rgba_and_unsupported_shapes():
    import numpy as np

    payload = synth_png(4, 6, seed=2, channels=4)
    width, height, channels, px = decode_png(payload)
    assert (width, height, channels) == (4, 6, 4)
    expected = np.array(
        [[(i * 3 + y * 7 + 2) % 256 for i in range(16)] for y in range(6)],
        dtype=np.uint8,
    )
    assert (px.reshape(6, 16) == expected).all()
    # 16-bit / palette / interlaced variants raise NotImplementedError
    # (the PIL plug-in point), not silent garbage: patch IHDR depth.
    bad = bytearray(synth_png(3, 3))
    bad[8 + 8 + 8] = 16  # IHDR bit-depth byte
    # fix the CRC so the failure is the depth check, not chunk parsing
    import zlib

    crc = zlib.crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", bad, 8 + 8 + 13, crc)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(bad))


def test_pixel_and_sample_decode_means():
    """content_mean comes from the decoded bytes, not the container:
    BMP mean excludes stride padding; WAV mean is over int16 samples
    (negative values included)."""
    import numpy as np

    px = decode_bmp_pixels(synth_bmp(5, 4, seed=9))
    assert px.shape == (4, 5, 3)  # h x w x RGB, no padding columns
    assert px.mean() == pytest.approx(
        np.mean([[(x * 3 + y * 7 + 9) % 256 for x in range(15)]
                 for y in range(4)])
    )
    # Placement: image row 0 is the BOTTOM stored row (BMP is
    # bottom-up) and channels come back RGB (storage is BGR) — the
    # top-left pixel's (R, G, B) are stored row h-1's bytes (2, 1, 0).
    assert tuple(px[0, 0]) == tuple(
        (i * 3 + 3 * 7 + 9) % 256 for i in (2, 1, 0)
    )
    samples = decode_wav_samples(synth_wav(100, 8000, 2, seed=7))
    assert samples.dtype == np.dtype("<i2") and len(samples) == 200
    assert samples.min() < 0  # PCM ramp wraps negative


def test_extract_media_features_plumbing(spark):
    """Binary payloads survive the Arrow boundary and the decoder
    dispatch; unknown formats fail loudly (that is the PIL/librosa
    plug-in point, not a silent null)."""
    from pyspark.sql import functions as F

    docs = spark.range(0, 20).union(spark.range(200, 210)).select(
        F.col("id").alias("doc_id")
    )
    out = {
        r["doc_id"]: r
        for r in extract_media_features(attach_media_blob(docs)).collect()
    }
    assert len(out) == 30
    assert out[6]["mime"] == "image/bmp"
    assert out[6]["width"] == 1 + 6 % 7 and out[6]["height"] == 1 + 6 % 5
    assert out[6]["channels"] is None
    assert out[13]["mime"] == "audio/wav"
    assert out[13]["channels"] == 1 and out[13]["sample_rate"] == 8000
    assert out[13]["duration_s"] == pytest.approx((100 + 13 % 50) / 8000)
    assert out[13]["width"] is None
    assert out[205]["mime"] == "image/png"
    assert out[205]["width"] == 1 + 205 % 6
    assert out[205]["height"] == 1 + 205 % 9
    assert out[205]["channels"] == 3
    assert out[205]["content_mean"] is not None

    pdf = spark.createDataFrame(
        [(1, bytearray(b"%PDF-1.4...."))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="no pure-Python codec"):
        extract_media_features(pdf).collect()


def test_resize_images_nearest_neighbor_reference(spark):
    """Resize: engine output equals an independent per-pixel
    recomputation of the floor-index NN mapping on the same payloads,
    and shrinking genuinely changes the raster stats."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_bmp_pixels,
        resize_images,
        synth_bmp,
        synth_png,
    )

    payloads = [(0, synth_bmp(10, 7, seed=3)), (1, synth_png(9, 6, seed=5))]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in resize_images(df, 4, 3).collect()}

    # Independent reference for the BMP: manual NN loops.
    px = decode_bmp_pixels(payloads[0][1])
    ref = np.zeros((3, 4, 3), dtype=np.uint8)
    for i in range(3):
        for j in range(4):
            ref[i, j] = px[(i * 7) // 3, (j * 10) // 4]
    assert out[0]["resized_mean"] == round(float(ref.mean()), 6)
    assert out[0]["corner_sum"] == (
        int(ref[0, 0, 0]) + int(ref[0, -1, 0])
        + int(ref[-1, 0, 0]) + int(ref[-1, -1, 0])
    )
    assert out[1]["out_width"] == 4 and out[1]["out_height"] == 3
    # Shrink really resamples: mean of a strict subset of pixels.
    assert out[0]["resized_mean"] != round(float(px.mean()), 6)


def test_sample_audio_frames_uniform_indices(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_wav_samples,
        sample_audio_frames,
        synth_wav,
    )

    wav = synth_wav(sample_rate=8000, n_samples=100, seed=2)
    df = spark.createDataFrame([(5, wav)], "doc_id long, payload binary")
    row = sample_audio_frames(df, 8).collect()[0]
    samples = decode_wav_samples(wav)
    assert row["n_source_samples"] == len(samples)
    expected = [int(samples[(i * len(samples)) // 8]) for i in range(8)]
    assert row["sampled"] == expected


def test_image_neardup_via_ahash_banded_hamming(spark):
    """Image near-dup detection end to end: perceptual aHash + the
    text pipeline's banded-Hamming pair machinery. A lightly corrupted
    copy pairs with its original; unrelated images don't."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators import (
        dedup,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        ahash64,
        decode_bmp_pixels,
        image_ahashes,
        synth_bmp,
    )

    import struct

    def random_bmp(seed):
        # synth_bmp's sawtooth is perceptually IDENTICAL across seeds
        # (aHash correctly maps all of them to the same fingerprint);
        # unrelated images need unrelated random rasters.
        rng = np.random.default_rng(seed)
        shell = bytearray(synth_bmp(16, 16))
        (offset,) = struct.unpack_from("<I", bytes(shell), 10)
        px = rng.integers(0, 256, size=len(shell) - offset, dtype=np.uint8)
        shell[offset:] = px.tobytes()
        return bytes(shell)

    base = random_bmp(4)
    # Corrupt a few payload bytes inside the pixel area: a near-dup.
    corrupted = bytearray(base)
    for off in range(60, 66):
        corrupted[-off] ^= 0x07
    corrupted = bytes(corrupted)
    px_b = decode_bmp_pixels(base)
    px_c = decode_bmp_pixels(corrupted)
    d = bin(
        (ahash64(px_b) ^ ahash64(px_c)) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 3, d  # the corruption stays within the radius

    rows = [
        (0, base),
        (1, corrupted),
        (2, random_bmp(9)),
        (3, random_bmp(11)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = dedup.simhash_neardup_pairs(
        image_ahashes(df), "doc_id", max_hamming=3, bits=64, n_bands=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got), got


def test_bmp_png_cross_format_placement_consistency():
    """ADVICE r3: the same picture stored as BMP and PNG must decode
    to the identical top-down RGB raster — and therefore fingerprint
    identically (aHash) and produce the same placement-sensitive
    corner stats — or cross-format near-dup detection is broken."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        ahash64,
        bmp_from_pixels,
        png_from_pixels,
        resize_nn,
    )

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    bmp, png = bmp_from_pixels(px), png_from_pixels(px, seed=3)
    assert sniff_mime(bmp) == "image/bmp"
    assert sniff_mime(png) == "image/png"
    got_bmp = decode_bmp_pixels(bmp)
    _w, _h, _c, got_png = decode_png(png)
    assert (got_bmp == px).all()
    assert (got_png == px).all()
    assert ahash64(got_bmp) == ahash64(got_png)
    rz_b, rz_p = resize_nn(got_bmp, 4, 4), resize_nn(got_png, 4, 4)
    assert (rz_b == rz_p).all()


def test_bmp_top_down_pixel_decode():
    """A negative stored height means the BMP is already top-down; the
    decoder must NOT flip those rows."""
    import struct

    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        bmp_from_pixels,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    bottom_up = bytearray(bmp_from_pixels(px))
    # Rewrite as top-down: negate height, reverse the row order.
    (offset,) = struct.unpack_from("<I", bytes(bottom_up), 10)
    stride = bmp_row_stride(3)
    rows = [
        bytes(bottom_up[offset + y * stride : offset + (y + 1) * stride])
        for y in range(4)
    ]
    struct.pack_into("<i", bottom_up, 22, -4)
    top_down = bytes(bottom_up[:offset]) + b"".join(reversed(rows))
    assert (decode_bmp_pixels(top_down) == px).all()


def test_sample_audio_frames_empty_data_chunk(spark):
    """A WAV with an empty data chunk yields an empty sample list, not
    an IndexError inside the mapInPandas worker (ADVICE r3)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        sample_audio_frames,
    )

    wav = synth_wav(n_samples=0, sample_rate=8000)
    df = spark.createDataFrame(
        [(1, wav), (2, synth_wav(n_samples=40, sample_rate=8000, seed=3))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in sample_audio_frames(df, 4).collect()}
    assert rows[1]["n_source_samples"] == 0 and rows[1]["sampled"] == []
    assert rows[2]["n_source_samples"] == 40 and len(rows[2]["sampled"]) == 4


def test_jpeg_roundtrip_block_constant_exact():
    """Baseline JPEG: with the DC quantizer at 8, block-constant
    rasters survive quantization exactly — the synth->decode
    round-trip reproduces every pixel."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg,
    )

    for seed in range(8):
        bw, bh = 1 + seed % 4, 1 + seed % 3
        p = synth_jpeg(bw, bh, seed=seed)
        assert sniff_mime(p) == "image/jpeg"
        w, h, px = decode_jpeg(p)
        assert (w, h) == (8 * bw, 8 * bh)
        expect = np.zeros((h, w), dtype=np.uint8)
        for by in range(bh):
            for bx in range(bw):
                expect[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    bx * 3 + by * 7 + seed
                ) % 256
        assert (px == expect).all()
        assert p == synth_jpeg(bw, bh, seed=seed)  # deterministic


def test_jpeg_decoder_handles_ac_coefficients():
    """The decoder is a GENERAL baseline decoder, not a DC-only
    shortcut: a hand-built entropy stream with nonzero AC
    coefficients (run-length skips included) must reproduce the
    reference float IDCT within rounding."""
    import math
    import struct

    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        _BitWriter,
        _SYNTH_DC_BITS,
        _SYNTH_DC_VALS,
        _ZIGZAG,
        _huff_codes,
        decode_jpeg,
    )

    # AC table with (run=0,size=2), (run=3,size=1) and EOB.
    ac_bits = [0, 1, 2] + [0] * 13
    ac_vals = [0x00, 0x02, 0x31]
    dc_codes = _huff_codes(_SYNTH_DC_BITS, _SYNTH_DC_VALS)
    ac_codes = _huff_codes(ac_bits, ac_vals)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtab = [8, 2] + [1] * 62  # non-trivial quant on the first AC
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0x00]) + bytes(qtab))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xFFC4, bytes([0x00]) + bytes(_SYNTH_DC_BITS) + bytes(_SYNTH_DC_VALS)
    )
    out += seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    # DC: category 3, value +5
    c, ln = dc_codes[3]
    bw.put(c, ln)
    bw.put(5, 3)
    # AC at zigzag 1: (0,2) value -2 -> magnitude bits 01
    c, ln = ac_codes[0x02]
    bw.put(c, ln)
    bw.put(0b01, 2)
    # skip 3 zeros, then size-1 value +1 at zigzag 5
    c, ln = ac_codes[0x31]
    bw.put(c, ln)
    bw.put(1, 1)
    c, ln = ac_codes[0x00]  # EOB
    bw.put(c, ln)
    out += bw.done() + b"\xff\xd9"

    w, h, px = decode_jpeg(bytes(out))
    assert (w, h) == (8, 8)

    # Independent reference IDCT.
    zz = np.zeros(64)
    zz[0] = 5 * 8.0
    zz[1] = -2 * 2.0
    zz[5] = 1 * 1.0
    block = np.zeros((8, 8))
    block.flat[_ZIGZAG] = zz
    A = np.array(
        [
            [
                (math.sqrt(0.5) if u == 0 else 1.0)
                / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    ref = np.clip(np.floor(A.T @ block @ A + 128.0 + 0.5), 0, 255)
    assert (px == ref.astype(np.uint8)).all()


def test_jpeg_unsupported_shapes_raise():
    import struct

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0junkjunk")
    # 4-component (CMYK) SOF0 -> NotImplementedError (PIL plug-in).
    # (3-component color is decoded natively since round 5.)
    p = bytearray(synth_jpeg(1, 1))
    i = p.find(b"\xff\xc0")
    ncomp_off = i + 4 + 5  # marker(2) len(2) prec(1) h(2) w(2)
    p[ncomp_off] = 4
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(p))
    # progressive SOF2 -> NotImplementedError
    p = bytearray(synth_jpeg(1, 1))
    p[p.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(p))


def test_grayscale_jpeg_ignores_declared_sampling_factors():
    """T.81 A.2: a single-component scan is NON-interleaved whatever
    sampling factors the SOF declares (real encoders emit 2x2 luma
    factors on grayscale output) — flipping the sampling byte must not
    change the decoded raster (round-5 review regression guard)."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg,
    )

    p = bytearray(synth_jpeg(4, 2, seed=9))
    _w, _h, base = decode_jpeg(bytes(p))
    i = p.find(b"\xff\xc0")
    samp_off = i + 4 + 6 + 1  # marker(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1)
    assert p[samp_off] == 0x11
    p[samp_off] = 0x22
    _w2, _h2, hacked = decode_jpeg(bytes(p))
    assert (_w2, _h2) == (_w, _h)
    assert np.array_equal(base, hacked)


def _expected_color_raster(mcus_w, mcus_h, seed, subsampling):
    """Closed-form RGB raster of a synth_jpeg_color fixture."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        jpeg_color_mcu,
        ycbcr_to_rgb_int,
    )

    bw = {"420": 16, "422": 16, "444": 8}[subsampling]
    bh = {"420": 16, "422": 8, "444": 8}[subsampling]
    out = np.zeros((bh * mcus_h, bw * mcus_w, 3), dtype=np.uint8)
    for my in range(mcus_h):
        for mx in range(mcus_w):
            rgb = ycbcr_to_rgb_int(*jpeg_color_mcu(mx, my, seed))
            out[my * bh : (my + 1) * bh, mx * bw : (mx + 1) * bw] = rgb
    return out


def test_color_jpeg_roundtrip_exact_all_subsamplings():
    """Round 5: baseline YCbCr color decode — MCU-constant fixtures
    survive quantization exactly for 4:2:0, 4:2:2 AND 4:4:4, so the
    synth->decode round-trip reproduces every RGB pixel (per-component
    quant/Huffman table selection, interleaved MCU order, chroma
    upsampling, and the float YCbCr->RGB conversion all pinned)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg_color,
    )

    for sub in ("420", "422", "444"):
        for seed in (0, 7, 129, 255):
            mw, mh = 1 + seed % 3, 1 + (seed // 3) % 2
            p = synth_jpeg_color(mw, mh, seed=seed, subsampling=sub)
            assert sniff_mime(p) == "image/jpeg"
            w, h, px = decode_jpeg(p)
            exp = _expected_color_raster(mw, mh, seed, sub)
            assert (w, h) == (exp.shape[1], exp.shape[0])
            assert px.shape == exp.shape
            assert (px == exp).all(), (sub, seed)
            # deterministic bytes
            assert p == synth_jpeg_color(mw, mh, seed=seed, subsampling=sub)


def test_color_jpeg_cross_format_placement_consistency():
    """The same picture stored as color JPEG (both chroma layouts),
    BMP, and PNG must decode to the identical top-down RGB raster —
    and therefore fingerprint identically (aHash) — or cross-format
    near-dup detection is broken for the format that dominates real
    image corpora."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        ahash64,
        bmp_from_pixels,
        decode_jpeg,
        png_from_pixels,
        resize_nn,
        synth_jpeg_color,
    )

    for sub in ("420", "444"):
        seed, mw, mh = 23, 3, 2
        jp = synth_jpeg_color(mw, mh, seed=seed, subsampling=sub)
        _w, _h, px_j = decode_jpeg(jp)
        bmp, png = bmp_from_pixels(px_j), png_from_pixels(px_j, seed=3)
        px_b = decode_bmp_pixels(bmp)
        _w2, _h2, _c, px_p = decode_png(png)
        assert (px_b == px_j).all()
        assert (px_p == px_j).all()
        assert ahash64(px_j) == ahash64(px_b) == ahash64(px_p)
        assert (resize_nn(px_j, 4, 4) == resize_nn(px_b, 4, 4)).all()


def test_color_jpeg_media_features_and_ahash(spark):
    """Color JPEG payloads flow through extract_media_features
    (channels=3, decoded-RGB content_mean) and the aHash fingerprint
    machinery, like every other image format."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        image_ahashes,
        round6_half_up,
        synth_jpeg_color,
    )

    payloads = {
        0: synth_jpeg_color(2, 2, seed=3, subsampling="420"),
        1: synth_jpeg_color(3, 2, seed=4, subsampling="444"),
    }
    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    exp0 = _expected_color_raster(2, 2, 3, "420")
    exp1 = _expected_color_raster(3, 2, 4, "444")
    assert rows[0]["mime"] == "image/jpeg"
    assert (rows[0]["width"], rows[0]["height"]) == (32, 32)
    assert rows[0]["channels"] == 3
    assert rows[0]["content_mean"] == round6_half_up(float(exp0.mean()))
    assert (rows[1]["width"], rows[1]["height"]) == (24, 16)
    assert rows[1]["content_mean"] == round6_half_up(float(exp1.mean()))
    hashes = {r["doc_id"]: r["simhash"] for r in image_ahashes(df).collect()}
    assert hashes[0] == ahash64_ref(exp0)
    assert hashes[1] == ahash64_ref(exp1)


def ahash64_ref(px):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        ahash64,
    )

    return ahash64(px)


def test_jpeg_ahash_and_resize_ride_image_machinery(spark):
    """JPEG payloads flow through the same resize / aHash consumers as
    BMP/PNG (grayscale raster as a 1-channel image)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        image_ahashes,
        resize_images,
        synth_jpeg,
    )

    df = spark.createDataFrame(
        [(0, synth_jpeg(2, 2, seed=3)), (1, synth_jpeg(3, 2, seed=4))],
        "doc_id long, payload binary",
    )
    rz = {r["doc_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert rz[0]["mime"] == "image/jpeg"
    assert rz[0]["out_width"] == 4 and rz[0]["resized_mean"] is not None
    hashes = {r["doc_id"]: r["simhash"] for r in image_ahashes(df).collect()}
    assert len(hashes) == 2


def test_mjpeg_video_frame_sampling(spark):
    """Video modality (round 4): MJPEG = concatenated baseline JPEG
    frames (a REAL container — IP-camera / multipart streams). The
    frame-sample step splits on SOI/EOI spans, keeps uniformly spaced
    indices, and decodes ONLY the sampled frames; per-frame means must
    equal the closed-form block values of the synthesized frames."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        sample_video_frames,
        split_mjpeg_frames,
        synth_mjpeg,
    )

    vid = synth_mjpeg(n_frames=10, blocks_w=2, blocks_h=1, seed=5)
    frames = split_mjpeg_frames(vid)
    assert len(frames) == 10
    # every frame is a standalone JPEG of the expected geometry
    for f, p in enumerate(frames):
        w, h, px = decode_jpeg(p)
        assert (w, h) == (16, 8)
        # block-constant: frame f, block bx -> (3*bx + 5 + f) % 256
        assert px[0, 0] == (5 + f) % 256 and px[0, 8] == (3 + 5 + f) % 256

    df = spark.createDataFrame(
        [(1, vid), (2, synth_mjpeg(3, 1, 1, seed=9))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in sample_video_frames(df, 4).collect()}
    r1 = rows[1]
    assert r1["n_source_frames"] == 10
    assert (r1["width"], r1["height"]) == (16, 8)
    idx = [(i * 10) // 4 for i in range(4)]  # 0, 2, 5, 7
    expect = []
    for i in idx:
        vals = [(3 * bx + 5 + i) % 256 for bx in (0, 1)]
        expect.append(round(float(np.mean(np.repeat(vals, 64))), 6))
    assert r1["frame_means"] == expect
    # 3-frame clip sampled at 4: fixed-length output, repeats allowed
    assert rows[2]["n_source_frames"] == 3
    assert len(rows[2]["frame_means"]) == 4


def test_mjpeg_color_video_frame_sampling(spark):
    """Color MJPEG (round 5): the video frame-sample stage decodes
    sampled COLOR frames through the full YCbCr path; per-frame RGB
    means equal the closed-form MCU-grid expectation."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        round6_half_up,
        sample_video_frames,
        synth_mjpeg_color,
    )

    n_src, mw, mh, seed = 10, 2, 2, 5
    payload = synth_mjpeg_color(n_src, mw, mh, seed=seed, subsampling="420")
    df = spark.createDataFrame([(0, payload)], "doc_id long, payload binary")
    row = sample_video_frames(df, 4).collect()[0]
    assert row["n_source_frames"] == n_src
    assert (row["width"], row["height"]) == (32, 32)
    idx = [(i * n_src) // 4 for i in range(4)]
    expect = [
        round6_half_up(
            float(_expected_color_raster(mw, mh, seed + f, "420").mean())
        )
        for f in idx
    ]
    assert list(row["frame_means"]) == expect


def test_mjpeg_rejects_garbage():
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        split_mjpeg_frames,
        synth_mjpeg,
    )

    with pytest.raises(ValueError, match="expected SOI"):
        split_mjpeg_frames(b"not a video")
    with pytest.raises(ValueError, match="unterminated"):
        split_mjpeg_frames(synth_mjpeg(2, 1, 1)[:-2])


def test_gif_roundtrip_and_real_world_vector():
    """GIF codec: real LZW (variable-width codes, clear/EOI, KwKwK,
    width bumps) + palette lookup. Round-trips the synthesizer across
    palettes/geometries incl. a 64x64 image that forces code-width
    growth, and decodes the CLASSIC 1x1 transparent GIF byte-for-byte
    — a real-world file (which omits the EOI code), not a
    self-round-trip."""
    import base64

    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        _gif_palette,
        decode_gif,
        synth_gif,
    )

    for seed in range(12):
        w, h, nc = 1 + seed % 9, 1 + (seed * 3) % 7, 2 + seed % 5
        p = synth_gif(w, h, seed=seed, n_colors=nc)
        assert sniff_mime(p) == "image/gif"
        gw, gh, px = decode_gif(p)
        pal = _gif_palette(nc, seed)
        expect = np.array(
            [[pal[(x + 3 * y + seed) % nc] for x in range(w)]
             for y in range(h)],
            dtype=np.uint8,
        )
        assert (gw, gh) == (w, h) and (px == expect).all()
        assert p == synth_gif(w, h, seed=seed, n_colors=nc)
    big = decode_gif(synth_gif(64, 64, seed=3, n_colors=7))
    assert big[2].shape == (64, 64, 3)

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, px = decode_gif(tiny)
    assert (w, h) == (1, 1) and px.tolist() == [[[0, 0, 0]]]


def test_gif_unsupported_and_garbage():
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_gif,
        synth_gif,
    )

    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    p = bytearray(synth_gif(3, 3))
    # flip the interlace bit in the image descriptor's packed byte
    idx = p.index(0x2C)
    p[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(p))


def test_gif_rides_resize_and_ahash(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        image_ahashes,
        resize_images,
        synth_gif,
    )

    df = spark.createDataFrame(
        [(0, synth_gif(6, 5, seed=2, n_colors=4))],
        "doc_id long, payload binary",
    )
    rz = resize_images(df, 3, 3).collect()[0]
    assert rz["mime"] == "image/gif" and rz["resized_mean"] is not None
    assert image_ahashes(df).count() == 1


def test_gif_truncation_raises_cleanly():
    """Truncated GIFs fail with a ValueError from the decoder, not an
    IndexError from deep inside a worker."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_gif,
        synth_gif,
    )

    full = synth_gif(5, 4, seed=1, n_colors=4)
    for cut in (10, 20, len(full) // 2, len(full) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_gif(full[:cut])


def test_jpeg_truncation_raises_cleanly():
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg,
    )

    full = synth_jpeg(2, 2, seed=1)
    for cut in (4, 10, 30, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])


def test_audio_fingerprint_properties_and_independent_recompute():
    """audio_fingerprint64 (round 5): the fingerprint is invariant
    under amplitude scaling (all band energies scale by c^2, so the
    band-mean comparisons are unchanged), robust to small additive
    noise, discriminative for unrelated clips — and matches an
    INDEPENDENT straight-line recompute (explicit Haar packet on
    sample quadruples, no shared code path)."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        audio_fingerprint64,
    )

    rng = np.random.default_rng(23)
    x = (rng.standard_normal(4000) * 3000).astype(np.int64)
    fp = audio_fingerprint64(x, 1)
    # amplitude scaling: identical fingerprint
    assert audio_fingerprint64(x * 4, 1) == fp
    # small additive noise: within the near-dup radius
    noisy = x + rng.integers(-50, 50, size=len(x))
    d = bin((fp ^ audio_fingerprint64(noisy, 1)) & ((1 << 64) - 1)).count("1")
    assert d <= 3, d
    # unrelated audio: far outside it
    y = (rng.standard_normal(4000) * 3000).astype(np.int64)
    far = bin((fp ^ audio_fingerprint64(y, 1)) & ((1 << 64) - 1)).count("1")
    assert far > 10, far
    # stereo: channel 0 only (deinterleave), bit-identical to mono of
    # that channel
    stereo = np.empty(2 * len(x), dtype=np.int64)
    stereo[0::2] = x
    stereo[1::2] = y[: len(x)]
    assert audio_fingerprint64(stereo, 2) == fp

    # independent recompute: explicit quadruple Haar packet
    n = len(x) - len(x) % 4
    q = x[:n].reshape(-1, 4)
    bands = [
        q[:, 0] + q[:, 1] + q[:, 2] + q[:, 3],
        q[:, 0] + q[:, 1] - q[:, 2] - q[:, 3],
        q[:, 0] - q[:, 1] + q[:, 2] - q[:, 3],
        q[:, 0] - q[:, 1] - q[:, 2] + q[:, 3],
    ]
    want = 0
    for m, band in enumerate(bands):
        tot = int((band * band).sum())
        length = len(band)
        for f in range(16):
            seg = band[f * length // 16 : (f + 1) * length // 16]
            if 16 * int((seg * seg).sum()) > tot:
                want |= 1 << (m * 16 + f)
    if want >= 1 << 63:
        want -= 1 << 64
    assert fp == want


def test_audio_neardup_via_fingerprint_banded_hamming(spark):
    """Audio near-dup detection end to end: acoustic fingerprints +
    the SAME banded-Hamming pair machinery as text SimHash and image
    aHash — a lightly noised re-encode of a clip pairs with its
    original, unrelated clips don't, and no new join shape exists for
    the third modality."""
    import numpy as np

    from travelpulse_spark_stream_tourism_analytics_spark.operators import (
        dedup,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        audio_fingerprints,
        synth_wav,
    )

    def wav_of(samples, channels=1):
        # pack an int16 sample array into a WAV shell
        shell = bytearray(synth_wav(len(samples) // channels, 8000, channels))
        arr = np.asarray(samples, dtype="<i2").tobytes()
        shell[-len(arr):] = arr
        return bytes(shell)

    rng = np.random.default_rng(5)
    base = (rng.standard_normal(2000) * 2500).astype(np.int64)
    noisy = base + rng.integers(-40, 40, size=len(base))
    other = (rng.standard_normal(2000) * 2500).astype(np.int64)
    rows = [
        (0, wav_of(base)),
        (1, wav_of(noisy)),
        (2, wav_of(other)),
        (3, wav_of((rng.standard_normal(2000) * 2500).astype(np.int64))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = dedup.simhash_neardup_pairs(
        audio_fingerprints(df), "doc_id", max_hamming=3, bits=64, n_bands=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got), got


def test_video_neardup_majority_of_frame_hashes(spark):
    """Video near-dup (round 5, fourth modality): a re-encode sharing
    most frames pairs by MAJORITY of per-slot aHashes even though one
    sampled frame differs; unrelated videos never pair. Composition of
    the existing per-slot banded machinery — no new join shape."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.multimodal import (
        split_mjpeg_frames,
        synth_jpeg,
        synth_mjpeg,
        video_frame_ahashes,
        video_neardup_pairs,
    )

    # synth_jpeg's gradient is perceptually IDENTICAL across seeds at
    # one block grid (aHash correctly maps them together — same trap
    # documented for synth_bmp); DIFFERENT grids differ by ~12 bits.
    # So: variant = base with sampled frame 6 (slot 3 of 4) replaced
    # by an off-grid frame; other = a different grid throughout.
    base = synth_mjpeg(8, 3, 2, seed=40)
    frames = split_mjpeg_frames(base)
    variant = (
        b"".join(frames[:6]) + synth_jpeg(4, 3, seed=999) + frames[7]
    )
    other = synth_mjpeg(8, 4, 1, seed=400)

    df = spark.createDataFrame(
        [(0, base), (1, variant), (2, other)],
        "doc_id long, payload binary",
    )
    sigs = video_frame_ahashes(df, n_frames=4)
    rows = sigs.collect()
    assert len(rows) == 12  # 3 videos x 4 slots
    pairs = {
        (r["id_a"], r["id_b"]): r["n_slots_agree"]
        for r in video_neardup_pairs(sigs, n_frames=4).collect()
    }
    assert pairs.get((0, 1)) == 3  # slots 0-2 shared, edited slot 3 far
    assert all(p == (0, 1) for p in pairs), pairs

    # all-slots quorum: the edited variant must drop out — its
    # replaced frame lands exactly in sampled slot 3.
    quorum4 = {
        (r["id_a"], r["id_b"])
        for r in video_neardup_pairs(
            sigs, n_frames=4, min_agree=4
        ).collect()
    }
    assert quorum4 == set()
