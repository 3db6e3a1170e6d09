"""Stdlib PNG/WAV codec tests (sources/media.py) — roundtrips over
every PNG row-filter branch and the named unsupported-format gates.
The Spark-side wiring (decode/resize/features over mapInPandas) is
value-checked against SQL oracles via the multimodal_real_* queries
in test_queries_oracle.py."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pointdatabase_spark.sources import media


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(13, 9), (8, 5, 3), (6, 4, 4),
                                   (1, 1), (3, 257)])
def test_png_roundtrip_all_filters(filter_type, shape):
    rng = np.random.default_rng(filter_type * 100 + len(shape))
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    out = media.decode_png(media.encode_png(a, filter_type=filter_type))
    np.testing.assert_array_equal(out, a)


def test_png_known_pixels_gradient():
    # deterministic content, every filter must reconstruct identically
    i = np.arange(11)[:, None]
    j = np.arange(7)[None, :]
    a = ((i * 7 + j * 13) % 256).astype(np.uint8)
    blobs = {ft: media.encode_png(a, filter_type=ft) for ft in range(5)}
    for ft, blob in blobs.items():
        np.testing.assert_array_equal(media.decode_png(blob), a,
                                      err_msg=f"filter {ft}")
    # filtered streams genuinely differ (the branches are distinct)
    assert len({b for b in blobs.values()}) == 5


def test_png_gates_are_named():
    a = np.zeros((4, 4), np.uint8)
    blob = bytearray(media.encode_png(a))
    # IHDR body starts at offset 16: w(4) h(4) depth colortype ...
    blob[24] = 16                                       # bit depth 16
    blob[29:33] = struct.pack(
        ">I", zlib.crc32(bytes(blob[12:29])))
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        media.decode_png(bytes(blob))
    blob = bytearray(media.encode_png(a))
    blob[25] = 3                                        # palette
    blob[29:33] = struct.pack(
        ">I", zlib.crc32(bytes(blob[12:29])))
    with pytest.raises(NotImplementedError, match="color type 3"):
        media.decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        media.decode_png(b"JFIF not a png")


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 777, dtype=np.int16)
    d, rate = media.decode_wav(media.encode_wav(mono, 22050))
    assert rate == 22050 and d.shape == (777, 1)
    np.testing.assert_array_equal(d[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (100, 2), dtype=np.int16)
    d2, _ = media.decode_wav(media.encode_wav(stereo))
    np.testing.assert_array_equal(d2, stereo)


def test_wav_gates_are_named():
    blob = bytearray(media.encode_wav(np.zeros(8, np.int16)))
    fmt_at = blob.index(b"fmt ") + 8
    struct.pack_into("<H", blob, fmt_at, 3)             # IEEE float
    with pytest.raises(NotImplementedError, match="format 3"):
        media.decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        media.decode_wav(b"OggS not a wav")


def test_apng_roundtrip_and_plain_png_single_frame():
    rng = np.random.default_rng(11)
    for shape in [(1, 5, 4), (4, 6, 5), (3, 4, 4, 3), (2, 3, 3, 4)]:
        f = rng.integers(0, 256, shape, dtype=np.uint8)
        d = media.decode_apng(media.encode_apng(f))
        np.testing.assert_array_equal(d, f)
    a = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    d = media.decode_apng(media.encode_png(a))
    assert d.shape == (1, 5, 7)
    np.testing.assert_array_equal(d[0], a)


def test_real_decode_video_is_apng_or_gated():
    from pointdatabase_spark.operators.multimodal import _real_decode_row
    frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    n, w, h, nf, _fp = _real_decode_row(media.encode_apng(frames),
                                        "video")
    assert (w, h, nf) == (4, 3, 2)
    # non-APNG containers (mp4 etc.) stay gated on ffmpeg
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _real_decode_row(b"\x00\x00\x00 ftypisom....", "video")
