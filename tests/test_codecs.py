"""Pure-numpy PPM/WAV codecs: round-trips, spec edge cases, resize."""

from __future__ import annotations

import numpy as np
import pytest

from skewer_spark.functions.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resize_nearest,
)


def test_ppm_round_trip():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(12, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_ppm_header_with_comments_and_odd_whitespace():
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = b"P6 # netpbm allows comments\n# another\n 3\t2 #dims\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(raw), arr)


def test_ppm_raster_starting_with_whitespace_byte():
    # the single whitespace after maxval terminates the header; a
    # raster whose FIRST byte is 0x0A must not be skipped
    arr = np.full((1, 2, 3), 0x0A, dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_ppm_rejects_truncation_and_bad_magic():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(arr)[:-1])
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\0" * 4)


def test_wav_round_trip():
    s = (np.arange(-5, 5) * 1000).astype("<i2")
    rate, ch, out = decode_wav(encode_wav(s, rate=22050))
    assert (rate, ch) == (22050, 1)
    assert np.array_equal(out, s)


def test_wav_walks_extra_chunks():
    # LIST chunk between fmt and data (word-aligned odd-size body)
    s = np.array([1, -2, 3], dtype="<i2")
    canonical = encode_wav(s, rate=8000)
    header, pcm = canonical[:36], canonical[36:]
    import struct
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # padded to even
    stitched = (
        canonical[:12]
        + canonical[12:36]  # fmt chunk
        + extra
        + pcm  # data chunk (header+body)
    )
    rate, ch, out = decode_wav(stitched)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_rejects_non_pcm16():
    s = np.zeros(4, dtype="<i2")
    raw = bytearray(encode_wav(s))
    raw[34] = 8  # bits-per-sample → 8
    with pytest.raises(ValueError):
        decode_wav(bytes(raw))


def test_resize_nearest_shapes_and_identity():
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(arr, 3, 2)
    assert out.shape == (2, 3, 3)
    # identity resize returns the same pixels
    assert np.array_equal(resize_nearest(arr, 6, 4), arr)
    # upscale duplicates neighbors, never interpolates new values
    up = resize_nearest(arr, 12, 8)
    assert set(np.unique(up)) <= set(np.unique(arr))
