"""Real, dependency-free media codecs (pure numpy / stdlib).

PIL / libav are absent in this container, but two public formats are
simple enough to implement from their specs — which upgrades the
multimodal pipeline from "stubbed codec" to a REAL decode path for:

* **PPM (P6)** — the Netpbm binary RGB image format: ASCII header
  ``P6 <w> <h> <maxval>`` (whitespace/comment separated) followed by
  ``w*h*3`` raw bytes.  (netpbm's published format spec.)
* **WAV (RIFF, PCM16)** — canonical RIFF container: ``RIFF`` size
  ``WAVE`` then chunks; the ``fmt `` chunk carries rate/channels/bit
  depth, the ``data`` chunk the little-endian PCM samples.
  (Microsoft/IBM RIFF spec.)

Everything else (JPEG/PNG/MP4…) stays honestly stubbed in
``operators/multimodal.py`` — swap in PIL/libav there.

These functions run inside Arrow-batched ``mapInPandas`` workers, one
*item* at a time: media codecs are inherently per-item (in production
they are C libraries); the "no per-row Python" rule is about the
per-turn parse hot path, not MB-sized media blobs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → P6 bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _ppm_tokens(data: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens (skipping ``#``
    comments), plus the offset of the byte after the single whitespace
    that terminates the last token (where raster data begins)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(data[i:j])
        i = j
    return toks, i + 1  # exactly one whitespace after maxval per spec


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes → (h, w, 3) uint8 array."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (magic, w_b, h_b, maxval_b), off = _ppm_tokens(data, 4)
    w, h, maxval = int(w_b), int(h_b), int(maxval_b)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * 3
    raster = data[off : off + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index mapping (pure numpy)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    """int16 sample array → canonical 44-byte-header RIFF/WAVE bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    block_align = channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return header + pcm


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes → (rate, channels, int16 samples).

    Walks the chunk list properly (some writers insert LIST/fact chunks
    between ``fmt `` and ``data``), so this reads any PCM16 WAV, not
    just the canonical 44-byte layout that :func:`encode_wav` emits.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = channels = None
    pcm = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (tag={fmt_tag}, bits={bits})")
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), int(channels), np.frombuffer(pcm, dtype="<i2")
