"""Pure-stdlib PNG container codec (no imaging library).

The reference materializes one PNG per object for its image-based
matching baseline (reference utils.py:134-163 ``generate_png_fig``, via
matplotlib). This module provides the container layer for the Spark-first
re-expression (operators/render.py): a minimal, deterministic PNG writer
(8-bit RGB, color type 2, filter 0 scanlines, one zlib IDAT) and a
decoder for the subset a headless engine actually produces — filters
0 (None), 1 (Sub) and 2 (Up); Average/Paeth scanlines raise, since no
codec library exists in this environment to fall back to.

Determinism contract: ``encode_png`` output bytes are a pure function of
the pixel array (fixed zlib level 6, fixed chunk layout), so byte lengths
and hashes are oracle-checkable; the independent oracle rebuilds the
same stream from the documented spec with stdlib ``zlib`` only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (bit depth 8, color type 2,
    filter byte 0 on every scanline, single IDAT, zlib level 6)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.

    Supports the engine's own output subset plus the vectorizable filters:
    bit depth 8, color type 2 (RGB), no interlace, scanline filters
    0/1/2. Filter 1 (Sub) reconstructs as a per-channel cumulative sum
    mod 256; filter 2 (Up) adds the prior reconstructed row. Average (3)
    and Paeth (4) raise ``NotImplementedError``.
    """
    if b[:8] != _SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        payload = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2 or comp != 0 or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} ctype={ctype} interlace={interlace}:"
                    " only 8-bit RGB non-interlaced decodes here"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    if len(raw) != stride * h:
        raise ValueError("PNG scanline payload has wrong length")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int64).reshape(h, w, 3)
    if (filters > 2).any():
        raise NotImplementedError(
            "PNG Average/Paeth filters not supported without a codec library"
        )
    for y in range(h):
        f = filters[y]
        if f == 1:
            out[y] = np.cumsum(out[y], axis=0) % 256
        elif f == 2:
            if y == 0:
                raise ValueError("Up filter on first scanline")
            out[y] = (out[y] + out[y - 1]) % 256
    return out.astype(np.uint8)
