"""Minimal stdlib PNG codec (zlib + struct) — the dependency-free
fallback for the multimodal decode path and its test fixtures.

This sandbox ships no Pillow, which used to leave
``decode_image_real`` (operators/multimodal.py) entirely untestable:
both the encode side (making a fixture image) and the decode side
needed PIL.  PNG is simple enough that the stdlib covers a useful
subset end-to-end:

- :func:`encode` writes a valid non-interlaced 8-bit PNG (grayscale,
  gray+alpha, RGB, or RGBA inferred from the array shape) with any of
  the five scanline filter types — filters 1–4 exist so tests can
  exercise every decoder unfilter branch, not just the filter-0 one the
  encoder would naturally emit.
- :func:`decode` reads non-interlaced 8-bit PNGs of color type 0/2/4/6
  (palette and sub-byte depths are out of scope — a real pipeline uses
  PIL for those), handling all five filter types and multi-IDAT
  streams.  Returns an (H, W, C) uint8 array.

This is a CORRECTNESS fallback, not a performance path: unfiltering is
a per-scanline Python loop (left-neighbor filters are sequential by
definition), fine for fixtures and the occasional PNG in a test
partition.  At production scale install Pillow — the operator
automatically prefers it.

Format reference: the public PNG specification (RFC 2083 / ISO 15948);
filter definitions in §6 (None/Sub/Up/Average/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (encode direction)."""
    if ftype == 0:
        return row.tobytes()
    out = bytearray(len(row))
    for i in range(len(row)):
        a = int(row[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # 4
            pred = _paeth(a, b, c)
        out[i] = (int(row[i]) - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """Undo filter ``ftype`` in place (decode direction)."""
    if ftype == 0:
        return
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        cur[i] = (cur[i] + pred) & 0xFF


def encode(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Array -> PNG bytes.  ``pixels`` is uint8 (H, W) or (H, W, C) with
    C in {1, 2, 3, 4}.  ``filter_type`` 0-4 selects the scanline filter
    for every row (non-zero types exist to exercise decoder branches)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"unknown PNG filter type {filter_type}")
    flat = px.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw.append(filter_type)
        raw += _filter_row(filter_type, flat[y], prev, ch)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array.  Raises ValueError for
    anything outside the supported subset (not a PNG, palette color,
    sub-byte or 16-bit depth, interlaced) or for corrupt streams."""
    if not isinstance(payload, (bytes, bytearray)) or payload[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel payload has the wrong length")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        cur = bytearray(raw[off + 1 : off + 1 + stride])
        _unfilter_row(ftype, cur, prev, channels)
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = bytes(cur)
    return out.reshape(height, width, channels)


def to_gray(px: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float64 grayscale in [0, 255]: ITU-R
    601 luma for color (PIL's convert('L') coefficients), alpha ignored
    (PNG has no premultiplication)."""
    if px.shape[2] == 1:
        return px[:, :, 0].astype(np.float64)
    if px.shape[2] == 2:  # gray + alpha
        return px[:, :, 0].astype(np.float64)
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    return r * 299 / 1000 + g * 587 / 1000 + b * 114 / 1000


def pool_gray(gray: np.ndarray, grid: int) -> np.ndarray:
    """(H, W) grayscale -> (grid, grid) block means in [0, 1] — the
    fallback's analogue of resize-to-grid (area pooling rather than
    PIL's resampling kernel; both are grid summaries of the image)."""
    h, w = gray.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    out = np.empty((grid, grid), dtype=np.float64)
    for i in range(grid):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(grid):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = gray[min(y0, h - 1) : min(y1, h), min(x0, w - 1) : min(x1, w)].mean()
    return out / 255.0
