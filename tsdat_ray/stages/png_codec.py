"""Pure-python PNG codec (8-bit gray / RGB / RGBA, non-interlaced).

Makes the engine's ``png`` media codec REAL without PIL: PNG is zlib
(stdlib) + per-row byte filters, both expressible in numpy.  Lossless, so
the multimodal roundtrip is bit-exact and testable.  Decode supports all
five scanline filters (None/Sub/Up/Average/Paeth — PNG spec §9); encode
emits per-row None/Up/Sub chosen by a simple sum-of-abs-deltas heuristic
(any choice is spec-valid; decoders must handle all).

Scope (documented, spec-checked on parse): bit depth 8, color types
0 (gray), 2 (RGB), 6 (RGBA), interlace 0.  Palette/16-bit/Adam7 raise
ValueError — this is the training-pipeline baseline path, not a general
viewer.  The reference has no media handling at all
(/root/reference/tsdat/io/readers/); see multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (c in {1, 3, 4})."""
    if img.dtype != np.uint8:
        raise ValueError(f"png_encode wants uint8, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    rows = img.reshape(h, w * c).astype(np.uint8)
    up = np.diff(rows, axis=0, prepend=np.zeros((1, w * c), np.uint8))
    sub = rows.copy()
    sub[:, c:] = rows[:, c:] - rows[:, :-c]
    filtered = bytearray()
    for y in range(h):
        # cost heuristic: smallest sum of abs signed residuals (PNG spec
        # suggestion); ties go None > Up > Sub for determinism
        cands = ((0, rows[y]), (2, up[y]), (1, sub[y]))
        cost = [(int(np.abs(r.astype(np.int8).astype(np.int32)).sum()), i, f)
                for i, (f, r) in enumerate(cands)]
        _, i, f = min(cost)
        filtered.append(f)
        filtered.extend(cands[i][1].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered), level))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 array.  All five filters; 8-bit
    gray/RGB/RGBA, non-interlaced (raises ValueError otherwise)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, 0
    h = bitdepth = color = interlace = -1
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if bitdepth != 8 or color not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth} color={color} "
            f"interlace={interlace}); this codec handles 8-bit gray/RGB/RGBA")
    c = _CHANNELS[color]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, r = int(ftypes[y]), rows[y]
        if f == 0:
            cur = r
        elif f == 2:  # Up
            cur = (r + prev) & 0xFF
        elif f == 1:  # Sub: per-lane cumsum mod 256 (left-dependency, exact)
            cur = r.copy()
            lanes = cur.reshape(w, c)
            np.cumsum(lanes, axis=0, out=lanes)
            cur &= 0xFF
        elif f == 3:  # Average
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                cur[i] = (r[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                cur[i] = (r[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, c)
