"""Minimal from-scratch PNG decoder — pure stdlib (zlib) + numpy.

Makes `multimodal`'s image decode REAL in containers without PIL
(round-3 verdict item 5): the capability probe prefers PIL when present
and falls back to this decoder for PNG payloads.

Implements the public PNG specification (RFC 2083 / W3C PNG spec):
chunk walk (IHDR/IDAT/IEND), zlib inflate, and all five scanline
filters (None/Sub/Up/Average/Paeth). Scope: 8-bit depth, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — the
truecolor/grayscale formats real pipelines emit; anything else raises
ValueError (never a silent wrong decode).

Filters Up and None are vectorized; Sub/Average/Paeth defilter with a
per-scanline loop (pixels depend on their left neighbor — inherently
sequential in x; rows are bounded by image width and the decode runs
inside Arrow-batched executors, same story as the Gorilla bit reader).
"""

from __future__ import annotations

import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_MAGIC


def decode_png(data: bytes) -> tuple[np.ndarray, int, int]:
    """PNG bytes → (pixels uint8[h, w, channels], width, height)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    idat = []
    width = height = None
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + payload + crc
        if typ == b"IHDR":
            width = int.from_bytes(chunk[0:4], "big")
            height = int.from_bytes(chunk[4:8], "big")
            bit_depth, color_type = chunk[8], chunk[9]
            interlace = chunk[12]
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} (0/2/4/6)")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    nch = _CHANNELS[color_type]
    stride = width * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {height * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = lines[y, 1:]
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up
            cur = line + prev  # uint8 add wraps mod 256, per spec
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            cur = line.astype(np.int64).reshape(width, nch)
            cur = (np.cumsum(cur, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 3:  # Average
            lt, pv = line.tolist(), prev.tolist()
            cl = [0] * stride  # plain ints; converted back below
            for x in range(stride):
                a = cl[x - nch] if x >= nch else 0
                cl[x] = (lt[x] + (a + pv[x]) // 2) % 256
            cur = np.asarray(cl, np.uint8)
        elif f == 4:  # Paeth
            lt, pv = line.tolist(), prev.tolist()
            cl = [0] * stride
            for x in range(stride):
                a = cl[x - nch] if x >= nch else 0
                b = pv[x]
                c = pv[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cl[x] = (lt[x] + pred) % 256
            cur = np.asarray(cl, np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, nch), width, height


def decode_png_gray(data: bytes) -> np.ndarray:
    """PNG bytes → flat grayscale uint8 pixels (row-major). RGB(A) folds
    to luma with the ITU-R 601-2 integer transform PIL's convert("L")
    uses (L = (R*299 + G*587 + B*114) // 1000), so outputs agree with
    the PIL path where both exist; gray(+alpha) takes the gray channel."""
    px, _w, _h = decode_png(data)
    nch = px.shape[2]
    if nch == 1:
        return px.reshape(-1)
    if nch == 2:  # gray + alpha
        return px[:, :, 0].reshape(-1)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).reshape(-1)
