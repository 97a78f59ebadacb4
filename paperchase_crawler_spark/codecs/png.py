"""Minimal lossless PNG codec for 8-bit RGB — pure numpy + stdlib zlib.

Encoder always writes filter type 0 (None) scanlines; decoder handles all
five standard filter types (0-4) so any conforming RGB8 PNG round-trips.
No Pillow exists in this sandbox (SURVEY.md §0.1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter None
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 1)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    ai = a.astype(np.int16)
    bi = b.astype(np.int16)
    ci = c.astype(np.int16)
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    i = len(_SIG)
    w = h = -1
    idat = bytearray()
    while i < len(data):
        (length,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        i += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit non-interlaced RGB supported")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            acc = line
            for x in range(bpp, w * 3):
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            acc = line
            for x in range(w * 3):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
            out[y] = acc
        elif ftype == 4:  # Paeth
            acc = line
            for x in range(w * 3):
                left = acc[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                acc[x] = (
                    int(acc[x]) + int(_paeth(np.uint8(left), prev[x], np.uint8(ul)))
                ) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"bad filter {ftype}")
    return out.reshape(h, w, 3)
