"""Image codecs (pure numpy + stdlib — sandbox has no Pillow, SURVEY.md §0.1).

``fmt`` dispatch used by both the simweb fixture generator and the engine's
decode UDFs: 'ppm' / 'png' lossless, 'qdct' lossy (PSNR ≥ 40 dB gate).
"""

from __future__ import annotations

import numpy as np

from .phash import phash64
from .png import decode_png, encode_png
from .ppm import decode_ppm, encode_ppm
from .qdct import decode_qdct, encode_qdct

FMTS = ("ppm", "png", "qdct")


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(rgb)
    if fmt == "png":
        return encode_png(rgb)
    if fmt == "qdct":
        return encode_qdct(rgb)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "qdct":
        return decode_qdct(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


__all__ = [
    "FMTS",
    "encode_image",
    "decode_image",
    "psnr",
    "phash64",
    "encode_ppm",
    "decode_ppm",
    "encode_png",
    "decode_png",
    "encode_qdct",
    "decode_qdct",
]
