"""64-bit DCT perceptual hash (FIXTURES.md §1) — pure numpy.

gray = mean(RGB); nearest-grid downscale to 32×32 (idx = arange(32)*dim//32,
deterministic, no resampling library needed); orthonormal 32×32 DCT-II;
bits = top-left 8×8 coefficient block > median(those 64); packed MSB-first
into a signed int64 (Spark LongType).
"""

from __future__ import annotations

import numpy as np


def _dct32() -> np.ndarray:
    n = np.arange(32)
    k = n.reshape(-1, 1)
    c = np.cos(np.pi * (2 * n + 1) * k / 64.0) * np.sqrt(2.0 / 32.0)
    c[0] = np.sqrt(1.0 / 32.0)
    return c


_C32 = _dct32()


def phash64(rgb: np.ndarray) -> int:
    h, w, _ = rgb.shape
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    # downsample BEFORE the gray conversion: the mean over the channel axis
    # is per-pixel, so selecting the 32x32 grid first is bit-identical to
    # graying the full image and then selecting — but touches 32x32 pixels
    # instead of h x w (measured: phash was ~27% of the whole image kernel,
    # nearly all of it this full-image mean)
    small = rgb[np.ix_(yi, xi)].astype(np.float64).mean(axis=2)
    dct = _C32 @ small @ _C32.T
    block = dct[:8, :8].ravel()
    bits = block > np.median(block)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v
