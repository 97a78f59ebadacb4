"""Codec round-trips, the PSNR>=40dB lossy gate, phash determinism."""

from __future__ import annotations

import numpy as np
import pytest

from paperchase_crawler_spark.codecs import (
    FMTS,
    decode_image,
    encode_image,
    phash64,
    psnr,
)

SHAPES = [(32, 32), (48, 80), (100, 37), (256, 256), (33, 65), (8, 8)]


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("shape", SHAPES)
def test_roundtrip(fmt, shape):
    h, w = shape
    rgb = np.random.default_rng(h * 1000 + w).integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_image(encode_image(rgb, fmt), fmt)
    assert dec.shape == rgb.shape
    if fmt in ("ppm", "png"):
        assert np.array_equal(dec, rgb)
    else:
        assert psnr(rgb, dec) >= 40.0


def test_qdct_smooth_image():
    # smooth gradients are the easy case; still must clear the gate
    y, x = np.mgrid[0:64, 0:96]
    rgb = np.stack([(x * 2) % 256, (y * 3) % 256, (x + y) % 256], axis=-1).astype(np.uint8)
    dec = decode_image(encode_image(rgb, "qdct"), "qdct")
    assert psnr(rgb, dec) >= 40.0


def test_phash_deterministic_and_discriminative():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert phash64(a) == phash64(a.copy())
    assert phash64(a) != phash64(b)
    assert -(2**63) <= phash64(a) < 2**63


def test_garbage_raises():
    for fmt in FMTS:
        with pytest.raises((ValueError, Exception)):
            decode_image(b"garbage", fmt)
