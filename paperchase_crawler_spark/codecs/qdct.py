"""``qdct`` — custom 8×8-DCT quantized lossy codec (pure numpy + zlib).

The third corpus ``fmt`` (FIXTURES.md §1), present so the PSNR ≥ 40 dB
decoded-pixel gate from BASELINE.json input_hint is exercised honestly by a
genuinely lossy format. Orthonormal 2-D DCT-II per 8×8 block per channel,
uniform quantization step Q=6 (expected MSE ≈ Q²/12 = 3 → PSNR ≈ 43 dB),
int16 coefficients, zlib-compressed.

Container: b"QDCT" | w:u32le | h:u32le | q:u16le | zlib(int16le coeffs of the
8-padded image, shape (H8, W8, 3)).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

Q_DEFAULT = 6


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    c = np.cos(np.pi * (2 * n + 1) * k / 16.0) * np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _blockify(img: np.ndarray) -> np.ndarray:
    """(H8, W8, ch) → (nby, nbx, ch, 8, 8)."""
    h, w, ch = img.shape
    return img.reshape(h // 8, 8, w // 8, 8, ch).transpose(0, 2, 4, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    nby, nbx, ch, _, _ = blocks.shape
    return blocks.transpose(0, 3, 1, 4, 2).reshape(nby * 8, nbx * 8, ch)


def encode_qdct(rgb: np.ndarray, q: int = Q_DEFAULT) -> bytes:
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.zeros((h8, w8, 3), dtype=np.float64)
    img[:h, :w] = rgb.astype(np.float64) - 128.0
    if h8 > h:
        img[h:, :w] = img[h - 1 : h, :w]  # edge-replicate pad
    if w8 > w:
        img[:, w:] = img[:, w - 1 : w]
    blocks = _blockify(img)
    # C @ B @ C.T per 8x8 block — np.matmul broadcasts over the leading dims
    # and hits BLAS (einsum's c_einsum path is ~10x slower here)
    coeffs = _C @ blocks @ _C.T
    qc = np.round(coeffs / q).astype(np.int16)
    payload = zlib.compress(qc.tobytes(), 1)
    return b"QDCT" + struct.pack("<IIH", w, h, q) + payload


def decode_qdct(data: bytes) -> np.ndarray:
    if data[:4] != b"QDCT":
        raise ValueError("not a QDCT payload")
    w, h, q = struct.unpack_from("<IIH", data, 4)
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    qc = np.frombuffer(zlib.decompress(data[14:]), dtype=np.int16).reshape(
        h8 // 8, w8 // 8, 3, 8, 8
    )
    coeffs = qc.astype(np.float64) * q
    blocks = _C.T @ coeffs @ _C
    img = _unblockify(blocks) + 128.0
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]
