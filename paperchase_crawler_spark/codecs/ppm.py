"""PPM (P6) codec — trivial lossless container for RGB uint8 (pure numpy).

One of the three corpus ``fmt`` values (FIXTURES.md §1). No Pillow/cv2 exists
in this sandbox (SURVEY.md §0.1), so all codecs are numpy + stdlib.
"""

from __future__ import annotations

import numpy as np


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    # header: magic, whitespace-separated w h maxval, single whitespace, raster
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            i = data.index(b"\n", i) + 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).copy()
