"""PNG I/O. Replaces the reference's glReadPixels + ImageIO screenshot path
(dispatch.java:804-851): the display image (row 0 = bottom, GL convention)
is flipped vertically and written as 8-bit RGB."""
from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp to [0,1] and quantize like GL_UNSIGNED_BYTE readback."""
    img = np.nan_to_num(np.asarray(img, np.float32), nan=0.0)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, flip: bool = True) -> None:
    from PIL import Image

    arr = to_uint8(img)
    if flip:
        arr = arr[::-1]  # row 0 = bottom -> top-first file order
    Image.fromarray(arr, mode="RGB").save(path)


def read_png(path: str, flip: bool = True) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    if flip:
        arr = arr[::-1]
    return arr


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Pixel RMSE — the BASELINE.json parity metric."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
