"""Image output.

The reference presents to a swapchain; the headless TPU framework writes
PNG (display-ready, already tone-mapped by Common.glsl:113-118's filmic
curve) and .npy/EXR-style float radiance dumps for parity comparisons.
"""

from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np


def write_png(path: str | Path, image: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 or float[0,1] image as PNG.

    Pure-stdlib encoder (zlib + PNG chunks) so the framework has no hard
    imaging dependency; Pillow is used only if available for speed."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)

    try:
        from PIL import Image

        Image.fromarray(image, "RGB").save(str(path))
        return
    except Exception:
        pass

    h, w = image.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return (
            len(data).to_bytes(4, "big")
            + c
            + (zlib.crc32(c) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + image[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)


def write_radiance_npy(path: str | Path, image: np.ndarray) -> None:
    """Float32 HDR dump (the parity-comparison currency)."""
    np.save(str(path), np.asarray(image, np.float32))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Image RMSE — the BASELINE.json parity metric."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
