"""PFM (Portable FloatMap) image I/O.

Parity: reference src/rt_renderer.rs:1318-1334 — header
"PF\\n{w} {h}\\n-1.0\\n" (scale -1.0 => little-endian), rows written
bottom-up, 3 x f32 LE per pixel.
"""

from __future__ import annotations

import numpy as np


def write_pfm(path: str, image: np.ndarray) -> None:
    """Write (H, W, 3|4) float array as a color PFM; alpha is dropped."""
    image = np.asarray(image, np.float32)
    if image.ndim != 3:
        raise ValueError(f"PFM image must be HxWxC, got {image.shape}")
    h, w = image.shape[:2]
    rgb = image[..., :3]
    with open(path, "wb") as f:
        f.write(f"PF\n{w} {h}\n-1.0\n".encode("ascii"))
        # Rows bottom-up (rt_renderer.rs:1327 `.rev()`).
        f.write(np.ascontiguousarray(rgb[::-1]).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> (H, W, 3) or (H, W) float32."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"Not a PFM file: {path}")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        channels = 3 if header == b"PF" else 1
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * channels * 4), dtype)
    img = data.reshape(h, w, channels) if channels == 3 else data.reshape(h, w)
    return np.ascontiguousarray(img[::-1]).astype(np.float32)
