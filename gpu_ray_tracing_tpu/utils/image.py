"""Image output: tonemapping and PNG/PPM writers.

The reference never encodes images — its linear rgba32float accumulation
texture is displayed directly by Bevy's sprite path with no tone mapping or
gamma (SURVEY D8).  An offline renderer needs files: `tonemap` applies the
standard gamma encode and the writers emit PNG (via PIL when present) or
portable PPM (no dependencies).
"""

from __future__ import annotations

import numpy as np


def tonemap(linear_rgb, gamma: float = 2.2) -> np.ndarray:
    """Linear HDR RGB -> clipped gamma-encoded [0,1] f32."""
    arr = np.asarray(linear_rgb, np.float32)
    return np.clip(arr, 0.0, 1.0) ** (1.0 / gamma)


def to_uint8(rgb01) -> np.ndarray:
    return (np.clip(np.asarray(rgb01), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_ppm(path: str, linear_rgb, gamma: float = 2.2) -> None:
    """Binary PPM (P6) writer; zero dependencies."""
    img = to_uint8(tonemap(linear_rgb, gamma))
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read a binary PPM back as uint8 (H, W, 3)."""
    with open(path, "rb") as f:
        data = f.read()
    parts = data.split(b"\n", 3)
    if parts[0] != b"P6":
        raise ValueError(f"not a binary PPM: {path}")
    w, h = (int(x) for x in parts[1].split())
    return np.frombuffer(parts[3], np.uint8)[: w * h * 3].reshape(h, w, 3)


def write_image(path: str, linear_rgb, gamma: float = 2.2) -> str:
    """Write PNG if PIL is available and the path ends in .png, else PPM.

    Returns the path actually written (a .ppm fallback when PIL is missing,
    so callers report the real file)."""
    if path.endswith(".png"):
        try:
            from PIL import Image
        except ImportError:
            fallback = path[:-4] + ".ppm"
            write_ppm(fallback, linear_rgb, gamma)
            return fallback
        Image.fromarray(to_uint8(tonemap(linear_rgb, gamma))).save(path)
        return path
    write_ppm(path, linear_rgb, gamma)
    return path
