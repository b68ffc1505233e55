"""Image decoding for dataset loaders.

Primary path: the native C++ PNG codec (native/pngio.cpp, built with zlib —
the TPU-host equivalent of the reference's OpenCV imread dependency,
depth_sensor.cpp:190-192). Fallback: PIL when the native library is not
built. Both return numpy arrays: depth PNGs as uint16 [H, W], color PNGs as
uint8 [H, W, 3] RGB.
"""

from __future__ import annotations

import numpy as np


def _try_native():
    try:
        from kinfu_tpu.io import native

        return native if native.available() else None
    except Exception:
        return None


_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE = _try_native()
        _NATIVE_CHECKED = True
    return _NATIVE


def read_depth_png(path: str) -> np.ndarray:
    """16-bit (or 8-bit) grayscale depth PNG -> uint16 [H, W]."""
    nat = _native()
    if nat is not None:
        return nat.native_read_png_gray16(path)
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint16)


def read_color_png(path: str) -> np.ndarray:
    """Color PNG -> uint8 [H, W, 3] RGB."""
    nat = _native()
    if nat is not None:
        return nat.native_read_png_rgb8(path)
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def write_depth_png(path: str, depth: np.ndarray) -> None:
    nat = _native()
    depth = np.asarray(depth, dtype=np.uint16)
    if nat is not None:
        nat.native_write_png_gray16(path, depth)
        return
    from PIL import Image

    Image.fromarray(depth, mode="I;16").save(path)


def write_color_png(path: str, rgb: np.ndarray) -> None:
    nat = _native()
    rgb = np.asarray(rgb, dtype=np.uint8)
    if nat is not None:
        nat.native_write_png_rgb8(path, rgb)
        return
    from PIL import Image

    Image.fromarray(rgb, mode="RGB").save(path)
