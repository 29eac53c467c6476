"""ctypes bindings for the native image-ops library, with PIL fallback.

Replaces the external cv2/PIL native resamplers on the serving and training
hot paths (SURVEY.md §2.9; env_adapter/simpler.py:83-87 LANCZOS4 resize;
dataset.py:276-299 bicubic + ImageNet normalize). Threaded C++ across the
tile/frame batch; ~an order of magnitude faster than per-image PIL on
multi-core hosts and one fused pass for resize+normalize.
"""

from __future__ import annotations

import ctypes
import logging
from typing import Tuple

import numpy as np

logger = logging.getLogger("vlaser_tpu.image")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        from ..native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        lib.crop_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception as e:  # toolchain missing -> PIL fallback
        logger.warning("native image ops unavailable (%s); using PIL", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def resize_batch(
    images: np.ndarray,  # [N, H, W, 3] uint8
    size: Tuple[int, int],  # (oh, ow)
    mode: str = "bicubic",  # bicubic | lanczos
    normalize: bool = True,
) -> np.ndarray:
    """-> [N, oh, ow, 3] float32 (ImageNet-normalized when normalize)."""
    assert images.dtype == np.uint8 and images.ndim == 4
    oh, ow = size
    lib = _load()
    if lib is not None:
        images = np.ascontiguousarray(images)
        n, h, w, _ = images.shape
        out = np.empty((n, oh, ow, 3), np.float32)
        lib.resize_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            oh, ow, 1 if mode == "lanczos" else 0, 1 if normalize else 0,
        )
        return out
    # PIL fallback
    from PIL import Image

    from .tiling import IMAGENET_MEAN, IMAGENET_STD

    resample = Image.LANCZOS if mode == "lanczos" else Image.BICUBIC
    out = np.empty((len(images), oh, ow, 3), np.float32)
    for i, img in enumerate(images):
        r = np.asarray(Image.fromarray(img).resize((ow, oh), resample), np.float32)
        out[i] = r
    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out


def normalize_batch(images: np.ndarray) -> np.ndarray:
    """uint8 [..., 3] -> ImageNet-normalized float32, native when possible."""
    lib = _load()
    if lib is not None:
        images = np.ascontiguousarray(images)
        out = np.empty(images.shape, np.float32)
        npix = int(np.prod(images.shape[:-1]))
        lib.normalize_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            npix,
        )
        return out
    from .tiling import normalize_uint8

    return normalize_uint8(images)


def tile_image(
    image: np.ndarray,  # [H, W, 3] uint8
    grid: Tuple[int, int],  # (cols, rows) from find_closest_aspect_ratio
    tile: int = 448,
    mode: str = "bicubic",
) -> np.ndarray:
    """Resize to the grid and crop tiles in one native pass ->
    [rows*cols, tile, tile, 3] normalized float32."""
    cols, rows = grid
    resized = resize_batch(image[None], (rows * tile, cols * tile), mode)[0]
    lib = _load()
    if lib is not None:
        out = np.empty((rows * cols, tile, tile, 3), np.float32)
        resized = np.ascontiguousarray(resized)
        lib.crop_tiles(
            resized.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, cols, tile,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    tiles = []
    for ty in range(rows):
        for tx in range(cols):
            tiles.append(
                resized[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            )
    return np.stack(tiles)
