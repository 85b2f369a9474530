"""ctypes bindings for the native host-ops library (libfastops.so).

Optional fast path for the input pipeline; smirk_tpu/data/transforms.py holds
the numpy oracle implementations. Build with tools/build_native.sh.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfastops.so")
_lib = None


def available() -> bool:
    return load() is not None


def load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.warp_affine_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.convex_hull_mask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        try:
            lib.warp_affine_nearest.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ]
            lib.clahe_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.clahe_rgb_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
        except AttributeError:
            pass  # older prebuilt .so without the round-4 augment ops
        try:
            lib.warp_affine_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.convex_hull_mask_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
        except AttributeError:
            pass  # older prebuilt .so without the batch executor
        _lib = lib
    return _lib


def _fp(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def warp_affine(image: np.ndarray, M: np.ndarray,
                out_shape: Tuple[int, int]) -> Optional[np.ndarray]:
    """Forward-matrix bilinear warp, same contract as transforms.warp_affine."""
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(image, np.float32)
    H, W, C = img.shape
    OH, OW = out_shape
    Minv = np.linalg.inv(np.asarray(M, np.float64))
    minv = np.ascontiguousarray(Minv[:2].reshape(-1))
    out = np.empty((OH, OW, C), np.float32)
    lib.warp_affine_bilinear(
        _fp(img, ctypes.c_float), H, W, C, _fp(minv, ctypes.c_double),
        _fp(out, ctypes.c_float), OH, OW,
    )
    return out


def warp_affine_nearest(image: np.ndarray, M: np.ndarray,
                        out_shape: Tuple[int, int]) -> Optional[np.ndarray]:
    """Nearest-neighbor warp (transforms.warp_affine order=0 contract)."""
    lib = load()
    if lib is None or not hasattr(lib, "warp_affine_nearest"):
        return None
    img = np.ascontiguousarray(image, np.float32)
    H, W, C = img.shape
    OH, OW = out_shape
    Minv = np.linalg.inv(np.asarray(M, np.float64))
    minv = np.ascontiguousarray(Minv[:2].reshape(-1))
    out = np.empty((OH, OW, C), np.float32)
    lib.warp_affine_nearest(
        _fp(img, ctypes.c_float), H, W, C, _fp(minv, ctypes.c_double),
        _fp(out, ctypes.c_float), OH, OW,
    )
    return out


def clahe_u8(channel: np.ndarray, clip_limit: float,
             tiles: Tuple[int, int] = (8, 8)) -> Optional[np.ndarray]:
    """CLAHE over a (H,W) uint8 channel; same algorithm as the numpy oracle
    transforms._clahe_apply_u8 (OpenCV CLAHE semantics)."""
    lib = load()
    if lib is None or not hasattr(lib, "clahe_u8"):
        return None
    ch = np.ascontiguousarray(channel, np.uint8)
    H, W = ch.shape
    out = np.empty((H, W), np.uint8)
    lib.clahe_u8(_fp(ch, ctypes.c_uint8), H, W, float(clip_limit),
                 int(tiles[0]), int(tiles[1]), _fp(out, ctypes.c_uint8))
    return out


def clahe_rgb(image: np.ndarray, clip_limit: float,
              tiles: Tuple[int, int] = (8, 8)) -> Optional[np.ndarray]:
    """Full CLAHE augmentation op on a (H,W,3) float32 sRGB image in [0,1]
    (transforms._clahe pipeline: u8 quantize, LAB, CLAHE on L, back)."""
    lib = load()
    if lib is None or not hasattr(lib, "clahe_rgb_f32"):
        return None
    img = np.ascontiguousarray(image, np.float32)
    H, W, C = img.shape
    if C != 3:
        return None
    out = np.empty((H, W, 3), np.float32)
    lib.clahe_rgb_f32(_fp(img, ctypes.c_float), H, W, float(clip_limit),
                      int(tiles[0]), int(tiles[1]),
                      _fp(out, ctypes.c_float))
    return out


def convex_hull_mask(points: np.ndarray,
                     shape: Tuple[int, int]) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    # int-truncate like the reference create_mask (idempotent when the
    # caller already truncated; keeps scalar and batch paths identical)
    pts = np.ascontiguousarray(
        np.asarray(points)[:, :2].astype(np.int32).astype(np.float64))
    H, W = shape
    mask = np.empty((H, W), np.float32)
    lib.convex_hull_mask(_fp(pts, ctypes.c_double), len(pts),
                         _fp(mask, ctypes.c_float), H, W)
    return mask


def warp_affine_batch(images: np.ndarray, Ms: np.ndarray,
                      out_shape: Tuple[int, int],
                      n_threads: int = 0) -> Optional[np.ndarray]:
    """Batched warp over the native thread pool.

    images (N,H,W,C), Ms (N,3,3) forward matrices -> (N,OH,OW,C).
    n_threads 0 = hardware concurrency. None when the library (or the batch
    entry point) is unavailable.
    """
    lib = load()
    if lib is None or not hasattr(lib, "warp_affine_batch"):
        return None
    imgs = np.ascontiguousarray(images, np.float32)
    N, H, W, C = imgs.shape
    OH, OW = out_shape
    minvs = np.ascontiguousarray(
        np.stack([np.linalg.inv(np.asarray(m, np.float64))[:2].reshape(-1)
                  for m in Ms])
    )
    out = np.empty((N, OH, OW, C), np.float32)
    lib.warp_affine_batch(
        _fp(imgs, ctypes.c_float), H, W, C, _fp(minvs, ctypes.c_double),
        _fp(out, ctypes.c_float), OH, OW, N, n_threads,
    )
    return out


def convex_hull_mask_batch(points: np.ndarray, shape: Tuple[int, int],
                           n_threads: int = 0) -> Optional[np.ndarray]:
    """Batched hull fill: points (N,K,2) -> masks (N,H,W). Coordinates are
    int-truncated like the reference create_mask (and the scalar path)."""
    lib = load()
    if lib is None or not hasattr(lib, "convex_hull_mask_batch"):
        return None
    pts = np.ascontiguousarray(
        np.asarray(points)[..., :2].astype(np.int32).astype(np.float64))
    N, K = pts.shape[:2]
    H, W = shape
    masks = np.empty((N, H, W), np.float32)
    lib.convex_hull_mask_batch(_fp(pts, ctypes.c_double), K,
                               _fp(masks, ctypes.c_float), H, W, N, n_threads)
    return masks
