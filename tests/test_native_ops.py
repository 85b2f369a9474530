"""Native host-ops library (libfastops.so) vs the numpy oracles.

The C++ warp/hull are the production data path (transforms.py dispatches to
them when built); the numpy implementations are the reference oracle. Also
covers the batched thread-pool executor (warp_affine_batch /
convex_hull_mask_batch) and the video demo's deferred-crop resolution.
"""
import numpy as np
import pytest

from smirk_tpu import native
from smirk_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libfastops.so not built"
)


def _numpy_warp(image, M, out_shape):
    """The scipy oracle, bypassing the native dispatch."""
    from scipy import ndimage

    Minv = np.linalg.inv(M)
    A = np.array([[Minv[1, 1], Minv[1, 0]], [Minv[0, 1], Minv[0, 0]]])
    offset = np.array([Minv[1, 2], Minv[0, 2]])
    img = np.asarray(image, np.float32)
    return np.stack(
        [ndimage.affine_transform(img[:, :, c], A, offset=offset,
                                  output_shape=out_shape, order=1,
                                  mode="grid-constant", cval=0.0)
         for c in range(img.shape[2])], axis=-1)


def _mats(rng, n):
    out = []
    for _ in range(n):
        M = np.eye(3)
        th = rng.uniform(-0.4, 0.4)
        s = rng.uniform(0.7, 1.3)
        M[:2, :2] = s * np.array([[np.cos(th), -np.sin(th)],
                                  [np.sin(th), np.cos(th)]])
        M[:2, 2] = rng.uniform(-5, 5, 2)
        out.append(M)
    return np.stack(out)


def test_native_warp_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    img = rng.random((37, 45, 3)).astype(np.float32)
    for M in _mats(rng, 4):
        a = native.warp_affine(img, M, (32, 32))
        b = _numpy_warp(img, M, (32, 32))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_native_hull_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    for _ in range(4):
        pts = rng.uniform(3, 28, (25, 2))
        a = native.convex_hull_mask(pts, (32, 32))
        # numpy oracle (module-internal, bypasses dispatch); coordinates
        # int-truncated like the native path / reference create_mask
        pts64 = np.asarray(pts, np.float64).astype(np.int32).astype(np.float64)
        hull = T._convex_hull(pts64)
        H, W = 32, 32
        yy, xx = np.mgrid[0:H, 0:W]
        pos = np.ones((H, W), bool)
        neg = np.ones((H, W), bool)
        for i in range(len(hull)):
            x0, y0 = hull[i]
            x1, y1 = hull[(i + 1) % len(hull)]
            e = (xx - x0) * (y1 - y0) - (yy - y0) * (x1 - x0)
            pos &= e >= 0
            neg &= e <= 0
        b = np.ones((H, W), np.float32)
        b[pos | neg] = 0.0
        np.testing.assert_array_equal(a, b)


def test_batch_executor_matches_single():
    rng = np.random.default_rng(2)
    imgs = rng.random((6, 40, 48, 3)).astype(np.float32)
    Ms = _mats(rng, 6)
    batch = native.warp_affine_batch(imgs, Ms, (32, 32), n_threads=4)
    assert batch is not None
    for i in range(6):
        np.testing.assert_array_equal(
            batch[i], native.warp_affine(imgs[i], Ms[i], (32, 32)))

    pts = rng.uniform(2, 28, (5, 20, 2))
    masks = native.convex_hull_mask_batch(pts, (32, 32), n_threads=3)
    for i in range(5):
        np.testing.assert_array_equal(
            masks[i], native.convex_hull_mask(pts[i], (32, 32)))


def test_demo_video_deferred_crop_resolution():
    from smirk_tpu.cli.demo_video import _resolve_deferred_crops

    rng = np.random.default_rng(3)
    frames = [
        (rng.random((60, 80, 3)) * 255).astype(np.uint8) for _ in range(3)
    ]
    Ms = _mats(rng, 3)
    crops = [("warp", Ms[0]),
             np.zeros((24, 24, 3), np.float32),  # already-resolved entry
             ("warp", Ms[2])]
    _resolve_deferred_crops(crops, frames, size=24)
    for i in (0, 2):
        want = np.clip(
            T.warp_affine(frames[i].astype(np.float32), Ms[i], (24, 24)),
            0, 255) / 255.0
        np.testing.assert_allclose(crops[i], want, atol=1e-6)
    assert isinstance(crops[1], np.ndarray)
