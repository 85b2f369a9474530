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


# ---------------- round-4 augmentation host ops (nearest warp, CLAHE) ------


def test_nearest_warp_numpy_matches_scipy():
    """Pins the order=0 semantics: _warp_affine_nearest_np ==
    scipy affine_transform(order=0, grid-constant) (the pre-round-4
    implementation of the augment mask warp)."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    for M in _mats(rng, 6):
        img = rng.random((41, 37, 2)).astype(np.float32)
        got = T._warp_affine_nearest_np(img, M, (33, 29))
        Minv = np.linalg.inv(M)
        A = np.array([[Minv[1, 1], Minv[1, 0]], [Minv[0, 1], Minv[0, 0]]])
        off = np.array([Minv[1, 2], Minv[0, 2]])
        want = np.stack(
            [ndimage.affine_transform(img[:, :, c], A, offset=off,
                                      output_shape=(33, 29), order=0,
                                      mode="grid-constant", cval=0.0)
             for c in range(2)], axis=-1)
        np.testing.assert_array_equal(got, want)


def test_native_nearest_warp_matches_numpy_oracle():
    rng = np.random.default_rng(8)
    img = rng.random((50, 44, 1)).astype(np.float32)
    for M in _mats(rng, 6):
        a = native.warp_affine_nearest(img, M, (40, 48))
        b = T._warp_affine_nearest_np(img, M, (40, 48))
        np.testing.assert_array_equal(a, b)


def test_native_clahe_u8_matches_numpy_oracle():
    """Bit-exact across divisible and non-divisible tile grids and the
    whole clip range used by augment (U(1,4)) plus extremes."""
    rng = np.random.default_rng(9)
    for shape in [(224, 224), (223, 225), (64, 100), (8, 8)]:
        for clip in [0.7, 1.0, 2.5, 4.0, 40.0]:
            ch = rng.integers(0, 256, shape).astype(np.uint8)
            a = T._clahe_apply_u8(ch, clip)
            b = native.clahe_u8(ch, clip)
            np.testing.assert_array_equal(a, b)


def test_native_clahe_u8_tiny_images_reflect_pad():
    """Images smaller than the tile grid force reflect-101 pad widths that
    exceed the image extent: the native fold must reflect REPEATEDLY like
    np.pad(mode="reflect") instead of computing negative source indices
    (out-of-bounds reads; round-4 review finding). Covers 1-pixel axes."""
    rng = np.random.default_rng(12)
    for shape in [(4, 4), (1, 16), (16, 1), (3, 7), (5, 5), (7, 229)]:
        for clip in [1.0, 2.0, 4.0]:
            ch = rng.integers(0, 256, shape).astype(np.uint8)
            a = T._clahe_apply_u8(ch, clip)
            b = native.clahe_u8(ch, clip)
            np.testing.assert_array_equal(a, b)


def test_clahe_u8_matches_cv2():
    """The CLAHE kernel follows cv2's algorithm (the reference's
    albumentations CLAHE backend): same u8 input -> at most 1-level
    differences on a tiny fraction of pixels (cv2 interpolates the tile
    LUTs in float32; ours is float64)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(10)
    for shape in [(224, 224), (223, 225)]:
        for clip in [1.0, 2.5, 4.0]:
            ch = rng.integers(0, 256, shape).astype(np.uint8)
            ours = T._clahe_apply_u8(ch, clip)
            ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(ch)
            d = np.abs(ours.astype(int) - ref.astype(int))
            assert d.max() <= 1
            assert (d > 0).mean() < 0.01


def test_native_clahe_rgb_matches_numpy_fallback():
    """The full _clahe pipeline (quantize, LAB, CLAHE-L, back): native and
    numpy agree to the output's u8 quantization grid (ties under 1-ulp
    transcendental differences may flip a level on isolated pixels)."""
    rng = np.random.default_rng(11)
    real_load = native.load
    for clip in [1.0, 2.2, 3.9]:
        img = np.clip(rng.random((96, 80, 3)), 0, 1).astype(np.float32)
        nat = T._clahe(img, clip)
        try:
            native.load = lambda: None
            ora = T._clahe(img, clip)
        finally:
            native.load = real_load
        d = np.abs(nat.astype(np.float64) - ora) * 255.0
        assert d.max() <= 1.0 + 1e-6
        assert (d > 0.5).mean() < 1e-3


def test_clahe_rgb_close_to_cv2_pipeline():
    """End-to-end _clahe vs the cv2 LAB round-trip the reference's
    albumentations CLAHE performs: distribution-level agreement (float
    LAB vs cv2's u8 fixed-point tables; PARITY.md augmentation table)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(12)
    base = (rng.random((28, 28, 3)) * 255).astype(np.uint8)
    img = np.asarray([cv2.resize(base[:, :, c], (224, 224))
                      for c in range(3)]).transpose(1, 2, 0)
    img = (img / 255.0).astype(np.float32)
    for clip in [1.5, 3.0]:
        ours = T._clahe(img, clip)
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        lab = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.createCLAHE(
            clipLimit=clip, tileGridSize=(8, 8)).apply(lab[..., 0])
        ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.float32) / 255.0
        d = np.abs(ours - ref) * 255.0
        assert d.mean() < 3.0
        # enhancement direction agrees: both move L the same way
        assert np.corrcoef((ours - img).ravel(), (ref - img).ravel())[0, 1] > 0.9
