"""Host-side image/keypoint transforms for the input pipeline.

Pure numpy/scipy equivalents of the reference's cv2/skimage/albumentations
usage (datasets/base_dataset.py):
  * similarity-transform estimation (Umeyama) <- skimage estimate_transform
  * bbox-centered face crop (crop_face, base_dataset.py:77-96)
  * affine warp <- skimage.warp / cv2.warpAffine
  * convex hull face mask <- cv2.convexHull + fillConvexPoly
  * ArcFace 5-point 112px alignment (estimate_norm, base_dataset.py:61-75)
  * photometric + geometric train augmentation (approximate equivalent of
    the albumentations pipeline at base_dataset.py:41-52 — augmentation is
    stochastic regularization, not a parity surface)

A C++ fast path can override `warp_affine` / `convex_hull_mask` via
smirk_tpu.native when built; these numpy versions are the reference oracle.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage

ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]],
    dtype=np.float32,
)

# 105-of-478 mediapipe landmark subset matching the FLAME mediapipe
# embedding (base_dataset.py:18-26; also stored in the embedding npz)
MEDIAPIPE_INDICES = [
    276, 282, 283, 285, 293, 295, 296, 300, 334, 336, 46, 52, 53,
    55, 63, 65, 66, 70, 105, 107, 249, 263, 362, 373, 374, 380,
    381, 382, 384, 385, 386, 387, 388, 390, 398, 466, 7, 33, 133,
    144, 145, 153, 154, 155, 157, 158, 159, 160, 161, 163, 173, 246,
    168, 6, 197, 195, 5, 4, 129, 98, 97, 2, 326, 327, 358,
    0, 13, 14, 17, 37, 39, 40, 61, 78, 80, 81, 82, 84,
    87, 88, 91, 95, 146, 178, 181, 185, 191, 267, 269, 270, 291,
    308, 310, 311, 312, 314, 317, 318, 321, 324, 375, 402, 405, 409,
    415,
]


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Umeyama least-squares similarity (rotation+scale+translation).

    src/dst (N,2) -> 3x3 homogeneous matrix mapping src -> dst. Matches
    skimage SimilarityTransform.estimate.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc**2).sum() / len(src)
    scale = np.trace(np.diag(S) @ D) / var_s
    t = mu_d - scale * R @ mu_s
    M = np.eye(3)
    M[:2, :2] = scale * R
    M[:2, 2] = t
    return M


def crop_face_tform(
    landmarks: np.ndarray, scale: float, image_size: int
) -> np.ndarray:
    """Landmark-bbox-centered square crop -> 3x3 similarity matrix
    (reference crop_face, base_dataset.py:77-96)."""
    left, right = landmarks[:, 0].min(), landmarks[:, 0].max()
    top, bottom = landmarks[:, 1].min(), landmarks[:, 1].max()
    old_size = (right - left + bottom - top) / 2
    center = np.array([right - (right - left) / 2.0, bottom - (bottom - top) / 2.0])
    size = int(old_size * scale)
    src = np.array(
        [
            [center[0] - size / 2, center[1] - size / 2],
            [center[0] - size / 2, center[1] + size / 2],
            [center[0] + size / 2, center[1] - size / 2],
        ]
    )
    dst = np.array([[0, 0], [0, image_size - 1], [image_size - 1, 0]])
    return estimate_similarity(src, dst)


def warp_affine(
    image: np.ndarray, M: np.ndarray, out_shape: Tuple[int, int],
    order: int = 1,
) -> np.ndarray:
    """Warp image with the FORWARD 3x3 matrix M (out(p) = img(M^-1 p)).

    Bilinear by default; equivalent to skimage.warp(tform.inverse) /
    cv2.warpAffine(M[:2]).
    """
    if order == 1:
        from smirk_tpu import native

        fast = native.warp_affine(np.asarray(image, np.float32), M, out_shape)
        if fast is not None:
            return fast
    if order == 0:
        from smirk_tpu import native

        fast = native.warp_affine_nearest(
            np.asarray(image, np.float32), M, out_shape)
        if fast is not None:
            return fast
        return _warp_affine_nearest_np(image, M, out_shape)
    Minv = np.linalg.inv(M)
    # scipy affine_transform maps output coords -> input coords via
    # matrix @ out + offset, in (row, col) order.
    A = np.array([[Minv[1, 1], Minv[1, 0]], [Minv[0, 1], Minv[0, 0]]])
    offset = np.array([Minv[1, 2], Minv[0, 2]])
    chans = []
    img = np.asarray(image, np.float32)
    for c in range(img.shape[2]):
        chans.append(
            # grid-constant: zero-pad then interpolate (edge blending), the
            # behavior of skimage.warp / cv2.warpAffine that the reference
            # relies on; plain 'constant' would snap edge samples to cval.
            ndimage.affine_transform(
                img[:, :, c], A, offset=offset, output_shape=out_shape,
                order=order, mode="grid-constant", cval=0.0,
            )
        )
    return np.stack(chans, axis=-1)


def _warp_affine_nearest_np(image: np.ndarray, M: np.ndarray,
                            out_shape: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor warp, forward matrix M, zero fill outside — the
    order=0 semantics of scipy affine_transform(order=0, grid-constant)
    (rounding floor(v+0.5); verified equal in tests), without the ~7 ms
    scipy geometric_transform call the mask warp used to pay per sample."""
    img = np.asarray(image, np.float32)
    H, W = img.shape[:2]
    OH, OW = out_shape
    Minv = np.linalg.inv(np.asarray(M, np.float64))
    xo = np.arange(OW, dtype=np.float64)
    yo = np.arange(OH, dtype=np.float64)[:, None]
    ix = np.floor(Minv[0, 0] * xo + Minv[0, 1] * yo + Minv[0, 2] + 0.5)
    iy = np.floor(Minv[1, 0] * xo + Minv[1, 1] * yo + Minv[1, 2] + 0.5)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = np.clip(ix, 0, W - 1).astype(np.int64)
    iyc = np.clip(iy, 0, H - 1).astype(np.int64)
    out = np.where(valid[..., None], img[iyc, ixc], 0.0)
    return out.astype(np.float32)


def transform_points(M: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply 3x3 homogeneous matrix to (N,2) points."""
    homo = np.hstack([pts[:, :2], np.ones((len(pts), 1))])
    return (homo @ M.T)[:, :2]


def convex_hull_mask(points: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """1 outside the convex hull of points, 0 inside (reference create_mask,
    base_dataset.py:9-15 semantics: hull region zeroed).

    Like the reference, landmark coordinates are truncated to int before the
    hull. The fill itself is a pixel-center half-plane test, not cv2's
    fillConvexPoly outline rasterization — measured ~0.6% of pixels differ
    on the hull BOUNDARY only (293/50176 at 224px, random 105-pt inputs);
    interior/exterior classification is identical. Fewer than 3 unique
    points (never the case for the 105 mediapipe landmarks) -> all-ones."""
    from smirk_tpu import native

    # reference create_mask truncates to int32 before cv2.convexHull
    points = np.asarray(points)[:, :2].astype(np.int32)
    fast = native.convex_hull_mask(points, shape)
    if fast is not None:
        return fast
    pts = np.asarray(points, np.float64)
    hull = _convex_hull(pts)
    if len(hull) < 3:  # degenerate: match the native path (no hull region)
        return np.ones(shape, np.float32)
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pos = np.ones((H, W), bool)
    neg = np.ones((H, W), bool)
    n = len(hull)
    for i in range(n):
        x0, y0 = hull[i]
        x1, y1 = hull[(i + 1) % n]
        e = (xx - x0) * (y1 - y0) - (yy - y0) * (x1 - x0)
        pos &= e >= 0
        neg &= e <= 0
    inside = pos | neg  # orientation-agnostic convex containment
    mask = np.ones(shape, np.float32)
    mask[inside] = 0.0
    return mask


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull (y-down image coords)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                a, b = out[-2], out[-1]
                if (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def arcface_tform(landmarks_fan: np.ndarray, image_size: int = 112) -> np.ndarray:
    """5-point similarity to the ArcFace template (base_dataset.py:61-75,
    184-189). landmarks_fan: (68,2); returns 3x3 matrix."""
    lmk5 = landmarks_fan[[36, 45, 32, 48, 54]].astype(np.float64).copy()
    lmk5[0] = (landmarks_fan[36] + landmarks_fan[39]) / 2
    lmk5[1] = (landmarks_fan[42] + landmarks_fan[45]) / 2
    ratio = image_size / 112.0
    dst = ARCFACE_DST * ratio
    return estimate_similarity(lmk5, dst)


# ------------------------------ augmentation ------------------------------


_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def _rotate_hue(img: np.ndarray, turns: float) -> np.ndarray:
    """Rotate hue by `turns` of the full circle: rotation about the RGB gray
    axis u=(1,1,1)/sqrt(3) (R = cI + (1-c)uu^T + s[u]x), the linear-RGB
    equivalent of torchvision adjust_hue's HSV shift."""
    a = 2.0 * np.pi * turns
    c, s = np.cos(a), np.sin(a)
    cross = np.array([[0, -1, 1], [1, 0, -1], [-1, 1, 0]], np.float32)
    m = c * np.eye(3, dtype=np.float32) + (1 - c) / 3.0 + (
        s / np.sqrt(3.0)) * cross
    return img @ m.T


# D65 sRGB <-> XYZ matrices of the cv2 RGB2LAB formula (sRGB-gamma input,
# the OpenCV convention the reference's albumentations CLAHE goes through;
# verified empirically: cv2's u8 L channel matches the gamma formula within
# 0.92 levels vs 78 levels without).
_RGB2XYZ = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], np.float64)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_LAB_EPS = 0.008856
_LAB_KAPPA = 903.3


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.0031308, 12.92 * c,
                    1.055 * np.maximum(c, 0.0) ** (1.0 / 2.4) - 0.055)


def _rgb_to_lab(img: np.ndarray):
    """sRGB float [0,1] -> (L [0,100], a, b), cv2 COLOR_RGB2LAB semantics
    in float instead of cv2's u8 fixed-point tables."""
    xyz = _srgb_to_linear(img.astype(np.float64)) @ _RGB2XYZ.T
    xyz /= np.array([0.950456, 1.0, 1.088754])
    f = np.where(xyz > _LAB_EPS, np.cbrt(np.maximum(xyz, 0)),
                 7.787 * xyz + 16.0 / 116.0)
    L = np.where(xyz[..., 1] > _LAB_EPS,
                 116.0 * f[..., 1] - 16.0, _LAB_KAPPA * xyz[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return L, a, b


def _lab_to_rgb(L: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def _inv(f):
        f3 = f ** 3
        return np.where(f3 > _LAB_EPS, f3, (f - 16.0 / 116.0) / 7.787)

    yr = np.where(L > _LAB_KAPPA * _LAB_EPS,
                  ((L + 16.0) / 116.0) ** 3, L / _LAB_KAPPA)
    xyz = np.stack([_inv(fx) * 0.950456, yr, _inv(fz) * 1.088754], -1)
    lin = np.clip(xyz @ _XYZ2RGB.T, 0.0, 1.0)
    return _linear_to_srgb(lin).astype(np.float32)


def _clahe_apply_u8(channel: np.ndarray, clip_limit: float,
                    tiles: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """CLAHE over a (H,W) uint8 channel — numpy oracle for
    native.clahe_u8 (OpenCV CLAHE semantics: integer clip limit scaled by
    tile area, batch + residual-step excess redistribution, bilinear
    interpolation between the 4 surrounding tile LUTs, reflect-101
    right/bottom padding when the size is not tile-divisible)."""
    ch = np.asarray(channel, np.uint8)
    H, W = ch.shape
    tx_n, ty_n = int(tiles[0]), int(tiles[1])
    if W % tx_n == 0 and H % ty_n == 0:
        src = ch
    else:
        pw, ph = tx_n - W % tx_n, ty_n - H % ty_n
        src = np.pad(ch, ((0, ph), (0, pw)), mode="reflect")
    PH, PW = src.shape
    tw, th = PW // tx_n, PH // ty_n
    area = tw * th
    clip = max(1, int(clip_limit * area / 256.0)) if clip_limit > 0 else 0

    tiles_v = src.reshape(ty_n, th, tx_n, tw).transpose(0, 2, 1, 3)
    tile_ids = np.arange(ty_n * tx_n)[:, None, None]
    idx = tile_ids * 256 + tiles_v.reshape(ty_n * tx_n, th, tw)
    hist = np.bincount(idx.ravel(), minlength=ty_n * tx_n * 256).reshape(
        ty_n * tx_n, 256).astype(np.int64)
    if clip > 0:
        clipped = np.maximum(hist - clip, 0).sum(1)
        hist = np.minimum(hist, clip) + (clipped // 256)[:, None]
        residual = clipped - (clipped // 256) * 256
        for t in np.nonzero(residual)[0]:
            r = int(residual[t])
            step = max(1, 256 // r)
            hist[t, np.arange(0, 256, step)[:r]] += 1
    lut = np.rint(np.cumsum(hist, 1) * (255.0 / area))
    lut = np.clip(lut, 0, 255).reshape(ty_n, tx_n, 256)

    # x * (1/tw), not x/tw: the 1-ulp difference flips floor() at exact
    # tile boundaries and must match the native kernel (and cv2) bit-for-bit
    txf = np.arange(W) * (1.0 / tw) - 0.5
    tx1 = np.floor(txf).astype(np.int64)
    xa = txf - tx1
    tx2 = np.minimum(tx1 + 1, tx_n - 1)
    tx1 = np.maximum(tx1, 0)
    tyf = np.arange(H) * (1.0 / th) - 0.5
    ty1 = np.floor(tyf).astype(np.int64)
    ya = (tyf - ty1)[:, None]
    ty2 = np.minimum(ty1 + 1, ty_n - 1)
    ty1 = np.maximum(ty1, 0)
    v = ch.astype(np.int64)
    r1 = ty1[:, None]
    r2 = ty2[:, None]
    res = ((lut[r1, tx1[None, :], v] * (1 - xa) +
            lut[r1, tx2[None, :], v] * xa) * (1 - ya) +
           (lut[r2, tx1[None, :], v] * (1 - xa) +
            lut[r2, tx2[None, :], v] * xa) * ya)
    return np.clip(np.rint(res), 0, 255).astype(np.uint8)


def _clahe(img: np.ndarray, clip_limit: float) -> np.ndarray:
    """CLAHE on the LAB L channel (the reference's albumentations CLAHE,
    which wraps cv2 — here first-party: sRGB-gamma float LAB transform +
    the cv2-semantics CLAHE kernel, no cv2 dependency; the native path
    (fastops clahe_rgb) does the whole pipeline in C++, the numpy path
    below is the oracle; equivalence vs cv2 is tolerance-tested in
    tests/test_native_ops.py)."""
    from smirk_tpu import native

    rgb = np.clip(img, 0.0, 1.0).astype(np.float32)
    fast = native.clahe_rgb(rgb, clip_limit)
    if fast is not None:
        return fast
    # mirror the native pipeline: u8 quantization on both ends (the
    # reference's albumentations pipeline is u8 throughout)
    rgb_q = np.rint(rgb * 255.0) / 255.0
    L, a, b = _rgb_to_lab(rgb_q)
    # cv2's u8 pipeline quantizes L to L*255/100; CLAHE histograms need the
    # same 256-level grid
    l_u8 = np.clip(np.rint(L * (255.0 / 100.0)), 0, 255).astype(np.uint8)
    l_eq = _clahe_apply_u8(l_u8, clip_limit)
    out = _lab_to_rgb(l_eq.astype(np.float64) * (100.0 / 255.0), a, b)
    return (np.rint(out * 255.0) / 255.0).astype(np.float32)


def augment(
    rng: np.random.Generator,
    image: np.ndarray,  # (H,W,3) float [0,1]
    mask: np.ndarray,  # (H,W) float
    keypoints: np.ndarray,  # (K,2)
    keypoints2: np.ndarray,  # (K2,2)
):
    """Photometric + shift/scale/rotate augmentation with keypoint sync.

    Op set, order, probabilities, and parameter ranges mirror the reference
    albumentations pipeline (base_dataset.py:41-52) at the libraries'
    default limits: RandomBrightnessContrast(0.5), RandomGamma(0.5),
    ColorJitter(0.05 x4, 0.25), CLAHE(0.255), RGBShift(0.25), Blur(0.1),
    GaussNoise(0.5), ShiftScaleRotate(0.05/0.1/10deg, border 0, 0.9).
    Remaining divergences (PARITY.md augmentation table): ops run on float
    images rather than uint8 (no 8-bit quantization between ops), and the
    RNG draws differ from albumentations' internal sequence, so this is
    distribution-level, not sample-level, parity.
    """
    img = image.astype(np.float32)

    if rng.random() < 0.5:  # RandomBrightnessContrast (limits 0.2/0.2)
        img = img * (1 + rng.uniform(-0.2, 0.2)) + rng.uniform(-0.2, 0.2)
    if rng.random() < 0.5:  # RandomGamma (gamma_limit 80..120)
        img = np.clip(img, 0, 1) ** rng.uniform(0.8, 1.2)
    if rng.random() < 0.25:  # ColorJitter(0.05,0.05,0.05,0.05), random order
        for op in rng.permutation(4):
            if op == 0:  # brightness
                img = img * rng.uniform(0.95, 1.05)
            elif op == 1:  # contrast: blend with the mean gray
                f = rng.uniform(0.95, 1.05)
                img = img * f + float((img @ _LUMA).mean()) * (1 - f)
            elif op == 2:  # saturation: blend with per-pixel gray
                f = rng.uniform(0.95, 1.05)
                gray = (img @ _LUMA)[..., None]
                img = img * f + gray * (1 - f)
            else:  # hue
                img = _rotate_hue(img, rng.uniform(-0.05, 0.05))
    if rng.random() < 0.255:  # CLAHE (clip_limit U(1,4), 8x8 tiles)
        img = _clahe(img, rng.uniform(1.0, 4.0))
    if rng.random() < 0.25:  # RGBShift (shift_limit 20/255 per channel)
        img = img + rng.uniform(-20.0, 20.0, 3).astype(np.float32) / 255.0
    if rng.random() < 0.1:  # Blur (box kernel, odd size 3/5/7 — even
        # sizes would shift content half a pixel off the keypoints, and
        # albumentations draws odd ksizes only)
        k = 2 * int(rng.integers(1, 4)) + 1
        img = ndimage.uniform_filter(img, size=(k, k, 1))
    if rng.random() < 0.5:  # GaussNoise (var_limit 10..50 on the 255 scale)
        std = np.sqrt(rng.uniform(10.0, 50.0)) / 255.0
        img = img + rng.normal(0, std, img.shape)
    img = np.clip(img, 0, 1).astype(np.float32)

    if rng.random() < 0.9:  # shift-scale-rotate
        H, W = img.shape[:2]
        angle = np.deg2rad(rng.uniform(-10, 10))
        scale = 1 + rng.uniform(-0.1, 0.1)
        tx = rng.uniform(-0.05, 0.05) * W
        ty = rng.uniform(-0.05, 0.05) * H
        c, s = np.cos(angle), np.sin(angle)
        cx, cy = W / 2, H / 2
        R = np.array(
            [[scale * c, -scale * s, 0], [scale * s, scale * c, 0], [0, 0, 1]]
        )
        T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
        T2 = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1.0]])
        M = T2 @ R @ T1
        img = warp_affine(img, M, (H, W))
        mask = warp_affine(mask[..., None], M, (H, W), order=0)[..., 0]
        keypoints = transform_points(M, keypoints)
        keypoints2 = transform_points(M, keypoints2)
        img = np.clip(img, 0, 1).astype(np.float32)

    return img, mask.astype(np.float32), keypoints.astype(np.float32), \
        keypoints2.astype(np.float32)
