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


def _clahe(img: np.ndarray, clip_limit: float) -> np.ndarray:
    """CLAHE on the LAB L channel (albumentations CLAHE semantics); no-op
    when cv2 is unavailable (documented divergence, PARITY.md)."""
    try:
        import cv2
    except ImportError:
        return img
    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    lab = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB)
    cl = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(8, 8))
    lab[..., 0] = cl.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.float32) / 255.0


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
