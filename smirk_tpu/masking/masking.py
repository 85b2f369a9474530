"""Mesh-anchored pixel sampling & mask composition (jit-safe, PRNG-keyed).

Equivalent capability to reference src/utils/masking.py:
  * triangle probability table from FLAME regions (loaded in assets.py);
  * `sample_mesh_points`  <- mesh_based_mask_uniform_faces (masking.py:132-181):
    frontal-facing filter, probability x screen-space area, categorical
    sampling, random barycentric, NDC -> pixel mapping;
  * `compose_mask`        <- masking (masking.py:71-102): hull-mask dilation,
    rendered-mask subtraction, pixel-hint paste with noise and random 11x11
    dropout patches;
  * `transfer_pixels`     <- transfer_pixels (masking.py:116-129), vectorized
    scatter with optional per-sample point budgets (demo.py:155-160) realized
    by scattering invalid points out of bounds (mode='drop').

All shapes static; all randomness from explicit jax PRNG keys. Images NHWC.

TPU-native since round 5 (measured, PARITY.md reconstruct bisect): the
categorical draw is inverse-CDF via broadcast compare-count (no gumbel
tail, no gathers), the dilation is a separable max-pool, and callers pass
static incidence tables so the frontal-facing gate's vertex normals are
gathers, never scatters. Env oracles: SMIRK_SAMPLE_GUMBEL=1 /
SMIRK_DILATE_NAIVE=1 restore the direct formulations.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from smirk_tpu.render import geometry

NORMAL_Z_THRESH = 0.05  # reference masking.py:152


def triangle_area_xy(fv: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of triangles projected on xy. fv (...,3,>=2) -> (...)."""
    x1, y1 = fv[..., 0, 0], fv[..., 0, 1]
    x2, y2 = fv[..., 1, 0], fv[..., 1, 1]
    x3, y3 = fv[..., 2, 0], fv[..., 2, 1]
    return 0.5 * jnp.abs(x1 * y2 + x2 * y3 + x3 * y1 - x2 * y1 - x3 * y2 - x1 * y3)


def random_barycentric(key, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Uniform barycentric coords, same construction as masking.py:54-68."""
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, shape)
    v = jax.random.uniform(kv, shape)
    flip = u + v > 1
    u = jnp.where(flip, 1 - u, u)
    v = jnp.where(flip, 1 - v, v)
    return jnp.stack([1 - (u + v), u, v], axis=-1)


def points_to_pixels(npoints: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """NDC points (...,>=2) -> integer pixel coords [x, y] (masking.py:172-175)."""
    p = 0.5 * (1.0 + npoints[..., :2]) * image_size
    p = p.astype(jnp.int32)
    return jnp.clip(p, 0, image_size - 1)


def interpolate_on_faces(
    verts: jnp.ndarray, faces: jnp.ndarray, face_idx: jnp.ndarray, bary: jnp.ndarray
) -> jnp.ndarray:
    """Barycentric interpolation of vertex positions on sampled faces.

    verts (B,V,3), faces (F,3), face_idx (B,N), bary (B,N,3) -> (B,N,3).
    """
    tri = faces[face_idx]  # (B,N,3)
    fv = jax.vmap(lambda v, f: v[f])(verts, tri)  # (B,N,3,3)
    return jnp.einsum("bnc,bncd->bnd", bary, fv)


def face_sampling_probabilities(
    transformed_vertices: jnp.ndarray,  # (B,V,3) NDC
    faces: jnp.ndarray,  # (F,3)
    face_probabilities: jnp.ndarray,  # (F,)
    incidence=None,  # optional (face_idx, corner_idx) static tables
) -> jnp.ndarray:
    """Region prob x frontal-facing gate x screen area (masking.py:144-159)."""
    B = transformed_vertices.shape[0]
    if incidence is not None:
        normals = geometry.vertex_normals_gather(
            transformed_vertices, faces, incidence[0], incidence[1]
        )
    else:
        normals = geometry.vertex_normals(transformed_vertices, faces)
    fnz = geometry.face_vertices(normals, faces)[..., 2].mean(-1)  # (B,F)
    probs = jnp.broadcast_to(face_probabilities[None], fnz.shape)
    probs = jnp.where(fnz < NORMAL_Z_THRESH, probs, 0.0)
    fv = geometry.face_vertices(transformed_vertices, faces)
    return probs * triangle_area_xy(fv)


def sample_mesh_points(
    key,
    transformed_vertices: jnp.ndarray,
    faces: jnp.ndarray,
    face_probabilities: jnp.ndarray,
    num_points: int,
    image_size: int = 224,
    coords: Optional[Dict[str, jnp.ndarray]] = None,
    incidence=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sample pixel locations on the visible face surface.

    Returns (pixel points (B,N,2) int32 [x,y], coords for re-sampling the
    SAME surface points on a deformed mesh — the cycle-path trick,
    smirk_trainer.py:268-287).

    `num_points` must be static: int(mask_ratio * H * W) (masking.py:140).
    """
    B = transformed_vertices.shape[0]
    if coords is None:
        kf, kb = jax.random.split(key)
        probs = face_sampling_probabilities(
            transformed_vertices, faces, face_probabilities, incidence
        )
        # categorical == multinomial-with-replacement; guard all-zero rows
        total = probs.sum(-1, keepdims=True)
        safe = jnp.where(total > 0, probs, 1.0)
        if os.environ.get("SMIRK_SAMPLE_GUMBEL"):
            # original formulation: gumbel-argmax over (B, N, F) — kept as
            # a distribution oracle (test_masking sampling tests pass under
            # either; draws differ, distributions match)
            logits = jnp.log(safe)
            face_idx = jax.random.categorical(
                kf, logits[:, None, :], axis=-1, shape=(B, num_points))
        else:
            # Inverse-CDF sampling by compare-count: cumsum over F once per
            # image, then `searchsorted(cdf, u, side='right') ==
            # #{f : cdf[f] <= u}` as a broadcast compare reduced over F.
            # TPU-native on measurement, not just in theory: the gumbel
            # argmax streams ~1.6e9 transcendental draws and a log-F
            # binary search issues B*N*logF serial scalar gathers — BOTH
            # measured ~140 ms/batch64 on v5e, 73% of the whole
            # reconstruct path, while this compare-count reduce is pure
            # vectorized VPU work with no gathers (~2 ms; PARITY.md
            # round-5 reconstruct bisect). Same distribution, different
            # draw sequence; exactness vs searchsorted pinned in
            # test_masking.py::test_cdf_count_equals_searchsorted.
            cdf = jnp.cumsum(safe, axis=-1)  # (B,F)
            u = jax.random.uniform(kf, (B, num_points)) * cdf[:, -1:]
            face_idx = (cdf[:, None, :] <= u[:, :, None]).sum(
                -1, dtype=jnp.int32)
            # u*total can round up to exactly cdf[-1] (count == F); clamp
            # to the last POSITIVE-probability face, not blindly to F-1 —
            # trailing faces are often prob-0 (backfacing gate) and the
            # gumbel oracle (-inf logits) could never select one
            F = safe.shape[-1]
            iota = jnp.arange(F, dtype=jnp.int32)
            last_pos = jnp.max(
                jnp.where(safe > 0, iota[None, :], -1), axis=-1,
                keepdims=True)  # (B,1); all-zero rows have safe==1.0
            face_idx = jnp.minimum(face_idx, last_pos)
        bary = random_barycentric(kb, (B, num_points))
        coords = {"sampled_faces_indices": face_idx, "barycentric_coords": bary}
    pts = interpolate_on_faces(
        transformed_vertices,
        faces,
        coords["sampled_faces_indices"],
        coords["barycentric_coords"],
    )
    return points_to_pixels(pts, image_size), coords


def transfer_pixels(
    img: jnp.ndarray,  # (B,H,W,C)
    points_src: jnp.ndarray,  # (B,N,2) int [x,y]
    points_dst: jnp.ndarray,  # (B,N,2)
    valid_count: Optional[jnp.ndarray] = None,  # (B,) optional point budget
) -> jnp.ndarray:
    """Zeros image with img[src] copied to [dst] (masking.py:116-129)."""
    B, H, W, C = img.shape
    N = points_src.shape[1]

    def per_image(im, src, dst, nvalid):
        vals = im[src[:, 1], src[:, 0]]  # (N,C)
        oob = jnp.full_like(dst[:, 0], H)
        keep = jnp.arange(N) < nvalid
        y = jnp.where(keep, dst[:, 1], oob)
        x = jnp.where(keep, dst[:, 0], oob)
        return jnp.zeros_like(im).at[y, x].set(vals, mode="drop")

    if valid_count is None:
        valid_count = jnp.full((B,), N, jnp.int32)
    return jax.vmap(per_image)(img, points_src, points_dst, valid_count)


def _dilate(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation via max pooling, window 2r+1 stride 1 (masking.py:78).

    Max over a square window separates exactly into a row pass then a
    column pass: 2*(2r+1) comparisons per pixel instead of (2r+1)^2 —
    15.5x less VPU work at the recipe radius 10 (bit-identical output,
    test_masking.py::test_dilate_separable_matches_naive).
    SMIRK_DILATE_NAIVE=1 restores the single-pass square window."""
    k = 2 * radius + 1
    if os.environ.get("SMIRK_DILATE_NAIVE"):
        return jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "SAME"
        )
    for window in ((1, k, 1, 1), (1, 1, k, 1)):
        mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, window, (1, 1, 1, 1), "SAME"
        )
    return mask


def compose_mask(
    key,
    img: jnp.ndarray,  # (B,H,W,C)
    mask: jnp.ndarray,  # (B,H,W,1) hull mask, 1 = BACKGROUND (create_mask
    # polarity, base_dataset.py:9-15): the face (1-mask) is dilated + removed
    extra_points: jnp.ndarray,  # (B,H,W,C) sparse pixel hints
    dilation_radius: int = 15,
    rendered_mask: Optional[jnp.ndarray] = None,  # (B,H,W,1)
    extra_noise: bool = True,
    random_mask: float = 0.01,
) -> jnp.ndarray:
    """Masked image = img outside (dilated hull minus render) + noisy hints.

    Reference masking.py:71-102. Output is stop-gradiented like the
    reference's .detach() (masking.py:101).
    """
    kn, kp = jax.random.split(key)
    B, H, W, C = img.shape

    hole = 1.0 - _dilate(1.0 - mask, dilation_radius)
    if rendered_mask is not None:
        hole = hole * (1.0 - rendered_mask)
    masked_img = img * hole

    if extra_noise:  # N(1, 0.05) multiplicative (masking.py:86-89)
        noise = jax.random.normal(kn, extra_points.shape) * 0.05 + 1.0
        extra_points = extra_points * noise

    if random_mask > 0:  # drop 11x11 patches around random centers
        centers = jax.random.bernoulli(kp, random_mask, (B, H, W, 1)).astype(
            img.dtype
        )
        keep = 1.0 - _dilate(centers, 5)
        extra_points = extra_points * keep

    masked_img = jnp.where(extra_points > 0, extra_points, masked_img)
    return jax.lax.stop_gradient(masked_img)
