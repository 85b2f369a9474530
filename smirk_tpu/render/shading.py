"""Lighting models for the mesh renderer (reference renderer.py:209-250).

The training renderer uses only `directional_shading` (5 fixed directions,
intensity 1.7, gray albedo); SH and point lighting are kept for parity with
the reference's auxiliary rendering utilities.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# reference renderer.py:127-136
DEFAULT_LIGHT_DIRECTIONS = np.array(
    [[-1, 1, 1], [1, 1, 1], [-1, -1, 1], [1, -1, 1], [0, 0, 1]], np.float32
)
DEFAULT_LIGHT_INTENSITY = 1.7
GRAY_ALBEDO = 180.0 / 255.0

# SH constant factors (reference renderer.py:94-98)
_pi = np.pi
SH_CONST = np.array(
    [
        1 / np.sqrt(4 * _pi),
        ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
        ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
        ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
        (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
        (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
        (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
        (_pi / 4) * (3 / 2) * np.sqrt(5 / (12 * _pi)),
        (_pi / 4) * (1 / 2) * np.sqrt(5 / (4 * _pi)),
    ],
    np.float32,
)


def directional_shading(
    normals: jnp.ndarray,  # (..., 3) unit normals
    light_directions: np.ndarray = DEFAULT_LIGHT_DIRECTIONS,
    intensity: float = DEFAULT_LIGHT_INTENSITY,
) -> jnp.ndarray:
    """Mean over lights of clamp(n . dir, 0, 1) * intensity -> (..., 3).

    Reference add_directionlight (renderer.py:239-250); the per-light
    intensity is a constant 1.7 on all channels, so the shading is gray.
    """
    dirs = light_directions / np.linalg.norm(light_directions, axis=-1, keepdims=True)
    dots = jnp.einsum("...k,lk->...l", normals, jnp.asarray(dirs))
    shade = jnp.clip(dots, 0.0, 1.0).mean(axis=-1) * intensity
    return jnp.broadcast_to(shade[..., None], shade.shape + (3,))


def point_shading(vertices, normals, light_positions, light_intensities):
    """Reference add_pointlight (renderer.py:224-236): unclamped n.l."""
    d = light_positions[:, :, None, :] - vertices[:, None, :, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=3, keepdims=True), 1e-12)
    ndl = (normals[:, None, :, :] * d).sum(3)
    return (ndl[..., None] * light_intensities[:, :, None, :]).mean(1)


def sh_shading(normal_images: jnp.ndarray, sh_coeff: jnp.ndarray) -> jnp.ndarray:
    """Reference add_SHlight (renderer.py:209-222). normal_images (B,H,W,3),
    sh_coeff (B,9,3) -> (B,H,W,3)."""
    N = normal_images
    sh = jnp.stack(
        [
            jnp.ones_like(N[..., 0]),
            N[..., 0],
            N[..., 1],
            N[..., 2],
            N[..., 0] * N[..., 1],
            N[..., 0] * N[..., 2],
            N[..., 1] * N[..., 2],
            N[..., 0] ** 2 - N[..., 1] ** 2,
            3 * (N[..., 2] ** 2) - 1,
        ],
        axis=-1,
    ) * jnp.asarray(SH_CONST)
    return jnp.einsum("bhwk,bkc->bhwc", sh, sh_coeff)
