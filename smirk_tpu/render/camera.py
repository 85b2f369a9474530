"""Orthographic camera projection (reference src/renderer/util.py:64-78).

cam = [scale, tx, ty]; projection = scale * (xy + t), z passed through scaled.
The y/z sign flip applied after projection in the reference renderer
(renderer.py:101-108) lives in `orth_proj_ndc` so callers can't get it wrong.
"""
from __future__ import annotations

import jax.numpy as jnp


def batch_orth_proj(X: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """X (B,N,3), camera (B,3)=[scale,tx,ty] -> (B,N,3) scaled translation."""
    camera = camera.reshape(-1, 1, 3)
    xy = X[:, :, :2] + camera[:, :, 1:]
    Xt = jnp.concatenate([xy, X[:, :, 2:]], axis=2)
    return camera[:, :, 0:1] * Xt


def orth_proj_ndc(X: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Project and flip y/z into SMIRK's custom NDC (renderer.py:101-102)."""
    p = batch_orth_proj(X, camera)
    return jnp.concatenate([p[..., :1], -p[..., 1:]], axis=-1)


def project_landmarks(lmk: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Landmarks -> 2D NDC, matching renderer.py:104-108 (y flip, keep xy)."""
    p = batch_orth_proj(lmk, camera)
    return jnp.concatenate([p[..., :1], -p[..., 1:2]], axis=-1)
