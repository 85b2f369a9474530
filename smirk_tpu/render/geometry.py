"""Mesh geometry helpers: per-face vertex gather, area-weighted vertex normals.

Equivalent to reference src/renderer/util.py:10-62, but expressed as batched
gathers and a single segment-sum scatter instead of index_add_ loops.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def face_vertices(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex coords.

    vertices (B,V,3), faces (F,3) or (B,F,3) int -> (B,F,3,3).
    Reference: util.py:10-28.
    """
    if faces.ndim == 2:
        return vertices[:, faces]
    return jax.vmap(lambda v, f: v[f])(vertices, faces)


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, normalized. (B,V,3).

    Matches reference util.py:30-62: accumulates the cross product at each
    face corner (all three corners receive the same unnormalized face normal,
    computed from different edge pairs — identical up to fp error), then
    L2-normalizes with eps=1e-6. Implemented with segment_sum instead of
    index_add_.
    """
    B, V = vertices.shape[:2]
    if faces.ndim == 2:
        faces = jnp.broadcast_to(faces[None], (B,) + faces.shape)
    fv = face_vertices(vertices, faces)  # (B,F,3,3)

    # corner order matches reference accumulation (util.py:52-57)
    n1 = jnp.cross(fv[:, :, 2] - fv[:, :, 1], fv[:, :, 0] - fv[:, :, 1])
    n2 = jnp.cross(fv[:, :, 0] - fv[:, :, 2], fv[:, :, 1] - fv[:, :, 2])
    n0 = jnp.cross(fv[:, :, 1] - fv[:, :, 0], fv[:, :, 2] - fv[:, :, 0])

    def accumulate(face_idx, contribs):
        # face_idx (F,3) int, contribs (F,3,3): contribs[:,c] goes to vertex
        # face_idx[:,c]
        flat_idx = face_idx.reshape(-1)
        flat_c = contribs.reshape(-1, 3)
        return jax.ops.segment_sum(flat_c, flat_idx, num_segments=V)

    contribs = jnp.stack([n0, n1, n2], axis=2)  # (B,F,3corner,3)
    normals = jax.vmap(accumulate)(faces, contribs)  # (B,V,3)

    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(norm, 1e-6)
    return normals


def build_vertex_face_incidence(
    faces: np.ndarray, num_verts: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Static incidence tables: for each vertex, the faces touching it and
    the corner index it occupies. -> (face_idx (V,D), corner_idx (V,D)),
    -1 padded, D = max vertex degree.

    Precomputed once from the (fixed) mesh topology so vertex normals become
    a pure gather instead of a scatter-add — scatters serialize on TPU.
    """
    faces = np.asarray(faces)
    lists: list = [[] for _ in range(num_verts)]
    for fi, tri in enumerate(faces):
        for ci, v in enumerate(tri):
            lists[v].append((fi, ci))
    D = max(1, max(len(l) for l in lists))
    fidx = np.full((num_verts, D), -1, np.int32)
    cidx = np.zeros((num_verts, D), np.int32)
    for v, l in enumerate(lists):
        for j, (fi, ci) in enumerate(l):
            fidx[v, j] = fi
            cidx[v, j] = ci
    return fidx, cidx


def vertex_normals_gather(
    vertices: jnp.ndarray,  # (B,V,3)
    faces: jnp.ndarray,  # (F,3) shared topology
    incidence_face: jnp.ndarray,  # (V,D) int32, -1 pad
    incidence_corner: jnp.ndarray,  # (V,D) int32
) -> jnp.ndarray:
    """Scatter-free vertex normals; numerically equivalent to
    `vertex_normals` up to fp summation order."""
    fv = face_vertices(vertices, faces)  # (B,F,3,3)
    n1 = jnp.cross(fv[:, :, 2] - fv[:, :, 1], fv[:, :, 0] - fv[:, :, 1])
    n2 = jnp.cross(fv[:, :, 0] - fv[:, :, 2], fv[:, :, 1] - fv[:, :, 2])
    n0 = jnp.cross(fv[:, :, 1] - fv[:, :, 0], fv[:, :, 2] - fv[:, :, 0])
    contribs = jnp.stack([n0, n1, n2], axis=2)  # (B,F,3,3)

    valid = (incidence_face >= 0)[None, :, :, None]
    f = jnp.maximum(incidence_face, 0)
    gathered = contribs[:, f, incidence_corner]  # (B,V,D,3)
    normals = jnp.where(valid, gathered, 0.0).sum(axis=2)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / jnp.maximum(norm, 1e-6)
