"""Linear-blend-skinning math for the FLAME head model, as pure jnp functions.

Functionally equivalent to the reference PyTorch kernels
(/root/reference/src/FLAME/lbs.py:101-377) but written TPU-first:

* all blendshape contractions are single einsums that XLA maps onto the MXU;
* the 5-joint kinematic chain is unrolled at trace time (J=5 is static), so
  there is no sequential device loop;
* landmark extraction is a batched gather + barycentric weighted sum.

Everything here is shape-static and jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rot_mat_to_euler_y(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Y-axis euler angle from rotation matrices (N,3,3) -> (N,).

    Mirrors reference rot_mat_to_euler (lbs.py:26-32).
    """
    sy = jnp.sqrt(rot_mats[:, 0, 0] ** 2 + rot_mats[:, 1, 0] ** 2)
    return jnp.arctan2(-rot_mats[:, 2, 0], sy)


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (N,3) -> rotation matrices (N,3,3).

    Matches reference batch_rodrigues (lbs.py:274-305) numerics, including the
    +1e-8 inside the norm (not a clamp) that keeps the gradient finite at 0.
    """
    angle = jnp.linalg.norm(rot_vecs + epsilon, axis=1, keepdims=True)  # (N,1)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[:, None]  # (N,1,1)
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * K + (1.0 - cos) * jnp.matmul(K, K)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex displacement from blendshape coefficients.

    betas (B,L) x shape_disps (V,3,L) -> (B,V,3).
    Reference: lbs.py:250-271 (einsum 'bl,mkl->bmk').
    """
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """Joint locations from vertices: (J,V) x (B,V,3) -> (B,J,3).

    Reference: lbs.py:230-247 (einsum 'bik,ji->bjk').
    """
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) rotations + (N,3,1) translations -> (N,4,4) rigid transforms."""
    N = R.shape[0]
    top = jnp.concatenate([R, t], axis=2)  # (N,3,4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype)[None, None, :], (N, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=1)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,  # (B,J,3,3)
    joints: jnp.ndarray,  # (B,J,3)
    parents: np.ndarray,  # (J,) static host array, parents[0] == -1
):
    """Forward kinematics over a (static, tiny) joint tree.

    Returns posed joints (B,J,3) and per-joint relative transforms (B,J,4,4).
    The chain walk is unrolled at trace time (FLAME has J=5), unlike the
    reference's sequential python loop over device tensors (lbs.py:321-377).
    """
    B, J = joints.shape[:2]
    parents = np.asarray(parents)

    rel_joints = joints - jnp.where(
        (np.arange(J) == 0)[None, :, None],
        jnp.zeros_like(joints),
        joints[:, np.maximum(parents, 0)],
    )

    transforms_mat = transform_mat(
        rot_mats.reshape(-1, 3, 3), rel_joints.reshape(-1, 3, 1)
    ).reshape(B, J, 4, 4)

    chain = [transforms_mat[:, 0]]
    for i in range(1, J):
        chain.append(jnp.matmul(chain[parents[i]], transforms_mat[:, i]))
    transforms = jnp.stack(chain, axis=1)  # (B,J,4,4)

    posed_joints = transforms[:, :, :3, 3]

    # rel_transforms = transforms - [0 0 0 | transforms @ joints_homogen]
    joints_homogen = jnp.concatenate(
        [joints, jnp.zeros((B, J, 1), dtype=joints.dtype)], axis=2
    )[..., None]  # (B,J,4,1)
    shifted = jnp.matmul(transforms, joints_homogen)  # (B,J,4,1)
    rel_transforms = transforms - jnp.concatenate(
        [jnp.zeros((B, J, 4, 3), dtype=transforms.dtype), shifted], axis=3
    )
    return posed_joints, rel_transforms


def lbs(
    betas: jnp.ndarray,  # (B, n_shape+n_exp)
    pose: jnp.ndarray,  # (B, J*3) axis-angle
    v_template: jnp.ndarray,  # (V,3)
    shapedirs: jnp.ndarray,  # (V,3,n_shape+n_exp)
    posedirs: jnp.ndarray,  # (P, V*3)  with P = (J-1)*9
    J_regressor: jnp.ndarray,  # (J,V)
    parents: np.ndarray,  # (J,) static
    lbs_weights: jnp.ndarray,  # (V,J)
):
    """Linear blend skinning. Returns (verts (B,V,3), posed joints (B,J,3)).

    Fused-einsum equivalent of reference lbs (lbs.py:140-227).
    """
    B = betas.shape[0]
    J = J_regressor.shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, J, 3, 3)
    ident = jnp.eye(3, dtype=betas.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B,(J-1)*9)
    pose_offsets = jnp.matmul(pose_feature, posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)

    # Skinning: per-vertex 4x4 = lbs_weights @ per-joint transforms.
    T = jnp.einsum("vj,bjpq->bvpq", lbs_weights, A)  # (B,V,4,4)
    verts = (
        jnp.einsum("bvpk,bvk->bvp", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    )
    return verts, posed_joints


def vertices2landmarks(
    vertices: jnp.ndarray,  # (B,V,3)
    faces: jnp.ndarray,  # (F,3) int
    lmk_faces_idx: jnp.ndarray,  # (L,) or (B,L) int
    lmk_bary_coords: jnp.ndarray,  # (L,3) or (B,L,3)
) -> jnp.ndarray:
    """Barycentric landmark interpolation -> (B,L,3).

    Reference: lbs.py:101-137. Batched face indices (the dynamic jaw contour)
    and shared indices are both supported via broadcasting.
    """
    B = vertices.shape[0]
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(lmk_faces_idx[None], (B,) + lmk_faces_idx.shape)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(
            lmk_bary_coords[None], (B,) + lmk_bary_coords.shape
        )
    lmk_faces = faces[lmk_faces_idx]  # (B,L,3)
    lmk_vertices = jax.vmap(lambda v, f: v[f])(vertices, lmk_faces)  # (B,L,3,3)
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)


def find_dynamic_lmk_idx_and_bcoords(
    pose: jnp.ndarray,  # (B, J*3) full pose
    dynamic_lmk_faces_idx: jnp.ndarray,  # (79, 17) int
    dynamic_lmk_bary_coords: jnp.ndarray,  # (79, 17, 3)
    neck_kin_chain: np.ndarray,  # static chain of joint indices (neck -> root)
):
    """Pose-dependent jaw-contour landmark selection via the 79-bin LUT.

    Reference: FLAME.py:117-159 (note: the FLAME.py variant uses +euler angle,
    unlike lbs.py:34-98 which negates it; we follow FLAME.py since that is the
    one the model calls).
    """
    B = pose.shape[0]
    neck_kin_chain = np.asarray(neck_kin_chain)
    aa_pose = pose.reshape(B, -1, 3)[:, neck_kin_chain]  # (B,C,3)
    rot_mats = batch_rodrigues(aa_pose.reshape(-1, 3)).reshape(B, -1, 3, 3)

    rel_rot_mat = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype)[None], (B, 3, 3))
    for idx in range(len(neck_kin_chain)):
        rel_rot_mat = jnp.matmul(rot_mats[:, idx], rel_rot_mat)

    y_rot_angle = jnp.round(
        jnp.clip(rot_mat_to_euler_y(rel_rot_mat) * 180.0 / np.pi, max=39)
    ).astype(jnp.int32)
    neg_mask = (y_rot_angle < 0).astype(jnp.int32)
    mask = (y_rot_angle < -39).astype(jnp.int32)
    neg_vals = mask * 78 + (1 - mask) * (39 - y_rot_angle)
    y_rot_angle = neg_mask * neg_vals + (1 - neg_mask) * y_rot_angle

    return dynamic_lmk_faces_idx[y_rot_angle], dynamic_lmk_bary_coords[y_rot_angle]
