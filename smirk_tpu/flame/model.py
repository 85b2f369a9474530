"""FLAME parametric head model as a jit-friendly jnp function bundle.

Equivalent capability to reference src/FLAME/FLAME.py:232-315 (forward:
params dict -> vertices + FAN-68 / full-68 / mediapipe-105 landmarks), with
constants held as jnp arrays and all control flow static. Debug modes
zero_expression / zero_pose / zero_shape are static python flags (they select
different traced graphs, like the reference's separate calls).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from smirk_tpu import assets as assets_lib
from smirk_tpu.flame import lbs as lbs_lib


class FlameModel:
    """Holds FLAME constants; `__call__` maps parameter dicts to geometry.

    Parameters dict keys (matching reference FLAME.forward, FLAME.py:232-248):
      shape_params (B,<=n_shape), expression_params (B,<=n_exp),
      pose_params (B,3), jaw_params (B,3), optional eyelid_params (B,2),
      optional eye_pose_params (B,6), neck_pose_params (B,3).
    """

    def __init__(self, bundle: Dict[str, np.ndarray], n_shape: int = 300, n_exp: int = 50):
        self.n_shape = n_shape
        self.n_exp = n_exp
        f32 = jnp.float32

        sd = bundle["shapedirs"]
        # slice [0:n_shape] shape PCs + [300:300+n_exp] expression PCs
        # (reference FLAME.py:67-68)
        self.shapedirs = jnp.asarray(
            np.concatenate(
                [sd[:, :, :n_shape], sd[:, :, assets_lib.N_SHAPE_FULL:
                                        assets_lib.N_SHAPE_FULL + n_exp]], axis=2
            ),
            f32,
        )
        self.v_template = jnp.asarray(bundle["v_template"], f32)
        self.posedirs = jnp.asarray(bundle["posedirs"], f32)
        self.J_regressor = jnp.asarray(bundle["J_regressor"], f32)
        self.lbs_weights = jnp.asarray(bundle["lbs_weights"], f32)
        self.parents = np.asarray(bundle["parents"], np.int64)  # static
        self.faces = jnp.asarray(bundle["faces"], jnp.int32)
        self.faces_np = np.asarray(bundle["faces"], np.int32)

        self.l_eyelid = jnp.asarray(bundle["l_eyelid"], f32)
        self.r_eyelid = jnp.asarray(bundle["r_eyelid"], f32)

        self.lmk_faces_idx = jnp.asarray(bundle["static_lmk_faces_idx"], jnp.int32)
        self.lmk_bary_coords = jnp.asarray(bundle["static_lmk_bary_coords"], f32)
        self.dynamic_lmk_faces_idx = jnp.asarray(
            bundle["dynamic_lmk_faces_idx"], jnp.int32
        )
        self.dynamic_lmk_bary_coords = jnp.asarray(
            bundle["dynamic_lmk_bary_coords"], f32
        )
        self.full_lmk_faces_idx = jnp.asarray(bundle["full_lmk_faces_idx"], jnp.int32)
        self.full_lmk_bary_coords = jnp.asarray(bundle["full_lmk_bary_coords"], f32)
        self.mp_lmk_faces_idx = jnp.asarray(bundle["mp_lmk_faces_idx"], jnp.int32)
        self.mp_lmk_bary_coords = jnp.asarray(bundle["mp_lmk_bary_coords"], f32)

        # neck kinematic chain: walk parents from NECK_IDX=1 to root
        # (reference FLAME.py:103-108)
        chain, cur = [], 1
        while cur != -1:
            chain.append(cur)
            cur = int(self.parents[cur])
        self.neck_kin_chain = np.asarray(chain, np.int64)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    def _pad(self, x: jnp.ndarray, n: int) -> jnp.ndarray:
        if x.shape[1] < n:
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], n - x.shape[1]), x.dtype)], axis=1
            )
        return x

    def __call__(
        self,
        params: Dict[str, jnp.ndarray],
        *,
        zero_expression: bool = False,
        zero_shape: bool = False,
        zero_pose: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        shape = self._pad(params["shape_params"], self.n_shape)
        expr = self._pad(params["expression_params"], self.n_exp)
        B = shape.shape[0]
        pose = params.get("pose_params")
        jaw = params.get("jaw_params")
        eye = params.get("eye_pose_params")
        neck = params.get("neck_pose_params")
        eyelid = params.get("eyelid_params")

        if zero_expression:  # reference FLAME.py:251-253
            expr = jnp.zeros_like(expr)
            jaw = jnp.zeros_like(jaw)
        if zero_shape:
            shape = jnp.zeros_like(shape)
        if zero_pose:  # canonical viz pose (reference FLAME.py:259-262)
            pose = jnp.zeros_like(pose).at[..., 0].set(0.2).at[..., 1].set(-0.7)
        if eye is None:
            eye = jnp.zeros((B, 6), shape.dtype)
        if neck is None:
            neck = jnp.zeros((B, 3), shape.dtype)

        betas = jnp.concatenate([shape, expr], axis=1)
        full_pose = jnp.concatenate([pose, neck, jaw, eye], axis=1)

        vertices, _ = lbs_lib.lbs(
            betas,
            full_pose,
            self.v_template,
            self.shapedirs,
            self.posedirs,
            self.J_regressor,
            self.parents,
            self.lbs_weights,
        )

        if eyelid is not None:  # reference FLAME.py:284-286
            vertices = vertices + self.r_eyelid[None] * eyelid[:, 1:2, None]
            vertices = vertices + self.l_eyelid[None] * eyelid[:, 0:1, None]

        dyn_faces, dyn_bary = lbs_lib.find_dynamic_lmk_idx_and_bcoords(
            full_pose,
            self.dynamic_lmk_faces_idx,
            self.dynamic_lmk_bary_coords,
            self.neck_kin_chain,
        )
        fan_faces = jnp.concatenate(
            [dyn_faces, jnp.broadcast_to(self.lmk_faces_idx[None], (B, 51))], axis=1
        )
        fan_bary = jnp.concatenate(
            [dyn_bary, jnp.broadcast_to(self.lmk_bary_coords[None], (B, 51, 3))],
            axis=1,
        )

        landmarks_fan = lbs_lib.vertices2landmarks(
            vertices, self.faces, fan_faces, fan_bary
        )
        landmarks_fan_3d = lbs_lib.vertices2landmarks(
            vertices, self.faces, self.full_lmk_faces_idx, self.full_lmk_bary_coords
        )
        landmarks_mp = lbs_lib.vertices2landmarks(
            vertices, self.faces, self.mp_lmk_faces_idx, self.mp_lmk_bary_coords
        )

        return {
            "vertices": vertices,
            "landmarks_fan": landmarks_fan,
            "landmarks_fan_3d": landmarks_fan_3d,
            "landmarks_mp": landmarks_mp,
        }
