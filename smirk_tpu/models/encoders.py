"""SMIRK encoders: three independent CNN regressors over the same 224 image.

Reference: src/smirk_encoder.py:14-133. Pose -> 3 pose + 3 cam (cam-scale
bias initialized to 7); Shape -> n_shape (zero-initialized head);
Expression -> n_exp + 2 eyelid (clamped [0,1]) + 3 jaw (relu / clamp +-0.2).

Images are NHWC in [0,1]. Heads replicate the reference init *distributions*
(scaled default init) — exact values only matter when importing a torch
checkpoint, which overwrites them anyway.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from smirk_tpu.models.mobilenetv3 import MobileNetV3Features


def _scaled_lecun(scale: float):
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def _pose_kernel_init(key, shape, dtype=jnp.float32):
    # weight * 0.001, cam-scale row (output 3) zeroed
    # (reference smirk_encoder.py:26-31)
    w = nn.initializers.lecun_normal()(key, shape, dtype) * 0.001
    return w.at[:, 3].set(0.0)


def _pose_bias_init(key, shape, dtype=jnp.float32):
    # bias * 0.001 ~ 0, cam-scale bias = 7
    return jnp.zeros(shape, dtype).at[3].set(7.0)


class PoseEncoder(nn.Module):
    backbone: str = "tf_mobilenetv3_small_minimal_100"
    dtype: Any = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = MobileNetV3Features(self.backbone, dtype=self.dtype,
                                    name="encoder")(img, train)
        # adaptive_avg_pool2d(1,1); heads stay f32 for output precision
        x = feats[-1].astype(jnp.float32).mean(axis=(1, 2))
        pose_cam = nn.Dense(
            6,
            kernel_init=_pose_kernel_init,
            bias_init=_pose_bias_init,
            name="pose_cam_layers_0",
        )(x)
        return {"pose_params": pose_cam[..., :3], "cam": pose_cam[..., 3:]}


class ShapeEncoder(nn.Module):
    n_shape: int = 300
    backbone: str = "tf_mobilenetv3_large_minimal_100"
    dtype: Any = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = MobileNetV3Features(self.backbone, dtype=self.dtype,
                                    name="encoder")(img, train)
        x = feats[-1].astype(jnp.float32).mean(axis=(1, 2))
        shape = nn.Dense(
            self.n_shape,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="shape_layers_0",
        )(x)
        return {"shape_params": shape}


class ExpressionEncoder(nn.Module):
    n_exp: int = 50
    backbone: str = "tf_mobilenetv3_large_minimal_100"
    dtype: Any = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = MobileNetV3Features(self.backbone, dtype=self.dtype,
                                    name="encoder")(img, train)
        x = feats[-1].astype(jnp.float32).mean(axis=(1, 2))
        p = nn.Dense(
            self.n_exp + 2 + 3,
            kernel_init=_scaled_lecun(0.1),
            bias_init=nn.initializers.zeros,
            name="expression_layers_0",
        )(x)
        n = self.n_exp
        return {
            "expression_params": p[..., :n],
            "eyelid_params": jnp.clip(p[..., n : n + 2], 0.0, 1.0),
            "jaw_params": jnp.concatenate(
                [
                    jax.nn.relu(p[..., n + 2 : n + 3]),
                    jnp.clip(p[..., n + 3 : n + 5], -0.2, 0.2),
                ],
                axis=-1,
            ),
        }


class SmirkEncoder(nn.Module):
    """The three encoders over one image (reference smirk_encoder.py:113-133)."""

    n_exp: int = 50
    n_shape: int = 300
    backbone_pose: str = "tf_mobilenetv3_small_minimal_100"
    backbone_shape: str = "tf_mobilenetv3_large_minimal_100"
    backbone_expression: str = "tf_mobilenetv3_large_minimal_100"
    dtype: Any = None  # backbone compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = {}
        out.update(PoseEncoder(self.backbone_pose, dtype=self.dtype,
                               name="pose_encoder")(img, train))
        out.update(
            ShapeEncoder(self.n_shape, self.backbone_shape, dtype=self.dtype,
                         name="shape_encoder")(img, train)
        )
        out.update(
            ExpressionEncoder(
                self.n_exp, self.backbone_expression, dtype=self.dtype,
                name="expression_encoder"
            )(img, train)
        )
        return out
