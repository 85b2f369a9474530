"""MobileNetV3 "minimal" backbones in Flax (NHWC, TF-SAME padding).

Re-implements the two timm backbones the reference encoders use
(`tf_mobilenetv3_small_minimal_100`, `tf_mobilenetv3_large_minimal_100`,
reference src/smirk_encoder.py:7-12 + configs/config_train.yaml:51-53).
"Minimal" = ReLU everywhere, no squeeze-excite, 3x3 kernels. The `tf_`
variants use TF-style asymmetric SAME padding and BN eps 1e-3 — JAX's native
`padding='SAME'` IS TF SAME, so no emulation is needed (unlike the PyTorch
port, which must pad by hand).

Only the final feature map (stride 32) is consumed by the encoders
(smirk_encoder.py:35: `features[-1]`), but all stage outputs are returned to
mirror timm's `features_only=True` contract.

Parameter names follow timm's module names (conv_stem, bn1, blocks_i_j.*) so
the torch-checkpoint importer is a pure name/layout map.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

BN_EPS_TF = 1e-3
BN_MOMENTUM = 0.9  # flax convention: new = m*old + (1-m)*batch  (torch 0.1)

# (block_type, expansion_chs, out_chs, stride) per stage; expansion channel
# counts are timm's make_divisible(in_chs * exp_ratio, 8) precomputed.
SMALL_MINIMAL: List[List[Tuple[str, int, int, int]]] = [
    [("ds", 16, 16, 2)],
    [("ir", 72, 24, 2), ("ir", 88, 24, 1)],
    [("ir", 96, 40, 2), ("ir", 240, 40, 1), ("ir", 240, 40, 1)],
    [("ir", 120, 48, 1), ("ir", 144, 48, 1)],
    [("ir", 288, 96, 2), ("ir", 576, 96, 1), ("ir", 576, 96, 1)],
    [("cn", 0, 576, 1)],
]

LARGE_MINIMAL: List[List[Tuple[str, int, int, int]]] = [
    [("ds", 16, 16, 1)],
    [("ir", 64, 24, 2), ("ir", 72, 24, 1)],
    [("ir", 72, 40, 2), ("ir", 120, 40, 1), ("ir", 120, 40, 1)],
    [("ir", 240, 80, 2), ("ir", 200, 80, 1), ("ir", 184, 80, 1), ("ir", 184, 80, 1)],
    [("ir", 480, 112, 1), ("ir", 672, 112, 1)],
    [("ir", 672, 160, 2), ("ir", 960, 160, 1), ("ir", 960, 160, 1)],
    [("cn", 0, 960, 1)],
]

ARCHS = {
    "tf_mobilenetv3_small_minimal_100": (SMALL_MINIMAL, 576),
    "tf_mobilenetv3_large_minimal_100": (LARGE_MINIMAL, 960),
}


def _bn(x, train: bool, name: str, dtype=None):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS_TF,
        dtype=dtype,
        name=name,
    )(x)


def _conv(features, kernel, stride, groups=1, name=None, dtype=None):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        feature_group_count=groups,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv: dw3x3-BN-ReLU, pw1x1-BN (no act)."""

    out_chs: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_chs = x.shape[-1]
        shortcut = x
        x = _conv(in_chs, 3, self.stride, groups=in_chs, name="conv_dw",
                  dtype=self.dtype)(x)
        x = _bn(x, train, "bn1", self.dtype)
        x = nn.relu(x)
        x = _conv(self.out_chs, 1, 1, name="conv_pw", dtype=self.dtype)(x)
        x = _bn(x, train, "bn2", self.dtype)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """timm InvertedResidual: pw-BN-ReLU, dw-BN-ReLU, pwl-BN."""

    exp_chs: int
    out_chs: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_chs = x.shape[-1]
        shortcut = x
        x = _conv(self.exp_chs, 1, 1, name="conv_pw", dtype=self.dtype)(x)
        x = _bn(x, train, "bn1", self.dtype)
        x = nn.relu(x)
        x = _conv(self.exp_chs, 3, self.stride, groups=self.exp_chs,
                  name="conv_dw", dtype=self.dtype)(x)
        x = _bn(x, train, "bn2", self.dtype)
        x = nn.relu(x)
        x = _conv(self.out_chs, 1, 1, name="conv_pwl", dtype=self.dtype)(x)
        x = _bn(x, train, "bn3", self.dtype)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class ConvBnAct(nn.Module):
    out_chs: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(self.out_chs, 1, self.stride, name="conv", dtype=self.dtype)(x)
        x = _bn(x, train, "bn1", self.dtype)
        return nn.relu(x)


class MobileNetV3Features(nn.Module):
    """Backbone returning per-stage feature maps (timm features_only)."""

    arch: str = "tf_mobilenetv3_large_minimal_100"
    dtype: Any = None  # compute dtype (e.g. bf16); params/stats stay f32

    @property
    def feature_dim(self) -> int:
        return ARCHS[self.arch][1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        stages, _ = ARCHS[self.arch]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _conv(16, 3, 2, name="conv_stem", dtype=self.dtype)(x)
        x = _bn(x, train, "bn1", self.dtype)
        x = nn.relu(x)

        feats = []
        for si, stage in enumerate(stages):
            for bi, (btype, exp_chs, out_chs, stride) in enumerate(stage):
                name = f"blocks_{si}_{bi}"
                if btype == "ds":
                    x = DepthwiseSeparable(out_chs, stride, dtype=self.dtype,
                                           name=name)(x, train)
                elif btype == "ir":
                    x = InvertedResidual(exp_chs, out_chs, stride,
                                         dtype=self.dtype, name=name)(x, train)
                else:
                    x = ConvBnAct(out_chs, stride, dtype=self.dtype,
                                  name=name)(x, train)
            feats.append(x)
        return feats
