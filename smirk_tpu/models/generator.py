"""Fuse generator: UNet (4 down / 4 up, skip concat) + reflect-pad ResNet
blocks at the bottleneck, sigmoid output.

Reference: src/smirk_generator.py (instantiated in=6ch [render || masked img],
out=3, feat=32, res_blocks=5, smirk_trainer.py:19). NHWC layout.

Module names mirror the torch attribute names (encoder1..4, bottleneck,
resnet_blocks_i, upconv4..1, decoder4..1, conv) for the weight importer.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-5  # torch nn.BatchNorm2d default
BN_MOMENTUM = 0.9


def _bn(name, dtype=None):
    return nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype,
                        name=name)


class ConvBlock(nn.Module):
    """(conv3x3 no-bias, BN, ReLU) x2 — reference _block (smirk_generator.py:88-119)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _bn("norm1", self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = _bn("norm2", self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class ResnetBlock(nn.Module):
    """Reflect-pad 3x3 conv blocks with skip (smirk_generator.py:121-178)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = _bn("norm1", self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _bn("norm2", self.dtype)(h, use_running_average=not train)
        return x + h


class SmirkGenerator(nn.Module):
    in_channels: int = 6
    out_channels: int = 3
    init_features: int = 32
    res_blocks: int = 5
    dtype: Any = None  # compute dtype (e.g. bf16); params/stats stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.init_features
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        enc1 = ConvBlock(f, dtype=self.dtype, name="encoder1")(x, train)
        enc2 = ConvBlock(f * 2, dtype=self.dtype, name="encoder2")(pool(enc1), train)
        enc3 = ConvBlock(f * 4, dtype=self.dtype, name="encoder3")(pool(enc2), train)
        enc4 = ConvBlock(f * 8, dtype=self.dtype, name="encoder4")(pool(enc3), train)

        b = ConvBlock(f * 16, dtype=self.dtype, name="bottleneck")(pool(enc4), train)
        for i in range(self.res_blocks):
            b = ResnetBlock(f * 16, dtype=self.dtype,
                            name=f"resnet_blocks_{i}")(b, train)

        d4 = nn.ConvTranspose(f * 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upconv4")(b)
        d4 = ConvBlock(f * 8, dtype=self.dtype, name="decoder4")(
            jnp.concatenate([d4, enc4], axis=-1), train
        )
        d3 = nn.ConvTranspose(f * 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upconv3")(d4)
        d3 = ConvBlock(f * 4, dtype=self.dtype, name="decoder3")(
            jnp.concatenate([d3, enc3], axis=-1), train
        )
        d2 = nn.ConvTranspose(f * 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upconv2")(d3)
        d2 = ConvBlock(f * 2, dtype=self.dtype, name="decoder2")(
            jnp.concatenate([d2, enc2], axis=-1), train
        )
        d1 = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upconv1")(d2)
        d1 = ConvBlock(f, dtype=self.dtype, name="decoder1")(
            jnp.concatenate([d1, enc1], axis=-1), train
        )
        # output head in f32: sigmoid image feeds f32 losses
        out = nn.Conv(self.out_channels, (1, 1), name="conv")(
            d1.astype(jnp.float32))
        return nn.sigmoid(out)
