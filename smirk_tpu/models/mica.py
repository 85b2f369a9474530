"""MICA shape teacher: ArcFace iresnet100 embedding -> MappingNetwork -> 300
FLAME shape params (Flax, NHWC).

Reference: src/models/MICA/{mica.py,arcface.py}. Input is the 112x112
ArcFace-aligned crop in [0,1]; preprocessing is (x-0.5)/0.5 + RGB->BGR flip
(mica.py:70-71). Weights import from the released `mica.tar` via
utils.importer.

IResNet specifics (arcface.py:32-161): BN-first basic blocks with per-channel
PReLU, stride-2 on every layer's first block, stem conv3x3 s1, final
BN2d -> flatten (torch CHW order!) -> fc(512*49 -> 512) -> BatchNorm1d.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-5
IRESNET100_LAYERS = [3, 13, 30, 3]


def _bn(x, train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=BN_EPS, name=name
    )(x)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C)); param key 'weight'."""

    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "weight", nn.initializers.constant(0.25), (self.channels,)
        )
        return jnp.where(x >= 0, x, a * x)


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _bn(x, train, "bn1")
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv1")(out)
        out = _bn(out, train, "bn2")
        out = PReLU(self.planes, name="prelu")(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            use_bias=False, name="conv2",
        )(out)
        out = _bn(out, train, "bn3")
        if self.has_downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=self.stride,
                use_bias=False, name="downsample_0",
            )(x)
            identity = _bn(identity, train, "downsample_1")
        return out + identity


class ArcFaceIResNet100(nn.Module):
    num_features: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = _bn(x, train, "bn1")
        x = PReLU(64, name="prelu")(x)

        inplanes = 64
        for li, (planes, blocks) in enumerate(zip([64, 128, 256, 512],
                                                  IRESNET100_LAYERS)):
            for bi in range(blocks):
                s = 2 if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes)
                x = IBasicBlock(planes, s, ds, name=f"layer{li+1}_{bi}")(x, train)
                inplanes = planes
        x = _bn(x, train, "bn2")
        # flatten in torch CHW order so fc weights import as a transpose
        B = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(B, -1)
        x = nn.Dense(self.num_features, name="fc")(x)
        # BatchNorm1d 'features' (scale frozen at 1 in the reference)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=BN_EPS,
            name="features",
        )(x)
        return x


class MappingNetwork(nn.Module):
    """MICA regressor (mica.py:14-43): hidden=3 -> 4 linears + output,
    leaky_relu(0.2), no skips for hidden<=5."""

    hidden_dim: int = 300
    out_dim: int = 300
    hidden: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = z
        for i in range(self.hidden + 1):
            h = nn.Dense(self.hidden_dim, name=f"network_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        return nn.Dense(self.out_dim, name="output")(h)


class Mica(nn.Module):
    """images (B,112,112,3) in [0,1] -> 300 shape params (mica.py:68-78)."""

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = (images - 0.5) / 0.5
        x = x[..., ::-1]  # RGB -> BGR
        emb = ArcFaceIResNet100(name="arcface")(x, train)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        return MappingNetwork(name="regressor")(emb)
