"""EMOCA emotion-recognition ResNet50 backbone (Flax, NHWC).

Reference: src/losses/resnet.py:43-161 with `emoca_specific=True`: bottleneck
stride lives on conv2 (not conv1), stem maxpool uses padding=1. include_top
False -> (B, 2048) embedding after 7x7 avg pool. Used frozen as the
ExpressionLoss teacher (src/losses/ExpressionLoss.py:25-65).

Parameter names mirror torch keys (layer1_0.conv1 etc.) for the importer.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-5
LAYERS_R50 = [3, 4, 6, 3]


def _bn(x, train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=BN_EPS, name=name
    )(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(out, train, "bn1"))
        # emoca_specific: stride on the 3x3 (resnet.py:48-51)
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            use_bias=False, name="conv2",
        )(out)
        out = nn.relu(_bn(out, train, "bn2"))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = _bn(out, train, "bn3")
        if self.has_downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=self.stride,
                use_bias=False, name="downsample_0",
            )(x)
            residual = _bn(residual, train, "downsample_1")
        return nn.relu(out + residual)


class EmocaResNet50(nn.Module):
    """include_top=False variant: returns (B, 2048) embeddings."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        x = nn.relu(_bn(x, train, "bn1"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            zip([64, 128, 256, 512], LAYERS_R50, [1, 2, 2, 2])
        ):
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * 4)
                x = Bottleneck(planes, s, ds, name=f"layer{li+1}_{bi}")(x, train)
                inplanes = planes * 4
        # reference: AvgPool2d(7) on the 7x7 stride-32 map (resnet.py) —
        # identical to a global mean at 224px input, and the global mean
        # also works for non-224 sizes (tests run reduced-depth twins small)
        return x.mean(axis=(1, 2))


def emotion_embedding_distance(variables, gen, tar, metric="l2"):
    """ExpressionLoss metric between backbone embeddings
    (ExpressionLoss.py:45-60). Returns per-sample losses (B,)."""
    model = EmocaResNet50()
    eg = model.apply(variables, gen)
    et = model.apply(variables, tar)
    if metric == "l2":
        return ((eg - et) ** 2).mean(axis=1)
    if metric == "l1":
        return jnp.abs(eg - et).mean(axis=1)
    if metric == "cos":
        num = (eg * et).sum(1)
        den = jnp.linalg.norm(eg, axis=1) * jnp.linalg.norm(et, axis=1)
        return 1.0 - num / jnp.maximum(den, 1e-8)
    raise ValueError(metric)
