"""VGG16 feature blocks for the perceptual loss (NHWC Flax).

Reference: src/losses/VGGPerceptualLoss.py:8-47 — four torchvision vgg16
feature slices ([:4], [4:9], [9:16], [16:23]), L1 between block activations,
inputs renormalized with the reference's exact (x*0.5+0.5 -> imagenet) chain
and bilinearly resized to 224 (align_corners=False == jax half-pixel).

Weights come from a torchvision vgg16 state dict via
utils.importer.import_vgg16_features.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# torchvision vgg16 'features' conv indices per perceptual block
VGG16_BLOCK_CONVS = [
    [(0, 64), (2, 64)],
    [(5, 128), (7, 128)],
    [(10, 256), (12, 256), (14, 256)],
    [(17, 512), (19, 512), (21, 512)],
]


class VGG16Features(nn.Module):
    """Returns the four block activations used by the perceptual loss."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        for bi, block in enumerate(VGG16_BLOCK_CONVS):
            if bi > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for idx, ch in block:
                x = nn.Conv(ch, (3, 3), padding=1, name=f"features_{idx}")(x)
                x = nn.relu(x)
            feats.append(x)
        return feats


def preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Exact reference input chain (VGGPerceptualLoss.py:24-30), NHWC [0,1]."""
    x = x * 0.5 + 0.5
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if x.shape[1] != 224:
        x = jax.image.resize(
            x, (x.shape[0], 224, 224, x.shape[3]), method="bilinear"
        )
    return x


def perceptual_loss(vgg_variables, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-block mean-abs feature distances."""
    model = VGG16Features()
    fx = model.apply(vgg_variables, preprocess(x))
    fy = model.apply(vgg_variables, preprocess(y))
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fx, fy))
