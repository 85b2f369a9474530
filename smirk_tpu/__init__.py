"""smirk_tpu: TPU-native framework for 3D facial expression reconstruction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the SMIRK
reference (georgeretsi/smirk, CVPR 2024, arXiv:2404.04104): monocular face
images -> FLAME 3D morphable model parameters via three CNN encoders, a
differentiable rasterizer, and an analysis-by-neural-synthesis training loop.

Layout:
  flame/     parametric head model (blendshapes + LBS) as pure jnp functions
  render/    orthographic camera, mesh geometry, Pallas tile rasterizer, shading
  models/    Flax encoders (MobileNetV3-minimal), UNet fuse generator, loss nets
  masking/   mesh-anchored pixel sampling & mask composition
  losses/    landmark / regularization / perceptual / cycle losses
  train/     pure pjit-able train step, optax two-optimizer setup
  data/      host-side input pipeline (fixed-shape batches for jit)
  parallel/  device mesh + sharding helpers
  utils/     checkpointing (orbax async + npz), torch importer, metrics, viz
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: `from smirk_tpu import Predictor` without importing jax at
    # package-import time (host-only tools import smirk_tpu submodules)
    if name == "Predictor":
        from smirk_tpu.api import Predictor

        return Predictor
    raise AttributeError(f"module 'smirk_tpu' has no attribute {name!r}")
