"""Frozen-teacher weight loaders: released torch checkpoints -> flax trees.

Mirrors the reference's loss-model setup (base_trainer.py:77-100):
  * VGG16   — torchvision vgg16 state dict (or a .pth of its `features`)
  * emotion — EMOCA ResNet50 ckpt ('state_dict' with 'backbone.*' keys,
              ExpressionLoss.py:30-43)
  * MICA    — mica.tar {'arcface': ..., 'flameModel': ...} (mica.py:56-65)

Each returns a flax variable tree ready for the SmirkSystem teacher slots,
or None when the file is absent (training then runs with that loss at 0,
like configs with zero weights).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu")


def load_vgg_teacher(path: Optional[str]):
    if not path or not os.path.isfile(path):
        return None
    import jax
    import jax.numpy as jnp

    from smirk_tpu.models.vgg import VGG16Features
    from smirk_tpu.utils import importer

    sd = _torch_load(path)
    sd = sd.get("state_dict", sd)
    model = VGG16Features()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    return importer.import_state_dict(sd, variables)


def load_emotion_teacher(path: Optional[str]):
    """EMOCA emotion-recognition ResNet50 (ExpressionLoss backbone)."""
    if not path or not os.path.isfile(path):
        return None
    import jax
    import jax.numpy as jnp

    from smirk_tpu.models.emoca_resnet import EmocaResNet50
    from smirk_tpu.utils import importer

    ckpt = _torch_load(path)
    sd = ckpt.get("state_dict", ckpt)
    model = EmocaResNet50()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    return importer.import_state_dict(sd, variables, prefix="backbone.")


def load_mica_teacher(path: Optional[str]):
    """mica.tar -> Mica variables (arcface + regressor)."""
    if not path or not os.path.isfile(path):
        return None
    import jax
    import jax.numpy as jnp

    from smirk_tpu.models.mica import Mica
    from smirk_tpu.utils import importer

    ckpt = _torch_load(path)
    sd = {}
    sd.update({f"arcface.{k}": v for k, v in ckpt["arcface"].items()})
    for k, v in ckpt["flameModel"].items():
        if "network" in k or "output" in k:
            sd[f"regressor.{k.replace('regressor.', '')}"] = v
    model = Mica()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    return importer.import_state_dict(sd, variables)
