"""Shared tiny-system builder for train-step tests (single- and multi-host).

Tiny backbones + 32px images keep the full graph (encoders -> FLAME ->
rasterize -> masking -> generator -> two losses -> two optimizers) fast on
CPU. Used by tests/test_train_step.py (fixtures) and
tests/multihost_worker.py (the 2-process train-step parity check).
"""
import jax
import numpy as np
import jax.numpy as jnp

from smirk_tpu import assets
from smirk_tpu.config import Config, ArchConfig, TrainConfig, LossWeights

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]

S = 32
B = 4


def tiny_config(batch_size=B, **arch_train_overrides):
    """Tiny config; overrides go to ArchConfig or TrainConfig by field."""
    import dataclasses

    arch = ArchConfig(num_expression=10, num_shape=30)
    train = TrainConfig(
        batch_size=batch_size,
        mask_ratio=0.02,
        mask_dilation_radius=3,
        Ke=1,
        loss_weights=LossWeights(perceptual_vgg_loss=0.0, emotion_loss=0.0,
                                 mica_loss=0.0),
    )
    for k, v in arch_train_overrides.items():
        if k in {f.name for f in dataclasses.fields(arch)}:
            arch = dataclasses.replace(arch, **{k: v})
        else:
            train = dataclasses.replace(train, **{k: v})
    return Config(image_size=S, arch=arch, train=train)


def make_tiny_system(batch_size=B, **arch_train_overrides):
    """-> (system, state) with tiny backbone arch tables patched in."""
    from smirk_tpu.models import mobilenetv3 as mnv3
    from smirk_tpu.train import SmirkSystem

    mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (TINY_SMALL, 40)
    mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (TINY_LARGE, 48)
    bundle = assets.load_all()
    system = SmirkSystem(
        tiny_config(batch_size, **arch_train_overrides), bundle,
        steps_per_epoch=10, use_pallas=False,
        generator_features=8, generator_res_blocks=1,
    )
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def make_batch(rng, b=B, s=S):
    return {
        "img": jnp.asarray(rng.random((b, s, s, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (b, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.asarray(
            (np.arange(b) % 4 != 2)),  # some samples lack FAN labels
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (b, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray((rng.random((b, s, s, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((b, 112, 112, 3), jnp.float32),
    }
