"""Training CLI: epoch/phase loop driving the jitted train step.

Usage (mirrors reference train.py):
  python train.py configs/config_train.yaml train.lr=1e-4 ...
Extra flags (ours): --synthetic (procedural zero-data pipeline).

The host loop stays thin: shard batch -> jitted step -> log/viz/checkpoint.
Optimizer state persists across epochs (cosine restarts are baked into the
schedules), unlike the reference's per-epoch reconfigure (train.py:48).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    if synthetic:
        argv.remove("--synthetic")
    cfg_path = argv[0] if argv and "=" not in argv[0] else None
    overrides = tuple(a for a in argv[1 if cfg_path else 0:] if "=" in a)

    import jax

    # explicit platform override (some environments register a TPU plugin
    # that wins over the JAX_PLATFORMS env var): SMIRK_PLATFORM=cpu forces
    # the CPU backend even there
    if os.environ.get("SMIRK_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])

    from smirk_tpu import assets, parallel

    # multi-host entry (SURVEY §2.4): must run before any device op;
    # single-process runs are a no-op
    parallel.initialize_distributed()
    from smirk_tpu.config import load_config
    from smirk_tpu.data import load_dataloaders
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.utils import checkpoint as ckpt
    from smirk_tpu.utils.metrics import MetricLogger
    from smirk_tpu.utils import viz

    config = load_config(cfg_path, overrides)
    log_path = config.train.log_path
    os.makedirs(os.path.join(log_path, "train_images"), exist_ok=True)
    os.makedirs(os.path.join(log_path, "val_images"), exist_ok=True)
    _save_config_snapshot(config, log_path)  # reference train.py:31

    train_loader, val_loader = load_dataloaders(config, synthetic=synthetic)
    steps_per_epoch = len(train_loader)

    bundle = assets.load_all()
    templates = _load_templates(config)
    from smirk_tpu.models import teachers

    w = config.train.loss_weights
    system = SmirkSystem(
        config, bundle, steps_per_epoch=steps_per_epoch, templates=templates,
        vgg_variables=(
            teachers.load_vgg_teacher(os.environ.get("SMIRK_VGG16"))
            if w.perceptual_vgg_loss > 0 else None),
        emotion_variables=(
            teachers.load_emotion_teacher(
                os.environ.get("SMIRK_EMOTION",
                               "assets/ResNet50/emotion_checkpoint.ckpt"))
            if w.emotion_loss > 0 else None),
        mica_variables=(
            teachers.load_mica_teacher(
                os.environ.get("SMIRK_MICA", "assets/mica.tar"))
            if w.mica_loss > 0 else None),
    )
    state = system.init_state(jax.random.PRNGKey(0))
    if config.resume:
        state = ckpt.load_model(state, config.resume)
        # refresh the frozen base copy after loading (reference train.py:43)
        state = state.replace(base_encoder=jax.tree_util.tree_map(
            lambda x: x, state.encoder))

    mesh = parallel.make_mesh()
    state = parallel.replicate(state, mesh)
    logger = MetricLogger(log_path, config.train.log_losses_every)
    rng = jax.random.PRNGKey(1)

    for epoch in range(config.train.resume_epoch, config.train.num_epochs):
        for phase, loader in (("train", train_loader), ("val", val_loader)):
            if loader is None:
                continue
            for batch_idx, batch in enumerate(loader):
                if batch["img"].shape[0] % mesh.devices.size:
                    continue  # ragged tail batch
                batch = parallel.shard_batch(batch, mesh)
                if phase == "train":
                    state, metrics, aux = system.train_step(
                        state, batch, rng, parity=batch_idx
                    )
                else:
                    state, metrics, aux = system.eval_step(state, batch, rng)
                logger.log(batch_idx, metrics, phase)
                if batch_idx % config.train.visualize_every == 0:
                    extra = system.make_visualizations(state, batch, aux)
                    grid = viz.training_grid(
                        jax.tree_util.tree_map(np.asarray, batch),
                        {k: _np_or_none(v) for k, v in extra.items()},
                        show_landmarks=True,
                    )
                    viz.save_image(grid, os.path.join(
                        log_path, f"{phase}_images/{epoch}_{batch_idx}.jpg"))
        if epoch % config.train.save_every == 0:
            ckpt.save_model(state, os.path.join(log_path, f"model_{epoch}.npz"))
            ckpt.save_state(state, os.path.join(log_path, "last_state.npz"))
    logger.close()
    ckpt.finalize()  # block on pending async orbax saves


def _np_or_none(x):
    return None if x is None else np.asarray(x)


def _save_config_snapshot(config, log_path):
    import dataclasses
    import json

    with open(os.path.join(log_path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2)


def _load_templates(config):
    """FaMoS expression templates (utils/utils.py:5-25); None if absent."""
    import glob

    root = os.environ.get(
        "SMIRK_TEMPLATES", "assets/expression_templates_famos"
    )
    if not os.path.isdir(root):
        return None
    classes = {
        "lips_back", "rolling_lips", "mouth_side", "kissing", "high_smile",
        "mouth_up", "mouth_middle", "mouth_down", "blow_cheeks", "cheeks_in",
        "jaw", "lips_up",
    }
    rows = []
    for npy in glob.glob(os.path.join(root, "*", "*", "*.npy")):
        if os.path.basename(os.path.dirname(npy)) not in classes:
            continue
        params = np.load(npy, allow_pickle=True).item()
        rows.append(np.asarray(params["expression"]).squeeze())
    return np.stack(rows) if rows else None


if __name__ == "__main__":
    main()
