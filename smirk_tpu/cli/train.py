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
    if config.arch.backbone_init_small or config.arch.backbone_init_large:
        # ImageNet-pretrained backbone init from raw timm state dicts
        # (reference smirk_encoder.py:7-12 pretrained=True); resume/ckpt
        # loads below still override everything
        from smirk_tpu.utils import importer

        enc = importer.init_backbones_from_state_dicts(
            state.encoder,
            importer.load_raw_state_dict(config.arch.backbone_init_small)
            if config.arch.backbone_init_small else None,
            importer.load_raw_state_dict(config.arch.backbone_init_large)
            if config.arch.backbone_init_large else None,
        )
        state = state.replace(
            encoder=enc,
            base_encoder=jax.tree_util.tree_map(lambda x: x, enc))
        print("[init] backbones initialized from timm state dicts")
    if config.resume:
        state = ckpt.load_model(state, config.resume)
        # refresh the frozen base copy after loading (reference train.py:43)
        state = state.replace(base_encoder=jax.tree_util.tree_map(
            lambda x: x, state.encoder))
    start_epoch = config.train.resume_epoch
    if config.resume_state:
        # exact restart-based recovery: full TrainState (params + BN stats +
        # optimizer moments + step); intra-epoch steps past the checkpoint
        # replay (data is sampled with replacement; schedules key off step)
        state = ckpt.restore_state(state, config.resume_state)
        start_epoch = int(np.asarray(state.step)) // max(1, steps_per_epoch)
        print(f"[resume] {config.resume_state} step={int(np.asarray(state.step))}"
              f" -> epoch {start_epoch}")

    mesh = parallel.make_mesh()
    state = parallel.replicate(state, mesh)
    logger = MetricLogger(log_path, config.train.log_losses_every)
    rng = jax.random.PRNGKey(1)
    last_state_path = os.path.join(log_path, "last_state.npz")
    ckpt_every = config.train.ckpt_every_steps
    # fault-injection hook for restart-recovery tests: raise after the
    # cumulative train-step counter reaches N (fires once — resumed runs
    # start past it); negative = raise before the first step of this
    # incarnation (exercises the nothing-to-salvage path)
    fault_at = int(os.environ.get("SMIRK_FAULT_INJECT_STEP", "0"))
    global_step = int(np.asarray(state.step))

    try:
        _run_epochs(
            config, system, state, train_loader, val_loader, mesh, logger,
            rng, ckpt, viz, log_path, start_epoch, global_step, ckpt_every,
            fault_at, last_state_path,
        )
    except Exception:
        # best-effort salvage for restart-based recovery (worker crashes
        # surface at the first D2H after the failed step). save_state is
        # atomic (tmp + rename): a state poisoned by a dead device client
        # cannot clobber the previous good checkpoint.
        try:
            if _LAST_STATE[0] is None:
                # no step completed in this incarnation: leave any previous
                # checkpoint untouched (an empty save would clobber it)
                print("[crash] no completed step to salvage", file=sys.stderr)
            else:
                ckpt.save_state(_LAST_STATE[0], last_state_path)
                print(f"[crash] salvaged {last_state_path}", file=sys.stderr)
        except Exception as salvage_err:  # noqa: BLE001
            print(f"[crash] state not salvageable: {salvage_err}",
                  file=sys.stderr)
        print(
            "[crash] recovery: tools/train_supervisor.py relaunches with "
            f"resume_state={last_state_path} and escalates to "
            "SMIRK_STEP_MODE=split (see PARITY.md: fused-program worker "
            "crashes)", file=sys.stderr)
        raise
    logger.close()
    ckpt.finalize()  # block on pending async orbax saves


_LAST_STATE = [None]  # most recent TrainState, for crash salvage


def _run_epochs(config, system, state, train_loader, val_loader, mesh,
                logger, rng, ckpt, viz, log_path, start_epoch, global_step,
                ckpt_every, fault_at, last_state_path):
    import jax

    from smirk_tpu import parallel

    for epoch in range(start_epoch, config.train.num_epochs):
        for phase, loader in (("train", train_loader), ("val", val_loader)):
            if loader is None:
                continue
            for batch_idx, batch in enumerate(loader):
                if batch["img"].shape[0] % mesh.devices.size:
                    continue  # ragged tail batch
                batch = parallel.shard_batch(batch, mesh)
                if phase == "train":
                    if fault_at < 0:
                        raise RuntimeError(
                            "SMIRK_FAULT_INJECT_STEP<0: pre-step fault")
                    state, metrics, aux = system.train_step(
                        state, batch, rng, parity=batch_idx
                    )
                    _LAST_STATE[0] = state
                    global_step += 1
                    if ckpt_every and global_step % ckpt_every == 0:
                        # block so a later crash can't lose this step
                        jax.block_until_ready(state.step)
                        ckpt.save_state(state, last_state_path)
                    if fault_at and global_step == fault_at:
                        raise RuntimeError(
                            f"SMIRK_FAULT_INJECT_STEP={fault_at}")
                else:
                    # fold in the batch index: state.step is frozen during
                    # validation, so a fixed key would evaluate every val
                    # batch under one identical mask-sampling realization
                    state, metrics, aux = system.eval_step(
                        state, batch, jax.random.fold_in(rng, batch_idx))
                logger.log(batch_idx, metrics, phase, epoch=epoch,
                           global_step=global_step)
                # visualize_every=0 disables viz entirely (saves two
                # resident device programs; see PARITY.md worker notes)
                if (config.train.visualize_every > 0
                        and batch_idx % config.train.visualize_every == 0):
                    extra = system.make_visualizations(state, batch, aux)
                    grid = viz.training_grid(
                        jax.tree_util.tree_map(np.asarray, batch),
                        {k: _np_or_none(v) for k, v in extra.items()},
                        show_landmarks=True,
                    )
                    viz.save_image(grid, os.path.join(
                        log_path, f"{phase}_images/{epoch}_{batch_idx}.jpg"))
        # resumable full state at EVERY epoch end (supervisor recovery must
        # never resume from a stale epoch); save_every gates only the
        # per-epoch model exports, like the reference's save cadence
        ckpt.save_state(state, os.path.join(log_path, "last_state.npz"))
        if epoch % config.train.save_every == 0:
            ckpt.save_model(state, os.path.join(log_path, f"model_{epoch}.npz"))


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
