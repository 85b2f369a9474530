"""Export a smirk-tpu checkpoint as a reference-consumable torch .pt.

  python tools/export_torch_ckpt.py --checkpoint ckpt.npz|orbax_dir \\
      --out SMIRK_export.pt [--config configs/config_train.yaml] \\
      [--override arch.num_shape=300 ...] [--no_generator]

The inverse of the quick_install + importer flow: models trained here can
be loaded by the reference's PyTorch stack. The output is the joint
state-dict layout the reference trainer saves and its demos load
(`smirk_encoder.*` + `smirk_generator.*` keys, base_trainer.py:226-233 /
demo.py:55-66), including torch's `num_batches_tracked` BN buffers so a
strict load passes. `--out *.npz` writes the same dict as an npz (no
torch needed on the writing side). The config must match the checkpoint's
shapes (same rule as resuming training from it).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="model export or full train state (.npz or orbax dir)")
    p.add_argument("--out", required=True, help=".pt (torch) or .npz")
    p.add_argument("--config", default=None, help="YAML config matching the "
                   "checkpoint's shapes (default: built-in defaults)")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config override, repeatable")
    p.add_argument("--no_generator", action="store_true",
                   help="export the encoder only")
    args = p.parse_args(argv)

    os.environ.setdefault("SMIRK_PLATFORM", "cpu")
    import jax

    if os.environ.get("SMIRK_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])

    import numpy as np

    from smirk_tpu import assets
    from smirk_tpu.config import Config, load_config
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.utils import checkpoint as ckpt
    from smirk_tpu.utils import importer

    cfg = (load_config(args.config, overrides=tuple(args.override))
           if args.config else Config())
    if args.override and not args.config:
        from smirk_tpu.config import apply_override

        for ov in args.override:
            cfg = apply_override(cfg, ov)
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=1,
                         use_pallas=False)
    state = system.init_state(jax.random.PRNGKey(0))
    state = ckpt.load_model(state, args.checkpoint)

    sd = importer.export_state_dict(state.encoder, prefix="smirk_encoder.")
    if state.generator is not None and not args.no_generator:
        sd.update(importer.export_state_dict(
            state.generator, prefix="smirk_generator."))
    sd = importer.add_bn_trackers(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    if args.out.endswith(".npz"):
        np.savez(args.out, **sd)
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()},
            args.out,
        )
    print(f"wrote {args.out} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
