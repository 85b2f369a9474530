"""Export the inference step as a serving artifact (jax.export StableHLO).

  python tools/export_serving.py --out artifacts/smirk_b8 --batch 8 \\
      [--checkpoint pretrained_models/SMIRK_em1.pt] [--platform tpu]

Weights are baked in; the serving host only needs jax to deserialize and
call (smirk_tpu.serving.load_inference).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--platform", default=None,
                   help="lowering target (e.g. tpu); default: current backend")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the batch over a 1-D data mesh of N devices "
                        "(multi-chip serving artifact)")
    p.add_argument("--reconstruct", action="store_true",
                   help="export the full analysis-by-neural-synthesis "
                        "reconstruction (render + hints + hull mask + fuse "
                        "generator) instead of the params/render step; "
                        "inputs become (img, hull, key)")
    args = p.parse_args(argv)
    if args.reconstruct and args.devices > 1:
        p.error("--reconstruct is single-device (shard by running one "
                "artifact per chip; the batch axis is embarrassingly "
                "parallel)")

    from smirk_tpu import serving
    from smirk_tpu.cli.demo import build_system

    # pick the raster implementation for the TARGET platform (the Pallas
    # kernels cross-lower to TPU from any host; the jnp path serves CPU)
    import jax

    if os.environ.get("SMIRK_PLATFORM"):  # must apply BEFORE default_backend
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])
    target = args.platform or jax.default_backend()
    system, state = build_system(args.checkpoint,
                                 use_generator=args.reconstruct,
                                 use_pallas=target not in ("cpu",))
    platforms = [args.platform] if args.platform else None
    if args.reconstruct:
        path = serving.export_reconstruct(
            system, state.encoder, state.generator, args.out,
            batch_size=args.batch, platforms=platforms,
        )
    elif args.devices > 1:
        path = serving.export_inference_sharded(
            system, state.encoder, args.out, batch_size=args.batch,
            n_devices=args.devices, platforms=platforms,
        )
    else:
        path = serving.export_inference(
            system, state.encoder, args.out, batch_size=args.batch,
            platforms=platforms,
        )
    print("wrote", path, "and", path + serving.META_SUFFIX)


if __name__ == "__main__":
    sys.exit(main())
