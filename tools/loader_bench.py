"""Host input-pipeline throughput bench (CPU only, no TPU).

Answers "can the host feed the chip?": fabricates an FFHQ-layout dataset on
disk (PNG at a realistic source resolution, the FFHQ format), then times the
full training input pipeline — image decode, landmark load, scale-1.4 crop +
warp, 4-group
augmentation, convex-hull mask, ArcFace 112px crop, collate — through the
threaded prefetch DataLoader, exactly as cli/train.py consumes it.

The reference feeds its trainer with a torch DataLoader over the same
per-sample work (datasets/base_dataset.py prepare_data + albumentations);
here the hot host ops run through libfastops (smirk_tpu/native) with numpy
oracles as fallback. Compare the printed samples/s against the train step's
demand (PARITY.md): bf16 b64 recipe ~264 samples/s/chip, bf16 b32 ~196,
fp32 b32 ~138.

Usage:
  python tools/loader_bench.py [--n_images 64] [--src_size 512] [--batch 64]
      [--batches 8] [--workers N] [--no-native] [--keep DIR]

Prints one JSON line with samples/s and the demand ratios.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_ffhq(root: str, n: int, src_size: int,
                   rng: np.random.Generator) -> dict:
    """FFHQ-style tree: PNG images + per-image FAN (1,68,2) and
    mediapipe (478,2) landmark .npy files (layout of
    reference datasets/ffhq_dataset.py)."""
    from PIL import Image

    img_dir = os.path.join(root, "ffhq")
    fan_dir = os.path.join(root, "fan")
    mp_dir = os.path.join(root, "mp")
    for d in (img_dir, fan_dir, mp_dir):
        os.makedirs(d, exist_ok=True)
    S = src_size
    cx = cy = S / 2.0
    th478 = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    th68 = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    for i in range(n):
        # low-frequency random image compresses/decodes at realistic cost
        base = rng.random((S // 8, S // 8, 3)).astype(np.float32)
        img = np.asarray(
            Image.fromarray((base * 255).astype(np.uint8)).resize((S, S)))
        img = np.clip(
            img.astype(np.float32) + rng.normal(0, 12, img.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{i:05d}.png"))
        jx = rng.normal(0, 2.0)
        jy = rng.normal(0, 2.0)
        mp = np.stack([cx + jx + 0.22 * S * np.cos(th478),
                       cy + jy + 0.27 * S * np.sin(th478)], 1)
        fan = np.stack([cx + jx + 0.20 * S * np.cos(th68),
                        cy + jy + 0.25 * S * np.sin(th68)], 1)
        np.save(os.path.join(fan_dir, f"{i:05d}.npy"),
                fan.astype(np.float32)[None])
        np.save(os.path.join(mp_dir, f"{i:05d}.npy"), mp.astype(np.float32))
    return {"FFHQ_path": img_dir, "FFHQ_fan_landmarks_path": fan_dir,
            "FFHQ_mediapipe_landmarks_path": mp_dir}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=64)
    ap.add_argument("--src_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--workers", type=int, default=0,
                    help="0 = os.cpu_count()")
    ap.add_argument("--no-native", action="store_true",
                    help="force the numpy-oracle host ops")
    ap.add_argument("--keep", default=None,
                    help="fabricate into DIR and keep it (reused if present)")
    args = ap.parse_args()

    if args.no_native:
        from smirk_tpu import native

        native.load = lambda: None  # type: ignore[assignment]

    from smirk_tpu import native
    from smirk_tpu.config import Config, DatasetConfig
    from smirk_tpu.data import datasets as D
    from smirk_tpu.data.pipeline import DataLoader, MixedDatasetSampler

    rng = np.random.default_rng(0)
    root = args.keep or tempfile.mkdtemp(prefix="loaderbench_")
    cleanup = args.keep is None
    try:
        marker = os.path.join(root, "ffhq", f"{args.n_images - 1:05d}.png")
        if not os.path.exists(marker):
            t0 = time.perf_counter()
            paths = fabricate_ffhq(root, args.n_images, args.src_size, rng)
            print(f"fabricated {args.n_images} x {args.src_size}px PNGs "
                  f"in {time.perf_counter() - t0:.1f}s -> {root}",
                  file=sys.stderr)
        else:
            paths = {"FFHQ_path": os.path.join(root, "ffhq"),
                     "FFHQ_fan_landmarks_path": os.path.join(root, "fan"),
                     "FFHQ_mediapipe_landmarks_path": os.path.join(root, "mp")}

        cfg = Config(image_size=224, dataset=DatasetConfig(**paths))
        ds = D.FFHQDataset(cfg, test=False)
        assert len(ds) == args.n_images, (len(ds), args.n_images)
        workers = args.workers or (os.cpu_count() or 1)

        def run(n_batches):
            sampler = MixedDatasetSampler(
                [len(ds)], [1.0], args.batch, args.batch * n_batches, seed=1)
            loader = DataLoader(ds, sampler, num_workers=workers, prefetch=4)
            seen = 0
            for batch in loader:
                assert batch["img"].shape == (args.batch, 224, 224, 3)
                seen += batch["img"].shape[0]
            return seen

        run(1)  # warm page cache / thread pool
        t0 = time.perf_counter()
        seen = run(args.batches)
        dt = time.perf_counter() - t0

        sps = seen / dt
        demand = {"train_bf16_b64": 264.0, "train_bf16_b32": 196.0,
                  "train_fp32_b32": 138.0}
        out = {
            "samples_per_s": round(sps, 1),
            "ms_per_batch": round(1000.0 * dt / args.batches, 1),
            "batch": args.batch, "batches": args.batches,
            "workers": workers, "src_size": args.src_size,
            "native": bool(native.load() is not None),
            "cpus": os.cpu_count(),
            "headroom_vs_demand": {
                k: round(sps / v, 2) for k, v in demand.items()},
        }
        print(json.dumps(out))
    finally:
        if cleanup:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
