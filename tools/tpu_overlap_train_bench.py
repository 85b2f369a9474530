"""Overlapped host+device training throughput on a real file corpus
(VERDICT r4 item 6): wall-clock steps/s for the recommended recipe (bf16,
batch 64, split-step, viz off) with the threaded prefetch loader + native
image ops feeding from an on-disk FFHQ-layout directory, vs the known
device-only step times (PARITY.md: 271.0/213.3 ms p0/p1 b64 bf16
=> 4.13 ideal steps/s if the host pipeline fully hides).

Fabricates a 256-image 224px PNG corpus (+ fan/mediapipe landmark npys) in
/tmp on first run, launches the REAL `train.py` CLI (ambient TPU env) as a
subprocess, then computes steps/s from the metrics.jsonl timestamps between
the first and last train records (epoch-end checkpoint D2H excluded — that
cost is cadence-amortized and tunnel-bound on this dev box).

Worker budget: the b64 bf16 split-step family is ~2.5 slots (novel unless
the round-4 recipe worker survived). Run mid-round with recovery margin.

Usage: python tools/tpu_overlap_train_bench.py [steps]
"""
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
CORPUS = "/tmp/smirk_overlap_corpus"
LOG = "/tmp/smirk_overlap_logs"
BATCH = 64
N_IMG = 256
SIZE = 224


def make_corpus():
    from PIL import Image

    img_dir = os.path.join(CORPUS, "ffhq")
    fan_dir = os.path.join(CORPUS, "fan")
    mp_dir = os.path.join(CORPUS, "mp")
    if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= N_IMG:
        return img_dir, fan_dir, mp_dir
    for d in (img_dir, fan_dir, mp_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    th_mp = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    th_fan = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    # smooth low-frequency content + noise: PNG sizes comparable to real
    # face crops (pure noise would overstate inflate cost)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    for i in range(N_IMG):
        a, b, c = rng.random(3)
        base = (
            0.5 + 0.3 * np.sin(6.3 * (a + xx * (1 + b)))
            + 0.2 * np.cos(6.3 * (c + yy * (2 - b)))
        )[..., None] * np.array([0.9, 0.7 + 0.3 * a, 0.6 + 0.4 * b])
        img = np.clip(base + rng.normal(0, 0.05, (SIZE, SIZE, 3)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:05d}.png"))
        cx = SIZE / 2 + rng.normal(0, 5)
        cy = SIZE / 2 + rng.normal(0, 5)
        mp = np.stack([cx + 55 * np.cos(th_mp), cy + 70 * np.sin(th_mp)],
                      1).astype(np.float32)
        fan = np.stack([cx + 50 * np.cos(th_fan), cy + 65 * np.sin(th_fan)],
                       1).astype(np.float32)
        np.save(os.path.join(fan_dir, f"{i:05d}.npy"), fan[None])
        np.save(os.path.join(mp_dir, f"{i:05d}.npy"), mp)
    return img_dir, fan_dir, mp_dir


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    img_dir, fan_dir, mp_dir = make_corpus()
    metrics = os.path.join(LOG, "metrics.jsonl")
    if os.path.exists(metrics):
        os.remove(metrics)
    args = [
        sys.executable, os.path.join(ROOT, "train.py"),
        "arch.bf16_compute=true",
        f"train.batch_size={BATCH}",
        "train.num_workers=6",
        f"train.samples_per_epoch={steps * BATCH}",
        "train.num_epochs=1",
        "train.save_every=1",
        "train.visualize_every=0",
        "train.log_losses_every=1",
        f"dataset.FFHQ_path={img_dir}",
        f"dataset.FFHQ_fan_landmarks_path={fan_dir}",
        f"dataset.FFHQ_mediapipe_landmarks_path={mp_dir}",
        f"train.log_path={LOG}",
    ]
    print("launching:", " ".join(args[1:]), flush=True)
    proc = subprocess.run(args, cwd=ROOT, capture_output=True, text=True,
                          timeout=5400)
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        print(json.dumps({"error": f"train rc={proc.returncode}",
                          "tail": proc.stdout[-300:]}))
        return 1

    recs = [json.loads(ln) for ln in open(metrics)]
    tr = [r for r in recs if r.get("phase") == "train"]
    # drop the first record: it carries both compiles + first-batch fill
    if len(tr) < 10:
        print(json.dumps({"error": f"only {len(tr)} train records"}))
        return 1
    warm = tr[1:]
    dt = warm[-1]["t"] - warm[0]["t"]
    n = len(warm) - 1
    out = {
        "wall_steps_per_s_b64_bf16": round(n / dt, 3),
        "wall_ms_per_step": round(dt / n * 1e3, 1),
        "samples_per_s": round(n * BATCH / dt, 1),
        "n_steps_timed": n,
        "device_ideal_ms": 242.2,  # (271.0 + 213.3)/2, PARITY.md b64 bf16
        "first_step_s": round(tr[1]["t"] - tr[0]["t"], 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
