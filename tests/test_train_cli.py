"""Training CLI end-to-end: synthetic data, one epoch, artifacts on disk."""
import json
import os

import pytest

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
