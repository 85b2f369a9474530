"""End-to-end demo CLI smoke: image + landmarks npy -> output panel."""
import os

import numpy as np
import pytest
from PIL import Image

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]


@pytest.fixture(autouse=True)
def tiny_backbones(monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100", (TINY_SMALL, 40)
    )
    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100", (TINY_LARGE, 48)
    )


def _fake_face(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((400, 360, 3)) * 255).astype(np.uint8)
    img_path = str(tmp_path / "face.png")
    Image.fromarray(img).save(img_path)
    theta = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    lmk = np.stack(
        [180 + 80 * np.cos(theta), 200 + 100 * np.sin(theta)], 1
    ).astype(np.float32)
    lmk_path = str(tmp_path / "lmk.npy")
    np.save(lmk_path, lmk)
    return img_path, lmk_path


def test_demo_main_crop_render(tmp_path):
    from smirk_tpu.cli import demo

    img_path, lmk_path = _fake_face(tmp_path)
    out_dir = str(tmp_path / "out")
    demo.main([
        "--input_path", img_path,
        "--landmarks", lmk_path,
        "--crop",
        "--out_path", out_dir,
    ])
    out = os.path.join(out_dir, "face.png")
    assert os.path.exists(out)
    panel = np.asarray(Image.open(out))
    assert panel.shape[1] == 2 * panel.shape[0]  # [input | render]


def test_demo_main_render_orig(tmp_path):
    from smirk_tpu.cli import demo

    img_path, lmk_path = _fake_face(tmp_path)
    out_dir = str(tmp_path / "out2")
    demo.main([
        "--input_path", img_path,
        "--landmarks", lmk_path,
        "--crop", "--render_orig",
        "--out_path", out_dir,
    ])
    panel = np.asarray(Image.open(os.path.join(out_dir, "face.png")))
    assert panel.shape[0] == 400 and panel.shape[1] == 2 * 360


def test_demo_crop_via_fake_mediapipe(tmp_path, monkeypatch):
    """--crop with NO --landmarks: get_landmarks falls through to the
    mediapipe wrapper (fake-injected), exercising the detection branch the
    reference runs by default (demo.py:70-106)."""
    from test_mediapipe_wrapper import _Pt, _install_fake_mediapipe

    from smirk_tpu.cli import demo, mediapipe_utils

    monkeypatch.setattr(mediapipe_utils, "_detector", None)
    H, W = 400, 360
    theta = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    pts = [_Pt((180 + 80 * np.cos(t)) / W, (200 + 100 * np.sin(t)) / H,
               0.01) for t in theta]
    captured = {}
    _install_fake_mediapipe(monkeypatch, [pts], captured)

    img_path, _ = _fake_face(tmp_path)
    out_dir = str(tmp_path / "out_mp")
    demo.main([
        "--input_path", img_path,
        "--crop",
        "--out_path", out_dir,
    ])
    out = os.path.join(out_dir, "face.png")
    assert os.path.exists(out)
    assert captured["data"].shape == (H, W, 3)  # detector saw the image
