"""Additional coverage: FLAME zero modes, cycle augmentation invariants,
video demo over a frame directory."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smirk_tpu import assets
from smirk_tpu.flame import FlameModel

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]


@pytest.fixture(scope="module")
def flame():
    return FlameModel(assets.load_all(), n_shape=30, n_exp=10)


def _params(flame, rng, B=2):
    return {
        "shape_params": jnp.asarray(rng.normal(0, 1, (B, 30)), jnp.float32),
        "expression_params": jnp.asarray(rng.normal(0, 1, (B, 10)), jnp.float32),
        "pose_params": jnp.asarray(rng.normal(0, 0.2, (B, 3)), jnp.float32),
        "jaw_params": jnp.asarray(np.abs(rng.normal(0, 0.1, (B, 3))), jnp.float32),
        "eyelid_params": jnp.asarray(rng.uniform(0, 1, (B, 2)), jnp.float32),
    }


def test_flame_zero_modes(flame):
    rng = np.random.default_rng(0)
    p = _params(flame, rng)
    out = flame(p)
    out_zexp = flame(p, zero_expression=True)
    out_zpose = flame(p, zero_pose=True)
    out_zshape = flame(p, zero_shape=True)
    # zeroing changes geometry
    assert float(jnp.abs(out["vertices"] - out_zexp["vertices"]).max()) > 0
    assert float(jnp.abs(out["vertices"] - out_zpose["vertices"]).max()) > 0
    assert float(jnp.abs(out["vertices"] - out_zshape["vertices"]).max()) > 0
    # zero_expression with zeroed inputs is a no-op
    p0 = dict(p)
    p0["expression_params"] = jnp.zeros_like(p["expression_params"])
    p0["jaw_params"] = jnp.zeros_like(p["jaw_params"])
    np.testing.assert_allclose(
        np.asarray(flame(p0)["vertices"]),
        np.asarray(flame(p0, zero_expression=True)["vertices"]),
        atol=1e-6,
    )
    # parameter padding: short vectors are zero-padded (FLAME.py:244-248)
    p_short = dict(p)
    p_short["shape_params"] = p["shape_params"][:, :7]
    out_short = flame(p_short)
    assert out_short["vertices"].shape == out["vertices"].shape


def test_augment_feats_invariants():
    from smirk_tpu.config import ArchConfig, Config, TrainConfig
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.models import mobilenetv3 as mnv3

    mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (TINY_SMALL, 40)
    mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (TINY_LARGE, 48)
    cfg = Config(image_size=32, arch=ArchConfig(num_expression=10, num_shape=30),
                 train=TrainConfig(batch_size=8, Ke=2))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=10,
                         use_pallas=False, generator_features=8,
                         generator_res_blocks=1)
    rng = np.random.default_rng(1)
    B, Ke = 8, 2
    feats = {
        "expression_params": jnp.asarray(rng.normal(0, 1, (B * Ke, 10)),
                                         jnp.float32),
        "jaw_params": jnp.asarray(np.abs(rng.normal(0, 0.1, (B * Ke, 3))),
                                  jnp.float32),
        "eyelid_params": jnp.asarray(rng.uniform(0, 1, (B * Ke, 2)),
                                     jnp.float32),
        "shape_params": jnp.asarray(rng.normal(0, 1, (B * Ke, 30)), jnp.float32),
        "cam": jnp.zeros((B * Ke, 3)),
        "pose_params": jnp.zeros((B * Ke, 3)),
    }
    out = system._augment_feats(jax.random.PRNGKey(0), dict(feats), Ke)
    # constraints from smirk_trainer.py:226-242
    jaw = np.asarray(out["jaw_params"])
    assert jaw[:, 0].min() >= 0.0 and jaw[:, 0].max() <= 0.5
    eyelid = np.asarray(out["eyelid_params"])
    assert eyelid.min() >= 0.0 and eyelid.max() <= 1.0
    # shape/cam/pose untouched
    np.testing.assert_array_equal(out["shape_params"], feats["shape_params"])
    np.testing.assert_array_equal(out["cam"], feats["cam"])
    # expressions changed for (almost) all rows
    diff = np.abs(np.asarray(out["expression_params"]) -
                  np.asarray(feats["expression_params"])).max(axis=1)
    assert (diff > 1e-4).mean() > 0.9
    # deterministic under the same key
    out2 = system._augment_feats(jax.random.PRNGKey(0), dict(feats), Ke)
    np.testing.assert_array_equal(out["expression_params"],
                                  out2["expression_params"])


def test_demo_video_frame_dir(tmp_path, monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3
    from PIL import Image

    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))
    from smirk_tpu.cli import demo_video

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            (rng.random((120, 100, 3)) * 255).astype(np.uint8)
        ).save(frames / f"f_{i:03d}.png")
    out = tmp_path / "out"
    demo_video.main([
        "--input_path", str(frames),
        "--out_path", str(out),
        "--batch", "2",
    ])
    frames_out = sorted(f for f in os.listdir(out) if f.endswith(".jpg"))
    assert len(frames_out) == 5
    if any(f.endswith(".mp4") for f in os.listdir(out)):
        assert os.path.getsize(out / "grid.mp4") > 0
    panel = np.asarray(Image.open(out / frames_out[0]))
    assert panel.shape[1] == 2 * panel.shape[0]  # [crop | render]


def test_demo_video_crop_with_generator(tmp_path, monkeypatch):
    """--crop + --use_smirk_generator together: the crop loop must not
    clobber the masking-module alias the generator closure uses (regression:
    a local named M shadowed `masking as M` and the first flush crashed)."""
    from smirk_tpu.models import mobilenetv3 as mnv3
    from PIL import Image

    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))
    from smirk_tpu.cli import demo_video

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(1)
    n = 3
    for i in range(n):
        Image.fromarray(
            (rng.random((120, 100, 3)) * 255).astype(np.uint8)
        ).save(frames / f"f_{i:03d}.png")
    # precomputed mediapipe tracks drive the crop path without mediapipe
    th = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    lmk = np.stack([50 + 25 * np.cos(th), 60 + 30 * np.sin(th)], 1)
    tracks = np.stack([lmk + i for i in range(n)]).astype(np.float32)
    np.save(tmp_path / "tracks.npy", tracks)

    out = tmp_path / "out"
    demo_video.main([
        "--input_path", str(frames),
        "--landmarks", str(tmp_path / "tracks.npy"),
        "--out_path", str(out),
        "--batch", "2",
        "--crop", "--use_smirk_generator",
    ])
    jpgs = sorted(f for f in os.listdir(out) if f.endswith(".jpg"))
    assert len(jpgs) == n
    panel = np.asarray(Image.open(out / jpgs[0]))
    # generator adds the reconstruction panel: [crop | render | recon]
    assert panel.shape[1] == 3 * panel.shape[0]
