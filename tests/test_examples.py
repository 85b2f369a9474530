"""The examples/ scripts run end-to-end on synthetic assets."""
import json
import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]


@pytest.fixture
def tiny_archs(monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))


def _face_png(path, seed=0, size=(140, 120)):
    from PIL import Image

    img = (np.random.default_rng(seed).random((size[1], size[0], 3)) * 255
           ).astype(np.uint8)
    Image.fromarray(img).save(path)


def test_predict_example(tiny_archs, tmp_path):
    import predict as ex

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        _face_png(d / f"im{i}.png", seed=i)
    out = tmp_path / "out"
    ex.main(["--images", str(d), "--out", str(out), "--batch", "2"])
    assert sorted(os.listdir(out)) == [
        "panel_im0.png", "panel_im1.png", "panel_im2.png", "params.npz"]
    z = np.load(out / "params.npz")
    assert z["codes"].shape[0] == 3 and np.isfinite(z["codes"]).all()


def test_expression_edit_example(tiny_archs, tmp_path):
    import expression_edit as ex

    img = tmp_path / "face.png"
    _face_png(img, seed=7)
    out = tmp_path / "edit.png"
    ex.main(["--image", str(img), "--amplify", "3.0", "--jaw_open", "0.2",
             "--out", str(out)])
    from PIL import Image

    panel = np.asarray(Image.open(out))
    assert panel.shape[1] == 3 * panel.shape[0]  # [input|recon|edited]


def test_serve_client_reconstruct(tiny_archs, tmp_path, capsys):
    """serve_client against a reconstruct artifact: hull computed client-
    side from landmarks, seed forwarded."""
    import threading

    import serve_client as ex

    from smirk_tpu import assets, serving
    from smirk_tpu.config import ArchConfig, Config
    from smirk_tpu.train import SmirkSystem

    cfg = Config(image_size=64,
                 arch=ArchConfig(num_expression=10, num_shape=30))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=10,
                         use_pallas=False, generator_features=8,
                         generator_res_blocks=1)
    state = system.init_state(jax.random.PRNGKey(0))
    path = serving.export_reconstruct(
        system, state.encoder, state.generator, str(tmp_path / "rsrv"),
        batch_size=1)
    srv = serving.create_http_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        img = tmp_path / "face.png"
        _face_png(img, seed=5, size=(120, 100))
        theta = np.linspace(0, 2 * np.pi, 478, endpoint=False)
        lmk = np.stack([60 + 30 * np.cos(theta), 50 + 35 * np.sin(theta)],
                       1).astype(np.float32)
        lmk_path = tmp_path / "lmk.npy"
        np.save(lmk_path, lmk)
        ex.main(["--image", str(img), "--landmarks", str(lmk_path),
                 "--seed", "4", "--url", f"http://127.0.0.1:{port}"])
        printed = capsys.readouterr().out
        assert "reconstructed_img" in printed and "masked_img" in printed

        # missing --landmarks against a reconstruct artifact -> clear exit
        with pytest.raises(SystemExit, match="landmarks"):
            ex.main(["--image", str(img),
                     "--url", f"http://127.0.0.1:{port}"])
    finally:
        srv.shutdown()


def test_reconstruct_example(tiny_archs, tmp_path):
    import reconstruct as ex

    img = tmp_path / "face.png"
    _face_png(img, seed=11, size=(200, 180))
    theta = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    lmk = np.stack([100 + 40 * np.cos(theta), 90 + 50 * np.sin(theta)],
                   1).astype(np.float32)
    lmk_path = tmp_path / "lmk.npy"
    np.save(lmk_path, lmk)
    out = tmp_path / "recon.png"
    ex.main(["--image", str(img), "--landmarks", str(lmk_path),
             "--out", str(out)])
    from PIL import Image

    panel = np.asarray(Image.open(out))
    assert panel.shape[1] == 4 * panel.shape[0]  # 4 columns


def test_serve_client_example(tiny_archs, tmp_path, capsys):
    import threading

    import serve_client as ex

    from smirk_tpu import assets, serving
    from smirk_tpu.config import ArchConfig, Config
    from smirk_tpu.train import SmirkSystem

    cfg = Config(image_size=64,
                 arch=ArchConfig(num_expression=10, num_shape=30))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=10,
                         use_pallas=False, generator_features=8,
                         generator_res_blocks=1)
    state = system.init_state(jax.random.PRNGKey(0))
    path = serving.export_inference(system, state.encoder,
                                    str(tmp_path / "srv"), batch_size=1)
    srv = serving.create_http_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        img = tmp_path / "face.png"
        _face_png(img, seed=3)
        ex.main(["--image", str(img), "--url", f"http://127.0.0.1:{port}"])
        printed = capsys.readouterr().out
        assert "expression_params" in printed
    finally:
        srv.shutdown()
