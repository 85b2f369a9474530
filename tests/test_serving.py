"""Serving export: AOT StableHLO artifact roundtrip + TPU cross-lowering."""
import json
import os

import numpy as np
import jax
import pytest

from smirk_tpu import assets, serving
from smirk_tpu.config import ArchConfig, Config
from smirk_tpu.train import SmirkSystem

TINY = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]


@pytest.fixture(scope="module")
def tiny_system():
    from smirk_tpu.models import mobilenetv3 as mnv3

    mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (TINY, 40)
    mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (TINY, 40)
    cfg = Config(image_size=64, arch=ArchConfig(num_expression=10, num_shape=30))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=10,
                         use_pallas=False, generator_features=8,
                         generator_res_blocks=1)
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def test_export_roundtrip_matches_direct(tiny_system, tmp_path):
    system, state = tiny_system
    path = serving.export_inference(system, state.encoder,
                                    str(tmp_path / "art"), batch_size=2)
    assert path.endswith(".stablehlo") and os.path.getsize(path) > 1000
    meta = json.load(open(path + ".json"))
    assert meta["input"]["shape"] == [2, 64, 64, 3]

    serve = serving.load_inference(path)
    img = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    out = serve(img)
    direct = serving.make_inference_fn(system, state.encoder)(img)
    assert set(out) == set(k for k in serving.OUTPUT_KEYS if k in direct)
    for k in out:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(direct[k]),
                                   atol=1e-5, err_msg=k)


def test_export_sharded_roundtrip(tiny_system, tmp_path):
    """Mesh-aware artifact: batch sharded over the 8-device mesh, output
    matches the unsharded forward."""
    system, state = tiny_system
    path = serving.export_inference_sharded(
        system, state.encoder, str(tmp_path / "art8"), batch_size=8,
        n_devices=8)
    meta = json.load(open(path + ".json"))
    assert meta["nr_devices"] == 8
    assert meta["mesh"] == {"axes": ["data"], "shape": [8]}

    serve = serving.load_inference(path)
    img = np.random.default_rng(1).random((8, 64, 64, 3)).astype(np.float32)
    out = serve(img)
    direct = serving.make_inference_fn(system, state.encoder)(img)
    for k in out:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(direct[k]),
                                   atol=1e-5, err_msg=k)


def test_export_sharded_rejects_uneven_batch(tiny_system, tmp_path):
    system, state = tiny_system
    with pytest.raises(ValueError, match="divide"):
        serving.export_inference_sharded(
            system, state.encoder, str(tmp_path / "bad"), batch_size=9,
            n_devices=8)


def test_http_serving_host(tiny_system, tmp_path):
    """tools/serve.py daemon: healthz/meta endpoints + a /predict round
    trip with a ragged batch (3 requests through an exported batch of 2:
    chunking, tail padding, output trimming)."""
    import io
    import threading
    import urllib.request

    system, state = tiny_system
    path = serving.export_inference(system, state.encoder,
                                    str(tmp_path / "srv"), batch_size=2)
    srv = serving.create_http_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
        meta = json.loads(urllib.request.urlopen(base + "/meta").read())
        assert meta["input"]["shape"] == [2, 64, 64, 3]

        img = np.random.default_rng(2).random((3, 64, 64, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, img=img)
        req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                     method="POST")
        out = dict(np.load(io.BytesIO(urllib.request.urlopen(req).read())))
        direct = serving.make_inference_fn(system, state.encoder)(img)
        assert all(v.shape[0] == 3 for v in out.values())
        for k in out:
            np.testing.assert_allclose(out[k], np.asarray(direct[k]),
                                       atol=1e-5, err_msg=k)

        # empty batch -> clear 400, not an opaque IndexError
        buf0 = io.BytesIO()
        np.savez(buf0, img=np.zeros((0, 64, 64, 3), np.float32))
        req0 = urllib.request.Request(base + "/predict", data=buf0.getvalue(),
                                      method="POST")
        try:
            urllib.request.urlopen(req0)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"empty batch" in e.read()

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(base + "/predict", data=b"junk",
                                     method="POST")
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
    finally:
        srv.shutdown()


def test_export_reconstruct_roundtrip(tiny_system, tmp_path):
    """Generator-path artifact: (img, hull, key) -> reconstruction, equal
    to the direct closure, fully self-contained."""
    system, state = tiny_system
    path = serving.export_reconstruct(
        system, state.encoder, state.generator, str(tmp_path / "rec"),
        batch_size=2)
    meta = json.load(open(path + ".json"))
    assert meta["kind"] == "reconstruct"
    assert "masked_img" in meta["outputs"]
    assert meta["extra_inputs"][0]["name"] == "hull"

    rng = np.random.default_rng(3)
    img = rng.random((2, 64, 64, 3)).astype(np.float32)
    hull = np.ones((2, 64, 64, 1), np.float32)
    hull[:, 16:48, 16:48, 0] = 0.0  # face region (hull: 1 = background)
    key = np.asarray(jax.random.PRNGKey(7), np.uint32)

    serve = serving.load_inference(path)
    out = serve(img, hull, key)
    direct = serving.make_reconstruct_fn(
        system, state.encoder, state.generator)(img, hull, key)
    assert set(out) == set(direct)
    for k in out:
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(direct[k]),
                                   atol=1e-5, err_msg=k)
    # the mask actually erased face pixels and the generator is bounded
    assert (np.asarray(out["masked_img"]) == 0).mean() > 0.05
    assert np.asarray(out["reconstructed_img"]).min() >= 0.0
    assert np.asarray(out["reconstructed_img"]).max() <= 1.0


def test_http_serving_reconstruct(tiny_system, tmp_path):
    """Daemon over a reconstruct artifact: hull + seed through /predict,
    ragged batch (3 through batch 2), deterministic per seed."""
    import io
    import threading
    import urllib.request

    system, state = tiny_system
    path = serving.export_reconstruct(
        system, state.encoder, state.generator, str(tmp_path / "recsrv"),
        batch_size=2)
    srv = serving.create_http_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        rng = np.random.default_rng(4)
        img = rng.random((3, 64, 64, 3)).astype(np.float32)
        hull = np.ones((3, 64, 64, 1), np.float32)
        hull[:, 20:44, 20:44, 0] = 0.0

        def post(seed):
            buf = io.BytesIO()
            np.savez(buf, img=img, hull=hull, seed=np.int64(seed))
            req = urllib.request.Request(
                base + "/predict", data=buf.getvalue(), method="POST")
            return dict(np.load(io.BytesIO(urllib.request.urlopen(req).read())))

        out = post(0)
        assert out["reconstructed_img"].shape == (3, 64, 64, 3)
        assert np.isfinite(out["reconstructed_img"]).all()
        # deterministic per seed; fresh point budgets under another
        np.testing.assert_allclose(out["masked_img"], post(0)["masked_img"])
        # negative seeds are legal (masked to 64-bit PRNGKey semantics)
        neg = post(-1)
        assert np.isfinite(neg["reconstructed_img"]).all()

        # missing hull -> clear 400
        buf = io.BytesIO()
        np.savez(buf, img=img)
        req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                     method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"hull" in e.read()
    finally:
        srv.shutdown()


def test_export_tpu_cross_lowering_contains_mosaic(tmp_path):
    """A TPU artifact exported from this CPU host must embed the real Pallas
    kernels (tpu_custom_call), not the interpret-mode lax graph."""
    from smirk_tpu.models import mobilenetv3 as mnv3

    mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (TINY, 40)
    mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (TINY, 40)
    cfg = Config(image_size=64, arch=ArchConfig(num_expression=10, num_shape=30))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=10,
                         use_pallas=True, generator_features=8,
                         generator_res_blocks=1)
    state = system.init_state(jax.random.PRNGKey(0))
    path = serving.export_inference(system, state.encoder,
                                    str(tmp_path / "tpu_art"), batch_size=2,
                                    platforms=["tpu"])
    blob = open(path, "rb").read()
    assert b"tpu_custom_call" in blob
    meta = json.load(open(path + ".json"))
    assert meta["platforms"] == ["tpu"]
