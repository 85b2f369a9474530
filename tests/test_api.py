"""High-level Predictor API (smirk_tpu.api)."""
import numpy as np
import pytest

TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]


@pytest.fixture
def predictor(monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))
    from smirk_tpu import Predictor  # lazy package export

    return Predictor()


@pytest.fixture
def gen_predictor(monkeypatch):
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))
    from smirk_tpu import Predictor

    return Predictor(use_generator=True)


def test_reconstruct_generator_path(gen_predictor):
    rng = np.random.default_rng(5)
    imgs = (rng.random((2, 300, 280, 3)) * 255).astype(np.uint8)
    theta = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    kpt = np.stack([140 + 60 * np.cos(theta), 150 + 80 * np.sin(theta)],
                   1).astype(np.float32)[None].repeat(2, 0)
    out = gen_predictor.reconstruct(imgs, landmarks=kpt)
    S = gen_predictor.image_size
    for k in ("rendered_img", "masked_img", "reconstructed_img"):
        assert out[k].shape == (2, S, S, 3), k
        assert np.isfinite(out[k]).all(), k
    # generator output is sigmoid-bounded
    assert out["reconstructed_img"].min() >= 0.0
    assert out["reconstructed_img"].max() <= 1.0
    # the masked input must actually erase face pixels (hull interior)
    assert (out["masked_img"] == 0).mean() > 0.05
    # determinism under the same seed, fresh budget draw under another
    out2 = gen_predictor.reconstruct(imgs, landmarks=kpt, seed=0)
    np.testing.assert_allclose(out["masked_img"], out2["masked_img"])


def test_reconstruct_requires_generator_and_landmarks(predictor,
                                                      gen_predictor):
    img = np.zeros((224, 224, 3), np.float32)
    with pytest.raises(ValueError, match="use_generator"):
        predictor.reconstruct(img, landmarks=np.zeros((478, 2), np.float32))
    with pytest.raises(ValueError, match="landmarks"):
        gen_predictor.reconstruct(img, landmarks=None)


def test_predict_batch_resize(predictor):
    imgs = (np.random.default_rng(0).random((2, 120, 100, 3)) * 255
            ).astype(np.uint8)
    out = predictor(imgs)
    S = predictor.image_size
    assert out["rendered_img"].shape == (2, S, S, 3)
    assert out["vertices"].shape[0] == 2
    assert out["expression_params"].shape == (2, 50)
    for k in ("pose_params", "cam", "shape_params", "jaw_params",
              "eyelid_params", "landmarks_mp", "rendered_mask"):
        assert k in out, k
        assert np.isfinite(out[k]).all(), k


def test_dark_uint8_batch_normalized_by_dtype(predictor):
    """uint8 input must divide by 255 even when every pixel is dark (a
    value heuristic would misread max<=2 as already-[0,1] data)."""
    dark = np.full((1, 224, 224, 3), 2, np.uint8)
    out_u8 = predictor(dark)
    out_f = predictor(dark.astype(np.float32) / 255.0)
    np.testing.assert_allclose(out_u8["expression_params"],
                               out_f["expression_params"],
                               rtol=1e-5, atol=1e-6)


def test_batched_images_single_landmarks_broadcast(predictor):
    imgs = (np.random.default_rng(6).random((2, 160, 140, 3)) * 255
            ).astype(np.uint8)
    kpt = np.random.default_rng(7).uniform(40, 100, (478, 2)).astype(
        np.float32)
    out = predictor(imgs, landmarks=kpt)  # one landmark set, both images
    assert out["rendered_img"].shape[0] == 2
    with pytest.raises(ValueError, match="landmarks batch"):
        predictor(imgs, landmarks=np.stack([kpt] * 3))


def test_predict_single_image_with_landmark_crop(predictor):
    img = (np.random.default_rng(1).random((160, 140, 3)) * 255
           ).astype(np.uint8)
    # plausible face landmarks clustered mid-image
    kpt = np.random.default_rng(2).uniform(40, 100, (478, 2)).astype(
        np.float32)
    out = predictor(img, landmarks=kpt)
    assert out["rendered_img"].shape[0] == 1


def test_encode_then_edit_then_render(predictor):
    imgs = np.random.default_rng(3).random((2, 224, 224, 3)).astype(
        np.float32)
    params = predictor.encode(imgs)
    assert "expression_params" in params and "vertices" not in params
    edited = dict(params)
    edited["expression_params"] = params["expression_params"] + 1.0
    r1 = predictor.render_params(params)
    r2 = predictor.render_params(edited)
    assert r1["vertices"].shape == r2["vertices"].shape
    # editing the expression must move the geometry
    assert np.abs(r1["vertices"] - r2["vertices"]).max() > 1e-4


def test_full_call_matches_encode_plus_render(predictor):
    imgs = np.random.default_rng(4).random((1, 224, 224, 3)).astype(
        np.float32)
    full = predictor(imgs)
    two_step = predictor.render_params(predictor.encode(imgs))
    np.testing.assert_allclose(full["vertices"], two_step["vertices"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(full["rendered_img"],
                               two_step["rendered_img"],
                               rtol=1e-5, atol=1e-6)
