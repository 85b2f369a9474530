"""Composition parity: encoder -> FLAME -> orth projection -> 2D landmarks.

Per-module twins prove each piece alone; this test pins the COMPOSITION the
reference demo runs (reference demo.py:107-114: encoder outputs feed
FLAME.forward unmodified, then batch_orth_proj + y-flip produce screen
landmarks). The fixture (tools/make_composition_fixture.py) holds the
reference chain's outputs: torch-twin encoder (deterministic seed-21
recipe) -> reference FLAME.py on the synthetic pkl -> reference
renderer.py:104-108 projection. Here the same torch twin is rebuilt, its
state dict goes through the real importer into the flax encoder, and our
encoder -> FlameModel -> project_landmarks chain must match end to end —
a wiring bug between modules (param slicing, cam convention, flip
placement) fails even though every per-module test passes.
"""
import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from smirk_tpu import assets
from smirk_tpu.flame import FlameModel
from smirk_tpu.models.encoders import SmirkEncoder
from smirk_tpu.models.mobilenetv3 import LARGE_MINIMAL, SMALL_MINIMAL
from smirk_tpu.render import camera
from smirk_tpu.utils import importer

from torch_ref import SmirkEncoderTorch, randomize_bn_stats

FIX_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                        "composition_parity_golden.npz")


def _build_twin(seed):
    """The exact seed recipe tools/make_composition_fixture.py used."""
    gen = torch.Generator().manual_seed(seed)
    torch.manual_seed(seed)
    tmodel = SmirkEncoderTorch(SMALL_MINIMAL, LARGE_MINIMAL, n_shape=300,
                               n_exp=50)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)
        for sub in (tmodel.pose_encoder.pose_cam_layers,
                    tmodel.shape_encoder.shape_layers,
                    tmodel.expression_encoder.expression_layers):
            sub[0].weight.data.normal_(0, 0.05, generator=gen)
            sub[0].bias.data.normal_(0, 0.05, generator=gen)
    tmodel.eval()
    return tmodel


def test_composition_encoder_flame_projection():
    fix = np.load(FIX_PATH)
    tmodel = _build_twin(int(fix["seed"]))

    # Drift guard: the rebuilt twin must reproduce the fixture generator's
    # encoder outputs — isolates torch-RNG drift from composition bugs.
    with torch.no_grad():
        enc_t = tmodel(torch.from_numpy(fix["img"]))
    np.testing.assert_allclose(enc_t["cam"].numpy(), fix["enc_cam"],
                               rtol=1e-5, atol=1e-6,
                               err_msg="torch twin seed recipe drifted")

    # Our chain, with weights through the real importer.
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    fmodel = SmirkEncoder(n_exp=50, n_shape=300)
    x_nhwc = jnp.asarray(fix["img"].transpose(0, 2, 3, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), x_nhwc)
    variables = importer.import_state_dict(sd, variables)
    enc_out = fmodel.apply(variables, x_nhwc)

    bundle = assets.load_all(synthetic_seed=int(fix["synthetic_seed"]))
    flame = FlameModel(bundle, n_shape=300, n_exp=50)
    flame_out = flame(enc_out)
    lmk_fan = camera.project_landmarks(flame_out["landmarks_fan"],
                                       enc_out["cam"])
    lmk_mp = camera.project_landmarks(flame_out["landmarks_mp"],
                                      enc_out["cam"])

    # encoder-output parity (same tolerance as the full-size encoder twin)
    for ours, key in (
        (enc_out["pose_params"], "enc_pose"),
        (enc_out["cam"], "enc_cam"),
        (enc_out["shape_params"], "enc_shape"),
        (enc_out["expression_params"], "enc_expression"),
        (enc_out["eyelid_params"], "enc_eyelid"),
        (enc_out["jaw_params"], "enc_jaw"),
    ):
        np.testing.assert_allclose(np.asarray(ours), fix[key],
                                   rtol=1e-3, atol=1e-4, err_msg=key)

    # composition outputs: geometry + projected screen landmarks
    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - b) ** 2)))

    assert rmse(flame_out["vertices"], fix["vertices"]) < 1e-4
    assert rmse(lmk_fan, fix["landmarks_fan_2d"]) < 1e-4
    assert rmse(lmk_mp, fix["landmarks_mp_2d"]) < 1e-4
