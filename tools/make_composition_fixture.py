"""End-to-end composition fixture: torch-twin encoder -> reference FLAME ->
reference orthographic projection, at full size / 224px (VERDICT r4 item 7).

Per-module twins (encoder, FLAME, projection) each have parity tests; this
fixture pins the COMPOSITION the reference demo runs (demo.py:107-114):

    enc_out = smirk_encoder(img)                  # torch twin, seed 21
    flame_out = flame.forward(enc_out)            # reference FLAME.py,
                                                  #   synthetic pkl
    lmk2d = batch_orth_proj(lmk, enc_out['cam']); # reference renderer.py
    lmk2d[..., 1:] *= -1                          #   :104-108 y flip

so a wiring bug between modules (param ordering/slicing into FLAME, cam
vector convention, projection/flip placement) fails the test even though
every module passes alone. The consuming test rebuilds the same torch twin
from the seed recipe, imports its state dict into the flax encoder, and runs
our encoder -> FlameModel -> project_landmarks chain against these outputs.

Usage: python tools/make_composition_fixture.py   (needs /root/reference)
"""
import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures")

sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))

for alias, val in (("bool_", np.bool_), ("int_", np.int_),
                   ("float_", np.float64), ("complex_", np.complex128),
                   ("object_", np.object_), ("unicode_", np.str_),
                   ("str_", np.str_)):
    if not hasattr(np, alias):
        setattr(np, alias, val)
sys.modules.setdefault("cv2", types.ModuleType("cv2"))
for pkg in ("src", "src.FLAME", "src.renderer"):
    if pkg not in sys.modules:
        m = types.ModuleType(pkg)
        m.__path__ = [os.path.join(REF, *pkg.split(".")[1:])]
        sys.modules[pkg] = m


def load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


load_module("src/FLAME/lbs.py", "src.FLAME.lbs")
flame_mod = load_module("src/FLAME/FLAME.py", "src.FLAME.FLAME")
util = load_module("src/renderer/util.py", "src.renderer.util")

from smirk_tpu import assets  # noqa: E402
from smirk_tpu.models.mobilenetv3 import (  # noqa: E402
    LARGE_MINIMAL, SMALL_MINIMAL,
)
from torch_ref import SmirkEncoderTorch, randomize_bn_stats  # noqa: E402

# ---- torch twin encoder, deterministic seed-21 recipe (the test rebuilds
# this exact model; see tests/test_composition_parity.py::_build_twin) ----
SEED = 21
gen = torch.Generator().manual_seed(SEED)
torch.manual_seed(SEED)
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

# ---- reference FLAME on the synthetic-fallback pkl (same rebuild as
# tools/make_flame_parity_fixture.py) ----
bundle = assets.load_all()
assert bundle["is_synthetic_flame"], "run against the synthetic fallback"
V = bundle["v_template"].shape[0]
P = bundle["posedirs"].shape[0]
pkl = {
    "v_template": bundle["v_template"],
    "shapedirs": bundle["shapedirs"],
    "posedirs": bundle["posedirs"].T.reshape(V, 3, P),
    "J_regressor": bundle["J_regressor"],
    "kintree_table": np.stack(
        [np.array([0, 0, 1, 1, 1], np.int64), np.arange(5, dtype=np.int64)]
    ),
    "weights": bundle["lbs_weights"],
    "f": bundle["faces"].astype(np.int64),
}
tmp_pkl = "/tmp/synthetic_generic_model_comp.pkl"
with open(tmp_pkl, "wb") as f:
    pickle.dump(pkl, f)
os.chdir(REF)  # FLAME loads eyelid/landmark assets by relative path
flame = flame_mod.FLAME(flame_model_path=tmp_pkl)

# ---- the composition, exactly as demo.py:107-114 wires it ----
rng = np.random.default_rng(SEED)
img = rng.random((2, 3, 224, 224), np.float32)
with torch.no_grad():
    enc_out = tmodel(torch.from_numpy(img))
    flame_out = flame.forward(enc_out)
    lmks = {}
    for key in ("landmarks_fan", "landmarks_mp"):
        p = util.batch_orth_proj(flame_out[key], enc_out["cam"])
        p[:, :, 1:] = -p[:, :, 1:]
        lmks[key] = p[..., :2]

np.savez_compressed(
    os.path.join(OUT, "composition_parity_golden.npz"),
    img=img,
    seed=np.asarray(SEED),
    synthetic_seed=np.asarray(0),
    # drift guards: raw torch-twin encoder outputs (if the seed recipe ever
    # reproduces differently, the test fails HERE, not in the composition)
    enc_cam=enc_out["cam"].numpy(),
    enc_pose=enc_out["pose_params"].numpy(),
    enc_shape=enc_out["shape_params"].numpy(),
    enc_expression=enc_out["expression_params"].numpy(),
    enc_eyelid=enc_out["eyelid_params"].numpy(),
    enc_jaw=enc_out["jaw_params"].numpy(),
    # composition outputs
    vertices=flame_out["vertices"].numpy(),
    landmarks_fan_2d=lmks["landmarks_fan"].numpy(),
    landmarks_mp_2d=lmks["landmarks_mp"].numpy(),
)
print("wrote composition_parity_golden.npz")
