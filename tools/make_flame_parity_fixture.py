"""End-to-end FLAME parity fixture: reference FLAME.forward on a synthetic
generic_model.pkl (same tensors the framework falls back to), full output set.

This validates the ENTIRE FLAME module (blendshape slicing, LBS, eyelids,
param padding, static+dynamic+mediapipe landmarks) against the reference
implementation without the license-gated FLAME2020 download — the synthetic
deformation tensors stand in for the real PCA bases, exercising identical
code paths.

Usage: python tools/make_flame_parity_fixture.py
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

for alias, val in (("bool_", np.bool_), ("int_", np.int_),
                   ("float_", np.float64), ("complex_", np.complex128),
                   ("object_", np.object_), ("unicode_", np.str_),
                   ("str_", np.str_)):
    if not hasattr(np, alias):
        setattr(np, alias, val)
sys.modules.setdefault("cv2", types.ModuleType("cv2"))
for pkg in ("src", "src.FLAME"):
    if pkg not in sys.modules:
        m = types.ModuleType(pkg)
        m.__path__ = [os.path.join(REF, *pkg.split(".")[1:])]
        sys.modules[pkg] = m


def load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


load_module("src/FLAME/lbs.py", "src.FLAME.lbs")
flame_mod = load_module("src/FLAME/FLAME.py", "src.FLAME.FLAME")

from smirk_tpu import assets  # noqa: E402

bundle = assets.load_all()
assert bundle["is_synthetic_flame"], "run against the synthetic fallback"

# Rebuild the pkl layout the reference ctor expects (FLAME.py:54-78):
# posedirs stored as (V,3,P); shapedirs as (V,3,400); kintree row 0 parents.
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
tmp_pkl = "/tmp/synthetic_generic_model.pkl"
with open(tmp_pkl, "wb") as f:
    pickle.dump(pkl, f)

os.chdir(REF)  # FLAME loads eyelids/landmark assets by relative path
flame = flame_mod.FLAME(flame_model_path=tmp_pkl)

rng = np.random.default_rng(11)
B = 6
params = {
    "shape_params": torch.from_numpy(
        rng.normal(0, 1, (B, 300)).astype(np.float32)),
    "expression_params": torch.from_numpy(
        rng.normal(0, 1, (B, 50)).astype(np.float32)),
    "pose_params": torch.from_numpy(
        rng.normal(0, 0.3, (B, 3)).astype(np.float32)),
    "jaw_params": torch.from_numpy(
        np.abs(rng.normal(0, 0.1, (B, 3))).astype(np.float32)),
    "eyelid_params": torch.from_numpy(
        rng.uniform(0, 1, (B, 2)).astype(np.float32)),
}
with torch.no_grad():
    out = flame.forward(params)
    out_ze = flame.forward(params, zero_expression=True)
    out_zp = flame.forward(params, zero_pose=True)

np.savez_compressed(
    os.path.join(OUT, "flame_parity_golden.npz"),
    **{k: v.numpy() for k, v in params.items()},
    vertices=out["vertices"].numpy(),
    landmarks_fan=out["landmarks_fan"].numpy(),
    landmarks_fan_3d=out["landmarks_fan_3d"].numpy(),
    landmarks_mp=out["landmarks_mp"].numpy(),
    vertices_zero_expression=out_ze["vertices"].numpy(),
    vertices_zero_pose=out_zp["vertices"].numpy(),
    synthetic_seed=np.asarray(0),
)
print("wrote flame_parity_golden.npz")
