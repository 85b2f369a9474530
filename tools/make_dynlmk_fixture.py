"""Golden fixture for the pose-dependent jaw-contour LUT selection.

Calls the reference FLAME._find_dynamic_lmk_idx_and_bcoords (FLAME.py:117-159)
unbound (it only uses its arguments) with the real dynamic LUT from
assets/landmark_embedding.npy across a sweep of head poses, including
negative/extreme y-rotations that exercise the wrap-around indexing.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

for name in ("cv2",):
    sys.modules.setdefault(name, types.ModuleType(name))

# FLAME.py re-creates numpy 1.x aliases removed in numpy 2 (np.float_ etc.)
for alias, val in (("bool_", np.bool_), ("int_", np.int_),
                   ("float_", np.float64), ("complex_", np.complex128),
                   ("object_", np.object_), ("unicode_", np.str_),
                   ("str_", np.str_)):
    if not hasattr(np, alias):
        setattr(np, alias, val)
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

lmk = np.load(
    os.path.join(REF, "assets/landmark_embedding.npy"),
    allow_pickle=True, encoding="latin1",
)[()]
dyn_faces = lmk["dynamic_lmk_faces_idx"].long()
dyn_bary = lmk["dynamic_lmk_bary_coords"].float()
neck_chain = torch.tensor([1, 0], dtype=torch.long)

rng = np.random.default_rng(3)
B = 24
pose = np.zeros((B, 15), np.float32)  # full_pose: global,neck,jaw,eyes
pose[:, 1] = np.concatenate(
    [np.linspace(-1.5, 1.5, B - 4), [0, 3.0, -3.0, 0.05]]
)  # y-rotation sweep incl. extremes
pose[:, [0, 2]] = rng.normal(0, 0.2, (B, 2))
pose[:, 3:6] = rng.normal(0, 0.1, (B, 3))

f_idx, b_coords = flame_mod.FLAME._find_dynamic_lmk_idx_and_bcoords(
    None, torch.from_numpy(pose), dyn_faces, dyn_bary, neck_chain
)
np.savez_compressed(
    os.path.join(OUT, "dynlmk_golden.npz"),
    pose=pose,
    dyn_faces=dyn_faces.numpy(),
    dyn_bary=dyn_bary.numpy(),
    neck_chain=neck_chain.numpy(),
    out_faces=f_idx.numpy(),
    out_bary=b_coords.numpy(),
)
print("wrote dynlmk_golden.npz")
