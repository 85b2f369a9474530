"""Generate golden-value fixtures from the reference PyTorch math.

Runs the reference implementations (read-only at /root/reference) on fixed
random inputs and saves outputs to tests/fixtures/*.npz. The committed npz
files are what the test suite checks against, so the reference tree is NOT
needed to run the tests — only to regenerate fixtures.

Usage: python tools/make_golden_fixtures.py
"""
import importlib.util
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)

# Stub modules the reference imports but we don't have (cv2 is only used by
# code paths we don't call here).
for name in ("cv2",):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# Make `src.*` imports inside reference modules resolvable.
for pkg in ("src", "src.FLAME", "src.renderer", "src.utils"):
    if pkg not in sys.modules:
        m = types.ModuleType(pkg)
        m.__path__ = [os.path.join(REF, *pkg.split(".")[1:])]
        sys.modules[pkg] = m

lbs = load_module("src/FLAME/lbs.py", "src.FLAME.lbs")
util = load_module("src/renderer/util.py", "src.renderer.util")

torch.manual_seed(0)
rng = np.random.default_rng(0)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x)).float()


fix = {}

# ---- batch_rodrigues ----
rv = rng.normal(0, 0.6, (16, 3)).astype(np.float32)
rv[0] = 0.0  # near-zero rotation corner case
fix["rodrigues_in"] = rv
fix["rodrigues_out"] = lbs.batch_rodrigues(t(rv)).numpy()

# ---- blend_shapes / vertices2joints ----
V, L, J, B = 257, 35, 5, 4
betas = rng.normal(0, 1, (B, L)).astype(np.float32)
disps = rng.normal(0, 1e-2, (V, 3, L)).astype(np.float32)
fix["bs_betas"], fix["bs_disps"] = betas, disps
fix["bs_out"] = lbs.blend_shapes(t(betas), t(disps)).numpy()

Jr = rng.random((J, V)).astype(np.float32)
Jr /= Jr.sum(1, keepdims=True)
verts = rng.normal(0, 1, (B, V, 3)).astype(np.float32)
fix["v2j_Jr"], fix["v2j_verts"] = Jr, verts
fix["v2j_out"] = lbs.vertices2joints(t(Jr), t(verts)).numpy()

# ---- batch_rigid_transform ----
parents = np.array([-1, 0, 1, 1, 1], dtype=np.int64)
rots = lbs.batch_rodrigues(t(rng.normal(0, 0.4, (B * J, 3)).astype(np.float32)))
rots = rots.reshape(B, J, 3, 3)
joints = t(rng.normal(0, 0.1, (B, J, 3)).astype(np.float32))
pj, rel = lbs.batch_rigid_transform(rots, joints, torch.from_numpy(parents))
fix["brt_rots"] = rots.numpy()
fix["brt_joints"] = joints.numpy()
fix["brt_parents"] = parents
fix["brt_posed"] = pj.numpy()
fix["brt_rel"] = rel.numpy()

# ---- full lbs ----
pose = rng.normal(0, 0.3, (B, J * 3)).astype(np.float32)
v_template = rng.normal(0, 0.1, (V, 3)).astype(np.float32)
posedirs = rng.normal(0, 1e-3, ((J - 1) * 9, V * 3)).astype(np.float32)
W = rng.random((V, J)).astype(np.float32)
W /= W.sum(1, keepdims=True)
o_verts, o_joints = lbs.lbs(
    t(betas), t(pose), t(v_template).unsqueeze(0).expand(B, -1, -1),
    t(disps), t(posedirs), t(Jr), torch.from_numpy(parents), t(W),
)
fix["lbs_pose"] = pose
fix["lbs_v_template"] = v_template
fix["lbs_posedirs"] = posedirs
fix["lbs_W"] = W
fix["lbs_verts"] = o_verts.numpy()
fix["lbs_joints"] = o_joints.numpy()

# ---- vertices2landmarks (batched face idx) ----
F_ = 411
faces = rng.integers(0, V, (F_, 3)).astype(np.int64)
lmk_idx = rng.integers(0, F_, (B, 21)).astype(np.int64)
bary = rng.dirichlet(np.ones(3), (B, 21)).astype(np.float32)
fix["v2l_faces"] = faces
fix["v2l_idx"] = lmk_idx
fix["v2l_bary"] = bary
fix["v2l_out"] = lbs.vertices2landmarks(
    t(verts), torch.from_numpy(faces), torch.from_numpy(lmk_idx), t(bary)
).numpy()

# ---- renderer util: batch_orth_proj / face_vertices / vertex_normals ----
cam = rng.normal(0, 1, (B, 3)).astype(np.float32)
cam[:, 0] = 7 + rng.normal(0, 0.5, B)
fix["orth_cam"] = cam
fix["orth_out"] = util.batch_orth_proj(t(verts), t(cam)).numpy()

faces_b = np.broadcast_to(faces[None], (B, F_, 3)).copy()
fix["fv_out"] = util.face_vertices(t(verts), torch.from_numpy(faces_b)).numpy()
fix["vn_out"] = util.vertex_normals(t(verts), torch.from_numpy(faces_b)).numpy()

np.savez_compressed(os.path.join(OUT, "lbs_golden.npz"), **fix)
print("wrote", os.path.join(OUT, "lbs_golden.npz"), f"({len(fix)} arrays)")
