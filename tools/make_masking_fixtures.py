"""Golden fixtures for the masking pipeline from the reference torch code.

Covers the deterministic parts: triangle_area, point mapping with given
coords, masking() without noise/random patches, transfer_pixels.
Usage: python tools/make_masking_fixtures.py
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

for name in ("cv2",):
    sys.modules.setdefault(name, types.ModuleType(name))
for pkg in ("src", "src.FLAME", "src.renderer", "src.utils"):
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
load_module("src/renderer/util.py", "src.renderer.util")
masking = load_module("src/utils/masking.py", "src.utils.masking")

rng = np.random.default_rng(7)
t = lambda x: torch.from_numpy(np.ascontiguousarray(x)).float()

fix = {}

B, V, F_, N, S = 2, 120, 180, 64, 32
verts = rng.normal(0, 0.5, (B, V, 3)).astype(np.float32)
faces = rng.integers(0, V, (F_, 3)).astype(np.int64)
probs = rng.random(F_).astype(np.float32) * (rng.random(F_) > 0.3)

fix["verts"], fix["faces"], fix["probs"] = verts, faces, probs

# triangle_area golden
fv = t(verts).reshape(-1, 3)[torch.from_numpy(faces).reshape(-1)].reshape(1, F_, 3, 3)
fix["tri_area"] = masking.triangle_area(fv[..., :2]).numpy()

# deterministic resample path: coords given
cidx = rng.integers(0, F_, (B, N)).astype(np.int64)
cbary = rng.dirichlet(np.ones(3), (B, N)).astype(np.float32)
fix["coords_idx"], fix["coords_bary"] = cidx, cbary
npoints, _ = masking.mesh_based_mask_uniform_faces(
    t(verts),
    torch.from_numpy(faces),
    t(probs),
    coords={
        "sampled_faces_indices": torch.from_numpy(cidx),
        "barycentric_coords": t(cbary),
    },
    IMAGE_SIZE=S,
)
fix["npoints"] = npoints.numpy()

# masking() deterministic: extra_noise False, random_mask 0
img = rng.random((B, 3, S, S)).astype(np.float32)
hull = (rng.random((B, 1, S, S)) > 0.4).astype(np.float32)
rmask = (rng.random((B, 1, S, S)) > 0.5).astype(np.float32)
pts = rng.integers(0, S, (B, N, 2)).astype(np.int64)
extra = masking.transfer_pixels(t(img), torch.from_numpy(pts), torch.from_numpy(pts))
fix["img"], fix["hull"], fix["rmask"], fix["pts"] = img, hull, rmask, pts
fix["extra"] = extra.numpy()
fix["masked"] = masking.masking(
    t(img), t(hull), extra, wr=3, rendered_mask=t(rmask),
    extra_noise=False, random_mask=0,
).numpy()

# face probability weighting (frontal gate + area scaling)
from src.renderer.util import face_vertices, vertex_normals  # noqa: E402

faces_b = torch.from_numpy(np.broadcast_to(faces[None], (B, F_, 3)).copy())
tn = vertex_normals(t(verts), faces_b)
tfn = face_vertices(tn, faces_b)[:, :, :, 2].mean(dim=-1)
p = t(probs).repeat(B, 1)
p = torch.where(tfn < 0.05, p, torch.zeros_like(tfn))
xy_area = masking.triangle_area(face_vertices(t(verts), faces_b))
fix["weighted_probs"] = (p * xy_area).numpy()

np.savez_compressed(os.path.join(OUT, "masking_golden.npz"), **fix)
print("wrote masking_golden.npz", f"({len(fix)} arrays)")
