"""Asset loading & conversion: FLAME model data -> plain numpy pytrees.

The reference loads pickled FLAME2020 + npy/npz/obj assets at module-build
time into torch buffers (/root/reference/src/FLAME/FLAME.py:50-113,
src/renderer/renderer.py:50-98, src/utils/masking.py:11-38). Here every asset
becomes a plain numpy dict produced once on the host; device code receives
them as jnp constants inside jit.

The FLAME2020 `generic_model.pkl` is license-gated (quick_install.sh). When it
is absent we can still build a fully functional model for tests/benches from
the public assets that ship with the reference (template mesh + faces from
head_template.obj, landmark embeddings, eyelid blendshapes) plus
deterministic synthetic deformation tensors (`synthetic_deformation_tensors`).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

N_SHAPE_FULL = 300
N_EXP_FULL = 100
NUM_JOINTS = 5

# FLAME region -> sampling probability for mesh-anchored pixel hints
# (reference src/utils/masking.py:18-31).
AREA_WEIGHTS = {
    "neck": 0.0,
    "right_eyeball": 0.0,
    "right_ear": 0.0,
    "lips": 0.5,
    "nose": 0.5,
    "left_ear": 0.0,
    "eye_region": 1.0,
    "forehead": 1.0,
    "left_eye_region": 1.0,
    "right_eye_region": 1.0,
    "face_clean": 1.0,
    "cleaner_lips": 1.0,
}


def _to_np(a, dtype=np.float32):
    if "scipy.sparse" in str(type(a)):
        a = a.todense()
    if "Tensor" in type(a).__name__:  # torch tensor inside landmark npy
        a = a.detach().cpu().numpy()
    return np.asarray(a, dtype=dtype)


def load_obj(path: str):
    """Minimal wavefront OBJ parser (vertices, uvs, faces, uv faces).

    Replaces pytorch3d.io.load_obj (reference renderer.py:54-57). Only
    handles v/vt/f records with 1-based `v/vt` indices, which is all the
    FLAME head template uses.
    """
    verts, uvs, faces, uvfaces = [], [], [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                idx = [t.split("/") for t in line.split()[1:4]]
                faces.append([int(t[0]) - 1 for t in idx])
                if len(idx[0]) > 1 and idx[0][1]:
                    uvfaces.append([int(t[1]) - 1 for t in idx])
    return (
        np.asarray(verts, np.float32),
        np.asarray(uvs, np.float32),
        np.asarray(faces, np.int32),
        np.asarray(uvfaces, np.int32) if uvfaces else None,
    )


def load_flame_pkl(path: str) -> Dict[str, np.ndarray]:
    """Convert the FLAME2020 generic_model.pkl into plain numpy arrays.

    Mirrors the tensor prep in reference FLAME.__init__ (FLAME.py:54-78):
    posedirs reshaped to (P, V*3), kintree row 0 as parents with parents[0]=-1.
    Keeps the full 400-component shapedirs; slicing to (n_shape, n_exp)
    happens in FlameModel.
    """
    with open(path, "rb") as f:
        ss = pickle.load(f, encoding="latin1")
    posedirs = _to_np(ss["posedirs"])  # (V,3,P)
    num_pose_basis = posedirs.shape[-1]
    parents = _to_np(ss["kintree_table"], np.int64)[0]
    parents[0] = -1
    return {
        "v_template": _to_np(ss["v_template"]),
        "shapedirs": _to_np(ss["shapedirs"]),  # (V,3,400)
        "posedirs": posedirs.reshape(-1, num_pose_basis).T.copy(),  # (P,V*3)
        "J_regressor": _to_np(ss["J_regressor"]),  # (J,V)
        "parents": parents,
        "lbs_weights": _to_np(ss["weights"]),  # (V,J)
        "faces": _to_np(ss["f"], np.int32),  # (F,3)
    }


def synthetic_deformation_tensors(
    n_verts: int,
    faces: np.ndarray,
    v_template: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Deterministic FLAME-like deformation tensors for tests/benches.

    Used when the license-gated generic_model.pkl is unavailable. Scales are
    chosen so parameter magnitudes ~N(0,1) produce plausible-size (~mm)
    deformations of the real template.
    """
    rng = np.random.default_rng(seed)
    V = n_verts
    P = (NUM_JOINTS - 1) * 9
    shapedirs = rng.normal(0, 1e-3, (V, 3, N_SHAPE_FULL + N_EXP_FULL)).astype(
        np.float32
    )
    posedirs = rng.normal(0, 1e-4, (P, V * 3)).astype(np.float32)
    # Joints at plausible head locations: root/neck near centroid, jaw below,
    # eyes near the eye region (only geometry-plausible, not anatomical).
    c = v_template.mean(0)
    joint_pos = np.stack(
        [
            c,
            c + [0, 0.02, 0],
            c + [0, -0.04, 0.02],
            c + [-0.03, 0.03, 0.04],
            c + [0.03, 0.03, 0.04],
        ]
    ).astype(np.float32)
    # J_regressor: softmax over inverse distances (rows sum to 1).
    d = np.linalg.norm(v_template[None] - joint_pos[:, None], axis=-1)
    Jr = np.exp(-d / 0.01)
    J_regressor = (Jr / Jr.sum(1, keepdims=True)).astype(np.float32)
    # lbs weights: soft assignment to nearest joints.
    w = np.exp(-d.T / 0.05)
    lbs_weights = (w / w.sum(1, keepdims=True)).astype(np.float32)
    parents = np.array([-1, 0, 1, 1, 1], dtype=np.int64)
    return {
        "v_template": v_template.astype(np.float32),
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": J_regressor,
        "parents": parents,
        "lbs_weights": lbs_weights,
        "faces": faces.astype(np.int32),
    }


def load_landmark_embeddings(asset_root: str) -> Dict[str, np.ndarray]:
    """FAN-68 static/dynamic + mediapipe-105 landmark embeddings.

    Reference: FLAME.py:94-113. The dynamic contour LUT rows are stored as
    torch tensors inside the npy; converted to numpy here.
    """
    lmk = np.load(
        os.path.join(asset_root, "landmark_embedding.npy"),
        allow_pickle=True,
        encoding="latin1",
    )[()]
    mp = np.load(
        os.path.join(
            asset_root,
            "mediapipe_landmark_embedding/mediapipe_landmark_embedding.npz",
        )
    )
    return {
        "static_lmk_faces_idx": _to_np(lmk["static_lmk_faces_idx"], np.int32),
        "static_lmk_bary_coords": _to_np(lmk["static_lmk_bary_coords"]),
        "dynamic_lmk_faces_idx": _to_np(lmk["dynamic_lmk_faces_idx"], np.int32),
        "dynamic_lmk_bary_coords": _to_np(lmk["dynamic_lmk_bary_coords"]),
        "full_lmk_faces_idx": _to_np(lmk["full_lmk_faces_idx"], np.int32)[0],
        "full_lmk_bary_coords": _to_np(lmk["full_lmk_bary_coords"])[0],
        "mp_lmk_faces_idx": _to_np(mp["lmk_face_idx"], np.int32),
        "mp_lmk_bary_coords": _to_np(mp["lmk_b_coords"]),
        "mp_landmark_indices": _to_np(mp["landmark_indices"], np.int32),
    }


def load_eyelids(asset_root: str) -> Dict[str, np.ndarray]:
    """Left/right eyelid-close blendshapes (5023,3). Reference FLAME.py:81-82."""
    return {
        "l_eyelid": _to_np(np.load(os.path.join(asset_root, "l_eyelid.npy"))),
        "r_eyelid": _to_np(np.load(os.path.join(asset_root, "r_eyelid.npy"))),
    }


def load_flame_masks(asset_root: str) -> Dict[str, np.ndarray]:
    """Vertex-region masks (FLAME_masks.pkl). Reference renderer.py:65-76."""
    with open(os.path.join(asset_root, "FLAME_masks/FLAME_masks.pkl"), "rb") as f:
        masks = pickle.load(f, encoding="latin1")
    return {k: _to_np(v, np.int64) for k, v in masks.items()}


def load_face_probabilities(asset_root: str, num_faces: int = 9976) -> np.ndarray:
    """Per-triangle sampling probability table.

    Reference: masking.py:11-38 (load_probabilities_per_FLAME_triangle).
    """
    tri = np.load(
        os.path.join(asset_root, "FLAME_masks/FLAME_masks_triangles.npy"),
        allow_pickle=True,
    ).item()
    probs = np.zeros(num_faces, np.float32)
    for area, w in AREA_WEIGHTS.items():
        probs[np.asarray(tri[area], np.int64)] = w
    return probs


def keep_vertices_and_update_faces(faces: np.ndarray, keep: np.ndarray):
    """Cut the mesh to a vertex subset, renumbering faces.

    Reference: renderer.py:11-47. Returns (new_faces, kept_vertex_indices);
    downstream code gathers vertices with `verts[:, kept]`.
    """
    keep = np.unique(np.asarray(keep, np.int64))
    max_v = int(faces.max()) + 1
    remap = np.full(max_v, -1, np.int64)
    remap[keep] = np.arange(len(keep))
    mapped = remap[faces]
    valid = (mapped != -1).all(axis=1)
    return mapped[valid].astype(np.int32), keep


def default_asset_root() -> Optional[str]:
    for cand in (
        os.environ.get("SMIRK_ASSETS"),
        os.path.join(os.path.dirname(__file__), "..", "assets"),
        "/root/reference/assets",
    ):
        if cand and os.path.isdir(cand):
            return os.path.abspath(cand)
    return None


def load_all(asset_root: Optional[str] = None, *, synthetic_seed: int = 0):
    """One-stop asset bundle for FlameModel / Renderer / masking.

    Falls back to synthetic deformation tensors when generic_model.pkl is
    absent (its presence requires accepting the FLAME license).
    """
    asset_root = asset_root or default_asset_root()
    if asset_root is None:
        raise FileNotFoundError("no asset root found; set SMIRK_ASSETS")

    verts, uvs, faces_obj, uvfaces = load_obj(
        os.path.join(asset_root, "head_template.obj")
    )
    pkl_path = os.path.join(asset_root, "FLAME2020", "generic_model.pkl")
    if os.path.isfile(pkl_path):
        flame = load_flame_pkl(pkl_path)
    else:
        flame = synthetic_deformation_tensors(
            len(verts), faces_obj, verts, seed=synthetic_seed
        )

    bundle = dict(flame)
    bundle.update(load_landmark_embeddings(asset_root))
    bundle.update(load_eyelids(asset_root))
    bundle["uvcoords"] = uvs
    bundle["uvfaces"] = uvfaces
    bundle["face_vertex_ids"] = load_flame_masks(asset_root)["face"]
    bundle["face_probabilities"] = load_face_probabilities(
        asset_root, bundle["faces"].shape[0]
    )
    bundle["is_synthetic_flame"] = not os.path.isfile(pkl_path)
    return bundle
