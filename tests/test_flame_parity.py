"""End-to-end FLAME parity vs the reference implementation.

The fixture was produced by running the REFERENCE FLAME.py (torch) on a
synthetic generic_model.pkl built from the exact tensors our framework falls
back to — so this exercises identical code paths to the licensed model:
shapedir slicing (300+50 of 400), LBS, eyelid offsets, parameter padding,
static + pose-dynamic FAN landmarks and mediapipe landmarks, and the
zero_expression / zero_pose debug modes. Gate mirror: vertex RMSE < 1e-3
(we assert far tighter).
"""
import os

import numpy as np
import jax.numpy as jnp

from smirk_tpu import assets
from smirk_tpu.flame import FlameModel

FIX = np.load(
    os.path.join(os.path.dirname(__file__), "fixtures",
                 "flame_parity_golden.npz")
)


def test_flame_forward_matches_reference():
    bundle = assets.load_all(synthetic_seed=int(FIX["synthetic_seed"]))
    flame = FlameModel(bundle, n_shape=300, n_exp=50)
    params = {
        k: jnp.asarray(FIX[k])
        for k in ("shape_params", "expression_params", "pose_params",
                  "jaw_params", "eyelid_params")
    }
    out = flame(params)

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - b) ** 2)))

    assert rmse(out["vertices"], FIX["vertices"]) < 1e-5
    assert rmse(out["landmarks_fan"], FIX["landmarks_fan"]) < 1e-5
    assert rmse(out["landmarks_fan_3d"], FIX["landmarks_fan_3d"]) < 1e-5
    assert rmse(out["landmarks_mp"], FIX["landmarks_mp"]) < 1e-5

    out_ze = flame(params, zero_expression=True)
    assert rmse(out_ze["vertices"], FIX["vertices_zero_expression"]) < 1e-5
    out_zp = flame(params, zero_pose=True)
    assert rmse(out_zp["vertices"], FIX["vertices_zero_pose"]) < 1e-5
