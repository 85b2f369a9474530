"""Compact-raster auto-budget headroom (VERDICT r2 item 8).

The renderer's auto chunk budget (1.5*F/32 + Tp, renderer.py) was tuned on
the synthetic-FLAME fallback geometry with ~1.4x measured headroom over
full-coverage occupancy. These tests re-validate the claim on every run —
and the real-FLAME variant arms itself automatically the day the
license-gated `generic_model.pkl` lands (it skips until then), so the
headroom claim can never silently rot when assets arrive.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from smirk_tpu import assets
from smirk_tpu.flame import FlameModel
from smirk_tpu.render.renderer import Renderer


def _full_coverage_occupancy(bundle, image_size):
    flame = FlameModel(bundle)
    B = 1
    params = {
        "shape_params": jnp.zeros((B, 300)),
        "expression_params": jnp.zeros((B, 50)),
        "pose_params": jnp.zeros((B, 3)),
        "jaw_params": jnp.zeros((B, 3)),
        "eyelid_params": jnp.zeros((B, 2)),
    }
    out = flame(params)
    rend = Renderer(bundle, image_size=image_size, use_pallas=False)
    # center the face region and scale to full coverage (bench.py's cam fix)
    face_v = np.asarray(out["vertices"])[:, rend.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.asarray([[7.0, -c[0], -c[1]]])
    return rend.measure_compact_occupancy(out["vertices"], cam)


@pytest.mark.parametrize("image_size", [224, 64])
def test_auto_budget_headroom_synthetic(image_size):
    bundle = assets.load_all()
    rep = _full_coverage_occupancy(bundle, image_size)
    assert rep["occupied_chunks"] > 0
    # overflow corrupts training renders silently-but-logged; demand the
    # documented margin, not just fit (PARITY.md: 1.4x at 224px and 64px)
    assert rep["headroom"] >= 1.2, rep


@pytest.mark.parametrize("image_size", [224, 64])
def test_auto_budget_headroom_real_flame(image_size):
    bundle = assets.load_all()
    if bundle["is_synthetic_flame"]:
        pytest.skip("license-gated FLAME2020 absent; this test arms itself "
                    "when generic_model.pkl is installed")
    rep = _full_coverage_occupancy(bundle, image_size)
    print(f"real-FLAME occupancy @{image_size}px: {rep}")
    assert rep["headroom"] >= 1.0, rep
