"""Price the armed approx-binning miss detector on the FUSED INFERENCE path
(VERDICT r4 item 3 / round-5 queue).

The training path's differentiable raster has carried the detector by
default since round 4 (measured free); the fused inference raster kept it
opt-in because latency is the product there and no gradients are at stake.
This measures the bench headline program (encode+FLAME+fused render, batch
64, fp32) with `bin_miss_check` OFF (= the resident bench program) and ON
(one novel inference-scale program, ~0.5 worker slot), so the serving
default can be decided on a number.

Usage: python tools/tpu_infer_misscheck_bench.py   (real TPU, one process)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smirk_tpu import assets  # noqa: E402
from smirk_tpu.config import Config  # noqa: E402
from smirk_tpu.train import SmirkSystem  # noqa: E402

BATCH = 64
ITERS = 20


def measure(system, enc_vars, cam_fix, img):
    @jax.jit
    def forward(img):
        enc_out = system.encoder.apply(enc_vars, img, train=False)
        flame_out = system.flame(enc_out)
        rend = system.renderer(
            flame_out["vertices"], enc_out["cam"] + cam_fix, inference=True
        )
        return rend["rendered_img"], rend["rendered_mask"], rend.get(
            "raster_overflow")

    out = forward(img)
    jax.block_until_ready(out)
    assert float(out[1].mean()) > 0.05, "empty scene"
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    overflow = out[2]
    return BATCH * ITERS / dt, (
        None if overflow is None else int(np.asarray(overflow).max()))


def main():
    cfg = Config()
    bundle = assets.load_all()
    img = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 3), np.float32))

    from smirk_tpu.render.renderer import Renderer

    results = {}
    for armed in (False, True):
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        system.renderer = Renderer(
            bundle, render_full_head=cfg.render.full_head,
            image_size=cfg.image_size, use_pallas=True,
            bin_miss_check=armed)
        state = system.init_state(jax.random.PRNGKey(0))
        face_c = np.asarray(bundle["v_template"])[
            np.asarray(system.renderer.kept_vertices)].mean(0)
        cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])
        fps, overflow = measure(system, state.encoder, cam_fix, img)
        key = "armed" if armed else "baseline"
        results[f"{key}_fps"] = round(fps, 1)
        results[f"{key}_ms_batch"] = round(BATCH / fps * 1e3, 2)
        if overflow is not None:
            results[f"{key}_overflow_max"] = overflow
        print(json.dumps(results), flush=True)

    results["armed_cost_pct"] = round(
        100.0 * (results["baseline_fps"] / results["armed_fps"] - 1.0), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
