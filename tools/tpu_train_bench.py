"""One-shot TPU experiment: train-step timing, fused-diff raster (v5) A/B.

Measures the full train step (batch 32, both paths, both parities) with
(a) the new fused plane-evaluation raster (rasterize_planes_diff) and
(b) the round-1 gather-based interpolation path, on the real chip.

Round-1 baseline: 331 ms/step (batch 32, fp32, cycle on).

All timings via block_until_ready on device values; the only D2H is one
scalar finiteness check at the very end (tunnel D2H can stall for minutes).
Run with Bash run_in_background; never two TPU processes at once.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B = 32

    bundle = dict(assets.load_all())
    # recenter the synthetic template's face region so the random-init cam
    # renders a real on-screen face (same correction as bench.py) — an
    # off-screen face would make the raster measure an empty scene
    vt = np.array(bundle["v_template"], np.float32)
    face_ids = np.asarray(bundle["face_vertex_ids"])
    center = vt[face_ids].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, 224, 224, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (B, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.ones((B,), bool),
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (B, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray(
            (rng.random((B, 224, 224, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((B, 112, 112, 3), np.float32),
    }
    key = jax.random.PRNGKey(0)

    def bench(label, system, state, iters=10):
        results = {}
        for parity in (0, 1):
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            log(f"{label} parity={parity} compile+first: {time.time()-t0:.1f}s")
            t0 = time.perf_counter()
            for _ in range(iters):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / iters * 1e3
            results[parity] = ms
            log(json.dumps({"metric": f"train_step_ms_{label}",
                            "parity": parity, "batch": B,
                            "value": round(ms, 1)}))
        return results, out

    cfg = Config()

    # --- A: new fused-diff raster (current code path) ---
    sys_new = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
    state = sys_new.init_state(jax.random.PRNGKey(0))
    res_new, out_new = bench("v5_fused", sys_new, state)

    # --- B: round-1 gather-interp path (patch the dispatcher) ---
    def rasterize_old(face_verts, attributes, image_size, capacity=512,
                      use_pallas=None):
        interpret = jax.default_backend() in ("cpu",)
        p2f, _, p2slot, bins = R.rasterize_coverage_pallas_v3_full(
            jax.lax.stop_gradient(face_verts), image_size, capacity,
            interpret=interpret,
        )
        vals, mask = R.interpolate_attributes_fast(
            face_verts, attributes, p2f, p2slot, bins,
            image_size, capacity, interpret,
        )
        return vals, mask, p2f

    orig = R.rasterize
    R.rasterize = rasterize_old
    try:
        sys_old = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
        res_old, _ = bench("r1_gather", sys_old, state)
    finally:
        R.rasterize = orig

    log(json.dumps({
        "summary": {
            "v5_ms": res_new, "r1_ms": res_old,
            "speedup_parity0": round(res_old[0] / res_new[0], 3),
            "speedup_parity1": round(res_old[1] / res_new[1], 3),
        }
    }))

    # single D2H at the very end: finiteness sanity
    t0 = time.time()
    lf = float(out_new[1]["loss_first_path"])
    log(f"loss_first_path={lf} (finite={np.isfinite(lf)}), D2H took "
        f"{time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
