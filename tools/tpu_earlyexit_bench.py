"""One-shot TPU experiment: early-exit z-buffer kernels A/B + backward split.

The TPS sweep proved the raster kernels are VPU-compute-bound (24.3ms fused
at any tiles-per-step): with saturated 384-face bins every tile evaluates
~12 chunks of 32 faces. Early exit uses the depth-sorted bin order: once all
pixels are covered and max(winner z) <= the next chunk's min vertex z, the
remaining chunks cannot win — expected 2-4 chunks visited instead of 12.

Measures (batch 64, 224px, capacity 384, same scene as tpu_tps_bench):
  1. fused inference render (v4 + early exit)   [prev: 24.3 ms]
  2. v5 differentiable forward only             [new datum]
  3. v5 forward+backward via jax.grad           [prev: 47.8 ms]
  4. segment_reduce_tiles standalone            [backward split]
  5. the slot->face scatter fold standalone     [backward split]

All timings via block_until_ready; no bulk D2H. Run with Bash
run_in_background; never two TPU processes at once.
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
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B, S = 64, 224

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    face_ids = np.asarray(bundle["face_vertex_ids"])
    center = vt[face_ids].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    rend = Renderer(bundle, image_size=S, use_pallas=True)
    cap = rend.bin_capacity
    log(f"F={rend.faces.shape[0]} capacity={cap}")

    rng = np.random.default_rng(0)
    verts = jnp.asarray(
        vt[None] + rng.normal(0, 1e-3, (B, len(vt), 3)).astype(np.float32)
    )
    cam = jnp.asarray(np.tile(np.array([7.0, 0.0, 0.0], np.float32), (B, 1)))

    @jax.jit
    def prep(verts, cam):
        tv = rend.project(verts, cam)
        sub_v = verts[:, rend._kept]
        sub_tv = jnp.concatenate(
            [tv[:, rend._kept][..., :2],
             tv[:, rend._kept][..., 2:] + Z_OFFSET], axis=-1)
        normals = geometry.vertex_normals_gather(
            sub_v, rend.faces, rend._inc_face, rend._inc_corner)
        fn = geometry.face_vertices(normals, rend.faces)
        fv = geometry.face_vertices(sub_tv, rend.faces)
        return fv, fn

    fv, fnrm = jax.block_until_ready(prep(verts, cam))
    log("prep done")
    results = {}

    fused = jax.jit(lambda fv, fnrm: R.rasterize_normals_fused(
        fv, fnrm, S, capacity=cap, interpret=False)[:2])
    results["fused_ms"] = round(timeit(fused, fv, fnrm), 2)
    log(f"fused (early-exit): {results['fused_ms']} ms  [prev 24.3]")

    v5fwd = jax.jit(lambda fv, fnrm: R.rasterize_planes_diff(
        fv, fnrm, S, cap, False))
    results["v5_fwd_ms"] = round(timeit(v5fwd, fv, fnrm), 2)
    log(f"v5 forward: {results['v5_fwd_ms']} ms")

    def vloss(fv, fnrm):
        vals, mask, p2f, _ = R.rasterize_planes_diff(fv, fnrm, S, cap, False)
        return jnp.sum(vals * vals) + jnp.sum(mask)

    v5grad = jax.jit(jax.grad(vloss, argnums=(0, 1)))
    results["v5_grad_ms"] = round(timeit(v5grad, fv, fnrm), 2)
    log(f"v5 grad: {results['v5_grad_ms']} ms  [prev 47.8]")

    # --- backward split: segment reduce + scatter fold on realistic data ---
    vals, p2f, zbuf, p2slot, bins = jax.block_until_ready(
        jax.jit(lambda fv, a: R._v5_impl(fv, a, S, cap, False))(fv, fnrm))
    D = 3
    g_vals = vals  # arbitrary realistic payload
    xs, ys = R._pixel_centers(S)
    payload = jnp.concatenate(
        [g_vals * xs[None, ..., None], g_vals * ys[None, ..., None], g_vals],
        axis=-1)
    gpx_t = jax.block_until_ready(R.image_to_tiles(payload, S))
    slots_t = jax.block_until_ready(R.image_to_tiles(p2slot, S))

    segred = jax.jit(lambda s, g: R.segment_reduce_tiles(s, g, cap, False))
    results["segreduce_ms"] = round(timeit(segred, slots_t, gpx_t), 2)
    log(f"segment_reduce: {results['segreduce_ms']} ms")

    per_slot = jax.block_until_ready(segred(slots_t, gpx_t))
    F = fv.shape[1]
    Tp = per_slot.shape[1]

    @jax.jit
    def fold(per_slot, bins):
        ids = jnp.where(bins >= 0, bins, F).reshape(B, Tp * cap)
        flat = per_slot.reshape(B, Tp * cap, 3 * D)
        b_idx = jnp.arange(B)[:, None]
        return jnp.zeros((B, F, 3 * D), flat.dtype).at[b_idx, ids].add(
            flat, mode="drop")

    results["scatter_fold_ms"] = round(timeit(fold, per_slot, bins), 2)
    log(f"scatter fold: {results['scatter_fold_ms']} ms")

    # sanity: fused still agrees with v5 coverage
    img, p2f_fused = jax.block_until_ready(fused(fv, fnrm))
    results["p2f_agree"] = bool(jnp.all(p2f_fused == p2f))
    log(f"fused/v5 p2f agree: {results['p2f_agree']}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
