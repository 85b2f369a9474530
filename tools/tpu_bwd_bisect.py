"""One-shot TPU experiment: bisect the v5 raster backward.

Pre-early-exit numbers: v5 fwd ~24.3ms, grad 47.8ms => backward ~23.5ms.
Isolated micro-benches of the pieces (segred 7.6ms, fold 19.5ms vs 0.02ms
depending on harness) disagree, so measure the backward CUMULATIVELY in
context, adding one stage at a time:

  A: v5 forward (post-revert check, expect ~24.3)
  B: payload build + image_to_tiles + transposes + segment_reduce
  C: B + fold_slots_to_faces (scatter mode)
  C2: B + fold (cumsum mode)
  D: C + attr_planes vjp (= full manual backward)
  E: jax.grad end-to-end (expect ~47.8 if nothing changed)

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
    D = 3
    F = fv.shape[1]

    # A: forward
    v5fwd = jax.jit(lambda fv, a: R._v5_impl(fv, a, S, cap, False))
    results["A_fwd_ms"] = round(timeit(v5fwd, fv, fnrm), 2)
    log(f"A fwd: {results['A_fwd_ms']} ms [expect ~24.3]")

    vals, p2f, zbuf, p2slot, bins = jax.block_until_ready(v5fwd(fv, fnrm))
    g_vals = vals  # realistic cotangent

    def stage_B(g_vals, p2slot):
        xs, ys = R._pixel_centers(S)
        payload = jnp.concatenate(
            [g_vals * xs[None, ..., None], g_vals * ys[None, ..., None],
             g_vals], axis=-1)
        gpx_t = R.image_to_tiles(payload, S)
        slots_t = R.image_to_tiles(p2slot, S)
        return R.segment_reduce_tiles(slots_t, gpx_t, cap, False)

    jB = jax.jit(stage_B)
    results["B_segred_ms"] = round(timeit(jB, g_vals, p2slot), 2)
    log(f"B payload+tiles+segred: {results['B_segred_ms']} ms")

    for mode in ("scatter", "matmul"):
        def stage_C(g_vals, p2slot, bins, _m=mode):
            R.set_fold_mode(_m)
            per_slot = stage_B(g_vals, p2slot)
            return R.fold_slots_to_faces(per_slot, bins, F)

        jC = jax.jit(stage_C)
        ms = timeit(jC, g_vals, p2slot, bins)
        results[f"C_fold_{mode}_ms"] = round(ms, 2)
        log(f"C (+fold {mode}): {ms:.2f} ms")

    def stage_D(g_vals, p2slot, bins, fv, fnrm):
        R.set_fold_mode("matmul")
        plane_ct = stage_C_final(g_vals, p2slot, bins)
        _, vjp = jax.vjp(R.attr_planes, fv, fnrm)
        return vjp(plane_ct)

    def stage_C_final(g_vals, p2slot, bins):
        per_slot = stage_B(g_vals, p2slot)
        return R.fold_slots_to_faces(per_slot, bins, F)

    jD = jax.jit(stage_D)
    results["D_full_bwd_ms"] = round(timeit(jD, g_vals, p2slot, bins, fv, fnrm), 2)
    log(f"D full manual bwd: {results['D_full_bwd_ms']} ms")

    for mode in ("matmul", "scatter"):
        def vloss(fv, fnrm, _m=mode):
            R.set_fold_mode(_m)
            vals, mask, p2f, _ = R.rasterize_planes_diff(fv, fnrm, S, cap, False)
            return jnp.sum(vals * vals) + jnp.sum(mask)

        jE = jax.jit(jax.grad(vloss, argnums=(0, 1)))
        ms = timeit(jE, fv, fnrm)
        results[f"E_grad_{mode}_ms"] = round(ms, 2)
        log(f"E grad e2e ({mode} fold): {ms:.2f} ms [scatter baseline 47.8]")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
