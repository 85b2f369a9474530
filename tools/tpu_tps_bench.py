"""One-shot TPU experiment: tiles-per-grid-step (TPS) sweep for the raster
kernels.

At TPS=8 the v4/v5 kernels run B*ceil(Tp/8) grid steps (448 for batch64 at
224px); with ~45us Mosaic per-step overhead that is ~20ms of launch cost —
more than the kernels' VPU work. Fatter steps amortize it; VMEM bounds TPS
at roughly 24 for capacity 384 (records block TPS x cap x 128 lanes x 4B,
double-buffered).

Measures, per TPS in {8, 16, 24}:
  1. fused inference render (v4)
  2. fused differentiable raster (v5) forward+backward via jax.grad
with output-equality checks against TPS=8.

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
    ref_img = ref_g = None
    for tps in (8, 16, 24):
        R._TPS_OVERRIDE = tps

        # closure arg makes each tps a distinct jit cache entry
        def fused(fv, fnrm, _tps=tps):
            img, p2f, zb = R.rasterize_normals_fused(
                fv, fnrm, S, capacity=cap, interpret=False)
            return img, p2f

        def vloss(fv, fnrm, _tps=tps):
            vals, mask, p2f, _ = R.rasterize_planes_diff(
                fv, fnrm, S, cap, False)
            return jnp.sum(vals * vals) + jnp.sum(mask)

        try:
            f_jit = jax.jit(fused)
            ms_f = timeit(f_jit, fv, fnrm)
            g_jit = jax.jit(jax.grad(vloss, argnums=(0, 1)))
            ms_g = timeit(g_jit, fv, fnrm)
            img, p2f = jax.block_until_ready(f_jit(fv, fnrm))
            g = jax.block_until_ready(g_jit(fv, fnrm))
            if tps == 8:
                ref_img, ref_g = (img, p2f), g
                ok_f = ok_g = True
            else:
                ok_f = bool(jnp.all(ref_img[1] == p2f)) and bool(
                    jnp.max(jnp.abs(ref_img[0] - img)) < 1e-5)
                ok_g = all(
                    bool(jnp.max(jnp.abs(a - b)) < 1e-3)
                    for a, b in zip(ref_g, g))
            log(f"TPS={tps}: fused {ms_f:.2f} ms, grad(v5) {ms_g:.2f} ms, "
                f"match fused={ok_f} grad={ok_g}")
            results[tps] = {
                "fused_ms": round(ms_f, 2), "grad_ms": round(ms_g, 2),
                "ok": ok_f and ok_g,
            }
        except Exception as e:  # VMEM overflow etc.
            log(f"TPS={tps}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[tps] = {"error": str(e)[:200]}
    R._TPS_OVERRIDE = None

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
