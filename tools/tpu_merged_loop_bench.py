"""One-shot TPU experiment: v6 merged-loop fused raster kernel vs v4.

Hypothesis: the fused kernel's 24.3ms is NOT VPU math (the binned work is
~150 CHx1024 chunk iterations/image ~= 3ms of flops) but per-tile scalar
overhead — v4 unrolls TPS separate fori_loops per grid step, i.e. 3584
loop setups for batch64@224px. v6 runs ONE fori_loop per grid step over
(TPS, CH, P) blocks; tiles past their own count process kill records.
The loop bound is the step's max count, so grouping cost is bounded by
count correlation between spatially-adjacent tiles.

Measures v4 baseline, v6 at TPS 8/16/24, cross-checks p2f agreement.

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
    B, S, CAP = 64, 224, 384

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
    ref_img = ref_p2f = None

    cases = [("v4_tps8", False, None), ("v6_tps8", True, 8),
             ("v6_tps16", True, 16), ("v6_tps24", True, 24)]
    for key, merged, tps in cases:
        def fused(fv, fnrm, _m=merged, _t=tps):
            img, p2f, zb = R.rasterize_normals_fused(
                fv, fnrm, S, capacity=CAP, interpret=False,
                merged=_m, tps=_t)
            return img, p2f

        try:
            f_jit = jax.jit(fused)
            t0 = time.perf_counter()
            img, p2f = jax.block_until_ready(f_jit(fv, fnrm))
            log(f"{key}: compile+first {time.perf_counter() - t0:.0f}s")
            ms = timeit(f_jit, fv, fnrm)
            if ref_img is None:
                ref_img, ref_p2f = img, p2f
                agree, pxdiff = 1.0, 0.0
            else:
                agree = float(jnp.mean((p2f == ref_p2f).astype(jnp.float32)))
                pxdiff = float(jnp.mean(jnp.abs(img - ref_img)))
            results[key] = {"ms": round(ms, 2), "p2f_agree": round(agree, 5),
                            "px_meandiff": round(pxdiff, 7)}
            log(f"{key}: {ms:.2f} ms agree {agree:.4f} pxdiff {pxdiff:.2e}")
        except Exception as e:
            log(f"{key}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[key] = {"error": str(e)[:200]}

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
