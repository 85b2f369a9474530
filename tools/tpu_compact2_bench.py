"""One-shot TPU experiment: v7s compact raster (Pallas compaction kernel +
scratch-resident records via manual DMA) vs v4.

Fixes from tpu_compact_bench.py round 1:
  - index construction moved into a Pallas copy kernel (XLA per-row index
    gathers cost ~20ms);
  - compact records DMA'd once per image into persistent VMEM scratch
    (g-invariant BlockSpec re-fetched every grid step, +6ms/64 chunks);
  - production v4 path reverted to clamp+where gather (kill-row concat
    regressed the fused program 24.15 -> 29.55ms).

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

    def timeit_multi(fn, argsets, iters=32):
        for a in argsets:
            jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*argsets[i % len(argsets)])
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

    scenes = []
    for i in range(4):
        verts = jnp.asarray(
            vt[None] + np.random.default_rng(i).normal(
                0, 1e-3, (B, len(vt), 3)).astype(np.float32))
        scenes.append(jax.block_until_ready(prep(verts, cam)))
    log("prep done")

    results = {}

    def fused(fv, fnrm, compact=None):
        return R.rasterize_normals_fused(
            fv, fnrm, S, capacity=CAP, interpret=False, compact=compact)

    f4 = jax.jit(lambda a, b: fused(a, b))
    ms = timeit_multi(f4, [(a, b) for a, b in scenes])
    results["v4_full_reverted"] = round(ms, 2)
    log(f"v4_full (reverted gather): {ms:.2f} ms [want ~24.3]")
    ref = jax.block_until_ready(f4(*scenes[0]))

    for cm in (192, 256):
        key = f"v7s_cmax{cm}"
        try:
            f7 = jax.jit(lambda a, b, _c=cm: fused(a, b, compact=_c))
            t0 = time.perf_counter()
            out = jax.block_until_ready(f7(*scenes[0]))
            log(f"{key}: compile+first {time.perf_counter() - t0:.0f}s")
            ms = timeit_multi(f7, [(a, b) for a, b in scenes])
            agree = float(jnp.mean((out[1] == ref[1]).astype(jnp.float32)))
            pxdiff = float(jnp.mean(jnp.abs(out[0] - ref[0])))
            results[key] = {"ms": round(ms, 2), "p2f_agree": round(agree, 6),
                            "px_meandiff": round(pxdiff, 8)}
            log(f"{key}: {ms:.2f} ms agree {agree:.5f} pxdiff {pxdiff:.2e}")
        except Exception as e:
            log(f"{key}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[key] = {"error": str(e)[:200]}

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
