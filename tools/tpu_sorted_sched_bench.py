"""One-shot TPU experiment: fused-raster cost decomposition + count-sorted
tile scheduling (v6tl kernel: merged loop over tile-local records).

Questions:
  1. What is the fused path's fixed floor (empty scene: grid steps + DMA +
     binning + record gather, zero chunk iterations)?
  2. How much is binning alone / the kernel alone?
  3. Does count-sorted scheduling (homogeneous TPS groups; removes the
     merged loop's max-count inflation) beat v4's per-tile loops?

All timed jits cycle 4 perturbed inputs (the remote runtime dedupes
repeated identical executes — isolated micro-benches lie otherwise).

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
    rng = np.random.default_rng(0)
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

    # 4 perturbed scenes (same coverage statistics, different bits)
    scenes = []
    for i in range(4):
        verts = jnp.asarray(
            vt[None] + np.random.default_rng(i).normal(
                0, 1e-3, (B, len(vt), 3)).astype(np.float32))
        scenes.append(jax.block_until_ready(prep(verts, cam)))
    fv0, fn0 = scenes[0]
    # empty scene: everything off-screen to the right
    fv_empty = fv0 + jnp.asarray([3.0, 0.0, 0.0])
    log("prep done")

    results = {}

    def fused(fv, fnrm, merged=False, tps=None, sort=False):
        return R.rasterize_normals_fused(
            fv, fnrm, S, capacity=CAP, interpret=False,
            merged=merged, tps=tps, sort_tiles=sort)

    # --- baseline v4 (cached program) + empty-scene floor
    f4 = jax.jit(lambda a, b: fused(a, b))
    ms = timeit_multi(f4, [(a, b) for a, b in scenes])
    results["v4_full"] = round(ms, 2)
    log(f"v4_full: {ms:.2f} ms")
    ms = timeit_multi(f4, [(fv_empty, fn0)])
    results["v4_empty_floor"] = round(ms, 2)
    log(f"v4_empty_floor: {ms:.2f} ms")

    # --- binning alone
    bin_jit = jax.jit(lambda f: R.bin_faces(f, S, CAP))
    ms = timeit_multi(bin_jit, [(a,) for a, _ in scenes])
    results["binning_only"] = round(ms, 2)
    log(f"binning_only: {ms:.2f} ms")

    # --- sorted schedule (v6tl) at tps 8/16
    ref = jax.block_until_ready(f4(fv0, fn0))
    for tps in (8, 16):
        key = f"v6tl_sorted_tps{tps}"
        try:
            fs = jax.jit(lambda a, b, _t=tps: fused(a, b, tps=_t, sort=True))
            t0 = time.perf_counter()
            out = jax.block_until_ready(fs(fv0, fn0))
            log(f"{key}: compile+first {time.perf_counter() - t0:.0f}s")
            ms = timeit_multi(fs, [(a, b) for a, b in scenes])
            agree = float(jnp.mean((out[1] == ref[1]).astype(jnp.float32)))
            pxdiff = float(jnp.mean(jnp.abs(out[0] - ref[0])))
            results[key] = {"ms": round(ms, 2), "p2f_agree": round(agree, 5),
                            "px_meandiff": round(pxdiff, 7)}
            log(f"{key}: {ms:.2f} ms agree {agree:.4f} pxdiff {pxdiff:.2e}")
        except Exception as e:
            log(f"{key}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[key] = {"error": str(e)[:200]}

    # --- empty-scene floor for the sorted schedule (all counts 0)
    try:
        fs8 = jax.jit(lambda a, b: fused(a, b, tps=8, sort=True))
        ms = timeit_multi(fs8, [(fv_empty, fn0)])
        results["v6tl_sorted_tps8_empty_floor"] = round(ms, 2)
        log(f"v6tl_sorted_tps8_empty_floor: {ms:.2f} ms")
    except Exception as e:
        log(f"sorted empty floor FAILED: {str(e)[:200]}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
