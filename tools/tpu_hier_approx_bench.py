"""One-shot TPU experiment: hierarchical binning with approx_max_k stages.

Exact hier was a measured dead end (coarse exact top_k k=1024 hits a 42ms
slow path). approx_max_k may dodge it: coarse (B,7,3408)->1024 + fine
(B,7,4,2,1024)->384 could beat the flat (B,56,3408)->384 selection.
Baseline: flat approx 0.95 in-context fused = 15.24 ms/batch64.

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
    B, S, CAP, COMPACT = 64, 224, 384, 216
    results = {}

    def timeit(fn, *args, iters=32):
        jax.block_until_ready(fn(*args))
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

    verts = jnp.asarray(
        vt[None] + np.random.default_rng(0).normal(
            0, 1e-3, (B, len(vt), 3)).astype(np.float32))
    fv, fn = jax.block_until_ready(prep(verts, cam))
    log("prep done")

    def run(tag):
        R.rasterize_normals_fused.clear_cache()
        f = lambda a, b: R.rasterize_normals_fused(
            a, b, S, capacity=CAP, compact=COMPACT, bin_approx=0.95)
        t0 = time.time()
        img, p2f, _ = jax.block_until_ready(f(fv, fn))
        log(f"{tag} compile+first {time.time() - t0:.0f}s")
        ms = timeit(f, fv, fn)
        return ms, np.asarray(p2f), np.asarray(img)

    ms, p2f_ref, img_ref = run("flat_approx")
    results["flat_approx_ms"] = round(ms, 2)
    log(f"flat approx: {ms:.2f} ms")

    try:
        R.set_bin_mode(True, approx=None)
        # hier path reads approx from the bin_faces arg (0.95 via
        # bin_approx) — set_bin_mode(hier) only flips the dispatcher.
        ms, p2f, img = run("hier_approx")
        agree = float((p2f == p2f_ref).mean())
        pxdiff = float(np.abs(img - img_ref).mean())
        results["hier_approx"] = {
            "ms": round(ms, 2), "p2f_agree": round(agree, 5),
            "px_meandiff": f"{pxdiff:.2e}",
        }
        log(f"hier approx: {ms:.2f} ms agree {agree:.5f} "
            f"pxdiff {pxdiff:.2e}")
    except Exception as e:  # noqa: BLE001
        results["hier_approx"] = {"error": str(e)[:300]}
        log(f"hier approx FAILED {type(e).__name__}: {str(e)[:300]}")
    finally:
        R.set_bin_mode(False, None)

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
