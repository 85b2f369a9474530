"""One-shot TPU experiment: approx_max_k binning vs exact top_k.

The z-buffer kernel needs only MEMBERSHIP of each tile's nearest <=cap
faces (order just prioritizes overflow drops), so the TPU-native
approximate top-k is admissible. Measures the full fused raster
(in-context; standalone op timings lie on this tunnel) + quality
(pix_to_face agreement, px diff) at recall 0.95/0.99 vs exact.

Baseline (exact, compact 216): expect ~16.3 ms/batch64.

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
            a, b, S, capacity=CAP, compact=COMPACT)
        t0 = time.time()
        img, p2f, zb = jax.block_until_ready(f(fv, fn))
        log(f"{tag} compile+first {time.time() - t0:.0f}s")
        ms = timeit(f, fv, fn)
        return ms, np.asarray(p2f), np.asarray(img)

    ms, p2f_ref, img_ref = run("exact")
    results["exact_ms"] = round(ms, 2)
    log(f"exact: {ms:.2f} ms")

    for recall in (0.95, 0.99):
        tag = f"approx_{recall}"
        try:
            R.set_bin_mode(False, approx=recall)
            ms, p2f, img = run(tag)
            agree = float((p2f == p2f_ref).mean())
            cov_ref = (p2f_ref >= 0).mean()
            cov = (p2f >= 0).mean()
            pxdiff = float(np.abs(img - img_ref).mean())
            results[tag] = {
                "ms": round(ms, 2), "p2f_agree": round(agree, 5),
                "coverage": round(float(cov), 5),
                "coverage_ref": round(float(cov_ref), 5),
                "px_meandiff": f"{pxdiff:.2e}",
            }
            log(f"{tag}: {ms:.2f} ms agree {agree:.5f} "
                f"cov {cov:.5f}/{cov_ref:.5f} pxdiff {pxdiff:.2e}")
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:200]}
            log(f"{tag} FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            R.set_bin_mode(False, None)

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
