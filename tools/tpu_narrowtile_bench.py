"""One-shot TPU experiment: narrow raster tiles (8x32 vs 8x128 pixels).

The z-buffer kernels are VPU-compute-bound: every binned face is edge-tested
against all P pixels of its tile. Face bboxes are ~4px wide, so a 128-wide
tile tests ~97% wasted pixels. With 8x32 tiles the per-tile face count drops
~3.7x (the total binned pairs stay ~constant while P shrinks 4x), cutting
kernel compute ~3.7x at similar binning cost (4x the top_k rows, 1/3 the k).

Sweeps TILE_COLS in {128, 32} x capacity, measuring the fused inference
kernel and the v5 grad, and cross-checking coverage/pixel agreement
against the 128-wide baseline (overflow drops may differ slightly).

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
    cases = [(128, 384), (32, 160), (32, 128), (32, 224)]
    for tcols, cap in cases:
        R.TILE_COLS = tcols
        key = f"w{tcols}_c{cap}"

        def fused(fv, fnrm, _k=key):
            img, p2f, zb = R.rasterize_normals_fused(
                fv, fnrm, S, capacity=cap, interpret=False)
            return img, p2f

        def vloss(fv, fnrm, _k=key):
            vals, mask, p2f, _ = R.rasterize_planes_diff(fv, fnrm, S, cap, False)
            return jnp.sum(vals * vals) + jnp.sum(mask)

        try:
            # occupancy probe: does this capacity overflow?
            bins, counts = jax.jit(
                lambda fv, _k=key: R.bin_faces(fv, S, cap))(fv)
            maxc = int(jax.device_get(jnp.max(counts)))
            f_jit = jax.jit(fused)
            ms_f = timeit(f_jit, fv, fnrm)
            g_jit = jax.jit(jax.grad(vloss, argnums=(0, 1)))
            ms_g = timeit(g_jit, fv, fnrm)
            img, p2f = jax.block_until_ready(f_jit(fv, fnrm))
            if ref_img is None:
                ref_img, ref_p2f = img, p2f
                agree, pxdiff = 1.0, 0.0
            else:
                agree = float(jnp.mean((p2f == ref_p2f).astype(jnp.float32)))
                pxdiff = float(jnp.mean(jnp.abs(img - ref_img)))
            results[key] = {
                "fused_ms": round(ms_f, 2), "grad_ms": round(ms_g, 2),
                "max_count": maxc, "p2f_agree": round(agree, 5),
                "px_meandiff": round(pxdiff, 6),
            }
            log(f"{key}: fused {ms_f:.2f} ms grad {ms_g:.2f} ms "
                f"max_count {maxc} agree {agree:.4f} pxdiff {pxdiff:.2e}")
        except Exception as e:
            log(f"{key}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[key] = {"error": str(e)[:200]}
    R.TILE_COLS = 128

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
