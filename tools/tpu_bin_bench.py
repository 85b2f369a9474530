"""One-shot TPU experiment: hierarchical vs flat face binning A/B.

bin_faces top_k was 7.6 ms/batch64 (~28% of the 27.3 ms inference batch).
bin_faces_hier splits it: coarse top_k over all F faces but only
ceil(ty/4) band rows, then fine top_k over <=1024 depth-sorted candidates
per 8x128 tile. Outputs are bit-identical (tests), so this is purely a
timing question.

Measures, on realistic face-mesh geometry (B=64, F=3408, 224px, cap 384):
  1. bin_faces_flat alone
  2. bin_faces_hier alone
  3. fused inference render (bin + Pallas kernel) under each mode

All timings via block_until_ready; no D2H beyond tiny scalars at the end.
Run with Bash run_in_background; never two TPU processes at once.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, flush=True)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B, S = 64, 224

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
    cam = jnp.asarray(
        np.tile(np.array([7.0, 0.0, 0.0], np.float32), (B, 1))
    )

    @jax.jit
    def prep(verts, cam):
        tv = rend.project(verts, cam)
        sub_v = verts[:, rend._kept]
        sub_tv = jnp.concatenate(
            [tv[:, rend._kept][..., :2], tv[:, rend._kept][..., 2:] + Z_OFFSET],
            axis=-1,
        )
        normals = geometry.vertex_normals_gather(
            sub_v, rend.faces, rend._inc_face, rend._inc_corner
        )
        fn = geometry.face_vertices(normals, rend.faces)
        fv = geometry.face_vertices(sub_tv, rend.faces)
        return fv, fn

    fv, fnrm = jax.block_until_ready(prep(verts, cam))
    log("prep done")

    flat = jax.jit(lambda fv: R.bin_faces_flat(fv, S, cap))
    hier = jax.jit(lambda fv: R.bin_faces_hier(fv, S, cap))
    ms_flat = timeit(flat, fv)
    log(f"bin_faces_flat:  {ms_flat:.2f} ms/batch{B}")
    ms_hier = timeit(hier, fv)
    log(f"bin_faces_hier:  {ms_hier:.2f} ms/batch{B}")

    # bins must agree on-chip too
    bf, cf = jax.block_until_ready(flat(fv))
    bh, ch = jax.block_until_ready(hier(fv))
    agree = bool(jnp.all(bf == bh)) and bool(jnp.all(cf == ch))
    log(f"bins agree on-chip: {agree}  max_count={int(jnp.max(cf))}")

    def fused(mode):
        def f(fv, fnrm):
            R.set_bin_mode(mode)  # baked at trace time
            img, p2f, zb = R.rasterize_normals_fused(
                fv, fnrm, S, capacity=cap, interpret=False
            )
            return img, p2f

        return jax.jit(f)

    ms_rf_flat = timeit(fused(False), fv, fnrm)
    log(f"fused render (flat bins): {ms_rf_flat:.2f} ms/batch{B}")
    ms_rf_hier = timeit(fused(True), fv, fnrm)
    log(f"fused render (hier bins): {ms_rf_hier:.2f} ms/batch{B}")

    result = {
        "bin_flat_ms": round(ms_flat, 3),
        "bin_hier_ms": round(ms_hier, 3),
        "fused_flat_ms": round(ms_rf_flat, 3),
        "fused_hier_ms": round(ms_rf_hier, 3),
        "bins_agree": agree,
        "batch": B,
    }
    log("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
