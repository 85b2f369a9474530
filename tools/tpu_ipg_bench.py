"""One-shot TPU measurement: multi-image-per-grid-step compact kernels.

IPG (images per grid step) amortizes the ~45us Mosaic per-step overhead:
copy kernel ipg=8, z-buffer kernels ipg=2 at production shapes (VMEM
bound). Prior (ipg=1): fused 15.2 ms/batch64 (approx bin), diff fwd+bwd
33.3 @216. Checks bit-equality vs per-image grids via the padded path.

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

    # fused with IPG (+ approx binning as in production)
    f = jax.jit(lambda a, b: R.rasterize_normals_fused(
        a, b, S, capacity=CAP, compact=COMPACT, bin_approx=0.95))
    t0 = time.time()
    img, p2f, _ = jax.block_until_ready(f(fv, fn))
    log(f"fused ipg compile+first {time.time() - t0:.0f}s")
    ms = timeit(f, fv, fn)
    results["fused_ipg_ms"] = round(ms, 2)
    log(f"fused ipg: {ms:.2f} ms")

    # correctness vs padded kernel (exact binning both sides)
    fe = jax.jit(lambda a, b: R.rasterize_normals_fused(
        a, b, S, capacity=CAP, compact=COMPACT))
    fp = jax.jit(lambda a, b: R.rasterize_normals_fused(
        a, b, S, capacity=CAP))
    ie, pe, _ = jax.block_until_ready(fe(fv, fn))
    ip, pp, _ = jax.block_until_ready(fp(fv, fn))
    agree = float((np.asarray(pe) == np.asarray(pp)).mean())
    pxdiff = float(np.abs(np.asarray(ie) - np.asarray(ip)).mean())
    results["p2f_agree_vs_padded"] = round(agree, 6)
    results["px_meandiff_vs_padded"] = f"{pxdiff:.2e}"
    log(f"ipg vs padded: agree {agree:.6f} pxdiff {pxdiff:.2e}")

    # diff raster fwd+bwd with IPG
    def loss(a, b):
        v, m, _, _ = R.rasterize_planes_diff(a, b, S, CAP, False, COMPACT)
        return jnp.sum(jnp.sin(v) * v * m)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    jax.block_until_ready(g(fv, fn))
    log(f"diff grad compile+first {time.time() - t0:.0f}s")
    ms = timeit(g, fv, fn, iters=16)
    results["diff_fwdbwd_ipg_ms"] = round(ms, 2)
    log(f"diff fwd+bwd ipg: {ms:.2f} ms")

    # gradient agreement vs padded
    def loss_p(a, b):
        v, m, _, _ = R.rasterize_planes_diff(a, b, S, CAP, False, None)
        return jnp.sum(jnp.sin(v) * v * m)
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    ga = jax.block_until_ready(g(fv, fn))
    gb = jax.block_until_ready(gp(fv, fn))
    gdiff = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ga, gb))
    results["grad_maxdiff_vs_padded"] = gdiff
    log(f"grad maxdiff vs padded: {gdiff:.2e}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
