"""One-shot TPU experiment: decompose the fused raster's 19.8ms FIXED floor.

tpu_sorted_sched_bench.py measured: full 24.15ms, empty-scene 19.8ms,
binning alone 7.0ms. So the z-buffer math is ~4.4ms and ~12.8ms of floor
is unaccounted: record gather/materialization (176MB recs), kernel
launch+DMA (448 grid steps), output to_image transposes (5x14MB).

Stages (each timed with 4 perturbed inputs to dodge remote-runtime
dedup of identical executes):
  A prep_recs  = bin + gather + kill-select (returns counts, recs)
  B kernel     = pallas v4 on prebuilt (counts, recs), raw tile outputs
  C kernel+img = B + to_image reassembly
  D empty-B    = kernel on all-empty bins (launch+DMA floor)

Run with Bash run_in_background; never two TPU processes at once.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smirk_tpu import assets
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B, S, CAP = 64, 224, 384
    H = W = S
    ty = -(-H // R.TILE_ROWS)
    tx = -(-W // R.TILE_COLS)
    T = ty * tx

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

    F = scenes[0][0].shape[1]
    results = {}

    # --- A: prep_recs (mirrors rasterize_normals_fused up to the kernel)
    def prep_recs(fv, fnrm):
        bins, counts = R.bin_faces(fv, S, CAP)
        tps = R._pick_tps(bins.shape[1], CAP)
        bins, counts = R._pad_tiles_to(bins, counts, tps)
        Tp = bins.shape[1]
        records = R.face_records_shaded(fv, fnrm)
        records = records.at[..., 12].set(
            jnp.arange(F, dtype=fv.dtype)[None])
        recs = jax.vmap(lambda r, b: r[jnp.maximum(b, 0)])(
            records, bins.reshape(B, -1)
        ).reshape(B, Tp, CAP, R.RECF_LANES)
        kill = jnp.zeros((R.RECF_LANES,)).at[2].set(-1.0).at[12].set(-1.0)
        recs = jnp.where((bins < 0)[..., None], kill, recs)
        return counts.reshape(B * Tp, 1), recs

    pr_jit = jax.jit(prep_recs)
    ms = timeit_multi(pr_jit, [(a, b) for a, b in scenes])
    results["A_prep_recs"] = round(ms, 2)
    log(f"A prep_recs: {ms:.2f} ms")

    built = [jax.block_until_ready(pr_jit(a, b)) for a, b in scenes]
    counts0, recs0 = built[0]
    Tp = recs0.shape[1]
    tps = R._pick_tps(Tp, CAP)
    P = R.TILE_ROWS * R.TILE_COLS

    # --- B: kernel only (raw tile-major outputs)
    def kernel_only(counts, recs):
        return pl.pallas_call(
            functools.partial(R._raster_kernel_v4, H=H, W=W, TX=tx, TPS=tps),
            grid=(B, Tp // tps),
            in_specs=[
                pl.BlockSpec(
                    (tps, 1),
                    lambda b, g, Tp=Tp, tps=tps: ((b * Tp + g * tps) // tps, 0),
                    memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tps, CAP, R.RECF_LANES),
                             lambda b, g: (b, g, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, tps, P), lambda b, g: (b, g, 0))] * 5,
            out_shape=[jax.ShapeDtypeStruct((B, Tp, P), jnp.int32)]
            + [jax.ShapeDtypeStruct((B, Tp, P), jnp.float32)] * 4,
        )(counts, recs)

    k_jit = jax.jit(kernel_only)
    ms = timeit_multi(k_jit, built)
    results["B_kernel_only"] = round(ms, 2)
    log(f"B kernel_only: {ms:.2f} ms")

    # --- C: kernel + to_image
    def kernel_img(counts, recs):
        outs = kernel_only(counts, recs)

        def to_image(x):
            x = x[:, :T].reshape(B, ty, tx, R.TILE_ROWS, R.TILE_COLS)
            return x.transpose(0, 1, 3, 2, 4).reshape(
                B, ty * R.TILE_ROWS, tx * R.TILE_COLS)[:, :H, :W]

        p2f = to_image(outs[0])
        zbuf = to_image(outs[1])
        normals = jnp.stack([to_image(o) for o in outs[2:5]], axis=-1)
        return normals, p2f, zbuf

    ki_jit = jax.jit(kernel_img)
    ms = timeit_multi(ki_jit, built)
    results["C_kernel_plus_image"] = round(ms, 2)
    log(f"C kernel+to_image: {ms:.2f} ms")

    # --- D: kernel on empty bins (pure launch + DMA floor)
    kill_row = np.zeros((R.RECF_LANES,), np.float32)
    kill_row[2] = -1.0
    kill_row[12] = -1.0
    recs_empty = jnp.asarray(
        np.broadcast_to(kill_row, (B, Tp, CAP, R.RECF_LANES)).copy())
    counts_empty = jnp.zeros((B * Tp, 1), jnp.int32)
    ms = timeit_multi(k_jit, [(counts_empty, recs_empty)])
    results["D_kernel_empty"] = round(ms, 2)
    log(f"D kernel empty: {ms:.2f} ms")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
