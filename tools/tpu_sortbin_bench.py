"""Sort-based incidence binning vs top_k binning (VERDICT r3 item 4).

The differentiable/inference rasters spend ~6.0ms/batch64 in approx_max_k
binning (11.7ms exact): O(T*F) selection work for ~4.5k actual
(face, tile) incidences per image. bin_faces_sorted reformulates the
selection as ONE ascending per-image int32 sort of at most F*NI incidence
keys (key = tile*prio_span + prio), which is EXACT — bit-identical to
exact top_k, deleting the approx-miss caveat entirely — if it's fast.

This script measures, in ONE process (remote-compile friendly):
  A. standalone: flat approx 0.95 / flat approx 0.95 + miss check (the
     round-4 train default) / flat exact / sorted at row spans 8 and 4,
     plus device-side equality sorted == exact.
  B. e2e fused raster (batch 64 @224, auto compact budget): approx
     baseline vs sorted binning, p2f equality.

Also times the raw jnp.sort of the key array to separate sort cost from
expansion/searchsorted/gather cost.

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

    from smirk_tpu import assets
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
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

    B, S = 64, 224
    rend = Renderer(bundle, image_size=S, use_pallas=True)
    CAP = rend.bin_capacity
    COMPACT = rend.raster_compact
    log(f"auto budget {COMPACT}, capacity {CAP}")
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
    F = int(fv.shape[1])
    log(f"prep done F={F}")

    # ---------------- A. standalone binning ----------------
    variants = {
        "flat_a95": functools.partial(
            R.bin_faces_flat, image_size=S, capacity=CAP, approx=0.95),
        "flat_a95_misschk": functools.partial(
            R.bin_faces_flat, image_size=S, capacity=CAP, approx=0.95,
            with_misses=True),
        "flat_exact": functools.partial(
            R.bin_faces_flat, image_size=S, capacity=CAP, approx=None),
        "sorted_rs8": functools.partial(
            R.bin_faces_sorted, image_size=S, capacity=CAP, max_row_span=8),
        "sorted_rs4": functools.partial(
            R.bin_faces_sorted, image_size=S, capacity=CAP, max_row_span=4),
    }
    for tag, f in variants.items():
        try:
            results[f"bin_{tag}_ms"] = round(timeit(jax.jit(f), fv), 2)
            log(f"bin_{tag}: {results[f'bin_{tag}_ms']} ms")
        except Exception as e:  # noqa: BLE001
            results[f"bin_{tag}_ms"] = str(e)[:160]
            log(f"bin_{tag} FAILED: {str(e)[:160]}")

    # raw sort cost of the key array (separates sort from expand/gather)
    ni = 8 * 2
    keys = jnp.asarray(np.random.default_rng(1).integers(
        0, 2**30, (B, F * ni), dtype=np.int32))
    results["raw_sort_ms"] = round(
        timeit(jax.jit(lambda k: jnp.sort(k, axis=-1)), keys), 2)
    log(f"raw jnp.sort (B,{F * ni}) int32: {results['raw_sort_ms']} ms")

    # equality: sorted == exact, device-side
    @jax.jit
    def equal_check(fv):
        b1, c1 = R.bin_faces_flat(fv, S, CAP, approx=None)
        b2, c2, miss = R.bin_faces_sorted(fv, S, CAP, with_misses=True)
        return ((b1 == b2).all() & (c1 == c2).all(), miss.sum())

    eq, miss = jax.block_until_ready(equal_check(fv))
    results["sorted_equals_exact"] = bool(eq)
    results["sorted_span_misses"] = int(miss)
    log(f"sorted == exact: {bool(eq)}, span misses {int(miss)}")

    # ---------------- B. e2e fused raster ----------------
    def fused(fv, fn):
        return R.rasterize_normals_fused(
            fv, fn, S, capacity=CAP, compact=COMPACT,
            bin_approx=rend.bin_approx, return_overflow=True)

    base = jax.block_until_ready(fused(fv, fn))
    results["e2e_approx_ms"] = round(timeit(fused, fv, fn), 2)
    log(f"e2e approx: {results['e2e_approx_ms']} ms")

    R.set_bin_mode(False, None, sorted_=True)
    jax.clear_caches()
    try:
        def fused_sorted(fv, fn):
            return R.rasterize_normals_fused(
                fv, fn, S, capacity=CAP, compact=COMPACT,
                bin_approx=None, return_overflow=True)

        out = jax.block_until_ready(fused_sorted(fv, fn))
        results["e2e_sorted_ms"] = round(timeit(fused_sorted, fv, fn), 2)
        log(f"e2e sorted: {results['e2e_sorted_ms']} ms")
        results["e2e_p2f_equal"] = bool(
            jax.block_until_ready((out[1] == base[1]).all()))
        log(f"p2f equal vs approx baseline: {results['e2e_p2f_equal']}")
    finally:
        R.set_bin_mode(False, None, sorted_=False)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
