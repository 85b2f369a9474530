"""Pallas binning attacks on the fused raster (VERDICT r3 item 4).

Two designs measured against the shipped compact path (approx_max_k face
binning 6.12ms + compact plan/record gather ~4ms + v7 kernel ~5ms =
15.27ms/batch64 at 224px, tools/tpu_sortbin_bench.py 2026-08-19):

A. CHUNK-SKIP raster (rasterizer.rasterize_normals_chunkskip): bin fixed
   CH-face chunks of a Morton-ordered face list (exact top_k over F/CH
   candidates), kernel fetches chunks from the full resident record table
   by dynamic row offset — deletes the record gather and compact plan.
   Cost model: 2.07x wasted edge-tests at CH=8 / 3.3x at CH=32
   (tools/chunk_binning_occupancy.py exact-ANY occupancy), iteration count
   1090 vs the compact path's 148.

B. SCATTER-APPEND microbenchmark — the literal "per-tile counters in VMEM
   /SMEM, faces streamed once" design: one serial pass over faces, each
   face's record row copied into its overlapped tiles' regions at the
   tiles' running counters (dynamic (1,32)-row stores + SMEM counter RMW).
   TPU has no scatter hardware, so every (face,tile) incidence is a
   scalar-driven store; this measures the per-incidence cost to extrapolate
   whether ANY append-style binning can beat the top_k formulation.

Run with Bash run_in_background; never two TPU processes at once.
Stages selectable by argv: any of {baseline, chunkskip, binchunks, scatter}
(default: all).

RESULTS (TPU v5e-1, 2026-08-19 16:09-16:14 UTC, /tmp/r4_pallasbin.log):
  e2e approx resident baseline          15.97 ms/batch64
  chunkskip ch8 / ch16 / ch32           19.74 / 19.21 / 19.81 ms  -> NEGATIVE
  bin_chunks ch8 (binning stage alone)   2.20 ms   (vs 6.12 approx_max_k)
Chunk binning is 2.8x cheaper than face binning, but the 2.07x wasted
edge-tests + full-table dynamic-offset fetches cost ~8 ms of kernel time —
exactly what chunk_binning_occupancy.py's occupancy model predicted. The
21281px mismatch vs the APPROX baseline is z-tie noise (zmaxdiff 9.6e-3 at
shared mesh edges); CPU tests prove bit-exact equality against the EXACT
fused path. Chunk-skip stays opt-in (rasterize_normals_chunkskip); the
compact path remains the shipped design.
  scatter_append (2026-08-19, SMIRK_SCATTER_B=8; B=64 crashed the remote
compile helper twice): 3.5 ms for 8 images / 36023 incidences, counts
EXACTLY matching the XLA overlap oracle -> 97.2 us per 1k incidences
(~97 ns per incidence: one dynamic (1,32)-row VMEM store + SMEM counter
RMW, fully serialized — TPU has no scatter unit). At batch 64 (~288k
incidences) ANY append-style binning pays ~28 ms just for the appends,
4.6x the whole shipped approx_max_k stage (6.12 ms). NEGATIVE, decisively:
the never-materialized top_k formulation stands as the TPU-native design.
(First B=64 attempt also hit a Mosaic block constraint: SMEM block rows
must be a multiple of 8 — fixed by padding the packed bbox rows.)
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, flush=True)


def _scatter_append_kernel(bbox_ref, recs_ref, out_ref, cnt_out, cnt_sc,
                           *, F, TX, TP, CPT):
    """bbox_ref SMEM (ceil(F/128),128) int32: packed [ty0|ty1|tx0|tx1] 8-bit
    fields per face; recs_ref VMEM (1,F,32); out_ref VMEM (1,TP*CPT,32)
    per-tile regions; cnt_out SMEM (TP,1) final counters; cnt_sc SMEM (TP,)
    scratch counters."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def zero_body(t, carry):
        cnt_sc[t] = 0
        return carry

    jax.lax.fori_loop(0, TP, zero_body, 0)

    def face_body(f, carry):
        packed = bbox_ref[f // 128, f % 128]
        ty0 = packed & 0xFF
        ty1 = (packed >> 8) & 0xFF
        tx0 = (packed >> 16) & 0xFF
        tx1 = (packed >> 24) & 0xFF

        def row_body(r, carry2):
            def col_body(c, carry3):
                t = r * TX + c
                n = cnt_sc[t]
                dst = t * CPT + jnp.minimum(n, CPT - 1)
                out_ref[0, pl.ds(dst, 1), :] = recs_ref[0, pl.ds(f, 1), :]
                cnt_sc[t] = n + 1
                return carry3

            return jax.lax.fori_loop(tx0, tx1 + 1, col_body, carry2)

        return jax.lax.fori_loop(ty0, ty1 + 1, row_body, carry)

    jax.lax.fori_loop(0, F, face_body, 0)

    def copy_body(t, carry):
        cnt_out[t, 0] = cnt_sc[t]
        return carry

    jax.lax.fori_loop(0, TP, copy_body, 0)


def scatter_append(fv, image_size, CPT=384, interpret=False):
    """XLA prep (packed tile ranges) + the scatter-append Pallas kernel.
    Returns (out records (B,TP*CPT,32), counts (B,TP))."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smirk_tpu.render import rasterizer as R

    B, F = fv.shape[:2]
    H = W = image_size
    ty = -(-H // R.TILE_ROWS)
    tx = -(-W // R.TILE_COLS)
    T = ty * tx
    TP = -(-T // 8) * 8
    xmin, xmax, ymin, ymax, _, _, _ = R._bbox_and_priority(fv, image_size)
    # first/last overlapped tile of the continuous bbox against integer
    # pixel-center rows [kR, kR+R-1]: first = ceil((min-(R-1))/R), last =
    # floor(max/R); faces with no on-screen overlap get an empty range
    # (ty0=1, ty1=0 -> fori(1,1) no-op), matching the overlap-mask counts
    ty0 = jnp.clip(jnp.ceil((ymin - (R.TILE_ROWS - 1)) / R.TILE_ROWS),
                   0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / R.TILE_ROWS), 0, ty - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.ceil((xmin - (R.TILE_COLS - 1)) / R.TILE_COLS),
                   0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / R.TILE_COLS), 0, tx - 1).astype(jnp.int32)
    onscreen = ((ymax >= 0) & (ymin <= ty * R.TILE_ROWS - 1)
                & (xmax >= 0) & (xmin <= tx * R.TILE_COLS - 1))
    packed = jnp.where(
        onscreen, ty0 | (ty1 << 8) | (tx0 << 16) | (tx1 << 24), 1)  # (B,F)
    NR = -(-(-(-F // 128)) // 8) * 8  # Mosaic: SMEM block rows must be 8k
    pad = NR * 128 - F
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(jnp.asarray(1, jnp.int32), (B, pad))],
            axis=1)
    recs = R.face_records_shaded(fv, jnp.zeros_like(fv))

    out, cnt = pl.pallas_call(
        functools.partial(_scatter_append_kernel, F=F, TX=tx, TP=TP,
                          CPT=CPT),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((NR, 128), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, F, R.RECF_LANES), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TP * CPT, R.RECF_LANES), lambda b: (b, 0, 0)),
            pl.BlockSpec((TP, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, TP * CPT, R.RECF_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B * TP, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((TP,), jnp.int32)],
        interpret=interpret,
    )(packed.reshape(B * NR, 128), recs)
    return out, cnt.reshape(B, TP)


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    on_tpu = jax.default_backend() not in ("cpu",)
    stages = set(sys.argv[1:]) or {"baseline", "chunkskip", "binchunks",
                                   "scatter"}
    results = {}

    def timeit(fn, *args, iters=16):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    face_ids_v = np.asarray(bundle["face_vertex_ids"])
    center = vt[face_ids_v].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    B, S = (64, 224) if on_tpu else (2, 224)
    rend = Renderer(bundle, image_size=S, use_pallas=on_tpu)
    CAP = rend.bin_capacity
    COMPACT = rend.raster_compact
    log(f"auto budget {COMPACT}, capacity {CAP}, B={B}")
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

    interp = not on_tpu

    # ------- baseline: resident approx-compact e2e + exact-binning ref -----
    def fused_approx(fv, fn):
        return R.rasterize_normals_fused(
            fv, fn, S, capacity=CAP, compact=COMPACT, interpret=interp,
            bin_approx=rend.bin_approx, return_overflow=True)

    base = None
    if "baseline" in stages or "chunkskip" in stages:
        base = jax.block_until_ready(jax.jit(fused_approx)(fv, fn))
        results["e2e_approx_ms"] = round(
            timeit(jax.jit(fused_approx), fv, fn), 2)
        log(f"e2e approx (resident baseline): {results['e2e_approx_ms']} ms")

    # ------------------- A. chunk-skip raster ------------------------------
    perm = R.spatial_face_order(
        vt[np.asarray(rend._kept)], np.asarray(rend.faces))
    fvp = fv[:, perm]
    fnp_ = fn[:, perm]
    ids = jnp.asarray(np.asarray(perm))

    for CH, capc in ((8, 128), (16, 96), (32, 64)) if "chunkskip" in stages \
            else ():
        tag = f"chunkskip_ch{CH}"
        try:
            f = jax.jit(functools.partial(
                R.rasterize_normals_chunkskip, image_size=S, chunk=CH,
                cap=capc, interpret=interp, return_overflow=True,
                face_ids=ids))
            out = jax.block_until_ready(f(fvp, fnp_))
            results[f"{tag}_ms"] = round(timeit(f, fvp, fnp_), 2)
            mism = int(jax.device_get((out[1] != base[1]).sum()))
            zmax = float(jax.device_get(
                jnp.abs(jnp.where(base[1] >= 0, out[2] - base[2], 0.0)
                        ).max()))
            results[f"{tag}_p2f_mismatch_px"] = mism
            results[f"{tag}_zmaxdiff"] = round(zmax, 8)
            results[f"{tag}_overflow"] = int(jax.device_get(out[3].sum()))
            log(f"{tag}: {results[f'{tag}_ms']} ms, p2f mismatch {mism}px "
                f"(vs approx baseline), zmaxdiff {zmax:.2e}, "
                f"overflow {results[f'{tag}_overflow']}")
        except Exception as e:  # noqa: BLE001
            results[f"{tag}_ms"] = str(e)[:200]
            log(f"{tag} FAILED: {str(e)[:200]}")

    # standalone chunk binning cost at the best CH
    if "binchunks" in stages:
        try:
            fb = jax.jit(functools.partial(R.bin_chunks, image_size=S,
                                           chunk=8, cap=128))
            jax.block_until_ready(fb(fvp))
            results["bin_chunks_ch8_ms"] = round(timeit(fb, fvp), 2)
            log(f"bin_chunks ch8: {results['bin_chunks_ch8_ms']} ms")
        except Exception as e:  # noqa: BLE001
            results["bin_chunks_ch8_ms"] = str(e)[:200]
            log(f"bin_chunks FAILED: {str(e)[:200]}")

    # ------------------- B. scatter-append micro ---------------------------
    if "scatter" not in stages:
        print(json.dumps(results))
        return
    # per-incidence cost is per-image; a smaller batch shrinks the Mosaic
    # binary the flaky remote compile helper has to chew (B=64 crashed it
    # twice at the same point, 2026-08-19)
    sb = int(os.environ.get("SMIRK_SCATTER_B", "0"))
    if sb and sb < B:
        B = sb
        fv = fv[:B]
    try:
        fs = jax.jit(functools.partial(scatter_append, image_size=S,
                                       interpret=interp))
        out, cnt = jax.block_until_ready(fs(fv))
        # counts must equal the XLA overlap counts (clipped at CPT)
        xmin, xmax, ymin, ymax, _, _, _ = R._bbox_and_priority(fv, S)
        ty = -(-S // R.TILE_ROWS)
        tx = -(-S // R.TILE_COLS)
        t0 = (jnp.arange(ty) * R.TILE_ROWS).astype(jnp.float32)
        c0 = (jnp.arange(tx) * R.TILE_COLS).astype(jnp.float32)
        ovr = (ymax[:, None, :] >= t0[None, :, None]) & (
            ymin[:, None, :] <= t0[None, :, None] + R.TILE_ROWS - 1)
        ovc = (xmax[:, None, :] >= c0[None, :, None]) & (
            xmin[:, None, :] <= c0[None, :, None] + R.TILE_COLS - 1)
        ref_cnt = (ovr[:, :, None, :] & ovc[:, None, :, :]).reshape(
            B, ty * tx, F).sum(-1)
        eq = bool(jax.device_get(
            (cnt[:, :ty * tx] == ref_cnt).all()))
        results["scatter_counts_ok"] = eq
        results["scatter_append_ms"] = round(timeit(fs, fv), 2)
        inc = int(jax.device_get(ref_cnt.sum()))
        results["scatter_incidences"] = inc
        log(f"scatter_append: {results['scatter_append_ms']} ms for {inc} "
            f"incidences ({results['scatter_append_ms'] / inc * 1e6:.2f} "
            f"us/1k-incidence), counts_ok={eq}")
    except Exception as e:  # noqa: BLE001
        results["scatter_append_ms"] = str(e)[:200]
        log(f"scatter_append FAILED: {str(e)[:200]}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
