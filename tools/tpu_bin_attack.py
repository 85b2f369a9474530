"""Binning top_k attack measurements (VERDICT r3 item 2).

At budget 192 the fused raster decomposes as binning top_k 7.0ms +
compact plan/gather ~4ms + kernel ~5ms per batch64@224px (ROADMAP.md).
This script measures, in ONE process (remote-compile friendly):

  A. standalone binning: overlap-matrix-only cost, exact top_k,
     approx_max_k at recall {0.95, 0.90, 0.80}, bf16 keys at 0.95,
     and a row-band two-stage prototype (coarse per tile-ROW top_k k=512
     -> per-column fine top_k over 512 candidates; the round-2 hier
     failure used 4-row bands and k=1024 at BOTH levels).
  B. the plan/gather block: current 32-lane record gather vs a lean
     18-lane (verts+normals) gather with records computed post-gather.
  C. e2e fused raster with the binning variants that win standalone,
     plus p2f agreement vs the exact binning.

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

    B, S, CAP = 64, 224, 384
    rend = Renderer(bundle, image_size=S, use_pallas=True)
    COMPACT = rend.raster_compact
    log(f"auto budget {COMPACT}, capacity {rend.bin_capacity}")
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
    def keys_only(fv):
        xmin, xmax, ymin, ymax, prio, span, _ = R._bbox_and_priority(fv, S)
        ty = -(-S // R.TILE_ROWS)
        tx = -(-S // R.TILE_COLS)
        tile_r0 = (jnp.arange(ty) * R.TILE_ROWS).astype(jnp.float32)
        tile_c0 = (jnp.arange(tx) * R.TILE_COLS).astype(jnp.float32)
        ov_r = (ymax[:, None, :] >= tile_r0[None, :, None]) & (
            ymin[:, None, :] <= tile_r0[None, :, None] + R.TILE_ROWS - 1)
        ov_c = (xmax[:, None, :] >= tile_c0[None, :, None]) & (
            xmin[:, None, :] <= tile_c0[None, :, None] + R.TILE_COLS - 1)
        overlap = (ov_r[:, :, None, :] & ov_c[:, None, :, :]).reshape(
            fv.shape[0], ty * tx, -1)
        keyf = jnp.where(overlap, (span - prio).astype(jnp.float32)[:, None],
                         -1.0)
        return keyf.sum()  # force materialization, skip top_k

    results["keys_only_ms"] = round(timeit(jax.jit(keys_only), fv), 2)
    log(f"keys_only: {results['keys_only_ms']} ms")

    def bin_timed(approx):
        f = jax.jit(functools.partial(R.bin_faces_flat, image_size=S,
                                      capacity=CAP, approx=approx))
        return timeit(f, fv)

    for tag, approx in (("exact", None), ("a95", 0.95), ("a90", 0.90),
                        ("a80", 0.80)):
        try:
            results[f"bin_{tag}_ms"] = round(bin_timed(approx), 2)
            log(f"bin_{tag}: {results[f'bin_{tag}_ms']} ms")
        except Exception as e:  # noqa: BLE001
            results[f"bin_{tag}_ms"] = str(e)[:120]
            log(f"bin_{tag} FAILED: {str(e)[:120]}")

    # bf16 keys: halve the top_k input bandwidth; priority collisions only
    # reorder overflow drops (bf16 has 8 mantissa bits vs span ~ 2^20)
    def bin_bf16(fv):
        xmin, xmax, ymin, ymax, prio, span, _ = R._bbox_and_priority(fv, S)
        ty = -(-S // R.TILE_ROWS)
        tx = -(-S // R.TILE_COLS)
        T = ty * tx
        tile_r0 = (jnp.arange(ty) * R.TILE_ROWS).astype(jnp.float32)
        tile_c0 = (jnp.arange(tx) * R.TILE_COLS).astype(jnp.float32)
        ov_r = (ymax[:, None, :] >= tile_r0[None, :, None]) & (
            ymin[:, None, :] <= tile_r0[None, :, None] + R.TILE_ROWS - 1)
        ov_c = (xmax[:, None, :] >= tile_c0[None, :, None]) & (
            xmin[:, None, :] <= tile_c0[None, :, None] + R.TILE_COLS - 1)
        overlap = (ov_r[:, :, None, :] & ov_c[:, None, :, :]).reshape(
            fv.shape[0], T, -1)
        keyf = jnp.where(
            overlap, (span - prio).astype(jnp.bfloat16)[:, None],
            jnp.bfloat16(-1.0))
        vals, idx = jax.lax.approx_max_k(keyf, CAP, recall_target=0.95)
        valid = vals > 0
        bins = jnp.where(valid, idx, -1).astype(jnp.int32)
        counts = valid.sum(-1).astype(jnp.int32)
        return R._pad_bins(bins, counts, CAP, CAP, T)

    try:
        results["bin_bf16_a95_ms"] = round(timeit(jax.jit(bin_bf16), fv), 2)
        log(f"bin_bf16_a95: {results['bin_bf16_a95_ms']} ms")
    except Exception as e:  # noqa: BLE001
        results["bin_bf16_a95_ms"] = str(e)[:120]
        log(f"bin_bf16 FAILED: {str(e)[:120]}")

    # row-band two-stage: coarse per tile-ROW (k=512) then per-column fine.
    def bin_rowband(fv, coarse_k=512, approx=0.95):
        Bq = fv.shape[0]
        xmin, xmax, ymin, ymax, prio, span, _ = R._bbox_and_priority(fv, S)
        ty = -(-S // R.TILE_ROWS)
        tx = -(-S // R.TILE_COLS)
        T = ty * tx
        row_r0 = (jnp.arange(ty) * R.TILE_ROWS).astype(jnp.float32)
        ov_row = (ymax[:, None, :] >= row_r0[None, :, None]) & (
            ymin[:, None, :] <= row_r0[None, :, None] + R.TILE_ROWS - 1)
        keyc = jnp.where(
            ov_row, (span - prio).astype(jnp.float32)[:, None], -1.0)
        vals_c, cand = jax.lax.approx_max_k(
            keyc, coarse_k, recall_target=approx)  # (B,ty,k) near-to-far
        valid_c = vals_c > 0

        def gather_bf(a):
            return jnp.take_along_axis(
                jnp.broadcast_to(a[:, None, :], (Bq, ty, F)), cand, axis=-1)

        cxmin, cxmax = gather_bf(xmin), gather_bf(xmax)
        tile_c0 = (jnp.arange(tx) * R.TILE_COLS).astype(jnp.float32)
        ov_c = (cxmax[:, :, None, :] >= tile_c0[None, None, :, None]) & (
            cxmin[:, :, None, :] <= tile_c0[None, None, :, None]
            + R.TILE_COLS - 1) & valid_c[:, :, None, :]
        pos = jnp.arange(coarse_k, dtype=jnp.int32)
        keyf = jnp.where(ov_c, (coarse_k - pos).astype(jnp.float32), -1.0)
        k = min(CAP, coarse_k)
        vals_f, idx_f = jax.lax.approx_max_k(keyf, k, recall_target=approx)
        valid_f = vals_f > 0
        ids = jnp.take_along_axis(
            jnp.broadcast_to(cand[:, :, None, :], (Bq, ty, tx, coarse_k)),
            idx_f, axis=-1)
        bins = jnp.where(valid_f, ids, -1).astype(jnp.int32)
        counts = valid_f.sum(-1).astype(jnp.int32)
        return R._pad_bins(bins.reshape(Bq, T, k), counts.reshape(Bq, T),
                           CAP, k, T)

    try:
        results["bin_rowband_ms"] = round(timeit(jax.jit(bin_rowband), fv), 2)
        log(f"bin_rowband: {results['bin_rowband_ms']} ms")
    except Exception as e:  # noqa: BLE001
        results["bin_rowband_ms"] = str(e)[:120]
        log(f"bin_rowband FAILED: {str(e)[:120]}")

    # membership agreement vs exact (order-insensitive per tile)
    def membership(bins):
        m = np.zeros((bins.shape[0], bins.shape[1], F + 1), bool)
        bb = np.asarray(bins)
        for b in range(bins.shape[0]):
            for t in range(bins.shape[1]):
                m[b, t][bb[b, t][bb[b, t] >= 0]] = True
        return m[..., :F]

    exact_bins, exact_counts = jax.jit(functools.partial(
        R.bin_faces_flat, image_size=S, capacity=CAP, approx=None))(fv)
    mem_exact = membership(exact_bins[:4])
    for tag, fnv in (("a95", None), ("rowband", bin_rowband),
                     ("bf16", bin_bf16)):
        try:
            if fnv is None:
                bb, _ = jax.jit(functools.partial(
                    R.bin_faces_flat, image_size=S, capacity=CAP,
                    approx=0.95))(fv)
            else:
                bb, _ = jax.jit(fnv)(fv)
            mem = membership(bb[:4])
            miss = int((mem_exact & ~mem).sum())
            results[f"miss_{tag}"] = miss
            log(f"membership misses vs exact ({tag}, 4 images): {miss}")
        except Exception as e:  # noqa: BLE001
            results[f"miss_{tag}"] = str(e)[:120]

    # ---------------- B. plan/gather block ----------------
    bins, counts = exact_bins, exact_counts
    CH = R.V3_CHUNK
    CPT = CAP // CH
    Tp = bins.shape[1]
    compact8 = -(-COMPACT // 8) * 8

    def plan_gather_current(fv, fn, bins, counts):
        records = R.face_records_shaded(fv, fn)
        records = records.at[..., 12].set(
            jnp.arange(F, dtype=fv.dtype)[None])
        starts, ends, tof, meta, _ = R._compact_plan(counts, compact8)
        faces = R._compact_faces(meta, tof, starts, bins, B, Tp, CPT,
                                 compact8, False)
        recs = R._gather_recs(
            records, faces.reshape(B, compact8 * CH)[:, :, None]
        ).reshape(B, compact8 * CH, R.RECF_LANES)
        return recs.sum(), starts.sum()

    def plan_gather_lean(fv, fn, bins, counts):
        # gather 18 input lanes (verts 9 + normals 9), build records AFTER
        geom = jnp.concatenate(
            [fv.reshape(B, F, 9), fn.reshape(B, F, 9)], -1)  # (B,F,18)
        starts, ends, tof, meta, _ = R._compact_plan(counts, compact8)
        faces = R._compact_faces(meta, tof, starts, bins, B, Tp, CPT,
                                 compact8, False)
        idx = faces.reshape(B, compact8 * CH)
        safe = jnp.maximum(idx, 0)
        g = jax.vmap(lambda r, b: r[b])(geom, safe)  # (B,N,18)
        gfv = g[..., :9].reshape(B, -1, 3, 3)
        gfn = g[..., 9:].reshape(B, -1, 3, 3)
        recs = R.face_records_shaded(gfv, gfn)
        recs = recs.at[..., 12].set(idx.astype(fv.dtype))
        kill = (idx < 0)[..., None]
        recs = jnp.where(kill, jnp.zeros_like(recs).at[..., 2].set(-1.0)
                         .at[..., 12].set(-1.0), recs)
        return recs.sum(), starts.sum()

    for tag, f in (("plangather_current", plan_gather_current),
                   ("plangather_lean", plan_gather_lean)):
        try:
            results[f"{tag}_ms"] = round(
                timeit(jax.jit(f), fv, fn, bins, counts, iters=32), 2)
            log(f"{tag}: {results[f'{tag}_ms']} ms")
        except Exception as e:  # noqa: BLE001
            results[f"{tag}_ms"] = str(e)[:120]
            log(f"{tag} FAILED: {str(e)[:120]}")

    # ---------------- C. e2e fused raster ----------------
    def fused(approx):
        f = jax.jit(lambda a, b: R.rasterize_normals_fused(
            a, b, S, capacity=CAP, compact=COMPACT, bin_approx=approx)[1])
        return f

    try:
        p2f_ref = None
        for tag, approx in (("a95", 0.95), ("a90", 0.90), ("a80", 0.80)):
            ms = timeit(fused(approx), fv, fn)
            p2f = np.asarray(fused(approx)(fv, fn))
            if p2f_ref is None:
                exact_p2f = np.asarray(jax.jit(
                    lambda a, b: R.rasterize_normals_fused(
                        a, b, S, capacity=CAP, compact=COMPACT,
                        bin_approx=None)[1])(fv, fn))
                p2f_ref = exact_p2f
            diff = float((p2f != p2f_ref).mean())
            results[f"fused_{tag}"] = {"ms": round(ms, 2),
                                       "p2f_diff": round(diff, 6)}
            log(f"fused_{tag}: {ms:.2f} ms p2f_diff {diff:.2e}")
    except Exception as e:  # noqa: BLE001
        results["fused_e2e"] = str(e)[:200]
        log(f"fused e2e FAILED: {str(e)[:200]}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
