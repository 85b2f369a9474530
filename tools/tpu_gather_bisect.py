"""One-shot TPU experiment: bisect the 11.2ms record-gather inside the
fused raster prep (tpu_floor_bisect.py: prep_recs 18.2ms = binning 7.0
+ records/gather/kill ~11.2ms; the z-buffer kernel itself is only 7.5ms).

Variants:
  A1 records build only (face_records_shaded, (B,F,32))
  A2 A1 + row gather (clamped index, no kill select)   <- current minus kill
  A3 A1 + F+1 kill-row gather (kill folded into index) <- one pass less
  A4 current formulation (clamp gather + where kill)
  A5 A3 with bf16 records (half the gather bytes; numerics NOT evaluated
     here — speed probe only)

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

    # prebuild bins once (binning cost excluded from all variants)
    @jax.jit
    def binit(fv):
        bins, counts = R.bin_faces(fv, S, CAP)
        tps = R._pick_tps(bins.shape[1], CAP)
        bins, counts = R._pad_tiles_to(bins, counts, tps)
        return bins, counts

    binned = [jax.block_until_ready(binit(a)) for a, _ in scenes]
    Tp = binned[0][0].shape[1]
    argsets = [(scenes[i][0], scenes[i][1], binned[i][0])
               for i in range(4)]

    def build_records(fv, fnrm):
        records = R.face_records_shaded(fv, fnrm)
        return records.at[..., 12].set(
            jnp.arange(F, dtype=fv.dtype)[None])

    def a1(fv, fnrm, bins):
        return build_records(fv, fnrm)

    def a2(fv, fnrm, bins):
        records = build_records(fv, fnrm)
        return jax.vmap(lambda r, b: r[jnp.maximum(b, 0)])(
            records, bins.reshape(B, -1)
        ).reshape(B, Tp, CAP, R.RECF_LANES)

    kill_np = np.zeros((1, R.RECF_LANES), np.float32)
    kill_np[0, 2] = -1.0
    kill_np[0, 12] = -1.0

    def a3(fv, fnrm, bins):
        records = build_records(fv, fnrm)
        ext = jnp.concatenate(
            [records,
             jnp.broadcast_to(jnp.asarray(kill_np)[None], (B, 1, R.RECF_LANES))],
            axis=1)  # (B, F+1, 32)
        idx = jnp.where(bins < 0, F, bins)
        return jax.vmap(lambda r, b: r[b])(
            ext, idx.reshape(B, -1)
        ).reshape(B, Tp, CAP, R.RECF_LANES)

    def a4(fv, fnrm, bins):
        recs = a2(fv, fnrm, bins)
        kill = jnp.zeros((R.RECF_LANES,)).at[2].set(-1.0).at[12].set(-1.0)
        return jnp.where((bins < 0)[..., None], kill, recs)

    def a5(fv, fnrm, bins):
        records = build_records(fv, fnrm).astype(jnp.bfloat16)
        ext = jnp.concatenate(
            [records, jnp.broadcast_to(
                jnp.asarray(kill_np, np.float32).astype(jnp.bfloat16)[None],
                (B, 1, R.RECF_LANES))],
            axis=1)
        idx = jnp.where(bins < 0, F, bins)
        return jax.vmap(lambda r, b: r[b])(
            ext, idx.reshape(B, -1)
        ).reshape(B, Tp, CAP, R.RECF_LANES)

    for key, fn in [("A1_records_only", a1), ("A2_gather_noclean", a2),
                    ("A3_killrow_gather", a3), ("A4_current", a4),
                    ("A5_killrow_bf16", a5)]:
        try:
            j = jax.jit(fn)
            ms = timeit_multi(j, argsets)
            results[key] = round(ms, 2)
            log(f"{key}: {ms:.2f} ms")
        except Exception as e:
            log(f"{key}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results[key] = {"error": str(e)[:200]}

    # sanity: A3 output == A4 output bitwise
    r3 = jax.jit(a3)(*argsets[0])
    r4 = jax.jit(a4)(*argsets[0])
    same = bool(jnp.all(r3 == r4))
    results["A3_equals_A4"] = same
    log(f"A3 == A4: {same}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
