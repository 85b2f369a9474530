"""One-shot TPU validation of the compact-list raster (v7 fused + v5c diff).

Measures, in one process (remote-compile friendly):
  A. diff raster (v5) fwd and fwd+bwd: padded vs compact {336 (auto), 192}
     + gradient agreement,
  B. fused inference raster at compact=336 (192/256/v4 already measured:
     24.29 / 15.95 / 16.92 ms, tools/tpu_compact2_bench.py),
  C. full train step fp32+bf16 both parities with the renderer's auto
     compact (prior, padded: fp32 283/208, bf16 191/144 ms/batch32),
  D. bench-style inference fps at batch 64.

Run with Bash run_in_background; never two TPU processes at once.
"""
import dataclasses
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
    from smirk_tpu.config import Config
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET
    from smirk_tpu.train import SmirkSystem

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
    log(f"auto raster_compact at {S}px cap {rend.bin_capacity}: "
        f"{rend.raster_compact}")

    # Occupancy vs budget self-revalidation (VERDICT r2 item 8): measured
    # on whatever geometry is installed; when the real generic_model.pkl is
    # present this re-verifies the synthetic-tuned ~1.4x headroom claim.
    occ_cam = jnp.asarray(np.tile(
        np.array([7.0, 0.0, 0.0], np.float32), (1, 1)))
    occ = rend.measure_compact_occupancy(
        jnp.asarray(vt[None]), occ_cam)
    flame_kind = ("synthetic" if bundle.get("is_synthetic_flame", True)
                  else "REAL FLAME2020")
    results["occupancy"] = {**occ, "geometry": flame_kind}
    log(f"occupancy ({flame_kind}): {occ}")
    if not bundle.get("is_synthetic_flame", True):
        assert occ["headroom"] >= 1.0, (
            f"real-FLAME occupancy {occ} exceeds the auto budget — raise "
            "the renderer auto budget (renderer.py) before trusting "
            "compact-raster training renders")
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

    # ---- A. differentiable raster (v5 padded vs v5c compact) ----
    def diff_fwd(compact):
        f = jax.jit(lambda a, b: R.rasterize_planes_diff(
            a, b, S, CAP, False, compact)[0])
        return f

    def diff_grad(compact):
        def loss(a, b):
            v, m, _, _ = R.rasterize_planes_diff(a, b, S, CAP, False, compact)
            return jnp.sum(jnp.sin(v) * v * m)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    ref_vals = None
    ref_grad = None
    for compact in (None, 336, 192):
        tag = f"diff_{compact or 'padded'}"
        try:
            t0 = time.time()
            vals = jax.block_until_ready(diff_fwd(compact)(fv, fn))
            log(f"{tag} fwd compile+first {time.time() - t0:.0f}s")
            ms_f = timeit(diff_fwd(compact), fv, fn)
            t0 = time.time()
            g = jax.block_until_ready(diff_grad(compact)(fv, fn))
            log(f"{tag} grad compile+first {time.time() - t0:.0f}s")
            ms_g = timeit(diff_grad(compact), fv, fn, iters=16)
            if compact is None:
                ref_vals, ref_grad = vals, g
                agree = 1.0
                gdiff = 0.0
            else:
                agree = float(jnp.mean(
                    (jnp.abs(vals - ref_vals) < 1e-5).astype(jnp.float32)))
                gdiff = max(
                    float(jnp.max(jnp.abs(a - b)))
                    for a, b in zip(g, ref_grad))
            results[tag] = {"fwd_ms": round(ms_f, 2),
                            "fwdbwd_ms": round(ms_g, 2),
                            "val_agree": round(agree, 6),
                            "grad_maxdiff": gdiff}
            log(f"{tag}: fwd {ms_f:.2f} fwd+bwd {ms_g:.2f} "
                f"agree {agree:.5f} gmax {gdiff:.2e}")
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:200]}
            log(f"{tag} FAILED {type(e).__name__}: {str(e)[:200]}")

    # ---- B. fused inference raster at auto budget ----
    try:
        f336 = jax.jit(lambda a, b: R.rasterize_normals_fused(
            a, b, S, capacity=CAP, compact=336))
        t0 = time.time()
        jax.block_until_ready(f336(fv, fn))
        log(f"fused336 compile+first {time.time() - t0:.0f}s")
        ms = timeit(f336, fv, fn)
        results["fused_336"] = round(ms, 2)
        log(f"fused_336: {ms:.2f} ms")
    except Exception as e:  # noqa: BLE001
        results["fused_336"] = {"error": str(e)[:200]}
        log(f"fused_336 FAILED: {str(e)[:200]}")

    # ---- C. train step with renderer auto compact ----
    Bt = 32
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((Bt, 224, 224, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (Bt, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.ones((Bt,), bool),
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (Bt, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray(
            (rng.random((Bt, 224, 224, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((Bt, 112, 112, 3), np.float32),
    }
    key = jax.random.PRNGKey(0)
    for bf16 in (False, True):
        cfg = Config()
        if bf16:
            cfg = dataclasses.replace(
                cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        tag = "bf16" if bf16 else "fp32"
        for parity in (0, 1):
            try:
                t0 = time.time()
                out = system.train_step(state, batch, key, parity=parity)
                jax.block_until_ready(out[1])
                log(f"step {tag} p{parity} compile+first "
                    f"{time.time() - t0:.0f}s")
                t0 = time.perf_counter()
                for _ in range(10):
                    out = system.train_step(state, batch, key, parity=parity)
                jax.block_until_ready(out[1])
                ms = (time.perf_counter() - t0) / 10 * 1e3
                lf = float(out[1]["loss_first_path"])
                results[f"step_{tag}_p{parity}"] = round(ms, 1)
                results[f"step_{tag}_finite"] = bool(np.isfinite(lf))
                log(f"step {tag} parity {parity}: {ms:.1f} ms finite "
                    f"{np.isfinite(lf)}")
            except Exception as e:  # noqa: BLE001
                results[f"step_{tag}_p{parity}"] = {"error": str(e)[:200]}
                log(f"step {tag} p{parity} FAILED: {str(e)[:200]}")

    # ---- D. bench-style inference fps (batch 64) ----
    try:
        cfg = Config()
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        enc_vars = state.encoder
        face_c = np.asarray(bundle["v_template"])[
            np.asarray(system.renderer.kept_vertices)].mean(0)
        cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])

        @jax.jit
        def forward(img):
            enc_out = system.encoder.apply(enc_vars, img, train=False)
            flame_out = system.flame(enc_out)
            r = system.renderer(
                flame_out["vertices"], enc_out["cam"] + cam_fix,
                inference=True)
            return (r["rendered_img"], flame_out["vertices"],
                    r["rendered_mask"])

        img = jnp.asarray(
            np.random.default_rng(0).random((64, 224, 224, 3), np.float32))
        out = jax.block_until_ready(forward(img))
        cov = float(out[2].mean())
        t0 = time.perf_counter()
        for _ in range(20):
            out = forward(img)
        jax.block_until_ready(out)
        fps = 64 * 20 / (time.perf_counter() - t0)
        results["bench_fps"] = round(fps, 1)
        results["bench_coverage"] = round(cov, 4)
        log(f"bench fps: {fps:.1f} coverage {cov:.4f}")
    except Exception as e:  # noqa: BLE001
        results["bench_fps"] = {"error": str(e)[:200]}
        log(f"bench FAILED: {str(e)[:200]}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
