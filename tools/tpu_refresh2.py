"""One-shot TPU refresh after: tile-major backward slots (skips the
p2slot image_to_tiles round trip), approx_max_k inference binning,
compact budget 216.

Prior numbers: diff fwd+bwd 33.04 ms/batch64 @192; train step fp32
271.7/197.7, bf16 178.1/137.7 (budget 336); bench 3130 fps @224.

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
    log(f"auto compact {rend.raster_compact} bin_approx {rend.bin_approx}")
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

    # ---- diff raster fwd+bwd with tile-major slots ----
    for compact in (216,):
        def loss(a, b, compact=compact):
            v, m, _, _ = R.rasterize_planes_diff(a, b, S, CAP, False, compact)
            return jnp.sum(jnp.sin(v) * v * m)
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t0 = time.time()
        jax.block_until_ready(g(fv, fn))
        log(f"diff{compact} grad compile+first {time.time() - t0:.0f}s")
        ms = timeit(g, fv, fn, iters=16)
        results[f"diff_fwdbwd_{compact}"] = round(ms, 2)
        log(f"diff fwd+bwd @{compact}: {ms:.2f} ms")

    # ---- train step ----
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
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            log(f"step {tag} p{parity} compile+first {time.time() - t0:.0f}s")
            t0 = time.perf_counter()
            for _ in range(10):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            results[f"step_{tag}_p{parity}"] = round(ms, 1)
            log(f"step {tag} parity {parity}: {ms:.1f} ms finite "
                f"{np.isfinite(float(out[1]['loss_first_path']))}")

    # ---- bench fps (approx binning + compact 216) ----
    cfg = Config()
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
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
            flame_out["vertices"], enc_out["cam"] + cam_fix, inference=True)
        return (r["rendered_img"], flame_out["vertices"],
                r["rendered_mask"])

    img = jnp.asarray(
        np.random.default_rng(0).random((64, 224, 224, 3), np.float32))
    t0 = time.time()
    out = jax.block_until_ready(forward(img))
    log(f"bench compile+first {time.time() - t0:.0f}s "
        f"coverage {float(out[2].mean()):.4f}")
    t0 = time.perf_counter()
    for _ in range(20):
        out = forward(img)
    jax.block_until_ready(out)
    fps = 64 * 20 / (time.perf_counter() - t0)
    results["bench_fps"] = round(fps, 1)
    log(f"bench fps: {fps:.1f}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
