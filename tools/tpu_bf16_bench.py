"""TPU experiment: arch.bf16_compute train-step + inference timing.

Compares against the fp32 numbers from tools/tpu_train_bench.py
(v5 fused raster: 288.3/212.9 ms parity 0/1 at batch 32; inference
2342 fps/chip at batch 64). Run with Bash run_in_background.
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",)
    B = 32

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    center = vt[np.asarray(bundle["face_vertex_ids"])].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, 224, 224, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (B, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.ones((B,), bool),
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (B, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray(
            (rng.random((B, 224, 224, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((B, 112, 112, 3), np.float32),
    }
    key = jax.random.PRNGKey(0)

    cfg = Config()
    cfg_bf16 = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    system = SmirkSystem(cfg_bf16, bundle, steps_per_epoch=100,
                         use_pallas=True)
    state = system.init_state(jax.random.PRNGKey(0))

    for parity in (0, 1):
        t0 = time.time()
        out = system.train_step(state, batch, key, parity=parity)
        jax.block_until_ready(out[1])
        log(f"bf16 parity={parity} compile+first: {time.time()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(10):
            out = system.train_step(state, batch, key, parity=parity)
        jax.block_until_ready(out[1])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        log(json.dumps({"metric": "train_step_ms_bf16", "parity": parity,
                        "batch": B, "value": round(ms, 1)}))

    # inference fps with bf16 encoders (fused v4 render unchanged)
    enc_vars = state.encoder
    Bi = 64
    img = jnp.asarray(rng.random((Bi, 224, 224, 3), np.float32))

    @jax.jit
    def forward(img):
        enc_out = system.encoder.apply(enc_vars, img, train=False)
        flame_out = system.flame(enc_out)
        rend = system.renderer(flame_out["vertices"], enc_out["cam"],
                               inference=True)
        return rend["rendered_img"], rend["rendered_mask"]

    t0 = time.time()
    o = forward(img)
    jax.block_until_ready(o)
    log(f"bf16 inference compile+first: {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(20):
        o = forward(img)
    jax.block_until_ready(o)
    dt = time.perf_counter() - t0
    log(json.dumps({"metric": "inference_fps_bf16_encoders",
                    "value": round(Bi * 20 / dt, 1)}))

    lf = float(out[1]["loss_first_path"])
    log(f"loss_first_path={lf} finite={np.isfinite(lf)}")


if __name__ == "__main__":
    main()
