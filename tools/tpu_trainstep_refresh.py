"""One-shot TPU measurement: current train step, fp32 + bf16, both parities.

Refreshes the PARITY.md train-step table after raster changes (matmul
gradient fold: v5 grad 47.8 -> 41.6ms/batch64). Prior numbers (batch 32):
fp32 288.3/212.9, bf16 226.0/149.6 (parity 0/1).

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
    import dataclasses
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B = 32

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    face_ids = np.asarray(bundle["face_vertex_ids"])
    center = vt[face_ids].mean(0)
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
    results = {}

    for bf16 in (False, True):
        cfg = Config()
        if bf16:
            cfg = dataclasses.replace(
                cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        tag = "bf16" if bf16 else "fp32"
        for parity in (0, 1):
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            log(f"{tag} parity={parity} compile+first {time.time()-t0:.0f}s")
            t0 = time.perf_counter()
            for _ in range(10):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            results[f"{tag}_p{parity}"] = round(ms, 1)
            log(f"{tag} parity {parity}: {ms:.1f} ms")
    lf = float(out[1]["loss_first_path"])
    results["finite"] = bool(np.isfinite(lf))
    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
