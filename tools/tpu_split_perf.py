"""Measure split-step overhead at the production config (batch 64, bf16).

Fused baseline (PARITY.md, tools/tpu_step_bisect3.py): 271.0 / 213.3 ms
parity 0/1. Split mode re-dispatches aux between two programs; expected
near-neutral. Run with Bash run_in_background; one TPU process at a time.
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import os

    os.environ["SMIRK_STEP_MODE"] = "split"

    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "needs the TPU"

    rng = np.random.default_rng(0)
    B = 64
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

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=100,
                         use_pallas=True)
    assert system.step_mode == "split"
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    results = {}
    for parity in (0, 1):
        try:
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            print(f"p{parity} compile+first {time.time() - t0:.0f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(10):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            results[f"split_b64_bf16_p{parity}"] = round(ms, 1)
            print(f"p{parity}: {ms:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"split_b64_bf16_p{parity}"] = {"error": str(e)[:200]}
            print(f"p{parity} FAILED: {str(e)[:200]}", flush=True)
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
