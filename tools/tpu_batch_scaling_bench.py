"""TPU experiment: train-step throughput vs batch size (bf16 compute).

Per-chip samples/s at batch 32 vs 64: if 64 amortizes fixed costs, the
production recipe should shard larger global batches per chip.
Baselines (batch 32, bf16): 226.0 / 149.6 ms parity 0/1.
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

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    center = vt[np.asarray(bundle["face_vertex_ids"])].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)

    for B in (64,):
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
        for parity in (0, 1):
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            log(f"B={B} parity={parity} compile+first: {time.time()-t0:.1f}s")
            t0 = time.perf_counter()
            for _ in range(10):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            log(json.dumps({
                "metric": "train_step_ms_bf16", "batch": B, "parity": parity,
                "value": round(ms, 1),
                "samples_per_s": round(B / ms * 1e3, 1),
            }))

    lf = float(out[1]["loss_first_path"])
    log(f"loss_first_path={lf} finite={np.isfinite(lf)}")


if __name__ == "__main__":
    main()
