"""Cycle-path (parity-0) cost attack measurements (VERDICT r3 item 3).

Step decomposition (PARITY.md): path 1 = 147.9ms; the cycle adds 122.5ms
when the GENERATOR trains (backward through the frozen re-encode AND the
UNet) vs 46.4ms when the encoder trains. Levers measured here, batch 32,
split-step mode:

  1. bf16 baseline p0/p1 (also picks up round 3's approx diff binning —
     prior record: 176.1/137.5 ms);
  2. bf16 + train.remat_cycle (jax.checkpoint over the cycle applies);
  3. fp32 + arch.bf16_cycle_frozen (frozen cycle applies in bf16; prior
     fp32 p0 record: 270.4 ms).

Ordered smallest-program-first so a worker death still leaves the bf16
numbers. Run with Bash run_in_background; never two TPU processes at once.
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
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
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
    results = {}

    def cfg_for(bf16, remat, bf16_frozen):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            arch=dataclasses.replace(cfg.arch, bf16_compute=bf16,
                                     bf16_cycle_frozen=bf16_frozen),
            train=dataclasses.replace(cfg.train, remat_cycle=remat),
        )
        return cfg

    def measure(tag, cfg, parities=(0, 1)):
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        for p in parities:
            try:
                t0 = time.time()
                out = system.train_step(state, batch, key, parity=p)
                jax.block_until_ready(out[1])
                log(f"{tag} p{p} compile+first {time.time() - t0:.0f}s")
                t0 = time.perf_counter()
                for _ in range(10):
                    out = system.train_step(state, batch, key, parity=p)
                jax.block_until_ready(out[1])
                ms = (time.perf_counter() - t0) / 10 * 1e3
                lf = float(out[1]["loss_first_path"])
                cy = float(out[1]["cycle_loss"])
                results[f"{tag}_p{p}_ms"] = round(ms, 1)
                results[f"{tag}_p{p}_finite"] = bool(
                    np.isfinite(lf) and np.isfinite(cy))
                log(f"{tag} p{p}: {ms:.1f} ms  loss1 {lf:.3f} cycle {cy:.4f}")
            except Exception as e:  # noqa: BLE001
                results[f"{tag}_p{p}_ms"] = str(e)[:200]
                log(f"{tag} p{p} FAILED: {str(e)[:200]}")
            log("PARTIAL " + json.dumps(results))

    # smallest programs first (bf16 family has never crashed the worker).
    # Select stages via argv (worker program-budget discipline: the fp32
    # family is ~1.5 slots per phase; run it only with recovery margin).
    stages = sys.argv[1:] or ["bf16_base", "bf16_remat", "fp32_bf16frozen"]
    if "bf16_base" in stages:
        measure("bf16_base", cfg_for(True, False, False))
    if "bf16_remat" in stages:
        measure("bf16_remat", cfg_for(True, True, False))
    # the fp32 target: frozen cycle applies in bf16 (parity 0 is the
    # expensive one; parity 1 included for the avg). The _p0 variant
    # measures only parity 0 (~1.5 worker slots instead of 3).
    if "fp32_bf16frozen_p0" in stages:
        measure("fp32_bf16frozen", cfg_for(False, False, True),
                parities=(0,))
    elif "fp32_bf16frozen" in stages:
        measure("fp32_bf16frozen", cfg_for(False, False, True))

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
