"""One-shot TPU bisect of the train step via config differencing.

Jitting _loss1 standalone crashes the remote compile helper (HTTP 500,
reproducible — tools/tpu_step_bisect.py), so decompose through the
PROVEN train_step path instead:
  A. cycle_loss=0 (path 1 only, generator on)   -> loss1 cost
  B. enable_fuse_generator=False (pretrain)     -> encoder-only loss1
  C. full step p0/p1 (known 270.4/194.3 fp32)   -> loss2 = C - A
  D. batch-64 bf16 p0/p1 throughput refresh
All fp32 batch 32 unless stated.

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
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    results = {}

    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    face_ids = np.asarray(bundle["face_vertex_ids"])
    center = vt[face_ids].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    def make_batch(Bt):
        rng = np.random.default_rng(0)
        return {
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
    batch32 = make_batch(32)

    def run(tag, cfg, batch, parities=(0,)):
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        for parity in parities:
            try:
                t0 = time.time()
                out = system.train_step(state, batch, key, parity=parity)
                jax.block_until_ready(out[1])
                log(f"{tag} p{parity} compile+first {time.time() - t0:.0f}s")
                t0 = time.perf_counter()
                for _ in range(10):
                    out = system.train_step(state, batch, key, parity=parity)
                jax.block_until_ready(out[1])
                ms = (time.perf_counter() - t0) / 10 * 1e3
                results[f"{tag}_p{parity}"] = round(ms, 1)
                log(f"{tag} p{parity}: {ms:.1f} ms")
            except Exception as e:  # noqa: BLE001
                results[f"{tag}_p{parity}"] = {"error": str(e)[:200]}
                log(f"{tag} p{parity} FAILED: {str(e)[:200]}")

    cfg = Config()

    # A. path 1 only (generator on, no cycle)
    cfg_a = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, loss_weights=dataclasses.replace(
                cfg.train.loss_weights, cycle_loss=0.0)))
    run("loss1_only", cfg_a, batch32)

    # B. encoder-only path 1 (pretrain shape: no generator)
    cfg_b = dataclasses.replace(
        cfg, arch=dataclasses.replace(
            cfg.arch, enable_fuse_generator=False),
        train=dataclasses.replace(
            cfg.train, loss_weights=dataclasses.replace(
                cfg.train.loss_weights, cycle_loss=0.0,
                perceptual_vgg_loss=0.0)))
    run("loss1_enc_only", cfg_b, batch32)

    # D. batch-64 bf16 throughput refresh
    cfg_d = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    run("step64_bf16", cfg_d, make_batch(64), parities=(0, 1))

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
