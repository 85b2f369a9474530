"""Retry of the two tpu_step_bisect2.py measurements that hit the flaky
remote-compile helper (HTTP 500): the no-generator pretrain step and the
batch-64 bf16 parity-1 step. Fresh process (a fresh process has recovered
identical 500s before — tools/tpu_compact2_bench.py vs compact3).

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

    def run(tag, cfg, batch, parity):
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True)
        state = system.init_state(jax.random.PRNGKey(0))
        try:
            t0 = time.time()
            out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            log(f"{tag} compile+first {time.time() - t0:.0f}s")
            t0 = time.perf_counter()
            for _ in range(10):
                out = system.train_step(state, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            results[tag] = round(ms, 1)
            log(f"{tag}: {ms:.1f} ms")
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:200]}
            log(f"{tag} FAILED: {str(e)[:200]}")

    cfg = Config()
    cfg_b = dataclasses.replace(
        cfg, arch=dataclasses.replace(
            cfg.arch, enable_fuse_generator=False),
        train=dataclasses.replace(
            cfg.train, loss_weights=dataclasses.replace(
                cfg.train.loss_weights, cycle_loss=0.0,
                perceptual_vgg_loss=0.0)))
    run("loss1_enc_only_p0", cfg_b, make_batch(32), 0)

    cfg_d = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    run("step64_bf16_p1", cfg_d, make_batch(64), 1)

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
