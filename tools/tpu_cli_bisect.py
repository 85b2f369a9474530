"""Bisect the train-CLI parity-1 TPU crash (worker 'kernel fault' at the
CLI's batch 1, /tmp/tpu_train_cli*.log) into {program, data, state}:

  A. p1 step, fresh init state, random batch      -> validates the exact
     batch-32 fp32 ipg=1 program on benign operands (this variant was
     never executed standalone; only batch-64 bf16 was, step_bisect7).
  B. p1 step, fresh init state, synthetic-loader batch 1 -> data effect.
  C. p0 step with loader batch 0, then p1 with the UPDATED state on
     batch 1 (exact CLI replication)              -> state effect.

Two compiles total (p1, p0); stages B/C reuse the cached programs.
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
    from smirk_tpu.config import load_config
    from smirk_tpu.data import load_dataloaders
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    results = {}

    config = load_config(None, (
        "train.batch_size=32", "train.samples_per_epoch=960",
    ))
    train_loader, _ = load_dataloaders(config, synthetic=True)
    it = iter(train_loader)
    batch0 = {k: jnp.asarray(v) for k, v in next(it).items()}
    batch1 = {k: jnp.asarray(v) for k, v in next(it).items()}

    rng = np.random.default_rng(0)
    rand_batch = {
        "img": jnp.asarray(rng.random((32, 224, 224, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (32, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.ones((32,), bool),
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (32, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray(
            (rng.random((32, 224, 224, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((32, 112, 112, 3), np.float32),
    }
    for k in batch0:
        if k not in rand_batch:
            rand_batch[k] = batch0[k]
    log("batch keys: " + ",".join(sorted(batch0.keys())))

    bundle = assets.load_all()
    system = SmirkSystem(config, bundle, steps_per_epoch=30, use_pallas=True)
    state0 = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    def run(tag, state, batch, parity):
        try:
            t0 = time.time()
            new_state, metrics, aux = system.train_step(
                state, batch, key, parity=parity)
            jax.block_until_ready(metrics)
            vals = {k: float(v) for k, v in metrics.items()}
            results[tag] = "ok"
            log(f"{tag} ok {time.time() - t0:.0f}s "
                + json.dumps({k: round(v, 3) for k, v in vals.items()}))
            return new_state
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:300]}
            log(f"{tag} FAILED: {str(e)[:300]}")
            return None

    run("A_p1_fresh_rand", state0, rand_batch, 1)
    run("B_p1_fresh_loader", state0, batch1, 1)
    st = run("C1_p0_loader", state0, batch0, 0)
    if st is not None:
        run("C2_p1_updated_loader", st, batch1, 1)
        run("C3_p1_updated_rand", st, rand_batch, 1)

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
