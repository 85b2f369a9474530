"""p1-crash bisect round 3: data/state isolation in SPLIT mode.

S6 (split p1, random data, fresh state, b32 fp32) PASSED standalone, but
the same program inside the train CLI (synthetic-loader data, state after
one p0 step) crashed the worker twice. Stages (each a fresh process via
tpu_p1_driver3.sh):

  R1: S6 exact repeat, 3 executions      -> determinism check
  R2: loader batch1 + post-p0 state      -> the CLI reproduction
  R3: loader batch1 + fresh state        -> data alone

Usage: python tools/tpu_p1_stage2.py R1|R2|R3
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    tag = sys.argv[1]

    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import load_config
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "needs the TPU"

    config = load_config(None, ("train.batch_size=32",
                                "train.samples_per_epoch=960"))
    system = SmirkSystem(config, assets.load_all(), steps_per_epoch=30,
                         use_pallas=True)
    assert system.step_mode == "split"
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

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

    def loader_batches():
        from smirk_tpu.data import load_dataloaders

        train_loader, _ = load_dataloaders(config, synthetic=True)
        it = iter(train_loader)
        b0 = {k: jnp.asarray(v) for k, v in next(it).items()}
        b1 = {k: jnp.asarray(v) for k, v in next(it).items()}
        return b0, b1

    def run(label, state_in, batch, parity, reps=1):
        try:
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = system.train_step(state_in, batch, key, parity=parity)
            jax.block_until_ready(out[1])
            vals = {k: round(float(v), 3) for k, v in out[1].items()}
            print(f"STAGE_RESULT " + json.dumps(
                {"tag": label, "ok": True, "t": round(time.time() - t0, 1),
                 "metrics": vals}), flush=True)
            return out[0]
        except Exception as e:  # noqa: BLE001
            print("STAGE_RESULT " + json.dumps(
                {"tag": label, "ok": False, "t": round(time.time() - t0, 1),
                 "error": str(e)[:250]}), flush=True)
            sys.exit(1)

    if tag == "R1":
        run("R1_split_p1_rand_x3", state, rand_batch, 1, reps=3)
    elif tag == "R2":
        b0, b1 = loader_batches()
        st = run("R2a_p0_loader", state, b0, 0)
        run("R2b_p1_loader_updated", st, b1, 1)
    elif tag == "R3":
        _, b1 = loader_batches()
        run("R3_p1_loader_fresh", state, b1, 1)
    else:
        raise SystemExit(f"unknown stage {tag}")


if __name__ == "__main__":
    main()
