"""One stage of the p1-crash bisect (tools/tpu_p1_driver.sh).

Usage: python tools/tpu_p1_stage.py <tag> [--no-pallas] [--parity P]
Runs ONE train step (batch 32, fp32) in a fresh process and prints
STAGE_RESULT {"tag": ..., "ok": bool, ...}. Context: the cycle-path
parity=1 program crashed the remote TPU worker 2-3x (step 1 of the train
CLI, /tmp/tpu_train_cli*.log) while parity=0 and the viz program — which
exercise the identical Pallas kernel set — ran fine in the same process.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    tag = sys.argv[1]
    use_pallas = "--no-pallas" not in sys.argv
    parity = 1
    if "--parity" in sys.argv:
        parity = int(sys.argv[sys.argv.index("--parity") + 1])

    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    assert jax.default_backend() not in ("cpu",), "needs the TPU"

    rng = np.random.default_rng(0)
    batch = {
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

    system = SmirkSystem(Config(), assets.load_all(), steps_per_epoch=30,
                         use_pallas=use_pallas)
    state = system.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    try:
        _, metrics, _ = system.train_step(
            state, batch, jax.random.PRNGKey(1), parity=parity)
        jax.block_until_ready(metrics)
        vals = {k: round(float(v), 4) for k, v in metrics.items()}
        print("STAGE_RESULT " + json.dumps(
            {"tag": tag, "ok": True, "t": round(time.time() - t0, 1),
             "metrics": vals}), flush=True)
    except Exception as e:  # noqa: BLE001
        print("STAGE_RESULT " + json.dumps(
            {"tag": tag, "ok": False, "t": round(time.time() - t0, 1),
             "error": str(e)[:300]}), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
