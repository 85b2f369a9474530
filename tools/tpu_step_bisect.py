"""One-shot TPU bisect of the train step (fp32, batch 32) + batch-64 bf16
throughput refresh.

Splits the step into loss1 fwd / loss1 grad / loss2 fwd / loss2 grad
(both freeze parities) to locate the remaining cost after the compact
raster (full step: fp32 270.4/194.3, bf16 176.1/137.5 ms).

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
    cfg = Config()
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
    state = system.init_state(jax.random.PRNGKey(0))
    batch = make_batch(32)

    ep = state.encoder["params"]
    es = state.encoder["batch_stats"]
    gp = state.generator["params"]
    gs = state.generator["batch_stats"]
    k1, k2 = jax.random.split(key)

    def timed(tag, fn, *args, iters=10):
        try:
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            log(f"{tag} compile+first {time.time() - t0:.0f}s")
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            results[tag] = round(ms, 1)
            log(f"{tag}: {ms:.1f} ms")
            return out
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:200]}
            log(f"{tag} FAILED {type(e).__name__}: {str(e)[:200]}")
            return None

    # NOTE: operands must be jit ARGUMENTS — zero-arg closures bake the
    # weights in as HLO constants and crash the remote compile helper.
    be = state.base_encoder

    # loss1 forward only
    f_l1 = jax.jit(lambda ep, gp, es, gs, batch, k1, be: system._loss1(
        ep, gp, es, gs, batch, k1, True, be)[1])
    aux1 = timed("loss1_fwd", f_l1, ep, gp, es, gs, batch, k1, be)

    # loss1 fwd+bwd
    g_l1 = jax.jit(
        lambda ep, gp, es, gs, batch, k1, be: jax.value_and_grad(
            system._loss1, argnums=(0, 1), has_aux=True)(
            ep, gp, es, gs, batch, k1, True, be))
    timed("loss1_grad", g_l1, ep, gp, es, gs, batch, k1, be)

    enc_out = aux1["encoder_output"]
    tv = aux1["transformed_vertices"]

    # loss2 forward only
    f_l2 = jax.jit(
        lambda ep, gp, es, gs, batch, enc_out, tv, k2: system._loss2(
            ep, gp, es, gs, batch, enc_out, tv, k2, True, False)[0])
    timed("loss2_fwd", f_l2, ep, gp, es, gs, batch, enc_out, tv, k2)

    # loss2 fwd+bwd, both freeze parities
    for fe, fg, tag in ((True, False, "loss2_grad_genTrains"),
                        (False, True, "loss2_grad_encTrains")):
        g_l2 = jax.jit(
            lambda ep, gp, es, gs, batch, enc_out, tv, k2, fe=fe, fg=fg:
            jax.value_and_grad(
                system._loss2, argnums=(0, 1), has_aux=True)(
                ep, gp, es, gs, batch, enc_out, tv, k2, fe, fg))
        timed(tag, g_l2, ep, gp, es, gs, batch, enc_out, tv, k2)

    # batch-64 bf16 throughput refresh
    cfg64 = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    system64 = SmirkSystem(cfg64, bundle, steps_per_epoch=100,
                           use_pallas=True)
    state64 = system64.init_state(jax.random.PRNGKey(0))
    batch64 = make_batch(64)
    for parity in (0, 1):
        timed(f"step64_bf16_p{parity}",
              lambda parity=parity: system64.train_step(
                  state64, batch64, key, parity=parity)[1])

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
