"""Bounded XLA compiler-option sweep for the parity-0 train step
(VERDICT r4 item 5 — one recorded attack on the 122.5 ms generator-trains
half, then close the chapter like binning).

The parity-0 cost is conv FLOPs through the UNet + frozen re-encode
backward (PARITY.md step decomposition); no graph-level lever is left
(remat NEGATIVE, bf16 is the shipped lever), so what remains is the
compiler's schedule. This AOT-compiles the SAME split-step programs
(bf16, batch 32 — the bench train family) under candidate compiler option
sets via `jitted.lower(...).compile(compiler_options=...)` — options ride
the compile request, so they reach the remote compile helper, unlike a
client-side XLA_FLAGS env var — and times split1+split2(parity=0)
against the resident defaults.

Worker budget: each variant is ~1 slot (bf16 b32 split pair). Default runs
2 variants; SMIRK_SWEEP=name1,name2 selects. Run mid-round with recovery
margin (CLAUDE.md program-budget gotcha).

Usage: python tools/tpu_p0_xla_sweep.py
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smirk_tpu import assets  # noqa: E402
from smirk_tpu.config import Config  # noqa: E402
from smirk_tpu.train import SmirkSystem  # noqa: E402

# SMIRK_SWEEP_CPU=1: tiny-shape CPU smoke of the AOT compile plumbing
# (lower/compile/compiler_options API) without touching the TPU.
CPU_SMOKE = bool(os.environ.get("SMIRK_SWEEP_CPU"))
if CPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
B, S, ITERS = (4, 32, 2) if CPU_SMOKE else (32, 224, 10)

# Candidate option sets. Unknown options fail the compile (recorded as a
# result — "rejected by this libtpu" closes the candidate too).
VARIANTS = {
    # empty option set: exercises the AOT lower/compile path itself
    # (the CPU smoke's default — TPU-only options can't compile on CPU)
    "none": {},
    # scheduler that overlaps HBM copies with compute; conv backward chains
    # with BN stats are exactly the copy/compute interleave it targets
    "lhs_true": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs_false": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # reduce-window/broadcast fusion toggle: BN backward is reduce-heavy
    "rwb_off": {"xla_tpu_rwb_fusion": "false"},
}


def build():
    if CPU_SMOKE:
        jax.config.update("jax_platforms", "cpu")
    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    center = vt[np.asarray(bundle["face_vertex_ids"])].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt
    if CPU_SMOKE:
        from smirk_tpu.config import ArchConfig, LossWeights, TrainConfig

        cfg = Config(
            image_size=S,
            arch=ArchConfig(num_expression=10, num_shape=30,
                            bf16_compute=True),
            train=TrainConfig(batch_size=B, mask_ratio=0.02,
                              mask_dilation_radius=3,
                              loss_weights=LossWeights(
                                  perceptual_vgg_loss=0.0, emotion_loss=0.0,
                                  mica_loss=0.0)),
        )
    else:
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                         use_pallas=not CPU_SMOKE)
    state = system.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, S, S, 3), np.float32)),
        "landmarks_fan": jnp.asarray(
            rng.uniform(-1, 1, (B, 68, 2)).astype(np.float32)),
        "flag_landmarks_fan": jnp.ones((B,), bool),
        "landmarks_mp": jnp.asarray(
            rng.uniform(-1, 1, (B, 105, 2)).astype(np.float32)),
        "mask": jnp.asarray(
            (rng.random((B, S, S, 1)) > 0.5).astype(np.float32)),
        "img_mica": jnp.zeros((B, 112, 112, 3), np.float32),
    }
    return system, state, batch


def time_pair(run1, run2, state, batch, key):
    out1 = run1(state, batch, key)
    st, _, aux1 = out1
    out2 = run2(state, batch, aux1["encoder_output"],
                aux1["transformed_vertices"], key)
    jax.block_until_ready(out2[1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, m1, aux1 = run1(state, batch, key)
        st, m2, _ = run2(state, batch, aux1["encoder_output"],
                         aux1["transformed_vertices"], key)
    jax.block_until_ready(m2)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    assert np.isfinite(float(m1["loss_first_path"]))
    return ms


def main():
    # validate variant names BEFORE the expensive build/baseline work so a
    # typo can't burn a TPU run (and worker budget) on a KeyError
    names = [n for n in os.environ.get(
        "SMIRK_SWEEP", "none" if CPU_SMOKE else "lhs_true,rwb_off"
    ).split(",") if n]
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        raise SystemExit(
            f"unknown SMIRK_SWEEP variants {unknown}; "
            f"known: {sorted(VARIANTS)}")

    system, state, batch = build()
    key = jax.random.PRNGKey(0)
    results = {}

    # baseline = the resident bench-family programs via the normal jit path
    out = system.train_step(state, batch, key, parity=0)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = system.train_step(state, batch, key, parity=0)
    jax.block_until_ready(out[1])
    results["baseline_ms"] = round(
        (time.perf_counter() - t0) / ITERS * 1e3, 1)
    print(json.dumps(results), flush=True)

    for name in names:
        opts = VARIANTS[name]
        try:
            t0 = time.perf_counter()
            c1 = system._split1.lower(
                state, batch, key, final=False).compile(
                    compiler_options=opts)
            aux_probe = system._split1(state, batch, key, final=False)[2]
            c2 = system._split2.lower(
                state, batch, aux_probe["encoder_output"],
                aux_probe["transformed_vertices"], key,
                parity=0).compile(compiler_options=opts)
            compile_s = time.perf_counter() - t0

            def run1(s, b, k, _c=c1):
                return _c(s, b, k)

            def run2(s, b, e, tv, k, _c=c2):
                return _c(s, b, e, tv, k)

            ms = time_pair(run1, run2, state, batch, key)
            results[f"{name}_ms"] = round(ms, 1)
            results[f"{name}_compile_s"] = round(compile_s, 1)
        except Exception as e:  # noqa: BLE001 - record and continue
            results[f"{name}_error"] = str(e)[:200]
        print(json.dumps(results), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
