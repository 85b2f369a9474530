"""North-star benchmark: 224px video-frame inference fps/chip.

Measures the full crop->encode->FLAME->rasterize pipeline (the workload
reference demo_video.py:107-214 runs synchronously at batch 1 on GPU) as a
single jitted batched program on one chip, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "fps/chip", "vs_baseline": N/500}

Baseline: BASELINE.json north star >= 500 fps/chip on TPU v5e.

The line also carries TRAINING throughput (VERDICT r2 item 7): warm
split-step train iterations at batch 32 bf16 for both freeze parities
(`train_ms_batch32_bf16_p0/_p1/_avg`, reference trains batch 32 on one GPU,
configs/config_train.yaml:10-23), and the RECONSTRUCT path (VERDICT r3
item 3 / BASELINE.json workload 3, reference demo.py:133-182): the full
encode+FLAME+render+mesh-mask+UNet analysis-by-synthesis program at batch
64 (`reconstruct_fps`/`reconstruct_ms_batch`, plus the `arch.bf16_compute`
variant `reconstruct_bf16_*` — round-5 serving-config decision). Each extra
measurement runs in its own child process with a bounded timeout so a worker
hiccup there can never cost the headline inference number;
SMIRK_BENCH_NO_TRAIN=1 / SMIRK_BENCH_NO_RECON=1 skip them. The whole run is
accounted against SMIRK_BENCH_DEADLINE_S (default 3000s): one JSON line is
guaranteed on stdout before the budget expires, degrading missing
measurements to error fields rather than going silent under the driver's
timeout (rounds 2 and 4 recorded rc=124 with no output — VERDICT r4 #1).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# Global wall-clock budget (seconds). The driver runs bench.py under its own
# timeout and records rc=124 + NO OUTPUT if we exceed it (this happened in
# rounds 2 and 4, both times on a cold/dying worker: VERDICT r4 weak #1).
# Deadline accounting guarantees ONE JSON line lands on stdout before the
# budget expires: headline retries shrink to fit, extra workloads degrade to
# report fields, and a totally dead worker produces a fast value=null line
# instead of silence.
_T0 = time.monotonic()


def _deadline_s():
    return float(os.environ.get("SMIRK_BENCH_DEADLINE_S", "3000"))


def _remaining():
    return _deadline_s() - (time.monotonic() - _T0)


def _platform_override():
    """SMIRK_PLATFORM=cpu forces CPU for smoke runs: on this machine the
    sitecustomize-registered axon plugin wins over a bare JAX_PLATFORMS env
    var, so jax.config must be updated too (see cli/train.py)."""
    import jax

    if os.environ.get("SMIRK_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    _platform_override()
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (64 if on_tpu else 2)
    iters = 20 if on_tpu else 2

    cfg = Config()
    bundle = assets.load_all()
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=on_tpu)
    state = system.init_state(jax.random.PRNGKey(0))
    enc_vars = state.encoder

    # With random-init weights + the synthetic-template head (not origin
    # centered), the raw cam would put the face off-screen and the raster
    # would measure an empty scene. Recentering the cam translation makes the
    # benchmark render a real full-coverage face; with trained weights and
    # the licensed FLAME model this correction is ~0.
    face_c = np.asarray(bundle["v_template"])[
        np.asarray(system.renderer.kept_vertices)
    ].mean(0)
    cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])

    @jax.jit
    def forward(img):
        enc_out = system.encoder.apply(enc_vars, img, train=False)
        flame_out = system.flame(enc_out)
        rend = system.renderer(
            flame_out["vertices"], enc_out["cam"] + cam_fix, inference=True
        )
        return rend["rendered_img"], flame_out["vertices"], rend["rendered_mask"]

    img = jnp.asarray(
        np.random.default_rng(0).random((batch, 224, 224, 3), np.float32)
    )
    # warmup / compile; also verify the scene is non-empty (coverage > 5%)
    out = forward(img)
    jax.block_until_ready(out)
    coverage = float(out[2].mean())
    assert coverage > 0.05, f"benchmark scene is empty (coverage={coverage})"

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "224px_encode_flame_render_fps_per_chip",
                "value": round(fps, 2),
                "unit": "fps/chip",
                "vs_baseline": round(fps / 500.0, 3),
            }
        )
    )


def train_main():
    """Warm split-step train timing, bf16, both parities (the
    known-crash-free program family, PARITY.md worker notes). Prints one
    JSON line with train_ms_* fields for the parent to merge."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    _platform_override()
    on_tpu = jax.default_backend() not in ("cpu",)

    bundle = dict(assets.load_all())
    # recenter like the inference bench: random-init cam + synthetic
    # template would otherwise render an empty scene (see main())
    vt = np.array(bundle["v_template"], np.float32)
    center = vt[np.asarray(bundle["face_vertex_ids"])].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt

    if on_tpu:
        B, S, iters = 32, 224, 10
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    else:
        # CPU = plumbing smoke only: the full 224px step takes >15 min to
        # compile on a 1-core box; mirror dryrun_multichip's tiny shapes
        from smirk_tpu.config import ArchConfig, LossWeights, TrainConfig

        B, S, iters = 4, 32, 2
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
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=on_tpu)
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
    key = jax.random.PRNGKey(0)
    fields = {}
    for parity in (0, 1):
        out = system.train_step(state, batch, key, parity=parity)
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = system.train_step(state, batch, key, parity=parity)
        jax.block_until_ready(out[1])
        ms = (time.perf_counter() - t0) / iters * 1e3
        fields[f"train_ms_batch{B}_bf16_p{parity}"] = round(ms, 1)
        assert np.isfinite(float(out[1]["loss_first_path"]))
    fields[f"train_ms_batch{B}_bf16_avg"] = round(
        sum(fields.values()) / 2, 1)
    print(json.dumps(fields))


def reconstruct_main():
    """Warm reconstruct-path timing (BASELINE.json workload 3, the paper's
    analysis-by-neural-synthesis demo: reference demo.py:133-182): one
    jitted program running encode -> FLAME -> fused render -> mesh-point
    masking -> fuse-generator UNet at batch 64. Prints one JSON line with
    reconstruct_* fields for the parent to merge.

    The batch is PINNED (64 on TPU, like train_main pins 32): an argv
    batch override only resizes the headline inference program — a novel
    reconstruct-scale program would count against the worker program
    budget (CLAUDE.md). Measures fp32 first and prints its fields, then
    the `arch.bf16_compute` variant (round-5 queue: the serving-config
    decision needs both numbers) and prints a merged line — the parent
    takes the LAST JSON line, so a death during the bf16 compile still
    delivers the fp32 number."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    _platform_override()
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = 64 if on_tpu else 2
    iters = 10 if on_tpu else 2

    bundle = assets.load_all()

    def measure(cfg):
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=on_tpu)
        state = system.init_state(jax.random.PRNGKey(0))
        enc_vars, gen_vars = state.encoder, state.generator

        # recenter like main(): random-init weights + synthetic template
        # would otherwise render an empty scene, understating raster +
        # masking cost
        face_c = np.asarray(bundle["v_template"])[
            np.asarray(system.renderer.kept_vertices)
        ].mean(0)
        cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])

        @jax.jit
        def forward(img, hull, key):
            enc_out = system.encoder.apply(enc_vars, img, train=False)
            flame_out = system.flame(enc_out)
            rend = system.renderer(
                flame_out["vertices"], enc_out["cam"] + cam_fix,
                inference=True
            )
            infer_out = {**enc_out, **flame_out, **rend}
            masked, recon = system.reconstruct(gen_vars, infer_out, img,
                                               hull, key)
            return recon, rend["rendered_mask"]

        S = cfg.image_size
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((batch, S, S, 3), np.float32))
        # synthetic convex-hull stand-in: 1 = background (reference
        # create_mask polarity), face box covering the center ~45% of frame
        hull = np.ones((batch, S, S, 1), np.float32)
        hull[:, S // 4: -S // 8, S // 4: -S // 4] = 0.0
        hull = jnp.asarray(hull)
        key = jax.random.PRNGKey(0)

        out = forward(img, hull, key)
        jax.block_until_ready(out)
        coverage = float(out[1].mean())
        assert coverage > 0.05, f"reconstruct scene is empty ({coverage})"

        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(img, hull, key)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    dt = measure(Config())
    fields = {
        "reconstruct_fps": round(batch * iters / dt, 2),
        "reconstruct_ms_batch": round(dt / iters * 1e3, 2),
        "reconstruct_batch": batch,
    }
    print(json.dumps(fields), flush=True)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, bf16_compute=True))
    dt = measure(cfg)
    fields["reconstruct_bf16_fps"] = round(batch * iters / dt, 2)
    fields["reconstruct_bf16_ms_batch"] = round(dt / iters * 1e3, 2)
    print(json.dumps(fields))


def _run_with_retries():
    """The remote TPU worker flakes (compile-helper HTTP 500s; worker
    restarts after a crash can take minutes, during which device init
    hangs). Run the measurement in child processes — a dead worker
    poisons the jax client for the whole process — with bounded retries,
    forwarding the child's final JSON line. Everything is accounted
    against the global deadline so a JSON line ALWAYS lands on stdout
    before the driver's timeout (rc=124 silence is the one unacceptable
    outcome — see module docstring)."""
    attempts = int(os.environ.get("SMIRK_BENCH_ATTEMPTS", "5"))
    sleeps = [120, 240, 480, 900]
    env = dict(os.environ, SMIRK_BENCH_INNER="1")
    last = ""
    for i in range(attempts):
        # keep >=90s of budget for the extras/error line after this attempt
        budget = _remaining() - 90
        if budget < 60:
            last = last or "deadline exhausted before first attempt"
            break
        out = ""
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                capture_output=True, text=True,
                timeout=min(1500, budget), env=env,
            )
            out = proc.stdout
            last = (proc.stderr or proc.stdout)[-400:]
        except subprocess.TimeoutExpired as e:
            # the worker can die at process TEARDOWN after the measurement
            # printed (PARITY.md worker notes) — salvage the child's stdout
            # instead of discarding a completed headline number
            out = e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode("utf-8", "replace")
            last = "timeout (worker unresponsive)"
        for line in reversed(out.splitlines()):
            if line.startswith("{"):
                print(json.dumps({**json.loads(line), **_train_fields(),
                                  **_recon_fields()}))
                return 0
        print(f"bench attempt {i + 1}/{attempts} failed: {last}",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            # sleeping is only worth it if a full retry still fits after
            sleep = min(sleeps[min(i, len(sleeps) - 1)],
                        max(0, _remaining() - 600))
            time.sleep(sleep)
    # Headline unmeasurable within budget: emit an explicit null line fast
    # (value=null parses; silence does not) and a nonzero rc.
    print(json.dumps({
        "metric": "224px_encode_flame_render_fps_per_chip",
        "value": None, "unit": "fps/chip", "vs_baseline": None,
        "error": f"headline failed within deadline: {last[-300:]}",
    }))
    print(f"bench failed after {attempts} attempts: {last}", file=sys.stderr)
    return 1


def _child_fields(name, inner_env, skip_env, error_key):
    """Extra-workload fields via a bounded child process; any failure
    degrades to a report field instead of risking the headline number.
    No argv is forwarded: both extra workloads pin their own batch sizes
    (worker program budget, see train_main/reconstruct_main).
    Compiles can take ~10-15 min each over the remote compile tunnel;
    warm reruns take seconds."""
    if os.environ.get(skip_env):
        return {}
    budget = _remaining() - 60  # keep 60s to print the merged line
    if budget < 120:
        print(f"{name} bench skipped (deadline)", file=sys.stderr, flush=True)
        return {error_key: "skipped (deadline)"}
    env = dict(os.environ, **{inner_env: "1"})
    for other in ("SMIRK_BENCH_INNER", "SMIRK_BENCH_TRAIN_INNER",
                  "SMIRK_BENCH_RECON_INNER"):
        if other != inner_env:
            env.pop(other, None)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=min(2400, budget),
            env=env,
        )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{"):
                fields = json.loads(line)
                if proc.returncode != 0:
                    # e.g. worker death during a later variant's compile
                    # after the first fields printed: keep them but mark
                    # the record partial so a missing reconstruct_bf16_*
                    # can't pass as never-attempted
                    fields[error_key] = (
                        f"partial (child rc={proc.returncode})")
                return fields
        tail = (proc.stderr or proc.stdout)[-200:]
    except subprocess.TimeoutExpired as e:
        # salvage any fields the child printed before the timeout kill
        # (reconstruct_main prints fp32 fields before the bf16 attempt)
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        for line in reversed(out.splitlines()):
            if line.startswith("{"):
                fields = json.loads(line)
                fields[error_key] = "partial (timeout during later variant)"
                return fields
        tail = "timeout"
    print(f"{name} bench failed (inference number unaffected): {tail}",
          file=sys.stderr, flush=True)
    return {error_key: tail}


def _train_fields():
    return _child_fields("train", "SMIRK_BENCH_TRAIN_INNER",
                         "SMIRK_BENCH_NO_TRAIN", "train_ms_error")


def _recon_fields():
    return _child_fields("reconstruct", "SMIRK_BENCH_RECON_INNER",
                         "SMIRK_BENCH_NO_RECON", "reconstruct_error")


if __name__ == "__main__":
    if os.environ.get("SMIRK_BENCH_RECON_INNER"):
        reconstruct_main()
    elif os.environ.get("SMIRK_BENCH_TRAIN_INNER"):
        train_main()
    elif os.environ.get("SMIRK_BENCH_INNER"):
        main()
    else:
        sys.exit(_run_with_retries())
