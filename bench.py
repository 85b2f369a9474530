"""North-star benchmark: 224px video-frame inference fps/chip.

Measures the full crop->encode->FLAME->rasterize pipeline (the workload
reference demo_video.py:107-214 runs synchronously at batch 1 on GPU) as a
single jitted batched program on one chip, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "fps/chip", "vs_baseline": N/500}

Baseline: BASELINE.json north star >= 500 fps/chip on TPU v5e.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

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


def _run_with_retries():
    """The remote TPU worker flakes (compile-helper HTTP 500s; worker
    restarts after a crash can take minutes, during which device init
    hangs). Run the measurement in child processes — a dead worker
    poisons the jax client for the whole process — with bounded retries,
    forwarding the child's final JSON line."""
    # worker recovery after a crash takes 10-40 min (PARITY.md): 5 attempts
    # with escalating sleeps (3/6/12/20 min) span the whole window
    attempts = int(os.environ.get("SMIRK_BENCH_ATTEMPTS", "5"))
    sleeps = [180, 360, 720, 1200]
    env = dict(os.environ, SMIRK_BENCH_INNER="1")
    last = ""
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            for line in reversed(proc.stdout.splitlines()):
                if line.startswith("{"):
                    print(line)
                    return 0
            last = (proc.stderr or proc.stdout)[-400:]
        except subprocess.TimeoutExpired:
            last = "timeout (worker unresponsive)"
        print(f"bench attempt {i + 1}/{attempts} failed: {last}",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(sleeps[min(i, len(sleeps) - 1)])
    print(f"bench failed after {attempts} attempts: {last}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("SMIRK_BENCH_INNER"):
        main()
    else:
        sys.exit(_run_with_retries())
