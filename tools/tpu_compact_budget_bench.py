"""One-shot TPU sweep: compact budget {192, 224} on the bench e2e path.

Picks the Renderer's default raster_compact. Budget 336 already measured:
fused 18.48 ms/batch64, bench 2875 fps (tools/tpu_compact_validate.py).

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

    img = jnp.asarray(
        np.random.default_rng(0).random((64, 224, 224, 3), np.float32))

    for budget in (192, 224):
        cfg = Config()
        system = SmirkSystem(cfg, bundle, steps_per_epoch=100,
                             use_pallas=True, raster_compact=budget)
        state = system.init_state(jax.random.PRNGKey(0))
        enc_vars = state.encoder
        face_c = np.asarray(bundle["v_template"])[
            np.asarray(system.renderer.kept_vertices)].mean(0)
        cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])

        @jax.jit
        def forward(img, enc_vars=enc_vars, system=system, cam_fix=cam_fix):
            enc_out = system.encoder.apply(enc_vars, img, train=False)
            flame_out = system.flame(enc_out)
            r = system.renderer(
                flame_out["vertices"], enc_out["cam"] + cam_fix,
                inference=True)
            return (r["rendered_img"], flame_out["vertices"],
                    r["rendered_mask"])

        t0 = time.time()
        out = jax.block_until_ready(forward(img))
        log(f"budget {budget} compile+first {time.time() - t0:.0f}s "
            f"coverage {float(out[2].mean()):.4f}")
        t0 = time.perf_counter()
        for _ in range(20):
            out = forward(img)
        jax.block_until_ready(out)
        fps = 64 * 20 / (time.perf_counter() - t0)
        results[f"bench_fps_{budget}"] = round(fps, 1)
        log(f"budget {budget}: {fps:.1f} fps")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
