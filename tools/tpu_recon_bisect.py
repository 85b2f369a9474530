"""Stage bisect of the reconstruct path at batch 64 (round 5).

Motivation: the driver bench shows reconstruct at 208 ms/b64 while the
encode+FLAME+render prefix is only ~19.4 ms, and `arch.bf16_compute` moved
it by <1% (bench r5 early run) — so the ~189 ms remainder is NOT conv
compute. Candidates: `jax.random.categorical` over ~10k face logits
(gumbel over (B,N,F)), the 21x21 `reduce_window` dilation, the B*N pixel
scatter in transfer_pixels, and the UNet forward. This times cumulative
prefixes so each stage's marginal cost is a subtraction.

Programs: stage `base` equals the resident bench headline; `full` equals
the resident bench reconstruct; the 3 middle prefixes are novel
inference-scale programs (~0.25 slot each).

Usage: python tools/tpu_recon_bisect.py  [stages: base,sample,transfer,mask,full]
"""
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
from smirk_tpu.masking import masking as masking_lib  # noqa: E402
from smirk_tpu.train import SmirkSystem  # noqa: E402

BATCH, ITERS = 64, 10


def main():
    cfg = Config()
    bundle = assets.load_all()
    system = SmirkSystem(cfg, bundle, steps_per_epoch=100, use_pallas=True)
    state = system.init_state(jax.random.PRNGKey(0))
    enc_vars, gen_vars = state.encoder, state.generator
    face_c = np.asarray(bundle["v_template"])[
        np.asarray(system.renderer.kept_vertices)].mean(0)
    cam_fix = jnp.asarray([0.0, -face_c[0], -face_c[1]])

    c = cfg
    S = c.image_size
    mul = float(c.train.mask_ratio_mul)
    n_upper = int(float(c.train.mask_ratio) * mul * S * S)

    def prefix(img, hull, key, stage):
        enc_out = system.encoder.apply(enc_vars, img, train=False)
        flame_out = system.flame(enc_out)
        rend = system.renderer(
            flame_out["vertices"], enc_out["cam"] + cam_fix, inference=True)
        out = {**enc_out, **flame_out, **rend}
        if stage == "base":
            return out["rendered_img"], out["rendered_mask"]
        if stage == "full":
            # the end-to-end number comes from the REAL product path
            # (trainer.py says reconstruct() is the single source for the
            # budget/mask math) so it cannot drift from what ships; the
            # intermediate prefixes below are measurement replicas of its
            # stages and must be kept in sync with it by hand
            _, recon = system.reconstruct(gen_vars, out, img, hull, key)
            return recon, out["rendered_mask"]
        B = img.shape[0]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # incidence tables as in the (round-5 fixed) trainer.reconstruct;
        # SMIRK_BISECT_SCATTER_NORMALS=1 reproduces the pre-fix scatter path
        inc = (None if os.environ.get("SMIRK_BISECT_SCATTER_NORMALS")
               else system.flame_incidence)
        npoints, _ = masking_lib.sample_mesh_points(
            k1, out["transformed_vertices"], system.flame.faces,
            system.face_probabilities, n_upper, S, incidence=inc)
        if stage == "sample":
            return npoints, out["rendered_mask"]
        rsing = jax.random.randint(k2, (B,), 0, 2) * 2 - 1
        rscale = jax.random.uniform(k3, (B,)) * (mul - 1) + 1
        rbound = (n_upper / mul * (rscale ** rsing)).astype(jnp.int32)
        extra = masking_lib.transfer_pixels(
            img, npoints, npoints, valid_count=rbound)
        if stage == "transfer":
            return extra, out["rendered_mask"]
        masked = masking_lib.compose_mask(
            k4, img, hull, extra,
            dilation_radius=int(c.train.mask_dilation_radius),
            rendered_mask=out["rendered_mask"],
            extra_noise=True, random_mask=0.01)
        assert stage == "mask", stage
        return masked, out["rendered_mask"]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((BATCH, S, S, 3), np.float32))
    hull = np.ones((BATCH, S, S, 1), np.float32)
    hull[:, S // 4: -S // 8, S // 4: -S // 4] = 0.0
    hull = jnp.asarray(hull)
    key = jax.random.PRNGKey(0)

    stages = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["base", "sample", "transfer", "mask", "full"])
    results = {}
    prev = None
    for stage in stages:
        fn = jax.jit(lambda i, h, k, s=stage: prefix(i, h, k, s))
        out = fn(img, hull, key)
        jax.block_until_ready(out)
        assert float(out[1].mean()) > 0.05
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(img, hull, key)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[f"{stage}_ms"] = round(ms, 2)
        if prev is not None:
            results[f"{stage}_marginal_ms"] = round(ms - prev, 2)
        prev = ms
        print(json.dumps(results), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
