"""CPU diagnostic for the p1 worker crash: does the geometry feeding the
raster drift to extremes within the first few optimization steps?

Fresh-state heads are zero-init (outputs == bias for any image), so
step-0 raster inputs are data-independent; the crashes cluster in steps
1-5 where the state HAS been updated. Runs 4 steps (oracle raster, CPU,
batch 8, full-size archs/224px) on synthetic-loader data and prints, per
step: cam/vertex ranges, NaN counts, per-tile bin counts, and compact
plan occupancy vs the auto budget.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import load_config
    from smirk_tpu.data import load_dataloaders
    from smirk_tpu.render import rasterizer as rl
    from smirk_tpu.train import SmirkSystem

    config = load_config(None, ("train.batch_size=8",
                                "train.samples_per_epoch=64"))
    system = SmirkSystem(config, assets.load_all(), steps_per_epoch=30,
                         use_pallas=False)
    state = system.init_state(jax.random.PRNGKey(0))
    loader, _ = load_dataloaders(config, synthetic=True)
    batches = []
    it = iter(loader)
    for _ in range(4):
        batches.append({k: jnp.asarray(v) for k, v in next(it).items()})

    budget = system.renderer.raster_compact
    capacity = system.renderer.bin_capacity
    print(f"auto budget={budget} capacity={capacity}")

    def stats(label, st, batch):
        enc_out = system.encoder.apply(st.encoder, batch["img"], train=False)
        flame_out = system.flame(enc_out)
        tv = system.renderer.project(flame_out["vertices"], enc_out["cam"])
        fv = rl_face_verts(system, tv)
        cam = np.asarray(enc_out["cam"])
        v = np.asarray(tv)
        bins, counts = rl.bin_faces_flat(fv, config.image_size, capacity)
        counts = np.asarray(counts)
        cc = -(-counts // rl.V3_CHUNK)
        occ = cc.sum(1)
        print(f"{label}: cam[{cam.min():.3f},{cam.max():.3f}] "
              f"verts[{v.min():.2f},{v.max():.2f}] nan={np.isnan(v).sum()} "
              f"maxcount={counts.max()} occ_chunks={occ.min()}-{occ.max()} "
              f"(budget {budget}) overflow={int((occ > budget).sum())}/8")

    def rl_face_verts(system, tv):
        sub = tv[:, system.renderer._kept, :]
        return sub[:, system.renderer.faces]

    rng = jax.random.PRNGKey(1)
    stats("step0-pre", state, batches[0])
    for i, b in enumerate(batches):
        state, metrics, _ = system.train_step(state, b, rng, parity=i)
        stats(f"after-step{i} (parity {i % 2})", state, batches[(i + 1) % 4])
        bad = {k: float(v) for k, v in metrics.items()
               if not np.isfinite(float(v))}
        if bad:
            print(f"  NON-FINITE metrics: {bad}")


if __name__ == "__main__":
    main()
