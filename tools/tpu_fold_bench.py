"""One-shot TPU experiment: slot->face gradient fold A/B.

The raster backward's last stage folds per-(tile,slot) gradient sums into
per-face gradients. The plain XLA scatter-add measured 19.5 ms/batch64
(tools/tpu_earlyexit_bench.py) — most of the backward. Candidates:
  - scatter:        baseline .at[b, ids].add
  - sorted_scatter: sort by face id first, scatter with indices_are_sorted
  - cumsum:         sort + prefix sums + searchsorted (no scatter at all)

Measures each standalone on realistic shapes (B=64, Tp=56, cap=384, F=3408,
CHN=9) + the full v5 grad with the winner, and numeric agreement.

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

    from smirk_tpu.render import rasterizer as R

    assert jax.default_backend() not in ("cpu",), "this script needs the TPU"
    B, Tp, C, CHN, F = 64, 56, 384, 9, 3408

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    rng = np.random.default_rng(0)
    # realistic bins: depth-sorted ids per tile, ~full occupancy
    bins = rng.integers(0, F, (B, Tp, C)).astype(np.int32)
    bins[:, :, -40:] = -1  # some empty tail slots
    ps = rng.normal(0, 1e-3, (B, Tp, C, CHN)).astype(np.float32)
    bins_d = jnp.asarray(bins)
    ps_d = jnp.asarray(ps)

    results, outs = {}, {}
    REP = 20
    for mode in ("scatter", "sorted_scatter", "cumsum"):
        def fold(ps_d, bins_d, _m=mode):
            R.set_fold_mode(_m)
            return R.fold_slots_to_faces(ps_d, bins_d, F)

        # chain REP folds inside one jit (the i-dependent input defeats
        # loop-invariant hoisting) so the device must run them sequentially
        def many(ps_d, bins_d, _m=mode):
            def body(i, acc):
                scaled = ps_d * (1.0 + i.astype(jnp.float32) * 1e-9)
                return acc + fold(scaled, bins_d)
            return jax.lax.fori_loop(
                0, REP, body, jnp.zeros((B, F, CHN), jnp.float32))

        f = jax.jit(many)
        total = timeit(f, ps_d, bins_d, iters=3)
        ms = total / REP
        outs[mode] = jax.block_until_ready(jax.jit(fold)(ps_d, bins_d))
        results[mode + "_ms"] = round(ms, 2)
        log(f"{mode}: {ms:.2f} ms (chained x{REP})")

    for mode in ("sorted_scatter", "cumsum"):
        d = float(jnp.max(jnp.abs(outs[mode] - outs["scatter"])))
        results[mode + "_maxdiff"] = d
        log(f"{mode} maxdiff vs scatter: {d:.3e}")

    log("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
