"""Quick TPU check: v5 grad e2e with current defaults (moments kernel +
matmul fold). History: 47.8ms (scatter fold, separate moment image) ->
41.6ms (matmul fold) -> this run (fused in-kernel moments).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.render import geometry
    from smirk_tpu.render import rasterizer as R
    from smirk_tpu.render.renderer import Renderer, Z_OFFSET

    assert jax.default_backend() not in ("cpu",)
    B, S = 64, 224
    bundle = dict(assets.load_all())
    vt = np.array(bundle["v_template"], np.float32)
    center = vt[np.asarray(bundle["face_vertex_ids"])].mean(0)
    vt[:, 0] -= center[0]
    vt[:, 1] -= center[1]
    bundle["v_template"] = vt
    rend = Renderer(bundle, image_size=S, use_pallas=True)
    cap = rend.bin_capacity
    rng = np.random.default_rng(0)
    verts = jnp.asarray(
        vt[None] + rng.normal(0, 1e-3, (B, len(vt), 3)).astype(np.float32))
    cam = jnp.asarray(np.tile(np.array([7.0, 0.0, 0.0], np.float32), (B, 1)))

    @jax.jit
    def prep(verts, cam):
        tv = rend.project(verts, cam)
        sub_tv = jnp.concatenate(
            [tv[:, rend._kept][..., :2],
             tv[:, rend._kept][..., 2:] + Z_OFFSET], axis=-1)
        normals = geometry.vertex_normals_gather(
            verts[:, rend._kept], rend.faces, rend._inc_face,
            rend._inc_corner)
        return (geometry.face_vertices(sub_tv, rend.faces),
                geometry.face_vertices(normals, rend.faces))

    fv, fnrm = jax.block_until_ready(prep(verts, cam))

    def vloss(fv, fnrm):
        vals, mask, p2f, _ = R.rasterize_planes_diff(fv, fnrm, S, cap, False)
        return jnp.sum(vals * vals) + jnp.sum(mask)

    jE = jax.jit(jax.grad(vloss, argnums=(0, 1)))
    out = jE(fv, fnrm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = jE(fv, fnrm)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 30 * 1e3
    print("RESULT " + json.dumps(
        {"v5_grad_moments_ms": round(ms, 2), "prev_matmul": 41.57,
         "prev_scatter": 47.78}), flush=True)


if __name__ == "__main__":
    main()
