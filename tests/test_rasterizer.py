"""Rasterizer correctness: coverage oracle, Pallas/jnp consistency,
barycentric interpolation exactness, and gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smirk_tpu.render import rasterizer as R


def make_face_verts(tris):
    """list of 3x3 [[x,y,z],...] -> (1,F,3,3) jnp array."""
    return jnp.asarray(np.asarray(tris, np.float32))[None]


def oracle_coverage(face_verts, size):
    """Slow numpy z-buffer oracle with the same NDC/pixel convention."""
    fv = np.asarray(face_verts)[0]
    p2f = np.full((size, size), -1, np.int64)
    zb = np.full((size, size), R.BIG_Z, np.float64)
    for r in range(size):
        for c in range(size):
            x = (2 * c + 1 - size) / size
            y = (2 * r + 1 - size) / size
            for f, v in enumerate(fv):
                (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = v
                denom = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
                if abs(denom) < R.AREA_EPS:
                    continue
                w0 = ((x1 - x) * (y2 - y) - (y1 - y) * (x2 - x)) / denom
                w1 = ((x2 - x) * (y0 - y) - (y2 - y) * (x0 - x)) / denom
                w2 = ((x0 - x) * (y1 - y) - (y0 - y) * (x1 - x)) / denom
                if w0 >= 0 and w1 >= 0 and w2 >= 0:
                    z = w0 * z0 + w1 * z1 + w2 * z2
                    if z < zb[r, c]:
                        zb[r, c] = z
                        p2f[r, c] = f
    return p2f, zb


def random_mesh(rng, F=40, B=2):
    v0 = rng.uniform(-1, 1, (B, F, 1, 3))
    dv = rng.uniform(-0.4, 0.4, (B, F, 2, 3))
    fv = np.concatenate([v0, v0 + dv], axis=2).astype(np.float32)
    fv[..., 2] = rng.uniform(5, 15, (B, F, 3))
    return jnp.asarray(fv)


def test_coverage_matches_oracle():
    tris = [
        [[-0.5, -0.5, 5.0], [0.5, -0.5, 5.0], [0.0, 0.5, 5.0]],  # front
        [[-0.6, -0.6, 8.0], [0.7, -0.4, 8.0], [0.1, 0.6, 8.0]],  # behind
        [[0.2, 0.2, 2.0], [0.9, 0.2, 2.0], [0.5, 0.9, 2.0]],  # closer, offset
    ]
    fv = make_face_verts(tris)
    p2f, zb = R.rasterize_coverage_jnp(fv, 32)
    op2f, ozb = oracle_coverage(fv, 32)
    assert (op2f >= 0).sum() > 50, "oracle must cover a nontrivial pixel set"
    assert op2f[16, 16] == 0, "front face wins the z-test at the center"
    np.testing.assert_array_equal(np.asarray(p2f)[0], op2f)
    covered = op2f >= 0
    np.testing.assert_allclose(
        np.asarray(zb)[0][covered], ozb[covered], rtol=1e-5
    )


def test_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(1)
    fv = random_mesh(rng, F=60, B=2)
    size = 224  # exercises W padding to 256
    p2f_j, zb_j = R.rasterize_coverage_jnp(fv, size)
    p2f_p, zb_p = R.rasterize_coverage_pallas(
        fv, size, capacity=64, interpret=True
    )
    assert (np.asarray(p2f_j) >= 0).mean() > 0.1, "non-trivial coverage"
    np.testing.assert_array_equal(np.asarray(p2f_j), np.asarray(p2f_p))
    cov = np.asarray(p2f_j) >= 0
    np.testing.assert_allclose(
        np.asarray(zb_j)[cov], np.asarray(zb_p)[cov], rtol=1e-5
    )


def test_bin_capacity_overflow_drops_farthest_faces():
    # 10 stacked triangles, capacity 4: z-priority binning keeps the 4
    # CLOSEST faces, so the true winner (z=0.5, id 9) still renders.
    tris = [[[-0.9, -0.9, float(z)], [0.9, -0.9, float(z)], [0.0, 0.9, float(z)]]
            for z in [9, 8, 7, 6, 5, 4, 3, 2, 1, 0.5]]
    fv = make_face_verts(tris)
    p2f, _ = R.rasterize_coverage_pallas(fv, 16, capacity=4, interpret=True)
    assert np.asarray(p2f)[0, 8, 8] == 9  # closest face survives overflow


def test_interpolation_reproduces_affine_attribute():
    # attribute = x + 2y at each corner => interpolated value must equal
    # x + 2y at every covered pixel center (affine bary interpolation).
    tris = [[[-0.8, -0.8, 5.0], [0.8, -0.8, 5.0], [0.0, 0.8, 5.0]]]
    fv = make_face_verts(tris)
    attr = fv[..., 0:1] + 2.0 * fv[..., 1:2]  # (1,F,3,1)
    p2f, _ = R.rasterize_coverage_jnp(fv, 32)
    vals, mask = R.interpolate_attributes(p2f, fv, attr)
    size = 32
    cs = (2 * np.arange(size) + 1 - size) / size
    expected = cs[None, :] + 2.0 * cs[:, None]
    m = np.asarray(mask)[0, ..., 0] > 0
    assert m.sum() > 100, "triangle must cover a nontrivial pixel set"
    np.testing.assert_allclose(
        np.asarray(vals)[0, ..., 0][m], expected[m], rtol=1e-4, atol=1e-5
    )


def test_gradients_flow_to_vertices():
    tris = [[[-0.8, -0.8, 5.0], [0.8, -0.8, 5.0], [0.0, 0.8, 5.0]]]
    fv = make_face_verts(tris)
    attr = jnp.ones((1, 1, 3, 1))

    def loss(fv_in):
        vals, mask, _, _ = R.rasterize(fv_in, attr * fv_in[..., 2:3], 16,
                                    use_pallas=False)
        return jnp.sum(vals**2)

    g = jax.grad(loss)(fv)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

    # finite-difference check on a z perturbation (coverage unchanged)
    eps = 1e-3
    fv_p = fv.at[0, 0, 0, 2].add(eps)
    fv_m = fv.at[0, 0, 0, 2].add(-eps)
    fd = (loss(fv_p) - loss(fv_m)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[0, 0, 0, 2], fd, rtol=1e-3)


def test_gradient_xy_matches_fd_fixed_coverage():
    # interior-only attribute gradient wrt a vertex x shift, small enough
    # that pixel coverage is unchanged -> autodiff == finite difference
    tris = [[[-0.9, -0.9, 5.0], [0.9, -0.9, 5.0], [0.0, 0.9, 5.0]]]
    fv = make_face_verts(tris)
    attr = jnp.asarray(np.arange(3, dtype=np.float32).reshape(1, 1, 3, 1))
    p2f, _ = R.rasterize_coverage_jnp(fv, 16)

    def loss(fv_in):
        vals, _ = R.interpolate_attributes(p2f, fv_in, attr)
        return jnp.sum(jnp.sin(vals))

    g = jax.grad(loss)(fv)
    eps = 1e-4
    fd = (loss(fv.at[0, 0, 1, 0].add(eps)) - loss(fv.at[0, 0, 1, 0].add(-eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.asarray(g)[0, 0, 1, 0], fd, rtol=1e-2)


def test_renderer_end_to_end_small():
    """Full Renderer on the real face topology with synthetic blendshapes."""
    from smirk_tpu import assets
    from smirk_tpu.flame import FlameModel
    from smirk_tpu.render.renderer import Renderer

    bundle = assets.load_all()
    flame = FlameModel(bundle)
    rend = Renderer(bundle, image_size=64, use_pallas=False)

    B = 2
    params = {
        "shape_params": jnp.zeros((B, 300)),
        "expression_params": jnp.zeros((B, 50)),
        "pose_params": jnp.zeros((B, 3)),
        "jaw_params": jnp.zeros((B, 3)),
        "eyelid_params": jnp.zeros((B, 2)),
    }
    out = flame(params)
    assert out["vertices"].shape == (B, 5023, 3)
    assert out["landmarks_fan"].shape == (B, 68, 3)
    assert out["landmarks_mp"].shape == (B, 105, 3)

    # center the face region in frame (the obj template is not
    # origin-centered; the encoder's cam translation handles this in
    # production)
    face_v = np.asarray(out["vertices"])[:, rend.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.tile(jnp.asarray([[7.0, -c[0], -c[1]]]), (B, 1))
    rout = rend(out["vertices"], cam, {"landmarks_fan": out["landmarks_fan"]})
    img = np.asarray(rout["rendered_img"])
    assert img.shape == (B, 64, 64, 3)
    mask = np.asarray(rout["rendered_mask"])
    assert 0.05 < mask.mean() < 0.95  # face covers part of the frame
    assert img.max() > 0.1  # lit pixels exist
    assert np.isfinite(img).all()
    assert rout["landmarks_fan"].shape == (B, 68, 2)


def test_vertex_normals_gather_matches_scatter():
    from smirk_tpu.render import geometry

    rng = np.random.default_rng(5)
    V, F = 80, 120
    verts = jnp.asarray(rng.normal(0, 1, (3, V, 3)).astype(np.float32))
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    a = geometry.vertex_normals(verts, jnp.asarray(faces))
    fidx, cidx = geometry.build_vertex_face_incidence(faces, V)
    b = geometry.vertex_normals_gather(
        verts, jnp.asarray(faces), jnp.asarray(fidx), jnp.asarray(cidx)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_v3_matches_jnp():
    rng = np.random.default_rng(2)
    fv = random_mesh(rng, F=60, B=2)
    for size in (224, 32):
        p2f_j, zb_j = R.rasterize_coverage_jnp(fv, size)
        p2f_p, zb_p = R.rasterize_coverage_pallas_v3(
            fv, size, capacity=64, interpret=True
        )
        assert (np.asarray(p2f_j) >= 0).mean() > 0.05
        np.testing.assert_array_equal(np.asarray(p2f_j), np.asarray(p2f_p))
        cov = np.asarray(p2f_j) >= 0
        np.testing.assert_allclose(
            np.asarray(zb_j)[cov], np.asarray(zb_p)[cov], rtol=2e-4, atol=1e-5
        )


def test_fused_normals_matches_separate_path():
    """rasterize_normals_fused == coverage + interpolate(normals) pixelwise."""
    rng = np.random.default_rng(7)
    fv = random_mesh(rng, F=50, B=2)
    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    nimg, p2f, zb = R.rasterize_normals_fused(fv, fn, 32, capacity=64,
                                              interpret=True)
    p2f_ref, _ = R.rasterize_coverage_jnp(fv, 32)
    np.testing.assert_array_equal(np.asarray(p2f), np.asarray(p2f_ref))
    vals, mask = R.interpolate_attributes(p2f_ref, fv, fn)
    np.testing.assert_allclose(
        np.asarray(nimg), np.asarray(vals), atol=2e-4, rtol=1e-3
    )


def test_fused_merged_loop_matches_v4():
    """v6 (one fori_loop per grid step over (TPS,CH,P)) is bit-identical to
    the per-tile-loop v4 kernel, at the default and a fatter TPS."""
    rng = np.random.default_rng(11)
    fv = random_mesh(rng, F=50, B=2)
    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    img4, p2f4, zb4 = R.rasterize_normals_fused(fv, fn, 32, capacity=64,
                                                interpret=True)
    for tps in (None, 16):
        img6, p2f6, zb6 = R.rasterize_normals_fused(
            fv, fn, 32, capacity=64, interpret=True, merged=True, tps=tps)
        np.testing.assert_array_equal(np.asarray(p2f4), np.asarray(p2f6))
        np.testing.assert_array_equal(np.asarray(img4), np.asarray(img6))
        np.testing.assert_array_equal(np.asarray(zb4), np.asarray(zb6))


def test_bin_faces_approx_subset_of_exact():
    """approx_max_k binning returns a subset of the exact tile membership
    (it can only MISS overlapping faces, never invent them), with valid ids
    and counts; the fused raster accepts it (bin_approx knob)."""
    rng = np.random.default_rng(23)
    fv = random_mesh(rng, F=120, B=2)
    cap = 64  # < F so the selection is non-trivial
    be, ce = R.bin_faces(fv, 32, cap)
    ba, ca = R.bin_faces(fv, 32, cap, approx=0.95)
    be, ba = np.asarray(be), np.asarray(ba)
    assert (np.asarray(ca) <= cap).all()
    for i in range(be.shape[0]):
        for t in range(be.shape[1]):
            exact = set(be[i, t][be[i, t] >= 0])
            approx = set(ba[i, t][ba[i, t] >= 0])
            assert approx <= exact
    fn = jnp.asarray(rng.normal(0, 1, (2, 120, 3, 3)).astype(np.float32))
    img, p2f, _ = R.rasterize_normals_fused(
        fv, fn, 32, capacity=cap, interpret=True, bin_approx=0.95)
    assert np.isfinite(np.asarray(img)).all()


def test_fused_compact_matches_v4():
    """v7 (compact per-image chunk list + per-tile dynamic windows) is
    bit-identical to v4 when cmax covers the occupied chunks."""
    rng = np.random.default_rng(13)
    fv = random_mesh(rng, F=50, B=2)
    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    img4, p2f4, zb4 = R.rasterize_normals_fused(fv, fn, 32, capacity=64,
                                                interpret=True)
    bins, counts = R.bin_faces(fv, 32, 64)
    needed = int(np.asarray((-(-counts // R.V3_CHUNK)).sum(axis=1)).max())
    img7, p2f7, zb7 = R.rasterize_normals_fused(
        fv, fn, 32, capacity=64, interpret=True, compact=needed)
    np.testing.assert_array_equal(np.asarray(p2f4), np.asarray(p2f7))
    np.testing.assert_array_equal(np.asarray(img4), np.asarray(img7))
    np.testing.assert_array_equal(np.asarray(zb4), np.asarray(zb7))


def test_fused_compact_multi_image_grid_step(monkeypatch):
    """SMIRK_RASTER_IPG=2 (two images per grid step) stays bit-identical
    to the default single-image grid (kept for experiments; default 1)."""
    rng = np.random.default_rng(13)
    fv = random_mesh(rng, F=50, B=2)
    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    img1, p2f1, zb1 = R.rasterize_normals_fused(
        fv, fn, 32, capacity=64, interpret=True, compact=24)
    monkeypatch.setenv("SMIRK_RASTER_IPG", "2")
    R.rasterize_normals_fused.clear_cache()
    img2, p2f2, zb2 = R.rasterize_normals_fused(
        fv, fn, 32, capacity=64, interpret=True, compact=24)
    R.rasterize_normals_fused.clear_cache()
    np.testing.assert_array_equal(np.asarray(p2f1), np.asarray(p2f2))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(zb1), np.asarray(zb2))


def test_fused_compact_truncation_degrades_gracefully():
    """cmax below the occupied chunk count drops trailing tiles' faces but
    never crashes or corrupts other tiles."""
    rng = np.random.default_rng(13)
    fv = random_mesh(rng, F=50, B=2)
    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    img4, p2f4, _ = R.rasterize_normals_fused(fv, fn, 32, capacity=64,
                                              interpret=True)
    img7, p2f7, _ = R.rasterize_normals_fused(
        fv, fn, 32, capacity=64, interpret=True, compact=2)
    a4, a7 = np.asarray(p2f4), np.asarray(p2f7)
    # covered pixels in v7 are a (possibly equal) subset of v4's and agree
    # where present; truncation must never corrupt surviving tiles
    covered7 = a7 >= 0
    assert covered7.sum() <= (a4 >= 0).sum()
    np.testing.assert_array_equal(a7[covered7], a4[covered7])


def test_backface_cull_drops_one_winding():
    """With culling on, only faces of the kept winding rasterize; the other
    winding's pixels become background (or a kept face behind them)."""
    # two overlapping triangles with opposite windings
    tri_ccw = [[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5]]
    tri_cw = [[-0.6, -0.6, 0.2], [0.0, 0.6, 0.2], [0.6, -0.6, 0.2]]
    fv = make_face_verts([tri_ccw, tri_cw])
    p2f_all, _ = R.rasterize_coverage_pallas_v3(fv, 16, capacity=32,
                                                interpret=True)
    present = set(np.unique(np.asarray(p2f_all))) - {-1}
    assert present == {0, 1}
    x, y = np.asarray(fv[..., 0])[0], np.asarray(fv[..., 1])[0]
    a2 = (x[:, 0] * (y[:, 1] - y[:, 2]) + x[:, 1] * (y[:, 2] - y[:, 0])
          + x[:, 2] * (y[:, 0] - y[:, 1]))
    for sign in (1, -1):
        R.rasterize_coverage_pallas_v3.clear_cache()
        R.set_backface_cull(sign)
        try:
            p2f, _ = R.rasterize_coverage_pallas_v3(fv, 16, capacity=32,
                                                    interpret=True)
        finally:
            R.set_backface_cull(None)
            R.rasterize_coverage_pallas_v3.clear_cache()
        kept = set(np.unique(np.asarray(p2f))) - {-1}
        expect = {i for i in (0, 1) if a2[i] * sign > 0}
        assert kept == expect, (sign, kept, expect)


def test_renderer_inference_matches_differentiable():
    """Renderer.render vs render_inference (fused kernel) on the real face."""
    from smirk_tpu import assets
    from smirk_tpu.flame import FlameModel
    from smirk_tpu.render.renderer import Renderer

    bundle = assets.load_all()
    flame = FlameModel(bundle)
    # 64px tiles span the whole face -> bins need room for most of the mesh
    rend = Renderer(bundle, image_size=64, use_pallas=True, bin_capacity=3456)
    rend_ref = Renderer(bundle, image_size=64, use_pallas=False)

    B = 1
    params = {
        "shape_params": jnp.zeros((B, 300)),
        "expression_params": jnp.zeros((B, 50)),
        "pose_params": jnp.zeros((B, 3)),
        "jaw_params": jnp.zeros((B, 3)),
        "eyelid_params": jnp.zeros((B, 2)),
    }
    out = flame(params)
    face_v = np.asarray(out["vertices"])[:, rend.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.asarray([[7.0, -c[0], -c[1]]])
    a = rend(out["vertices"], cam, inference=True)
    b = rend_ref(out["vertices"], cam)
    np.testing.assert_array_equal(
        np.asarray(a["rendered_mask"]), np.asarray(b["rendered_mask"])
    )
    np.testing.assert_allclose(
        np.asarray(a["rendered_img"]), np.asarray(b["rendered_img"]),
        atol=2e-4,
    )


def test_planes_diff_forward_matches_interpolate():
    """Fused v5 kernel (in-kernel plane eval) == coverage + interpolation."""
    rng = np.random.default_rng(11)
    fv = random_mesh(rng, F=40, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 40, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    vals, mask, p2f, _ = R.rasterize_planes_diff(fv, attr, size, cap, True)
    ref_p2f, _ = R.rasterize_coverage_pallas_v3(fv, size, capacity=cap,
                                                interpret=True)
    ref_vals, ref_mask = R.interpolate_attributes(ref_p2f, fv, attr)
    np.testing.assert_array_equal(np.asarray(p2f), np.asarray(ref_p2f))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-4, atol=1e-5
    )


def test_planes_diff_gradients_match_plain():
    """v5 custom-VJP (moment segment-reduce) == autodiff interpolation."""
    rng = np.random.default_rng(12)
    fv = random_mesh(rng, F=40, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 40, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    p2f, _ = R.rasterize_coverage_pallas_v3(fv, size, capacity=cap,
                                            interpret=True)

    def loss_plain(f, a):
        vals, _ = R.interpolate_attributes(p2f, f, a)
        return jnp.sum(jnp.sin(vals) * vals)

    def loss_v5(f, a):
        vals, _, _, _ = R.rasterize_planes_diff(f, a, size, cap, True)
        return jnp.sum(jnp.sin(vals) * vals)

    np.testing.assert_allclose(
        float(loss_plain(fv, attr)), float(loss_v5(fv, attr)), rtol=1e-5
    )
    g1 = jax.grad(loss_plain, argnums=(0, 1))(fv, attr)
    g2 = jax.grad(loss_v5, argnums=(0, 1))(fv, attr)
    for a, b in zip(g1, g2):
        # moment accumulation reassociates the per-pixel sums; fp32 rounding
        # differs by ~1e-5 relative on O(10) gradient magnitudes
        scale = np.abs(np.asarray(a)).max()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3 * max(scale, 1.0)
        )


def test_rasterize_dispatches_to_v5():
    """rasterize(use_pallas=True) returns the fused-diff path's outputs."""
    rng = np.random.default_rng(13)
    fv = random_mesh(rng, F=24, B=1)
    attr = jnp.asarray(rng.normal(0, 1, (1, 24, 3, 3)).astype(np.float32))
    vals, mask, p2f, _ = R.rasterize(fv, attr, 32, capacity=64, use_pallas=True)
    ref, refm, refp, _ = R.rasterize_planes_diff(fv, attr, 32, 64, True)
    np.testing.assert_array_equal(np.asarray(p2f), np.asarray(refp))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref), rtol=1e-6)


def test_planes_diff_compact_matches_padded():
    """The compact-list v5 forward is bit-identical to the padded v5, and
    its custom-VJP gradients match too (the backward consumes the same
    per-tile slot/bins contract)."""
    rng = np.random.default_rng(17)
    fv = random_mesh(rng, F=40, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 40, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    ref, refm, refp, _ = R.rasterize_planes_diff(fv, attr, size, cap, True)
    vals, mask, p2f, _ = R.rasterize_planes_diff(fv, attr, size, cap, True, 24)
    np.testing.assert_array_equal(np.asarray(refp), np.asarray(p2f))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(vals))

    def loss(f, a, compact):
        v, m, _, _ = R.rasterize_planes_diff(f, a, size, cap, True, compact)
        return jnp.sum(jnp.sin(v) * v)

    g1 = jax.grad(loss, argnums=(0, 1))(fv, attr, None)
    g2 = jax.grad(loss, argnums=(0, 1))(fv, attr, 24)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_planes_diff_approx_binning_matches_exact():
    """Approx binning (approx_max_k) on the DIFFERENTIABLE raster returns
    the complete tile membership when no bin overflows its capacity, so
    values, mask, p2f, and gradients are bit-identical to exact top_k
    (TPU-measured 11.7 -> 6.0 ms/batch64; tools/tpu_bin_attack.py)."""
    rng = np.random.default_rng(23)
    B, F = 2, 300
    c = rng.uniform(-0.9, 0.9, (B, F, 1, 2))
    d = rng.uniform(-0.08, 0.08, (B, F, 3, 2))
    xy = c + d  # small scattered triangles: per-tile counts << capacity
    z = np.repeat(rng.uniform(5, 15, (B, F, 1, 1)), 3, axis=2)
    fv = jnp.asarray(np.concatenate([xy, z], -1).astype(np.float32))
    attr = jnp.asarray(rng.normal(0, 1, (B, F, 3, 3)).astype(np.float32))
    size, cap = 32, 256  # k=256 < F=300: the approx selector is non-trivial
    bins, counts = R.bin_faces_flat(fv, size, cap, approx=None)
    assert int(np.asarray(counts).max()) < cap, "fixture must not overflow"

    ref = R.rasterize_planes_diff(fv, attr, size, cap, True, 64, None)
    out = R.rasterize_planes_diff(fv, attr, size, cap, True, 64, 0.95)
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))

    def loss(f, a, approx):
        v, m, _, _ = R.rasterize_planes_diff(f, a, size, cap, True, 64,
                                             approx)
        return jnp.sum(jnp.sin(v) * v)

    g1 = jax.grad(loss, argnums=(0, 1))(fv, attr, None)
    g2 = jax.grad(loss, argnums=(0, 1))(fv, attr, 0.95)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_plan_reports_overflow():
    """_compact_plan counts the occupied chunks dropped past the budget
    (ADVICE r2: overflow used to be silently clipped — trailing tiles
    rendered empty with zero gradients and nothing detected it)."""
    # tile chunk counts: ceil(40/32)+0+ceil(33/32)+ceil(1/32) = 2+2+1 = 5
    counts = jnp.asarray([[40, 0, 33, 1, 0, 0, 0, 0],
                          [0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    *_, dropped = R._compact_plan(counts, 8)
    assert dropped.tolist() == [0, 0]
    *_, dropped = R._compact_plan(counts, 4)
    assert dropped.tolist() == [1, 0]
    *_, dropped = R._compact_plan(counts, 2)
    assert dropped.tolist() == [3, 0]


def test_planes_diff_overflow_surfaced():
    """rasterize_planes_diff reports per-image dropped chunks: zero when
    the budget fits (bit-exact render), positive when it doesn't."""
    rng = np.random.default_rng(17)
    fv = random_mesh(rng, F=400, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 400, 3, 3)).astype(np.float32))
    size, cap = 32, 128
    _, _, _, ov_fit = R.rasterize_planes_diff(fv, attr, size, cap, True, 32)
    assert np.asarray(ov_fit).tolist() == [0, 0]
    _, _, _, ov_none = R.rasterize_planes_diff(fv, attr, size, cap, True)
    assert np.asarray(ov_none).tolist() == [0, 0]  # padded path: zeros
    # an 8-chunk budget is below this mesh's occupied chunks -> reported
    bins, counts = R.bin_faces(fv, size, cap)
    occupied = int(np.asarray(-(-counts // R.V3_CHUNK)).sum(axis=1).max())
    assert occupied > 8, "fixture regression: mesh no longer overflows 8"
    _, _, _, ov = R.rasterize_planes_diff(fv, attr, size, cap, True, 8)
    expect = np.maximum(
        np.asarray(-(-counts // R.V3_CHUNK)).sum(axis=1) - 8, 0)
    np.testing.assert_array_equal(np.asarray(ov), expect)


def test_renderer_exports_raster_overflow():
    """Renderer.__call__ surfaces `raster_overflow` on BOTH render paths:
    zeros at the auto budget, positive when the budget is forced tiny."""
    from smirk_tpu import assets
    from smirk_tpu.flame import FlameModel
    from smirk_tpu.render.renderer import Renderer

    bundle = assets.load_all()
    flame = FlameModel(bundle)
    B = 1
    params = {
        "shape_params": jnp.zeros((B, 300)),
        "expression_params": jnp.zeros((B, 50)),
        "pose_params": jnp.zeros((B, 3)),
        "jaw_params": jnp.zeros((B, 3)),
        "eyelid_params": jnp.zeros((B, 2)),
    }
    out = flame(params)
    rend = Renderer(bundle, image_size=64, use_pallas=True, bin_capacity=3456)
    face_v = np.asarray(out["vertices"])[:, rend.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.asarray([[7.0, -c[0], -c[1]]])
    for inference in (False, True):
        ok = rend(out["vertices"], cam, inference=inference)
        assert np.asarray(ok["raster_overflow"]).tolist() == [0]
    tiny = Renderer(bundle, image_size=64, use_pallas=True,
                    bin_capacity=3456, raster_compact=16)
    for inference in (False, True):
        bad = tiny(out["vertices"], cam, inference=inference)
        assert int(np.asarray(bad["raster_overflow"])[0]) > 0, inference


def test_interpolate_fast_gradients_match_plain():
    """Custom-VJP interpolation == autodiff interpolation (values + grads)."""
    rng = np.random.default_rng(9)
    fv = random_mesh(rng, F=40, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 40, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    p2f, _, p2slot, bins = R.rasterize_coverage_pallas_v3_full(
        fv, size, capacity=cap, interpret=True
    )

    def loss_plain(f, a):
        vals, _ = R.interpolate_attributes(p2f, f, a)
        return jnp.sum(jnp.sin(vals) * vals)

    def loss_fast(f, a):
        vals, _ = R.interpolate_attributes_fast(
            f, a, p2f, p2slot, bins, size, cap, True
        )
        return jnp.sum(jnp.sin(vals) * vals)

    np.testing.assert_allclose(
        float(loss_plain(fv, attr)), float(loss_fast(fv, attr)), rtol=1e-6
    )
    g1 = jax.grad(loss_plain, argnums=(0, 1))(fv, attr)
    g2 = jax.grad(loss_fast, argnums=(0, 1))(fv, attr)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_planes_diff_capacity_not_multiple_of_128():
    """Renderer auto-capacities are multiples of 32, not 128; the backward
    segment-reduce must pick a slot chunk that divides them (regression:
    found by driving the train CLI at image_size=32)."""
    rng = np.random.default_rng(14)
    fv = random_mesh(rng, F=24, B=1)
    attr = jnp.asarray(rng.normal(0, 1, (1, 24, 3, 3)).astype(np.float32))

    def loss(f, a):
        vals, _, _, _ = R.rasterize_planes_diff(f, a, 32, 96, True)
        return jnp.sum(vals ** 2)

    g = jax.grad(loss, argnums=(0, 1))(fv, attr)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    p2f, _ = R.rasterize_coverage_pallas_v3(fv, 32, capacity=96,
                                            interpret=True)
    ref, _ = R.interpolate_attributes(p2f, fv, attr)
    g_ref = jax.grad(lambda f, a: jnp.sum(
        R.interpolate_attributes(p2f, f, a)[0] ** 2), argnums=(0, 1))(fv, attr)
    for a, b in zip(g, g_ref):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3 * scale)


def _facelike_scene(rng, B=2, F=3408, spread=0.7, tri=0.03):
    c = rng.uniform(-spread, spread, (B, F, 1, 2))
    xy = c + rng.uniform(-tri, tri, (B, F, 3, 2))
    z = rng.uniform(9.5, 10.5, (B, F, 1, 1)) + rng.uniform(
        -0.01, 0.01, (B, F, 3, 1)
    )
    return jnp.asarray(
        np.concatenate([xy, np.broadcast_to(z, (B, F, 3, 1))], -1), jnp.float32
    )


def test_hierarchical_binning_matches_flat():
    """Two-level binning (coarse 32px bands -> fine 8x128 tiles) must produce
    exactly the flat binning's bins/counts: the coarse candidate list is
    depth-sorted by top_k, so fine position-priority reproduces the flat
    (zbucket, id) order, including overflow-drops-farthest."""
    rng = np.random.default_rng(3)
    fv = _facelike_scene(rng)
    for cap in (64, 384):
        bf, cf = R.bin_faces_flat(fv, 224, cap)
        bh, ch = R.bin_faces_hier(fv, 224, cap)
        assert (cf == ch).all() and (bf == bh).all()
    # dense scene forcing coarse-band overflow (>COARSE_CAPACITY per band):
    # the kept `capacity` nearest per tile must still agree
    fv2 = _facelike_scene(rng, spread=0.05, tri=0.01)
    bf, cf = R.bin_faces_flat(fv2, 224, 384)
    bh, ch = R.bin_faces_hier(fv2, 224, 384)
    assert (cf == ch).all() and (bf == bh).all()


def test_hierarchical_binning_approx_subset():
    """Hier binning with approx stages yields a subset of the exact hier
    membership per tile (approx can only miss faces, never invent)."""
    rng = np.random.default_rng(3)
    fv = _facelike_scene(rng)
    be, _ = R.bin_faces_hier(fv, 224, 384)
    ba, ca = R.bin_faces_hier(fv, 224, 384, approx=0.95)
    be, ba = np.asarray(be), np.asarray(ba)
    assert (np.asarray(ca) <= 384).all()
    for i in range(be.shape[0]):
        for t in range(be.shape[1]):
            exact = set(be[i, t][be[i, t] >= 0])
            approx = set(ba[i, t][ba[i, t] >= 0])
            assert approx <= exact


def test_bin_faces_dispatcher_small_f_uses_flat():
    """Below the hierarchy's payoff threshold the dispatcher must fall back
    to flat binning (F <= 2*COARSE_CAPACITY or a single band of tiles)."""
    rng = np.random.default_rng(4)
    fv = random_mesh(rng, F=40, B=1)
    bd, cd = R.bin_faces(fv, 32, 16)
    bf, cf = R.bin_faces_flat(fv, 32, 16)
    assert (bd == bf).all() and (cd == cf).all()


def test_early_exit_slanted_planes_safe():
    """Early-exit regression: bins are sorted by MEAN z, but a later (higher
    zmean) face can still win pixels where its slanted plane dips below the
    current winner. The exit test (all covered AND max winner z <= next
    chunk's min VERTEX z) must keep scanning in that case."""
    # face A: full-screen, z 5 (left) -> 15 (right), zmean 10 (bin first)
    # face B: full-screen, z 14 (left) -> 8 (right), zmean ~11 (bin LAST);
    # B must win the right half despite A covering everything first. The
    # mid faces (zmean 10.2-10.8, between A and B) push B into the third
    # V3_CHUNK chunk so the early-exit check actually runs before B.
    big = 3.0
    A = [[-big, -big, 5.0], [big, -big, 15.0], [0.0, big, 10.0]]
    Bf = [[-big, -big, 14.0], [big, -big, 8.0], [0.0, big, 11.0]]
    mid = [
        [[-0.1 + 0.001 * i, -0.1, 10.2 + 0.01 * i],
         [0.1 + 0.001 * i, -0.1, 10.2 + 0.01 * i],
         [0.001 * i, 0.1, 10.2 + 0.01 * i]]
        for i in range(2 * R.V3_CHUNK)
    ]
    fv = make_face_verts([A] + mid + [Bf])
    size = 32
    p2f_o, _ = R.rasterize_coverage_jnp(fv, size)
    cap = -(-fv.shape[1] // R.V3_CHUNK) * R.V3_CHUNK
    p2f, _ = R.rasterize_coverage_pallas_v3(fv, size, capacity=cap,
                                            interpret=True)
    assert np.asarray(p2f_o)[0, 16, 28] != np.asarray(p2f_o)[0, 16, 2], \
        "scene must split the winner between A and B"
    assert (np.asarray(p2f) == np.asarray(p2f_o)).all()


def test_fused_rejects_sort_tiles_with_compact():
    """sort_tiles reorders bins but the compact kernel derives pixel
    coordinates from the tile row index — the combination would silently
    rasterize each tile at another tile's pixels, so it must be rejected."""
    rng = np.random.default_rng(3)
    fv = random_mesh(rng, F=50, B=1)
    fn = jnp.asarray(rng.normal(0, 1, (1, 50, 3, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="sort_tiles"):
        R.rasterize_normals_fused(fv, fn, 32, capacity=64, interpret=True,
                                  sort_tiles=True, compact=16)


def test_coverage_jnp_non_multiple_row_chunk():
    """image_size not divisible by row_chunk (and smaller than it): the
    chunked lax.map path must stitch the clamped last chunk back to exactly
    H rows, matching a single-chunk run bit-for-bit."""
    rng = np.random.default_rng(0)
    fv = jnp.asarray(rng.normal(0, 0.5, (2, 30, 3, 3)).astype(np.float32))
    for s in (100, 10, 17):
        p2f, zb = R.rasterize_coverage_jnp(fv, s)
        assert p2f.shape == (2, s, s)
        p2f_ref, zb_ref = R.rasterize_coverage_jnp(fv, s, row_chunk=s)
        np.testing.assert_array_equal(np.asarray(p2f), np.asarray(p2f_ref))
        np.testing.assert_allclose(np.asarray(zb), np.asarray(zb_ref))


def test_bin_mode_approx_applies_to_hier_branch():
    """set_bin_mode(hier, approx): the global approx fallback must reach
    bin_faces_hier, not just the flat branch (a silent exact-top_k there
    defeats the knob's purpose)."""
    rng = np.random.default_rng(1)
    fv = jnp.asarray(rng.normal(0, 0.4, (1, 700, 3, 3)).astype(np.float32))
    try:
        R.set_bin_mode(False, 0.95)
        flat_b, flat_c = R.bin_faces_flat(fv, 64, 64)
        hier_b, hier_c = R.bin_faces_hier(fv, 64, 64, coarse_capacity=256)
        # both paths ran with approx from the global: the coarse candidate
        # selection is approx_max_k, so outputs are well-formed and counts
        # bounded by capacity
        assert int(jnp.max(flat_c)) <= 64 and int(jnp.max(hier_c)) <= 64
    finally:
        R.set_bin_mode(False, None)


# ---------------------------------------------------------------------------
# Approx-binning miss check (ROADMAP round-4 hardening, landed default-off):
# pre- vs post-selection counts fold into the raster_overflow surface.
# ---------------------------------------------------------------------------


def test_selection_misses_math():
    """min(pre, k) - counts: capacity overflow (pre > k, full selection)
    is NOT a miss; a selector returning fewer valid faces than available
    slots is."""
    pre = jnp.asarray([[5, 2, 0, 9], [0, 0, 0, 0]], jnp.int32)
    counts = jnp.asarray([[3, 2, 0, 8], [0, 0, 0, 0]], jnp.int32)
    misses = R.selection_misses(pre, counts, k=8)
    assert misses.tolist() == [2, 0]


def test_bin_faces_with_misses_zero_when_exact():
    """with_misses reports zero for exact top_k (by construction) and for
    approx on CPU (lowers to exact), without perturbing bins/counts —
    including under capacity overflow, which is a different surface."""
    rng = np.random.default_rng(23)
    fv = random_mesh(rng, F=120, B=2)
    for approx in (None, 0.95):
        b2, c2 = R.bin_faces_flat(fv, 32, 64, approx=approx)
        b3, c3, miss = R.bin_faces_flat(fv, 32, 64, approx=approx,
                                        with_misses=True)
        np.testing.assert_array_equal(np.asarray(b2), np.asarray(b3))
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(c3))
        assert miss.tolist() == [0, 0]
    _, c_over, miss = R.bin_faces_flat(fv, 32, 8, with_misses=True)
    assert int(np.asarray(c_over).max()) == 8, "fixture must overflow cap"
    assert miss.tolist() == [0, 0]
    # hier branch carries the same contract (coarse + fine stages)
    fvh = jnp.asarray(rng.normal(0, 0.4, (1, 700, 3, 3)).astype(np.float32))
    bh, ch = R.bin_faces_hier(fvh, 64, 64, coarse_capacity=256)
    bh2, ch2, missh = R.bin_faces_hier(fvh, 64, 64, coarse_capacity=256,
                                       with_misses=True)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(bh2))
    np.testing.assert_array_equal(np.asarray(ch), np.asarray(ch2))
    assert missh.tolist() == [0]


def test_bin_faces_sorted_matches_flat_exact():
    """Sort-based incidence binning (round-4 candidate for the top_k
    selection) must be BIT-IDENTICAL to exact flat top_k binning — same
    bins (including within-tile near-to-far order), same counts — and
    report zero span-clip misses on meshes whose bboxes fit the default
    spans. Includes capacity overflow: both paths drop the same farthest
    faces."""
    rng = np.random.default_rng(41)
    for F, size, cap in ((120, 32, 64), (300, 64, 96), (120, 32, 32)):
        fv = random_mesh(rng, F=F, B=2)
        b1, c1 = R.bin_faces_flat(fv, size, cap, approx=None)
        b2, c2, miss = R.bin_faces_sorted(fv, size, cap, with_misses=True)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2),
                                      err_msg=f"F={F} size={size} cap={cap}")
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2),
                                      err_msg=f"F={F} size={size} cap={cap}")
        assert miss.tolist() == [0, 0]
    # off-screen faces bin nowhere (the lo-clip must not fold them into
    # the last tile row/column)
    off = np.array(random_mesh(rng, F=8, B=1))
    off[..., 1] += 4.0  # NDC y >> 1: below the screen
    b3, c3, miss3 = R.bin_faces_sorted(jnp.asarray(off), 32, 16,
                                       with_misses=True)
    assert int(np.asarray(c3).sum()) == 0 and miss3.tolist() == [0]


def test_bin_faces_sorted_span_clip_is_counted():
    """A triangle taller than max_row_span tile-rows loses its far rows —
    and the loss must be visible in the misses output."""
    tris = [[[-0.1, -0.9, 5.0], [0.1, -0.9, 5.0], [0.0, 0.9, 5.0]]]
    fv = make_face_verts(tris)
    bfull, cfull = R.bin_faces_sorted(fv, 32, 16, max_row_span=8)
    assert int(np.asarray(cfull).sum()) >= 3  # spans several tile rows
    bclip, cclip, miss = R.bin_faces_sorted(fv, 32, 16, max_row_span=1,
                                            with_misses=True)
    assert int(np.asarray(cclip).sum()) < int(np.asarray(cfull).sum())
    assert int(np.asarray(miss)[0]) == (
        int(np.asarray(cfull).sum()) - int(np.asarray(cclip).sum()))


def test_injected_bin_miss_surfaces_in_overflow(monkeypatch):
    """A lossy selector (top candidate of every tile dropped) is invisible
    to the post-selection overflow counts but MUST show on the miss check:
    check-off overflow stays 0 (the documented blind spot), check-on
    overflow counts exactly one miss per non-empty tile."""
    rng = np.random.default_rng(29)
    fv = random_mesh(rng, F=60, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 60, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    _, counts_exact, miss0 = R.bin_faces_flat(fv, size, cap,
                                              with_misses=True)
    assert miss0.tolist() == [0, 0]
    expected = (np.asarray(counts_exact) > 0).sum(axis=1)
    assert (expected > 0).all(), "fixture regression: empty scene"

    real_top_k = jax.lax.top_k

    def lossy_approx_max_k(keyf, k, recall_target=None, **kw):
        vals, idx = real_top_k(keyf, k)
        return vals.at[..., 0].set(-1.0), idx  # best face "missed"

    monkeypatch.setattr(jax.lax, "approx_max_k", lossy_approx_max_k)
    _, _, miss = R.bin_faces_flat(fv, size, cap, approx=0.9,
                                  with_misses=True)
    np.testing.assert_array_equal(np.asarray(miss), expected)
    # end to end through the differentiable raster's overflow output
    big_budget = 2 * int(
        np.asarray(-(-counts_exact // R.V3_CHUNK)).sum(axis=1).max())
    blind = R.rasterize_planes_diff(fv, attr, size, cap, True, big_budget,
                                    0.9, False)
    assert np.asarray(blind[3]).tolist() == [0, 0]
    seen = R.rasterize_planes_diff(fv, attr, size, cap, True, big_budget,
                                   0.9, True)
    np.testing.assert_array_equal(np.asarray(seen[3]), expected)


def test_bin_miss_check_preserves_outputs_and_grads():
    """bin_miss_check=True is a pure observability add: values, masks,
    pix_to_face and gradients are bit-identical to check-off, and the
    fused inference raster accepts the flag too."""
    rng = np.random.default_rng(31)
    fv = random_mesh(rng, F=50, B=2)
    attr = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    size, cap = 32, 64
    ref = R.rasterize_planes_diff(fv, attr, size, cap, True, 32, 0.95, False)
    out = R.rasterize_planes_diff(fv, attr, size, cap, True, 32, 0.95, True)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(f, a, check):
        v, m, _, _ = R.rasterize_planes_diff(f, a, size, cap, True, 32,
                                             0.95, check)
        return jnp.sum(jnp.sin(v) * v)

    g1 = jax.grad(loss, argnums=(0, 1))(fv, attr, False)
    g2 = jax.grad(loss, argnums=(0, 1))(fv, attr, True)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fn = jnp.asarray(rng.normal(0, 1, (2, 50, 3, 3)).astype(np.float32))
    img0, p2f0, zb0, ov0 = R.rasterize_normals_fused(
        fv, fn, size, capacity=cap, interpret=True, compact=32,
        bin_approx=0.95, return_overflow=True)
    img1, p2f1, zb1, ov1 = R.rasterize_normals_fused(
        fv, fn, size, capacity=cap, interpret=True, compact=32,
        bin_approx=0.95, return_overflow=True, bin_miss_check=True)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(p2f0), np.asarray(p2f1))
    np.testing.assert_array_equal(np.asarray(ov0), np.asarray(ov1))


def test_renderer_bin_miss_check_flag(monkeypatch):
    """Round-5 default: BOTH paths arm the miss check whenever their approx
    binning is active (fused-path arming measured FREE at b64 on v5e —
    tools/tpu_infer_misscheck_bench.py; callers not consuming
    raster_overflow pay nothing via DCE). SMIRK_BIN_MISS_CHECK=1/0
    arms/disarms BOTH paths. Arming never changes the rendered output;
    raster_overflow stays zero on this backend (exact selection)."""
    from smirk_tpu import assets
    from smirk_tpu.flame import FlameModel
    from smirk_tpu.render.renderer import Renderer

    bundle = assets.load_all()
    flame = FlameModel(bundle)
    B = 1
    params = {
        "shape_params": jnp.zeros((B, 300)),
        "expression_params": jnp.zeros((B, 50)),
        "pose_params": jnp.zeros((B, 3)),
        "jaw_params": jnp.zeros((B, 3)),
        "eyelid_params": jnp.zeros((B, 2)),
    }
    out = flame(params)
    base = Renderer(bundle, image_size=64, use_pallas=True,
                    bin_capacity=3456)
    assert base.bin_miss_check_diff  # guarded by default (approx binning on)
    assert base.bin_miss_check_fused  # round 5: fused path armed too
    # exact diff binning -> nothing to guard on that path
    exact = Renderer(bundle, image_size=64, use_pallas=True,
                     bin_capacity=3456, diff_bin_approx=None)
    assert not exact.bin_miss_check_diff
    # exact fused binning -> fused check off as well
    exact_f = Renderer(bundle, image_size=64, use_pallas=True,
                       bin_capacity=3456, bin_approx=None)
    assert not exact_f.bin_miss_check_fused
    monkeypatch.setenv("SMIRK_BIN_MISS_CHECK", "0")
    disarmed = Renderer(bundle, image_size=64, use_pallas=True,
                        bin_capacity=3456)
    assert not disarmed.bin_miss_check_diff
    assert not disarmed.bin_miss_check_fused
    monkeypatch.setenv("SMIRK_BIN_MISS_CHECK", "1")
    armed = Renderer(bundle, image_size=64, use_pallas=True,
                     bin_capacity=3456)
    assert armed.bin_miss_check_diff and armed.bin_miss_check_fused
    # empty string = unset (a launcher clearing the var must NOT silently
    # disarm the training-path default; round-4 review finding)
    monkeypatch.setenv("SMIRK_BIN_MISS_CHECK", "")
    cleared = Renderer(bundle, image_size=64, use_pallas=True,
                       bin_capacity=3456)
    assert cleared.bin_miss_check_diff
    assert cleared.bin_miss_check_fused
    face_v = np.asarray(out["vertices"])[:, base.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.asarray([[7.0, -c[0], -c[1]]])
    for inference in (False, True):
        a = base(out["vertices"], cam, inference=inference)
        b = armed(out["vertices"], cam, inference=inference)
        assert np.asarray(b["raster_overflow"]).tolist() == [0]
        np.testing.assert_array_equal(
            np.asarray(a["rendered_img"]), np.asarray(b["rendered_img"]))


def test_fused_miss_check_requires_overflow_surface():
    """Arming bin_miss_check without return_overflow would compute misses
    and silently discard them — must be rejected (advisor r3)."""
    rng = np.random.default_rng(33)
    fv = random_mesh(rng, F=50, B=1)
    fn = jnp.asarray(rng.normal(0, 1, (1, 50, 3, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="return_overflow"):
        R.rasterize_normals_fused(fv, fn, 32, capacity=64, interpret=True,
                                  bin_approx=0.95, bin_miss_check=True)


def test_default_renderer_surfaces_injected_miss(monkeypatch):
    """End to end through the DEFAULT training-path configuration (no env,
    no flags): a lossy approx selector must show up in the renderer's
    raster_overflow output — the surface the trainer logs as the
    `raster_overflow` metric. This is the round-4 guard for the
    diff_bin_approx=0.95 default (VERDICT r3 item 1): the blind spot where
    a recall miss perturbed gradients invisibly is closed."""
    from smirk_tpu import assets
    from smirk_tpu.flame import FlameModel
    from smirk_tpu.render.renderer import Renderer

    bundle = assets.load_all()
    flame = FlameModel(bundle)
    params = {
        "shape_params": jnp.zeros((1, 300)),
        "expression_params": jnp.zeros((1, 50)),
        "pose_params": jnp.zeros((1, 3)),
        "jaw_params": jnp.zeros((1, 3)),
        "eyelid_params": jnp.zeros((1, 2)),
    }
    out = flame(params)
    renderer = Renderer(bundle, image_size=64, use_pallas=True,
                        bin_capacity=3456)
    assert renderer.diff_bin_approx is not None  # the shipped default
    face_v = np.asarray(out["vertices"])[:, renderer.kept_vertices]
    c = face_v.mean(axis=(0, 1))
    cam = jnp.asarray([[7.0, -c[0], -c[1]]])

    real_top_k = jax.lax.top_k

    def lossy_approx_max_k(keyf, k, recall_target=None, **kw):
        vals, idx = real_top_k(keyf, k)
        return vals.at[..., 0].set(-1.0), idx  # nearest face "missed"

    monkeypatch.setattr(jax.lax, "approx_max_k", lossy_approx_max_k)
    res = renderer(out["vertices"], cam, inference=False)
    assert int(np.asarray(res["raster_overflow"]).sum()) > 0


# ---------------------------------------------------------------------------
# Chunk-skip fused raster (round-4 binning attack, opt-in)
# ---------------------------------------------------------------------------


def _chunky_scene(rng, B=3, F=52, S=64):
    """Clustered small triangles with varied z; F deliberately NOT a
    multiple of the chunk sizes under test (exercises offscreen padding)."""
    v = rng.uniform(-1.1, 1.1, (B, F, 3, 2)).astype(np.float32)
    c = rng.uniform(-1, 1, (B, F, 1, 2)).astype(np.float32)
    v = c + (v - c) * 0.25
    z = rng.uniform(0.5, 2.0, (B, F, 1, 1)).astype(np.float32) + rng.uniform(
        -0.05, 0.05, (B, F, 3, 1)
    ).astype(np.float32)
    fv = jnp.asarray(np.concatenate([v, z], -1))
    fn = jnp.asarray(rng.normal(size=(B, F, 3, 3)).astype(np.float32))
    return fv, fn


@pytest.mark.parametrize("chunk", [4, 8, 16])
def test_chunkskip_matches_fused_exact(chunk):
    """rasterize_normals_chunkskip == exact fused raster: identical
    pix_to_face (membership + z-winner), z/normals within the plane-eval
    float noise the fused-vs-oracle tests already tolerate."""
    rng = np.random.default_rng(0)
    S = 64
    fv, fn = _chunky_scene(rng, S=S)
    base = R.rasterize_normals_fused(
        fv, fn, S, capacity=64, bin_approx=None, interpret=True
    )
    out = R.rasterize_normals_chunkskip(
        fv, fn, S, chunk=chunk, cap=32, interpret=True, return_overflow=True
    )
    assert float((base[1] >= 0).mean()) > 0.1, "non-trivial coverage"
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(base[1]))
    cov = np.asarray(base[1]) >= 0
    np.testing.assert_allclose(
        np.asarray(out[2])[cov], np.asarray(base[2])[cov],
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(base[0]), atol=2e-4, rtol=1e-3
    )
    assert (np.asarray(out[3]) == 0).all()


def test_chunkskip_permuted_input_keeps_original_ids():
    """A spatial_face_order permutation of the inputs plus face_ids=perm
    reproduces the unpermuted pix_to_face exactly."""
    rng = np.random.default_rng(1)
    S = 64
    fv, fn = _chunky_scene(rng, S=S)
    base = R.rasterize_normals_fused(
        fv, fn, S, capacity=64, bin_approx=None, interpret=True
    )
    cent = rng.normal(size=(fv.shape[1] * 3, 3))
    perm = R.spatial_face_order(
        cent, np.arange(fv.shape[1] * 3).reshape(fv.shape[1], 3)
    )
    out = R.rasterize_normals_chunkskip(
        fv[:, perm], fn[:, perm], S, chunk=8, cap=32, interpret=True,
        face_ids=jnp.asarray(np.asarray(perm)),
    )
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(base[1]))


def test_chunkskip_overflow_drops_farthest_and_reports():
    """Overfilled tile: cap overflow drops the FARTHEST chunks (near-to-far
    chunk priority), keeps the nearest winner, and reports the drop count."""
    rng = np.random.default_rng(2)
    B, F, S, CH = 1, 64, 32, 8
    # all faces cover the same top-left region; z grows with face id so
    # chunk priority follows chunk order
    xy = np.tile(
        np.asarray([[-0.9, -0.9], [-0.2, -0.9], [-0.55, -0.55]], np.float32),
        (B, F, 1, 1),
    )
    z = (1.0 + np.arange(F, dtype=np.float32) * 0.1)[None, :, None, None]
    fv = jnp.asarray(
        np.concatenate([xy, np.broadcast_to(z, (B, F, 3, 1))], -1)
    )
    fn = jnp.asarray(np.ones((B, F, 3, 3), np.float32))
    full = R.rasterize_normals_chunkskip(
        fv, fn, S, chunk=CH, cap=F // CH, interpret=True,
        return_overflow=True,
    )
    clipped = R.rasterize_normals_chunkskip(
        fv, fn, S, chunk=CH, cap=2, interpret=True, return_overflow=True
    )
    assert (np.asarray(full[3]) == 0).all()
    assert int(np.asarray(clipped[3]).sum()) > 0
    # face 0 (nearest) still wins every covered pixel
    cov = np.asarray(full[1]) >= 0
    assert cov.any()
    np.testing.assert_array_equal(np.asarray(clipped[1])[cov], 0)
    np.testing.assert_array_equal(
        np.asarray(clipped[1]), np.asarray(full[1])
    )


def test_bin_chunks_occupancy_matches_numpy():
    """bin_chunks membership/counts against a direct numpy computation of
    any-member bbox-overlap chunk occupancy."""
    rng = np.random.default_rng(3)
    S, CH = 64, 8
    fv, _ = _chunky_scene(rng, B=2, F=56, S=S)
    clist, counts, dropped = jax.tree_util.tree_map(
        np.asarray, R.bin_chunks(fv, S, CH, cap=16)
    )
    fvn = np.asarray(fv)
    px = (fvn[..., 0] * S + S - 1.0) / 2.0
    py = (fvn[..., 1] * S + S - 1.0) / 2.0
    x0, x1 = px.min(-1), px.max(-1)
    y0, y1 = py.min(-1), py.max(-1)
    ty, tx = S // R.TILE_ROWS, -(-S // R.TILE_COLS)
    NC = fvn.shape[1] // CH
    for b in range(fvn.shape[0]):
        for r in range(ty):
            for c in range(tx):
                t = r * tx + c
                ov = (
                    (y1[b] >= r * R.TILE_ROWS)
                    & (y0[b] <= r * R.TILE_ROWS + R.TILE_ROWS - 1)
                    & (x1[b] >= c * R.TILE_COLS)
                    & (x0[b] <= c * R.TILE_COLS + R.TILE_COLS - 1)
                )
                occ = ov.reshape(NC, CH).any(-1)
                assert counts[b, t] == min(occ.sum(), 16)
                got = set(clist[b, t, : counts[b, t]].tolist())
                assert got == set(np.flatnonzero(occ).tolist())
    assert (dropped == 0).all()
