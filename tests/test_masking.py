"""Masking pipeline: golden tests vs reference torch + stochastic-path sanity."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from smirk_tpu import masking as M

FIX = np.load(
    os.path.join(os.path.dirname(__file__), "fixtures", "masking_golden.npz")
)
S = 32


def test_triangle_area_golden():
    verts = jnp.asarray(FIX["verts"])
    faces = jnp.asarray(FIX["faces"].astype(np.int32))
    fv = verts.reshape(-1, 3)[faces][None]
    out = M.triangle_area_xy(fv)
    np.testing.assert_allclose(out, FIX["tri_area"], rtol=1e-5, atol=1e-6)


def test_points_from_coords_golden():
    pts, _ = M.sample_mesh_points(
        jax.random.PRNGKey(0),
        jnp.asarray(FIX["verts"]),
        jnp.asarray(FIX["faces"].astype(np.int32)),
        jnp.asarray(FIX["probs"]),
        num_points=FIX["coords_idx"].shape[1],
        image_size=S,
        coords={
            "sampled_faces_indices": jnp.asarray(FIX["coords_idx"].astype(np.int32)),
            "barycentric_coords": jnp.asarray(FIX["coords_bary"]),
        },
    )
    # reference returns float NDC points mapped to long pixel coords;
    # compare against its xy integer pixels
    ref = FIX["npoints"][..., :2].astype(np.int64)
    got = np.asarray(pts).astype(np.int64)
    # int truncation at exact pixel boundaries can differ by 1 due to fp;
    # require exact match on >99% and off-by-one elsewhere
    diff = np.abs(got - ref)
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.99


def test_weighted_probs_golden():
    w = M.face_sampling_probabilities(
        jnp.asarray(FIX["verts"]),
        jnp.asarray(FIX["faces"].astype(np.int32)),
        jnp.asarray(FIX["probs"]),
    )
    np.testing.assert_allclose(w, FIX["weighted_probs"], rtol=1e-4, atol=1e-6)


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_transfer_pixels_golden():
    img = jnp.asarray(_nchw_to_nhwc(FIX["img"]))
    pts = jnp.asarray(FIX["pts"].astype(np.int32))
    out = M.transfer_pixels(img, pts, pts)
    np.testing.assert_allclose(out, _nchw_to_nhwc(FIX["extra"]), atol=1e-6)


def test_compose_mask_golden_deterministic():
    img = jnp.asarray(_nchw_to_nhwc(FIX["img"]))
    hull = jnp.asarray(_nchw_to_nhwc(FIX["hull"]))
    rmask = jnp.asarray(_nchw_to_nhwc(FIX["rmask"]))
    extra = jnp.asarray(_nchw_to_nhwc(FIX["extra"]))
    out = M.compose_mask(
        jax.random.PRNGKey(0),
        img,
        hull,
        extra,
        dilation_radius=3,
        rendered_mask=rmask,
        extra_noise=False,
        random_mask=0.0,
    )
    np.testing.assert_allclose(out, _nchw_to_nhwc(FIX["masked"]), atol=1e-6)


def test_sampling_respects_probabilities_and_keys():
    verts = jnp.asarray(FIX["verts"])
    faces = jnp.asarray(FIX["faces"].astype(np.int32))
    probs = jnp.asarray(FIX["probs"])
    key = jax.random.PRNGKey(3)
    pts, coords = M.sample_mesh_points(key, verts, faces, probs, 128, S)
    # determinism under the same key
    pts2, coords2 = M.sample_mesh_points(key, verts, faces, probs, 128, S)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(
        coords["sampled_faces_indices"], coords2["sampled_faces_indices"]
    )
    # sampled faces must all have nonzero weighted probability
    w = np.asarray(
        M.face_sampling_probabilities(verts, faces, probs)
    )
    idx = np.asarray(coords["sampled_faces_indices"])
    assert (np.take_along_axis(w, idx, axis=1) > 0).all()
    # pixels in range
    assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) < S).all()
    # barycentric validity
    bary = np.asarray(coords["barycentric_coords"])
    assert (bary >= 0).all() and np.allclose(bary.sum(-1), 1, atol=1e-6)


def test_transfer_pixels_budget():
    img = jnp.ones((1, 8, 8, 3))
    src = jnp.asarray([[[1, 1], [2, 2], [3, 3]]], jnp.int32)
    out = M.transfer_pixels(img, src, src, valid_count=jnp.asarray([2]))
    o = np.asarray(out)
    assert o[0, 1, 1].sum() == 3 and o[0, 2, 2].sum() == 3
    assert o[0, 3, 3].sum() == 0  # beyond budget -> dropped


def test_compose_mask_polarity_removes_face_keeps_background():
    """The SMIRK contract: the generator input has the (dilated) face hull
    ERASED and the far background KEPT. mask is 1=background (reference
    create_mask polarity, base_dataset.py:9-15). A polarity inversion here
    would hand the generator the visible ground-truth face and cannot be
    caught by golden tests that feed both implementations the same mask."""
    H = 64
    img = jnp.ones((1, H, H, 3))
    mask = np.ones((1, H, H, 1), np.float32)
    mask[:, 20:44, 20:44] = 0.0  # face hull
    out = np.asarray(M.compose_mask(
        jax.random.PRNGKey(0), img, jnp.asarray(mask),
        jnp.zeros_like(img), dilation_radius=5,
        extra_noise=False, random_mask=0.0,
    ))
    assert out[:, 28:36, 28:36].max() == 0.0  # face interior erased
    assert out[0, 17, 32, 0] == 0.0           # dilation ring erased too
    assert out[:, :10, :10].min() == 1.0      # far background kept


def test_prepare_sample_mask_polarity():
    """batch['mask'] is 1=background / 0=face-hull: the crop recenters the
    landmarks, so the output center is inside the hull (0) and the corners
    are background (1)."""
    from smirk_tpu.data.base import prepare_sample

    rng = np.random.default_rng(0)
    th = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    mp = np.stack([80 + 30 * np.cos(th), 80 + 35 * np.sin(th)], 1)
    img = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    s = prepare_sample(rng, img, None, mp.astype(np.float32),
                       image_size=64, scale=1.6, test=True)
    m = s["mask"][..., 0]
    assert m[32, 32] == 0.0  # face center
    assert m[1, 1] == 1.0 and m[-2, -2] == 1.0  # corners = background


def test_dilate_separable_matches_naive(monkeypatch):
    """Round-5 separable dilation is bit-identical to the square window."""
    rng = np.random.default_rng(5)
    mask = jnp.asarray((rng.random((2, 41, 37, 1)) > 0.9).astype(np.float32))
    for radius in (1, 5, 10, 15):
        fast = M.masking._dilate(mask, radius)
        monkeypatch.setenv("SMIRK_DILATE_NAIVE", "1")
        naive = M.masking._dilate(mask, radius)
        monkeypatch.delenv("SMIRK_DILATE_NAIVE")
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


def test_sampling_cdf_matches_gumbel_distribution(monkeypatch):
    """Inverse-CDF sampler draws the same face distribution as the original
    gumbel-argmax formulation (draw sequences differ by construction)."""
    verts = jnp.asarray(FIX["verts"])
    faces = jnp.asarray(FIX["faces"].astype(np.int32))
    probs = jnp.asarray(FIX["probs"])
    F = probs.shape[-1]
    N = 4096

    def histogram(seed_env):
        if seed_env:
            monkeypatch.setenv("SMIRK_SAMPLE_GUMBEL", "1")
        counts = np.zeros((verts.shape[0], F))
        for s in range(4):
            _, coords = M.sample_mesh_points(
                jax.random.PRNGKey(s), verts, faces, probs, N, S)
            idx = np.asarray(coords["sampled_faces_indices"])
            for b in range(idx.shape[0]):
                counts[b] += np.bincount(idx[b], minlength=F)
        if seed_env:
            monkeypatch.delenv("SMIRK_SAMPLE_GUMBEL")
        return counts / counts.sum(-1, keepdims=True)

    h_cdf = histogram(False)
    h_gum = histogram(True)
    # expected distribution (weighted probabilities, normalized)
    w = np.asarray(M.face_sampling_probabilities(verts, faces, probs))
    w = w / w.sum(-1, keepdims=True)
    # total-variation distance per image: both samplers near the target,
    # and near each other (16k draws -> TV noise floor ~ sqrt(F/N)/2 ~ 0.04)
    tv_cdf = 0.5 * np.abs(h_cdf - w).sum(-1).max()
    tv_gum = 0.5 * np.abs(h_gum - w).sum(-1).max()
    tv_x = 0.5 * np.abs(h_cdf - h_gum).sum(-1).max()
    assert tv_cdf < 0.08, tv_cdf
    assert tv_gum < 0.08, tv_gum
    assert tv_x < 0.1, tv_x


def test_cdf_count_equals_searchsorted():
    """The compare-count face sampler is exactly searchsorted(side=right)."""
    rng = np.random.default_rng(9)
    for _ in range(3):
        probs = rng.random((3, 57)).astype(np.float32)
        probs[1, :30] = 0.0  # zero runs -> repeated cdf values
        cdf = jnp.cumsum(jnp.asarray(probs), axis=-1)
        u = jnp.asarray(
            rng.random((3, 64)).astype(np.float32)) * cdf[:, -1:]
        count = (cdf[:, None, :] <= u[:, :, None]).sum(-1, dtype=jnp.int32)
        ss = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right")
        )(cdf, u)
        np.testing.assert_array_equal(np.asarray(count), np.asarray(ss))
