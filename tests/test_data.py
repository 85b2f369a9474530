"""Data layer tests: transform math vs reference conventions, sample prep
shapes, sampler quotas, synthetic loader end-to-end."""
import numpy as np

from smirk_tpu.config import Config, TrainConfig
from smirk_tpu.data import transforms as T
from smirk_tpu.data import prepare_sample
from smirk_tpu.data.pipeline import (
    DataLoader,
    MixedDatasetSampler,
    SimpleBatchSampler,
    load_dataloaders,
)


def test_estimate_similarity_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.random((10, 2)) * 100
    angle, s = 0.3, 1.7
    R = np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
    dst = s * src @ R.T + [5, -3]
    M = T.estimate_similarity(src, dst)
    np.testing.assert_allclose(T.transform_points(M, src), dst, atol=1e-8)


def test_crop_face_tform_maps_bbox_to_frame():
    rng = np.random.default_rng(1)
    lmk = rng.random((478, 2)) * 50 + [100, 120]
    M = T.crop_face_tform(lmk, scale=1.0, image_size=224)
    out = T.transform_points(M, lmk)
    # all landmarks land inside the frame with scale 1 and centered-ish
    assert out.min() > -30 and out.max() < 254
    c = out.mean(0)
    assert abs(c[0] - 112) < 30 and abs(c[1] - 112) < 30


def test_warp_affine_identity_and_shift():
    img = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
    M = np.eye(3)
    np.testing.assert_allclose(T.warp_affine(img, M, (4, 4)), img, atol=1e-5)
    M[0, 2] = 1  # shift x by +1: out(x) = in(x-1)
    out = T.warp_affine(img, M, (4, 4))
    np.testing.assert_allclose(out[:, 1:], img[:, :3], atol=1e-5)


def test_convex_hull_mask():
    pts = np.array([[2, 2], [2, 12], [12, 2], [12, 12], [7, 7]])
    m = T.convex_hull_mask(pts, (16, 16))
    assert m[7, 7] == 0  # inside hull
    assert m[0, 0] == 1 and m[15, 15] == 1  # outside
    assert m[5, 5] == 0


def test_rotate_hue_properties():
    """Hue rotation about the gray axis: gray pixels are fixed points, the
    identity rotation is exact, and a full turn returns the input."""
    rng = np.random.default_rng(5)
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(T._rotate_hue(img, 0.0), img, atol=1e-6)
    np.testing.assert_allclose(T._rotate_hue(img, 1.0), img, atol=1e-5)
    gray = np.full((4, 4, 3), 0.37, np.float32)
    np.testing.assert_allclose(T._rotate_hue(gray, 0.05), gray, atol=1e-6)


def test_augment_distribution_sanity():
    """Distribution-level parity checks vs the reference albumentations
    pipeline (base_dataset.py:41-52; PARITY.md augmentation table):
    bounded outputs, roughly mean-preserving photometrics, geometric ops
    that keep both keypoint sets in sync with the image warp."""
    rng = np.random.default_rng(42)
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([xx / W, yy / H, np.full_like(xx, 0.5)], -1)
    mask = np.ones((H, W), np.float32)
    kp = np.array([[10.0, 20.0], [50.0, 40.0], [32.0, 32.0]], np.float32)

    N = 200
    means, maxs, mins, n_changed = [], [], [], 0
    for _ in range(N):
        img, m, k1, k2 = T.augment(rng, base, mask, kp.copy(), kp.copy())
        assert img.shape == base.shape and img.dtype == np.float32
        means.append(float(img.mean()))
        maxs.append(float(img.max()))
        mins.append(float(img.min()))
        # keypoint sync: both sets get the SAME affine draw
        np.testing.assert_allclose(k1, k2, atol=1e-4)
        if not np.allclose(k1, kp):
            n_changed += 1
    means = np.asarray(means)
    assert max(maxs) <= 1.0 and min(mins) >= 0.0  # clipped to [0,1]
    # photometric ops are centered: the sample-mean of means stays near the
    # base mean (base.mean()~0.49) and individual draws actually perturb it
    assert abs(means.mean() - float(base.mean())) < 0.05, means.mean()
    assert means.std() > 0.01
    # ShiftScaleRotate fires with p=0.9 -> keypoints moved in ~90% of draws
    assert 0.8 < n_changed / N < 1.0, n_changed / N


def test_prepare_sample_shapes():
    rng = np.random.default_rng(0)
    img = (rng.random((300, 280, 3)) * 255).astype(np.uint8)
    fan = rng.random((68, 2)) * 150 + 60
    mp = rng.random((478, 2)) * 150 + 60
    d = prepare_sample(rng, img, fan, mp, image_size=128, scale=1.6, test=True)
    assert d["img"].shape == (128, 128, 3)
    assert d["landmarks_fan"].shape == (68, 2)
    assert d["landmarks_mp"].shape == (105, 2)
    assert d["mask"].shape == (128, 128, 1)
    assert d["img_mica"].shape == (112, 112, 3)
    assert bool(d["flag_landmarks_fan"])
    assert np.abs(d["landmarks_mp"]).max() <= 1.5
    # landmark normalization: pixel -> [-1,1]
    d2 = prepare_sample(rng, img, None, mp, image_size=128, test=True)
    assert not bool(d2["flag_landmarks_fan"])
    assert d2["img_mica"].sum() == 0


def test_mixed_sampler_quotas():
    s = MixedDatasetSampler([100, 200, 300], [0.2, 0.3, 0.5], 10, 100)
    batches = list(s)
    assert len(batches) == 10
    for b in batches:
        assert len(b) == 10
        arr = np.asarray(b)
        assert ((arr >= 0) & (arr < 100)).sum() == 2
        assert ((arr >= 100) & (arr < 300)).sum() == 3
        assert (arr >= 300).sum() == 5


def test_synthetic_loader_end_to_end():
    cfg = Config(
        image_size=64,
        train=TrainConfig(batch_size=4, num_workers=2, samples_per_epoch=16),
    )
    train_loader, val_loader = load_dataloaders(cfg, synthetic=True)
    n = 0
    for batch in train_loader:
        assert batch["img"].shape == (4, 64, 64, 3)
        assert batch["landmarks_fan"].shape == (4, 68, 2)
        assert batch["flag_landmarks_fan"].dtype == bool
        n += 1
        if n >= 2:
            break
    assert n == 2


def test_landmarks_interpolate_tracks():
    from smirk_tpu.data.tracks import landmarks_interpolate

    a = np.array([[0.0, 0.0]])
    c = np.array([[4.0, 8.0]])
    track = [a, None, None, None, c, None]
    out = landmarks_interpolate(list(track))
    assert all(x is not None for x in out)
    np.testing.assert_allclose(out[2], [[2.0, 4.0]])  # linear gap fill
    np.testing.assert_allclose(out[5], c)  # tail extension
    assert landmarks_interpolate([None, None]) is None


def test_loader_propagates_worker_errors_and_bounds_prefetch():
    from smirk_tpu.data.pipeline import DataLoader, SimpleBatchSampler

    class Bad:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample 5")
            return {"img": np.zeros((4, 4, 3), np.float32)}

    loader = DataLoader(Bad(), SimpleBatchSampler(16, 4), num_workers=2)
    try:
        list(iter(loader))
        raise AssertionError("expected loader error")
    except RuntimeError as e:
        assert "corrupt sample 5" in repr(e.__cause__)


def test_loader_skips_all_none_batches():
    from smirk_tpu.data.pipeline import DataLoader, SimpleBatchSampler

    class Sparse:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return None if i < 4 else {"img": np.full((2, 2, 3), i, np.float32)}

    loader = DataLoader(Sparse(), SimpleBatchSampler(8, 4), num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == 1  # the all-None batch is skipped, not crashed
    assert batches[0]["img"].shape == (4, 2, 2, 3)


def test_simple_sampler_reshuffles_per_epoch():
    from smirk_tpu.data.pipeline import SimpleBatchSampler

    s = SimpleBatchSampler(64, 8, shuffle=True, seed=3)
    e0 = [tuple(b) for b in s]
    e1 = [tuple(b) for b in s]
    assert e0 != e1  # fresh permutation per epoch
    s2 = SimpleBatchSampler(64, 8, shuffle=True, seed=3)
    assert [tuple(b) for b in s2] == e0  # still deterministic per (seed, epoch)


def test_mixed_sampler_rejects_empty_dataset_with_quota():
    import pytest as _pytest

    from smirk_tpu.data.pipeline import MixedDatasetSampler

    s = MixedDatasetSampler([100, 0], [0.5, 0.5], 8, 64)
    with _pytest.raises(ValueError, match="empty"):
        list(iter(s))
