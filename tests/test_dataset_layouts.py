"""Dataset variants against fabricated on-disk layouts.

Each reference dataset format (datasets/{ffhq,celeba,lrs3,mead,
mead_sides}_dataset.py) gets a tmp-dir tree in its expected shape; the
loaders must enumerate and yield one prepared sample. Catches path/format
regressions that the synthetic dataset cannot.
"""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from smirk_tpu.config import Config, DatasetConfig
from smirk_tpu.data import datasets as D

H = W = 160


def _landmarks(rng):
    cx, cy = W / 2, H / 2
    th = np.linspace(0, 2 * np.pi, 478, endpoint=False)
    mp = np.stack([cx + 40 * np.cos(th), cy + 50 * np.sin(th)], 1)
    mp = (mp + rng.normal(0, 0.5, (478, 2))).astype(np.float32)
    t2 = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    fan = np.stack([cx + 35 * np.cos(t2), cy + 45 * np.sin(t2)], 1)
    return fan.astype(np.float32), mp


def _img(rng):
    return (rng.random((H, W, 3)) * 255).astype(np.uint8)


def _check_sample(s, size, expect_fan=True):
    assert s["img"].shape == (size, size, 3)
    assert s["landmarks_fan"].shape == (68, 2)
    assert s["landmarks_mp"].shape == (105, 2)
    assert s["mask"].shape == (size, size, 1)
    assert s["img_mica"].shape == (112, 112, 3)
    assert bool(s["flag_landmarks_fan"]) == expect_fan


def test_ffhq_layout(tmp_path):
    rng = np.random.default_rng(0)
    img_dir, fan_dir, mp_dir = (tmp_path / n for n in ("ffhq", "fan", "mp"))
    for d in (img_dir, fan_dir, mp_dir):
        d.mkdir()
    for i in range(3):
        Image.fromarray(_img(rng)).save(img_dir / f"0000{i}.png")
        fan, mp = _landmarks(rng)
        if i == 2:
            np.save(fan_dir / f"0000{i}.npy",
                    np.asarray(None, dtype=object))  # failed-FAN marker
        else:
            np.save(fan_dir / f"0000{i}.npy", fan[None])  # (1,68,2)
        np.save(mp_dir / f"0000{i}.npy", mp)
    cfg = Config(image_size=64, dataset=DatasetConfig(
        FFHQ_path=str(img_dir), FFHQ_fan_landmarks_path=str(fan_dir),
        FFHQ_mediapipe_landmarks_path=str(mp_dir)))
    ds = D.FFHQDataset(cfg, test=True)
    assert len(ds) == 3
    _check_sample(ds[0], 64)
    # index 2 has the size-1 failed-FAN marker -> retry lands on a good one
    _check_sample(ds[2], 64)


def test_celeba_layout(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "celeba"
    img_dir, fan_dir, mp_dir = (root / n for n in ("img", "fan", "mp"))
    for d in (img_dir, fan_dir, mp_dir):
        d.mkdir(parents=True)
    # 4 images over 2 identities (reference celeba_dataset.py: one random
    # image per identity per epoch sample)
    lines = []
    for i, ident in enumerate(["7", "7", "42", "42"]):
        f = f"{i:06d}.jpg"
        Image.fromarray(_img(rng)).save(img_dir / f)
        fan, mp = _landmarks(rng)
        np.save(fan_dir / f.replace(".jpg", ".npy"), fan[None])
        np.save(mp_dir / f.replace(".jpg", ".npy"), mp)
        lines.append(f"{f} {ident}")
    (root / "identity_CelebA.txt").write_text("\n".join(lines) + "\n")
    cfg = Config(image_size=64, dataset=DatasetConfig(
        CelebA_path=str(img_dir), CelebA_fan_landmarks_path=str(fan_dir),
        CelebA_mediapipe_landmarks_path=str(mp_dir)))
    ds = D.CelebADataset(cfg, test=True)
    assert len(ds) == 2  # identity-grouped
    _check_sample(ds[0], 64)
    _check_sample(ds[1], 64)


def _write_video(path, frames):
    import cv2

    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         25, (W, H))
    assert vw.isOpened(), "cv2 mp4 writer unavailable"
    for fr in frames:
        vw.write(fr[..., ::-1])  # RGB -> BGR
    vw.release()


def test_video_frame_dataset_lrs3_layout(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    rng = np.random.default_rng(2)
    n_frames = 5
    frames = [_img(rng) for _ in range(n_frames)]
    video_p = tmp_path / "clip.mp4"
    _write_video(video_p, frames)

    fan, mp = _landmarks(rng)
    # FAN pkl track with a detection gap (frame 2 None) -> interpolated
    track = [fan + i for i in range(n_frames)]
    track[2] = None
    with open(tmp_path / "clip.pkl", "wb") as f:
        pickle.dump(track, f)
    np.save(tmp_path / "clip.npy",
            np.stack([mp + i for i in range(n_frames)]))

    cfg = Config(image_size=64)
    ds = D.VideoFrameDataset(
        cfg, [(str(video_p), str(tmp_path / "clip.pkl"),
               str(tmp_path / "clip.npy"))], test=True)
    assert len(ds) == 1
    _check_sample(ds[0], 64)


def test_video_frame_dataset_sides_no_fan(tmp_path):
    """MEAD-sides semantics: mediapipe only -> flag_landmarks_fan False
    (reference mead_sides_dataset.py:45)."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    rng = np.random.default_rng(3)
    frames = [_img(rng) for _ in range(3)]
    video_p = tmp_path / "side.mp4"
    _write_video(video_p, frames)
    _, mp = _landmarks(rng)
    np.save(tmp_path / "side.npy", np.stack([mp] * 3))

    cfg = Config(image_size=64)
    ds = D.VideoFrameDataset(
        cfg, [(str(video_p), None, str(tmp_path / "side.npy"))], test=True)
    _check_sample(ds[0], 64, expect_fan=False)


def test_get_mead_items_subject_split(tmp_path):
    fan_dir = tmp_path / "mead_fan"
    mp_dir = tmp_path / "mead_mp"
    fan_dir.mkdir()
    mp_dir.mkdir()
    for stem in ("M003_front_happy_001", "M013_front_sad_001",
                 "M005_front_angry_001", "X999_unknown_001"):
        (fan_dir / f"{stem}.pkl").write_bytes(b"")
    cfg = Config(dataset=DatasetConfig(
        MEAD_path=str(tmp_path / "mead_videos"),
        MEAD_fan_landmarks_path=str(fan_dir),
        MEAD_mediapipe_landmarks_path=str(mp_dir)))
    train, val, test = D.get_mead_items(cfg)
    assert [len(train), len(val), len(test)] == [1, 1, 1]  # X999 dropped
    assert train[0][0].endswith("M003_front_happy_001.mp4")
    assert train[0][1].endswith(".pkl") and train[0][2].endswith(".npy")


def test_get_mead_sides_items_views_and_split(tmp_path):
    root = tmp_path / "sides"
    for view in ("videos_left_30", "videos_right_60"):
        vdir = root / view
        vdir.mkdir(parents=True)
        for stem in ("M003_a", "W018_b", "M022_c"):
            (vdir / f"{stem}.mp4").write_bytes(b"")
            (vdir / f"{stem}.npy").write_bytes(b"")
        (vdir / "M007_nolmk.mp4").write_bytes(b"")  # no npy -> skipped
    cfg = Config(dataset=DatasetConfig(MEAD_sides_path=str(root)))
    train, val, test = D.get_mead_sides_items(cfg)
    assert len(train) == 2 and len(val) == 2 and len(test) == 2  # 2 views
    assert all(item[1] is None for item in train)  # no FAN for sides


def test_video_frame_dataset_temporal_windows(tmp_path):
    """K>1 temporal sampling: a sample is a window of K consecutive frames
    (leading K axis), the shared augmentation seed keeps the crop scale
    identical across the window, and collate folds windows into the batch
    axis (mixed with single-frame samples)."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from smirk_tpu.data.pipeline import collate

    rng = np.random.default_rng(5)
    n_frames = 6
    frames = [_img(rng) for _ in range(n_frames)]
    video_p = tmp_path / "tclip.mp4"
    _write_video(video_p, frames)
    fan, mp = _landmarks(rng)
    with open(tmp_path / "tclip.pkl", "wb") as f:
        pickle.dump([fan + i for i in range(n_frames)], f)
    np.save(tmp_path / "tclip.npy",
            np.stack([mp + i for i in range(n_frames)]))

    K = 3
    cfg = Config(image_size=64, K=K)
    items = [(str(video_p), str(tmp_path / "tclip.pkl"),
              str(tmp_path / "tclip.npy"))]
    ds = D.VideoFrameDataset(cfg, items, temporal=True)
    s = ds[0]
    assert s["img"].shape == (K, 64, 64, 3)
    assert s["landmarks_fan"].shape == (K, 68, 2)
    assert s["flag_landmarks_fan"].shape == (K,)
    assert s["mask"].shape == (K, 64, 64, 1)

    # test=True disables temporal sampling (static eval shapes)
    ds_test = D.VideoFrameDataset(cfg, items, test=True, temporal=True)
    assert ds_test[0]["img"].shape == (64, 64, 3)

    # collate: window + single frame -> folded batch of 4 frames
    batch = collate([s, ds_test[0]])
    assert batch["img"].shape == (K + 1, 64, 64, 3)
    assert batch["flag_landmarks_fan"].shape == (K + 1,)

    # collate: ALL-window batch must also fold to the batch axis (the
    # common case when LRS3 is the only temporal dataset loaded)
    batch_w = collate([s, ds[0]])
    assert batch_w["img"].shape == (2 * K, 64, 64, 3)
    assert batch_w["flag_landmarks_fan"].shape == (2 * K,)
    assert batch_w["landmarks_fan"].shape == (2 * K, 68, 2)

    # short-clip tail: window start near the end repeats the last frame
    cfg1 = Config(image_size=64, K=n_frames + 4)
    ds_long = D.VideoFrameDataset(cfg1, items, temporal=True)
    s_long = ds_long[0]
    assert s_long["img"].shape == (n_frames + 4, 64, 64, 3)
    assert np.allclose(s_long["img"][-1], s_long["img"][-2])


def test_temporal_window_midread_failure_keeps_landmarks_aligned(
        tmp_path, monkeypatch):
    """cap.read() stopping before K frames (corrupt tail / inaccurate
    CAP_PROP_FRAME_COUNT): the repeated padding frames must carry the LAST
    DECODED frame's landmarks, not later track entries."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    n_frames, decodable, K = 6, 2, 4
    frames = [_img(rng) for _ in range(n_frames)]
    fan, mp = _landmarks(rng)
    with open(tmp_path / "c.pkl", "wb") as f:
        pickle.dump([fan + 3 * i for i in range(n_frames)], f)
    np.save(tmp_path / "c.npy",
            np.stack([mp + 3 * i for i in range(n_frames)]))

    class _TruncCap:
        """Reports n_frames but only yields `decodable` reads per open."""

        def __init__(self, _path):
            self.pos = 0
            self.reads = 0

        def get(self, _prop):
            return float(n_frames)

        def set(self, _prop, v):
            self.pos = int(v)

        def read(self):
            if self.reads >= decodable or self.pos >= n_frames:
                return False, None
            f = frames[self.pos]
            self.pos += 1
            self.reads += 1
            return True, f[..., ::-1]  # loader flips back to RGB

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", _TruncCap)
    cfg = Config(image_size=64, K=K)
    items = [("unused.mp4", str(tmp_path / "c.pkl"), str(tmp_path / "c.npy"))]
    ds = D.VideoFrameDataset(cfg, items, temporal=True)
    s = ds._get(0, np.random.default_rng(11))
    assert s["img"].shape == (K, 64, 64, 3)
    # frames decodable..K-1 are copies of frame decodable-1 and must have
    # identical prepared landmarks (same frame, same landmarks, same seed)
    for t in range(decodable, K):
        np.testing.assert_array_equal(s["landmarks_mp"][t],
                                      s["landmarks_mp"][decodable - 1])
        np.testing.assert_array_equal(s["img"][t], s["img"][decodable - 1])
