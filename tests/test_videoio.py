"""Pure-Python MJPEG-AVI demux/mux (cv2-free demo_video fallback).

Cross-validates against OpenCV in both directions: cv2 is the de-facto
container-compat oracle, and it IS present in this image even though the
fallback exists for environments where it is not.
"""
import numpy as np
import pytest

from smirk_tpu.utils import videoio


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        # smooth gradients survive JPEG quantization (random noise would not)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack(
            [xx / w * 255, yy / h * 255, np.full((h, w), 40.0 * i % 255)], -1
        ) + rng.normal(0, 2, (h, w, 3))
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def test_roundtrip_own_writer_own_reader(tmp_path):
    frames = _frames()
    path = str(tmp_path / "own.avi")
    videoio.write_mjpeg_avi(path, frames, fps=30.0)
    meta = videoio.read_mjpeg_avi_meta(path)
    assert meta["frames"] == len(frames)
    assert meta["size"] == (64, 48)
    assert meta["fps"] == pytest.approx(30.0, rel=1e-3)
    got = list(videoio.iter_mjpeg_avi(path))
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        assert a.shape == b.shape
        assert np.mean(np.abs(a.astype(float) - b.astype(float))) < 6.0


def test_own_writer_read_by_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames()
    path = str(tmp_path / "own.avi")
    videoio.write_mjpeg_avi(path, frames, fps=25.0)
    cap = cv2.VideoCapture(path)
    got = []
    while True:
        ret, fr = cap.read()
        if not ret:
            break
        got.append(fr[..., ::-1])  # BGR -> RGB
    cap.release()
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        assert np.mean(np.abs(a.astype(float) - b.astype(float))) < 6.0


def test_cv2_writer_read_by_own(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames()
    path = str(tmp_path / "cv2.avi")
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (64, 48))
    assert vw.isOpened(), "cv2 lacks an MJPG encoder in this build"
    for fr in frames:
        vw.write(fr[..., ::-1])
    vw.release()
    got = list(videoio.iter_mjpeg_avi(path))
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        assert np.mean(np.abs(a.astype(float) - b.astype(float))) < 8.0


def test_iter_frames_uses_fallback_without_cv2(tmp_path, monkeypatch):
    """demo_video.iter_frames on an .avi must work with cv2 absent."""
    from smirk_tpu.cli import demo_video

    frames = _frames(n=3)
    path = str(tmp_path / "clip.avi")
    videoio.write_mjpeg_avi(path, frames)
    monkeypatch.setattr(videoio, "have_cv2", lambda: False)
    got = list(demo_video.iter_frames(path))
    assert len(got) == 3
    assert got[0].shape == frames[0].shape


def test_assemble_falls_back_to_avi(tmp_path, monkeypatch):
    from PIL import Image

    from smirk_tpu.cli import demo_video

    for i, fr in enumerate(_frames(n=4)):
        Image.fromarray(fr).save(tmp_path / f"frame_{i:05d}.jpg")
    monkeypatch.setattr(videoio, "have_cv2", lambda: False)
    demo_video._assemble_mp4(str(tmp_path))
    out = tmp_path / "grid.avi"
    assert out.exists()
    assert len(list(videoio.iter_mjpeg_avi(str(out)))) == 4


def test_demo_video_e2e_avi_without_cv2(tmp_path, monkeypatch):
    """Full CLI drive with cv2 disabled: AVI in (pure-Python demux) ->
    encode/FLAME/render -> panel jpgs -> grid.avi out (pure-Python mux)."""
    from smirk_tpu.models import mobilenetv3 as mnv3

    TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
    TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100",
                        (TINY_SMALL, 40))
    monkeypatch.setitem(mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100",
                        (TINY_LARGE, 48))
    from smirk_tpu.cli import demo_video
    import os

    monkeypatch.setattr(videoio, "have_cv2", lambda: False)
    clip = str(tmp_path / "clip.avi")
    videoio.write_mjpeg_avi(clip, _frames(n=4, h=120, w=100))
    out = tmp_path / "out"
    demo_video.main([
        "--input_path", clip,
        "--out_path", str(out),
        "--batch", "2",
    ])
    panels = sorted(f for f in os.listdir(out) if f.endswith(".jpg"))
    assert len(panels) == 4
    assert len(list(videoio.iter_mjpeg_avi(str(out / "grid.avi")))) == 4


def test_reader_rejects_non_avi(tmp_path):
    path = tmp_path / "not.avi"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        list(videoio.iter_mjpeg_avi(str(path)))
    with pytest.raises(ValueError):
        videoio.read_mjpeg_avi_meta(str(path))
