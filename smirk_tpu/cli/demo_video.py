"""Video tracking demo: batched frames through one jit (the fps workload).

Reference demo_video.py runs mediapipe+encode+FLAME+render per frame at
batch 1, synchronously (demo_video.py:107-214). Here frames are decoded and
cropped on the host (overlapped with device compute via simple chunked
batching), then encode->FLAME->render runs as ONE jitted call per chunk —
the design that hits the >=500 fps/chip target.

Video IO uses cv2 when present; otherwise accepts a directory of frames.
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Iterator, Optional

import numpy as np


def iter_frames(path: str) -> Iterator[np.ndarray]:
    if os.path.isdir(path):
        from PIL import Image

        for name in sorted(os.listdir(path)):
            if name.lower().endswith((".png", ".jpg", ".jpeg")):
                yield np.asarray(Image.open(os.path.join(path, name)).convert("RGB"))
        return
    from smirk_tpu.utils import videoio

    if not videoio.have_cv2():
        # cv2-free fallback: MJPEG-AVI demuxed in pure Python (PIL decodes
        # the per-frame JPEGs). mp4/H.264 still needs cv2.
        yield from videoio.iter_mjpeg_avi(path)
        return
    import cv2

    cap = cv2.VideoCapture(path)
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        yield frame[..., ::-1]
    cap.release()


def _resolve_deferred_crops(crops, frames, size: int = 224) -> None:
    """Replace ('warp', M) markers with warped crops, in place.

    Uses the native batched warp executor (libfastops warp_affine_batch,
    thread-pooled C++) when available and the chunk's frames are uniform in
    shape — one GIL-released call for the whole device batch; falls back to
    per-frame warps otherwise.
    """
    from smirk_tpu import native
    from smirk_tpu.data import transforms as T

    todo = [i for i, c in enumerate(crops) if isinstance(c, tuple)]
    if not todo:
        return
    batch = None
    if len({frames[i].shape for i in todo}) == 1:
        frs = np.stack([frames[i] for i in todo]).astype(np.float32)
        Ms = np.stack([crops[i][1] for i in todo])
        batch = native.warp_affine_batch(frs, Ms, (size, size))
    if batch is not None:
        for j, i in enumerate(todo):
            crops[i] = (np.clip(batch[j], 0, 255) / 255.0).astype(np.float32)
        return
    for i in todo:
        w = T.warp_affine(frames[i].astype(np.float32), crops[i][1],
                          (size, size))
        crops[i] = (np.clip(w, 0, 255) / 255.0).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", required=True,
                   help="video file or directory of frames")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--landmarks", default=None,
                   help="npy of per-frame mediapipe landmarks (N,478,2+)")
    p.add_argument("--crop", action="store_true")
    p.add_argument("--out_path", default="output")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--render_orig", action="store_true")
    p.add_argument("--use_smirk_generator", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from smirk_tpu.cli.demo import build_system, get_landmarks
    from smirk_tpu.data import transforms as T
    from smirk_tpu.utils.viz import save_image

    system, state = build_system(args.checkpoint, args.use_smirk_generator)
    tracks = np.load(args.landmarks) if args.landmarks else None

    os.makedirs(args.out_path, exist_ok=True)
    crops, kpts_c, frames = [], [], []
    pending = []  # (idx0, crops, device outputs) — async device dispatch
    fps_frames, fps_time = 0, 0.0

    gen_fn = None
    if args.use_smirk_generator and system.generator is not None:
        from smirk_tpu import masking as M
        from smirk_tpu.data import transforms as T

        def gen_fn(imgs, out, hulls, seed):
            key = jax.random.PRNGKey(seed)
            k1, k4 = jax.random.split(key)
            npts, _ = M.sample_mesh_points(
                k1, out["transformed_vertices"], system.flame.faces,
                system.face_probabilities,
                int(0.05 * 224 * 224), 224,
                incidence=system.flame_incidence,
            )
            extra = M.transfer_pixels(imgs, npts, npts)
            masked = M.compose_mask(
                k4, imgs, hulls, extra, dilation_radius=10,
                rendered_mask=out["rendered_mask"],
            )
            return system.generator.apply(
                state.generator,
                jnp.concatenate([out["rendered_img"], masked], -1),
                train=False,
            )

    def drain(final=False):
        nonlocal fps_frames, fps_time
        while pending and (final or len(pending) > 2):
            idx0, cr, out, recon = pending.pop(0)
            rendered = np.asarray(out["rendered_img"])[: len(cr)]
            rec = None if recon is None else np.asarray(recon)[: len(cr)]
            for i in range(len(cr)):
                cols = [cr[i], rendered[i]]
                if rec is not None:
                    cols.append(rec[i])
                save_image(np.concatenate(cols, axis=1),
                           os.path.join(args.out_path,
                                        f"frame_{idx0 + i:06d}.jpg"))

    def flush(idx0: int):
        nonlocal fps_frames, fps_time
        if not crops:
            return
        n = len(crops)
        _resolve_deferred_crops(crops, frames)
        batch = np.stack(crops)
        if n < args.batch:  # pad to static shape
            batch = np.concatenate(
                [batch, np.zeros((args.batch - n,) + batch.shape[1:],
                                 batch.dtype)])
        first_call = not hasattr(flush, "_warm")  # first flush compiles
        flush._warm = True
        t0 = time.perf_counter()
        imgs = jnp.asarray(batch)
        out = system.infer(state.encoder, imgs)
        recon = None
        if gen_fn is not None:
            from smirk_tpu.data import transforms as T

            hulls = np.stack([
                T.convex_hull_mask(k, (224, 224)) if k is not None  # 1=bg
                else np.ones((224, 224), np.float32)
                for k in (kpts_c + [None] * (args.batch - n))
            ])[..., None]
            recon = gen_fn(imgs, out, jnp.asarray(hulls), idx0)
        # time the FULL device pipeline: with the generator on, recon is the
        # last dispatched computation and must be inside the timed window
        jax.block_until_ready(recon if recon is not None
                              else out["rendered_img"])
        if not first_call:  # exclude the compile-bearing first batch
            fps_time += time.perf_counter() - t0
            fps_frames += n
        pending.append((idx0, list(crops), out, recon))
        drain()
        crops.clear(), kpts_c.clear(), frames.clear()

    done = 0
    for fi, frame in enumerate(iter_frames(args.input_path)):
        kpt = tracks[fi] if tracks is not None else get_landmarks(frame, None)
        if args.crop and kpt is not None:
            # NB: not named `M` — that alias is the masking module gen_fn
            # closes over; rebinding it here broke the generator path
            tfm = T.crop_face_tform(kpt[..., :2], 1.4, 224)
            # warp deferred to flush: the whole chunk goes through the native
            # batch executor (libfastops warp_affine_batch) in one call
            crop = ("warp", tfm)
            kpts_c.append(T.transform_points(tfm, kpt[..., :2]))
        else:
            from PIL import Image

            crop = np.asarray(
                Image.fromarray(frame).resize((224, 224)), np.float32) / 255.0
            if kpt is not None:
                H0, W0 = frame.shape[:2]
                kpts_c.append(kpt[..., :2] * [224.0 / W0, 224.0 / H0])
            else:
                kpts_c.append(None)
        crops.append(crop if isinstance(crop, tuple)
                     else crop.astype(np.float32))
        frames.append(frame)
        if len(crops) == args.batch:
            flush(done)
            done = fi + 1
    flush(done)
    drain(final=True)
    if fps_time > 0:
        print(f"device fps: {fps_frames / fps_time:.1f} "
              f"({fps_frames} frames, {fps_time:.2f}s device time)")
    _assemble_mp4(args.out_path)


def _assemble_mp4(out_dir: str) -> None:
    """Join the written frame panels into grid.mp4 (cv2) or grid.avi
    (pure-Python MJPEG muxer) — reference demo_video.py writes an mp4
    directly and hard-requires OpenCV for it."""
    from smirk_tpu.utils import videoio

    frames = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith("frame_") and f.endswith(".jpg")
    )
    if not frames:
        return
    if not videoio.have_cv2():
        from PIL import Image

        videoio.write_mjpeg_avi(
            os.path.join(out_dir, "grid.avi"),
            (np.asarray(Image.open(os.path.join(out_dir, f)).convert("RGB"))
             for f in frames),
        )
        print("wrote", os.path.join(out_dir, "grid.avi"))
        return
    import cv2

    first = cv2.imread(os.path.join(out_dir, frames[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        os.path.join(out_dir, "grid.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h),
    )
    for f in frames:
        vw.write(cv2.imread(os.path.join(out_dir, f)))
    vw.release()
    print("wrote", os.path.join(out_dir, "grid.mp4"))


if __name__ == "__main__":
    main()
