"""Offline mediapipe landmark extraction for images/videos (reference
datasets/preprocess_scripts/apply_mediapipe_to_dataset.py): writes one
(478,3) npy per image, or an (N,478,3) npy per video.

Usage:
  python tools/apply_mediapipe_to_dataset.py --input_dir D --output_dir O \
      [--videos] [--workers 8]
Requires the mediapipe package + assets/face_landmarker.task.
"""
import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def process_image(args):
    in_path, out_path = args
    from PIL import Image

    from smirk_tpu.cli.mediapipe_utils import run_mediapipe

    img = np.asarray(Image.open(in_path).convert("RGB"))
    lmk = run_mediapipe(img)
    if lmk is not None:
        np.save(out_path, lmk)
    return lmk is not None


def process_video(args):
    in_path, out_path = args
    import cv2

    from smirk_tpu.cli.mediapipe_utils import run_mediapipe

    cap = cv2.VideoCapture(in_path)
    frames = []
    ok = True
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        # mp.Image requires C-contiguous data; [..., ::-1] is a view
        lmk = run_mediapipe(np.ascontiguousarray(frame[..., ::-1]))
        if lmk is None:
            ok = False
            break
        frames.append(lmk)
    cap.release()
    if ok and frames:
        np.save(out_path, np.stack(frames))
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--videos", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    exts = (".mp4", ".avi") if args.videos else (".png", ".jpg", ".jpeg")
    tasks = []
    for f in sorted(os.listdir(args.input_dir)):
        if f.lower().endswith(exts):
            tasks.append(
                (
                    os.path.join(args.input_dir, f),
                    os.path.join(args.output_dir, f.rsplit(".", 1)[0] + ".npy"),
                )
            )
    fn = process_video if args.videos else process_image
    with Pool(args.workers) as pool:
        results = pool.map(fn, tasks)
    print(f"{sum(results)}/{len(tasks)} processed")


if __name__ == "__main__":
    main()
