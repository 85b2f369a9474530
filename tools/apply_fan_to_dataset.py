"""Offline FAN-68 landmark extraction (reference
datasets/preprocess_scripts/apply_fan_to_dataset.py): RetinaFace detection +
2DFAN alignment, writing per-image (n_faces,68,2) npy files.

Requires the external `ibug` face-detection/alignment packages (not bundled;
same external dependency as the reference). Usage:
  python tools/apply_fan_to_dataset.py --input_dir D --output_dir O
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--device", default="cuda:0")
    args = p.parse_args()

    try:
        from ibug.face_alignment import FANPredictor
        from ibug.face_detection import RetinaFacePredictor
    except ImportError as e:
        raise SystemExit(
            "needs the ibug face_detection/face_alignment packages "
            "(github.com/hhj1897) — same external preprocessing dependency "
            "as the reference"
        ) from e

    import cv2

    detector = RetinaFacePredictor(
        device=args.device, threshold=0.8,
        model=RetinaFacePredictor.get_model("resnet50"),
    )
    fan = FANPredictor(device=args.device,
                       model=FANPredictor.get_model("2dfan2_alt"))

    os.makedirs(args.output_dir, exist_ok=True)
    for f in sorted(os.listdir(args.input_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        image = cv2.imread(os.path.join(args.input_dir, f))
        if image is None:  # corrupt/truncated file: skip, don't abort the run
            print(f"[warn] unreadable image skipped: {f}")
            continue
        faces = detector(image, rgb=False)
        landmarks, _ = fan(image, faces, rgb=False)
        np.save(
            os.path.join(args.output_dir, f.rsplit(".", 1)[0] + ".npy"),
            landmarks,
        )
    print("done")


if __name__ == "__main__":
    main()
