"""Minimal client for the HTTP serving daemon (tools/serve.py).

  # one-time: export an artifact and start the daemon
  python tools/export_serving.py --out artifacts/smirk_b8 --batch 8
  python tools/serve.py artifacts/smirk_b8 --port 8000

  # then:
  python examples/serve_client.py --image face.png [--url http://localhost:8000]

Protocol (smirk_tpu/serving.py): POST /predict with an npz body holding
key "img" (N,H,W,3) float32 in [0,1]; the response is an npz of outputs.
Against a reconstruct artifact (export_serving.py --reconstruct) also pass
--landmarks: the client applies the same scale-1.4 landmark face crop as
Predictor.reconstruct / cli/demo.py / the reference demo, computes the hull
background mask in the cropped frame, and adds "hull" (+ optional "seed")
to the request.
Client side needs numpy + scipy + PIL + the standard library (the crop and
hull helpers come from smirk_tpu.data.transforms, which imports
scipy.ndimage for the affine warp fallback).
"""
import argparse
import io
import json
import urllib.request

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--landmarks", default=None,
                   help="npy mediapipe landmarks (478,2+) in image coords; "
                        "required when the artifact is a reconstruct export")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from PIL import Image

    meta = json.loads(urllib.request.urlopen(args.url + "/meta").read())
    _, H, W, _ = meta["input"]["shape"]

    im = Image.open(args.image).convert("RGB")

    if meta.get("kind") == "reconstruct":
        if not args.landmarks:
            raise SystemExit("this artifact needs --landmarks for the hull")
        from smirk_tpu.data import transforms as T

        kpt = np.load(args.landmarks)[..., :2].astype(np.float32)
        # Same scale-1.4 landmark face crop as Predictor.reconstruct,
        # cli/demo.py, and the reference demo (base_dataset.py crop_face):
        # a plain full-frame resize would quietly degrade served
        # reconstructions vs the in-process paths on the same photo.
        tform = T.crop_face_tform(kpt, scale=1.4, image_size=H)
        img = np.clip(
            T.warp_affine(np.asarray(im, np.float32), tform, (H, W)), 0, 255
        ) / 255.0
        kpt_c = T.transform_points(tform, kpt)
        payload = {
            "img": img[None].astype(np.float32),
            "hull": T.convex_hull_mask(
                kpt_c, (H, W)).astype(np.float32)[None, :, :, None],
            "seed": np.int64(args.seed),
        }
    else:
        img = np.asarray(im.resize((W, H)), np.float32) / 255.0
        payload = {"img": img[None]}

    buf = io.BytesIO()
    np.savez(buf, **payload)
    req = urllib.request.Request(
        args.url + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    for k in out.files:
        print(f"{k}: shape {out[k].shape}")


if __name__ == "__main__":
    main()
