"""Minimal client for the HTTP serving daemon (tools/serve.py).

  # one-time: export an artifact and start the daemon
  python tools/export_serving.py --out artifacts/smirk_b8 --batch 8
  python tools/serve.py artifacts/smirk_b8 --port 8000

  # then:
  python examples/serve_client.py --image face.png [--url http://localhost:8000]

Protocol (smirk_tpu/serving.py): POST /predict with an npz body holding
key "img" (N,H,W,3) float32 in [0,1]; the response is an npz of outputs.
Against a reconstruct artifact (export_serving.py --reconstruct) also pass
--landmarks: the client computes the hull background mask locally and adds
"hull" (+ optional "seed") to the request.
Client side needs only numpy + PIL + the standard library (the hull fill
imports smirk_tpu.data.transforms, pure numpy).
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
    W0, H0 = im.size
    img = np.asarray(im.resize((W, H)), np.float32) / 255.0

    payload = {"img": img[None]}
    if meta.get("kind") == "reconstruct":
        if not args.landmarks:
            raise SystemExit("this artifact needs --landmarks for the hull")
        from smirk_tpu.data import transforms as T

        kpt = np.load(args.landmarks)[..., :2].astype(np.float32)
        kpt = kpt * [W / W0, H / H0]  # into the resized frame
        payload["hull"] = T.convex_hull_mask(
            kpt, (H, W)).astype(np.float32)[None, :, :, None]
        payload["seed"] = np.int64(args.seed)

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
