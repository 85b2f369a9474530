"""Minimal client for the HTTP serving daemon (tools/serve.py).

  # one-time: export an artifact and start the daemon
  python tools/export_serving.py --out artifacts/smirk_b8 --batch 8
  python tools/serve.py artifacts/smirk_b8 --port 8000

  # then:
  python examples/serve_client.py --image face.png [--url http://localhost:8000]

Protocol (smirk_tpu/serving.py): POST /predict with an npz body holding
key "img" (N,H,W,3) float32 in [0,1]; the response is an npz of outputs.
Client side needs only numpy + PIL + the standard library.
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
    args = p.parse_args(argv)

    from PIL import Image

    meta = json.loads(urllib.request.urlopen(args.url + "/meta").read())
    _, H, W, _ = meta["input"]["shape"]

    img = np.asarray(
        Image.open(args.image).convert("RGB").resize((W, H)),
        np.float32) / 255.0

    buf = io.BytesIO()
    np.savez(buf, img=img[None])
    req = urllib.request.Request(
        args.url + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    for k in out.files:
        print(f"{k}: shape {out[k].shape}")


if __name__ == "__main__":
    main()
