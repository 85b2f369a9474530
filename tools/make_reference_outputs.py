"""Produce a reference-pipeline output fixture for tools/check_parity.py.

Runs the PyTorch reference (encoder -> FLAME) on given 224px crops with the
released checkpoint and saves all outputs to npz. Needs: torch, timm, the
FLAME2020 pkl, and SMIRK_em1.pt — i.e. an environment where the reference
actually runs. The fixture is then consumed by check_parity.py anywhere.

Usage:
  python tools/make_reference_outputs.py --checkpoint SMIRK_em1.pt \
      --image crop.png --out ref_outputs.npz
"""
import argparse
import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def load_reference_modules():
    import torch  # noqa: F401

    for alias, val in (("bool_", np.bool_), ("int_", np.int_),
                       ("float_", np.float64), ("complex_", np.complex128),
                       ("object_", np.object_), ("str_", np.str_),
                       ("unicode_", np.str_)):
        if not hasattr(np, alias):
            setattr(np, alias, val)
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    for pkg in ("src", "src.FLAME"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REF, *pkg.split(".")[1:])]
            sys.modules[pkg] = m

    def load(relpath, name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("src/FLAME/lbs.py", "src.FLAME.lbs")
    flame_mod = load("src/FLAME/FLAME.py", "src.FLAME.FLAME")
    enc_mod = load("src/smirk_encoder.py", "ref_smirk_encoder")
    return flame_mod, enc_mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--out", default="ref_outputs.npz")
    args = p.parse_args()

    import torch

    flame_mod, enc_mod = load_reference_modules()
    os.chdir(REF)  # FLAME loads assets by relative path

    encoder = enc_mod.SmirkEncoder()
    sd = torch.load(args.checkpoint, map_location="cpu")
    encoder.load_state_dict(
        {k.replace("smirk_encoder.", ""): v for k, v in sd.items()
         if k.startswith("smirk_encoder.")}
    )
    encoder.eval()
    flame = flame_mod.FLAME()

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((224, 224)),
            np.float32,
        )[None] / 255.0
    else:
        img = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)

    with torch.no_grad():
        t = torch.from_numpy(img.transpose(0, 3, 1, 2))
        out = encoder(t)
        fo = flame.forward(out)
    np.savez(
        args.out,
        img=img,
        **{k: v.numpy() for k, v in out.items()},
        vertices=fo["vertices"].numpy(),
        landmarks_fan=fo["landmarks_fan"].numpy(),
        landmarks_mp=fo["landmarks_mp"].numpy(),
    )
    print("wrote", args.out)


if __name__ == "__main__":
    main()
