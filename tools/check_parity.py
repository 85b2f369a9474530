"""Checkpoint-parity harness: smirk-tpu vs the PyTorch reference pipeline.

The driver's parity gate (BASELINE.json): vertex RMSE < 1e-3 plus matching
FLAME params and projected landmarks against `SMIRK_em1.pt`. This harness:

1. loads the released torch checkpoint through the importer;
2. runs the reference torch pipeline (encoder -> FLAME) when its deps are
   available (torch + timm + FLAME2020 pkl), else loads a saved torch-output
   fixture;
3. runs the smirk-tpu pipeline on the same inputs;
4. reports param / vertex / landmark RMSEs.

Gracefully reports which license-gated pieces are missing instead of failing.
Usage: python tools/check_parity.py [--checkpoint SMIRK_em1.pt] [--image x.png]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="pretrained_models/SMIRK_em1.pt")
    p.add_argument("--image", default=None,
                   help="224x224 face crop (png); random input if omitted")
    p.add_argument("--ref_fixture", default=None,
                   help="npz of reference outputs (img, params..., vertices)")
    args = p.parse_args()

    import jax

    if os.environ.get("SMIRK_PLATFORM"):  # see cli/train.py: env alone
        # cannot override the sitecustomize-registered platform
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])
    import jax.numpy as jnp

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.utils import importer

    bundle = assets.load_all()
    if bundle["is_synthetic_flame"]:
        print("[warn] FLAME2020 pkl missing -> synthetic deformation tensors;"
              " vertex parity vs the reference is NOT meaningful until the"
              " licensed model is installed (quick_install.sh).")

    ref = None
    if args.ref_fixture and os.path.isfile(args.ref_fixture):
        ref = dict(np.load(args.ref_fixture))

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((224, 224)),
            np.float32,
        )[None] / 255.0
    elif ref is not None and "img" in ref:
        # the fixture stores the exact input its outputs were computed from
        img = np.asarray(ref["img"], np.float32)
        if img.ndim == 3:
            img = img[None]
        print("[ok] using the fixture's stored input image")
    else:
        img = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)

    system = SmirkSystem(Config(), bundle, steps_per_epoch=1)
    state = system.init_state(jax.random.PRNGKey(0))

    have_ckpt = os.path.isfile(args.checkpoint)
    if have_ckpt:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu")
        enc_sd, _ = importer.split_smirk_checkpoint(sd)
        state = state.replace(
            encoder=importer.import_state_dict(enc_sd, state.encoder)
        )
        print(f"[ok] imported {args.checkpoint}")
    else:
        print(f"[warn] {args.checkpoint} not found -> random weights; this "
              "run only validates pipeline plumbing, not checkpoint parity.")

    out = system.infer(state.encoder, jnp.asarray(img))
    ours = {k: np.asarray(v) for k, v in out.items()}

    if ref is None:
        ref = _run_reference(img, args.checkpoint) if have_ckpt else None

    if ref is None:
        print("[info] reference outputs unavailable (needs torch+timm+FLAME "
              "pkl or --ref_fixture); printing our outputs only:")
        for k in ("pose_params", "cam", "expression_params", "jaw_params"):
            print(f"  {k}: {ours[k].ravel()[:6]}")
        return

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    # the reference stack emits RAW 3D FLAME landmarks; our infer output is
    # already projected to 2D NDC (renderer override). Project the reference
    # landmarks with the same orthographic convention before comparing —
    # the projection itself has its own parity tests (test suite, camera).
    ref_lmk = np.asarray(ref["landmarks_mp"])
    if ref_lmk.shape[-1] == 3:
        from smirk_tpu.render import camera as camera_lib

        ref_lmk = np.asarray(camera_lib.project_landmarks(
            jnp.asarray(ref_lmk), jnp.asarray(ref["cam"])))

    report = {
        "expression_rmse": rmse(ours["expression_params"],
                                ref["expression_params"]),
        "pose_rmse": rmse(ours["pose_params"], ref["pose_params"]),
        "cam_rmse": rmse(ours["cam"], ref["cam"]),
        "shape_rmse": rmse(ours["shape_params"], ref["shape_params"]),
        "vertex_rmse": rmse(ours["vertices"], ref["vertices"]),
        "landmarks_mp_rmse": rmse(ours["landmarks_mp"], ref_lmk),
    }
    ok = all(v < 1e-3 for v in report.values())
    for k, v in report.items():
        print(f"  {k}: {v:.2e} {'OK' if v < 1e-3 else 'FAIL'}")
    print("PARITY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def _run_reference(img, checkpoint):
    """Run the reference torch encoder+FLAME when its stack is available
    (needs timm + the FLAME2020 pkl; see tools/make_reference_outputs.py)."""
    try:
        import timm  # noqa: F401  (reference encoder needs it)
        import torch

        from make_reference_outputs import load_reference_modules

        REF = "/root/reference"
        if not os.path.isfile(
            os.path.join(REF, "assets/FLAME2020/generic_model.pkl")
        ):
            return None
        flame_mod, enc_mod = load_reference_modules()
        cwd = os.getcwd()
        os.chdir(REF)
        try:
            encoder = enc_mod.SmirkEncoder()
            sd = torch.load(os.path.join(cwd, checkpoint), map_location="cpu")
            encoder.load_state_dict(
                {k.replace("smirk_encoder.", ""): v for k, v in sd.items()
                 if k.startswith("smirk_encoder.")}
            )
            encoder.eval()
            flame = flame_mod.FLAME()
            with torch.no_grad():
                t = torch.from_numpy(img.transpose(0, 3, 1, 2))
                out = encoder(t)
                fo = flame.forward(out)
        finally:
            os.chdir(cwd)
        ref = {k: v.numpy() for k, v in out.items()}
        ref["vertices"] = fo["vertices"].numpy()
        ref["landmarks_mp"] = fo["landmarks_mp"].numpy()
        return ref
    except Exception as e:  # degrade gracefully per the module contract:
        # missing license-gated assets / state-dict mismatches must not
        # kill the harness — report and fall back to ours-only output
        print(f"[warn] reference stack unavailable ({type(e).__name__}: {e})")
        return None


if __name__ == "__main__":
    main()
