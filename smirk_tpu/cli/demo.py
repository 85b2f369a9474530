"""Inference demos: single image + video tracking (reference demo.py /
demo_video.py equivalents, batched + jitted).

Landmark detection: uses mediapipe when importable; otherwise pass
--landmarks <npy> (478x2+ mediapipe points) or omit --crop to feed the image
as-is. Checkpoints: torch .pt (via the importer) or our .npz model exports.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def build_system(checkpoint: Optional[str], use_generator: bool,
                 use_pallas: Optional[bool] = None):
    import os

    import jax

    if os.environ.get("SMIRK_PLATFORM"):  # see cli/train.py
        jax.config.update("jax_platforms", os.environ["SMIRK_PLATFORM"])

    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.utils import checkpoint as ckpt
    from smirk_tpu.utils import importer

    cfg = Config()
    system = SmirkSystem(cfg, assets.load_all(), steps_per_epoch=1,
                         use_pallas=use_pallas)
    state = system.init_state(jax.random.PRNGKey(0))
    if checkpoint and checkpoint.endswith(".pt"):
        import torch

        sd = torch.load(checkpoint, map_location="cpu")
        enc_sd, gen_sd = importer.split_smirk_checkpoint(sd)
        enc = importer.import_state_dict(enc_sd, state.encoder)
        gen = state.generator
        if use_generator and gen_sd:
            gen = importer.import_state_dict(gen_sd, state.generator)
        state = state.replace(encoder=enc, generator=gen)
    elif checkpoint:
        state = ckpt.load_model(state, checkpoint)
    return system, state


def get_landmarks(image: np.ndarray, landmarks_path: Optional[str]):
    if landmarks_path:
        return np.load(landmarks_path)[..., :2]
    try:
        from smirk_tpu.cli.mediapipe_utils import run_mediapipe

        return run_mediapipe(image)
    except ImportError:
        return None


def process_image(system, state, image: np.ndarray, kpt: Optional[np.ndarray],
                  crop: bool, use_generator: bool, rng_seed: int = 0):
    """One frame -> dict with rendered_img / reconstructed_img / tform."""
    import jax
    import jax.numpy as jnp

    from smirk_tpu.data import transforms as T

    H0, W0 = image.shape[:2]
    tform = None
    if crop:
        assert kpt is not None, "--crop needs landmarks"
        tform = T.crop_face_tform(kpt[..., :2], scale=1.4, image_size=224)
        cropped = np.clip(T.warp_affine(image.astype(np.float32), tform,
                                        (224, 224)), 0, 255)
        kpt_c = T.transform_points(tform, kpt[..., :2]) if kpt is not None else None
    else:
        from PIL import Image

        cropped = np.asarray(
            Image.fromarray(image).resize((224, 224))
        ).astype(np.float32)
        sx, sy = 224.0 / W0, 224.0 / H0
        kpt_c = kpt[..., :2] * [sx, sy] if kpt is not None else None

    img = jnp.asarray(cropped[None] / 255.0, jnp.float32)
    out = system.infer(state.encoder, img)

    result = {"cropped_image": np.asarray(img[0]), "tform": tform,
              "outputs": out}

    if use_generator and system.generator is not None:
        assert kpt_c is not None, "generator path needs landmarks"
        # randomized point-budget sampling + hull masking + generator:
        # shared math in SmirkSystem.reconstruct (reference demo.py:133-182)
        hull = T.convex_hull_mask(kpt_c, (224, 224))  # 1=background
        masked, recon = system.reconstruct(
            state.generator, out, img,
            jnp.asarray(hull[None, :, :, None], jnp.float32),
            jax.random.PRNGKey(rng_seed),
        )
        result["masked_img"] = np.asarray(masked[0])
        result["reconstructed_img"] = np.asarray(recon[0])
    return result


def panel(image, result, render_orig: bool):
    """Build the side-by-side output panel (reference demo.py:117-193)."""
    from smirk_tpu.data import transforms as T

    rendered = np.asarray(result["outputs"]["rendered_img"][0])
    cols = []
    if render_orig:
        H0, W0 = image.shape[:2]
        full = image.astype(np.float32) / 255.0
        if result["tform"] is not None:
            inv = np.linalg.inv(result["tform"])
            r = T.warp_affine(rendered, inv, (H0, W0))
        else:
            from PIL import Image as PImage

            r = np.asarray(PImage.fromarray(
                (rendered * 255).astype(np.uint8)).resize((W0, H0))) / 255.0
        cols = [full, np.clip(r, 0, 1)]
        if "reconstructed_img" in result:
            rec = result["reconstructed_img"]
            if result["tform"] is not None:
                rec = T.warp_affine(rec, np.linalg.inv(result["tform"]), (H0, W0))
            else:
                from PIL import Image as PImage

                rec = np.asarray(PImage.fromarray(
                    (rec * 255).astype(np.uint8)).resize((W0, H0))) / 255.0
            cols.append(np.clip(rec, 0, 1))
    else:
        cols = [result["cropped_image"], rendered]
        if "reconstructed_img" in result:
            cols.append(result["reconstructed_img"])
    return np.concatenate(cols, axis=1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--landmarks", default=None,
                   help="npy with mediapipe landmarks (478,2+)")
    p.add_argument("--crop", action="store_true")
    p.add_argument("--out_path", default="output")
    p.add_argument("--use_smirk_generator", action="store_true")
    p.add_argument("--render_orig", action="store_true")
    args = p.parse_args(argv)

    from PIL import Image

    from smirk_tpu.utils.viz import save_image

    image = np.asarray(Image.open(args.input_path).convert("RGB"))
    system, state = build_system(args.checkpoint, args.use_smirk_generator)
    kpt = get_landmarks(image, args.landmarks)
    result = process_image(system, state, image, kpt, args.crop,
                           args.use_smirk_generator)
    grid = panel(image, result, args.render_orig)
    os.makedirs(args.out_path, exist_ok=True)
    out = os.path.join(args.out_path, os.path.basename(args.input_path))
    save_image(grid, out)
    print("wrote", out)


if __name__ == "__main__":
    main()
