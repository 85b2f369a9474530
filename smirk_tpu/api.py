"""High-level inference API: one object, one call, batched and jitted.

The reference exposes inference only through demo scripts
(/root/reference/demo.py:41-116 builds encoder+FLAME+renderer by hand);
here the same pipeline is a first-class object:

    from smirk_tpu import Predictor

    pred = Predictor(checkpoint="model.npz")      # or torch .pt / orbax dir
    out = pred(images)                            # (B,H,W,3) uint8 or float
    out["expression_params"], out["vertices"], out["rendered_img"], ...

Images are resized (or landmark-cropped with `landmarks=`) to the model
resolution on the host, then encode->FLAME->render runs as ONE jitted
program per batch size. Results come back as numpy. For multi-chip
serving artifacts see smirk_tpu.serving; for video throughput see
cli/demo_video.py.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["Predictor"]


class Predictor:
    """Batched single-call inference over the flagship pipeline.

    Args:
      checkpoint: model weights — our .npz / orbax export or a reference
        torch .pt (imported via smirk_tpu.utils.importer); None = random
        init (layout/shape-compatible, useful for smoke tests).
      use_generator: also load + expose the fuse generator (needed only
        for `reconstruct`, the analysis-by-neural-synthesis image path).
      use_pallas: force the Pallas raster kernels on/off (default: auto —
        on for TPU backends, off for CPU).
    """

    def __init__(self, checkpoint: Optional[str] = None,
                 use_generator: bool = False,
                 use_pallas: Optional[bool] = None):
        from smirk_tpu.cli.demo import build_system

        self.system, self.state = build_system(
            checkpoint, use_generator=use_generator, use_pallas=use_pallas)
        self.image_size = self.system.config.image_size
        self.use_generator = use_generator and self.system.generator is not None

    # ------------------------------ helpers ------------------------------

    def _prepare(self, images: np.ndarray,
                 landmarks: Optional[np.ndarray]):
        """uint8/float images (B,H,W,3) or (H,W,3) -> ((B,S,S,3) f32 in
        [0,1], landmarks mapped into the prepared frame or None), resized
        or landmark-cropped (scale 1.4, the reference demo crop,
        demo.py:87-99)."""
        from smirk_tpu.data import transforms as T

        images = np.asarray(images)
        # dtype decides the 0-255 branch (a value heuristic would misread
        # dark uint8 frames as already [0,1]); the max() check remains only
        # for float arrays holding 0-255 data
        was_integer = np.issubdtype(images.dtype, np.integer)
        if images.ndim == 3:
            images = images[None]
        if landmarks is not None:
            landmarks = np.asarray(landmarks)
            if landmarks.ndim == 2:  # one landmark set for every image
                landmarks = np.broadcast_to(
                    landmarks, (images.shape[0],) + landmarks.shape)
            elif landmarks.shape[0] != images.shape[0]:
                raise ValueError(
                    f"landmarks batch {landmarks.shape[0]} != images "
                    f"batch {images.shape[0]}")
        if images.dtype != np.float32:
            images = images.astype(np.float32)
        if was_integer or images.max() > 2.0:  # 0-255-range input
            images = images / 255.0
        S = self.image_size
        out = np.empty((images.shape[0], S, S, 3), np.float32)
        kpts = None if landmarks is None else np.empty(
            (images.shape[0], np.asarray(landmarks).shape[-2], 2), np.float32)
        for i, img in enumerate(images):
            if landmarks is not None:
                kpt = np.asarray(landmarks[i])[..., :2]
                tform = T.crop_face_tform(kpt, scale=1.4, image_size=S)
                out[i] = np.clip(
                    T.warp_affine(img * 255.0, tform, (S, S)), 0, 255
                ) / 255.0
                kpts[i] = T.transform_points(tform, kpt)
            elif img.shape[:2] != (S, S):
                from PIL import Image

                out[i] = np.asarray(Image.fromarray(
                    (np.clip(img, 0, 1) * 255).astype(np.uint8)
                ).resize((S, S))) / 255.0
            else:
                out[i] = img
        return out, kpts

    # ------------------------------ API ------------------------------

    def __call__(self, images: np.ndarray,
                 landmarks: Optional[np.ndarray] = None
                 ) -> Dict[str, np.ndarray]:
        """Full pipeline: FLAME params + geometry + rendered images.

        Returns numpy arrays: pose/shape/expression/jaw/eyelid params, cam,
        vertices, 2D/3D landmark sets, rendered_img, rendered_mask.
        """
        imgs, _ = self._prepare(images, landmarks)
        out = self.system.infer(self.state.encoder, imgs)
        return {k: np.asarray(v) for k, v in out.items()}

    def encode(self, images: np.ndarray,
               landmarks: Optional[np.ndarray] = None
               ) -> Dict[str, np.ndarray]:
        """Encoder only: FLAME parameters without geometry or rendering
        (cheaper when the caller only needs expression/pose codes)."""
        imgs, _ = self._prepare(images, landmarks)
        out = self._encode_jit(self.state.encoder, imgs)
        return {k: np.asarray(v) for k, v in out.items()}

    @property
    def _encode_jit(self):
        import jax

        if not hasattr(self, "_encode_fn"):
            enc = self.system.encoder

            @jax.jit
            def run(variables, img):
                return enc.apply(variables, img, train=False)

            self._encode_fn = run
        return self._encode_fn

    def reconstruct(self, images: np.ndarray, landmarks: np.ndarray,
                    seed: int = 0) -> Dict[str, np.ndarray]:
        """Analysis-by-neural-synthesis reconstruction (the reference
        demo.py:133-182 generator branch, batched): render the predicted
        mesh, sample mesh-anchored pixel hints with the demo's randomized
        point budget (rsing/rscale/rbound), hull-mask the input, and run
        the fuse generator on [render ‖ masked image].

        Requires Predictor(use_generator=True) and mediapipe-style
        landmarks (478+,2) per image in INPUT-image coordinates — they
        drive both the face crop and the convex-hull mask. Returns the
        __call__ outputs plus `cropped_img` (the prepared input),
        `masked_img`, and `reconstructed_img`.
        """
        import jax
        import jax.numpy as jnp

        from smirk_tpu.data import transforms as T

        if not self.use_generator:
            raise ValueError(
                "reconstruct() needs the fuse generator: build the "
                "Predictor with use_generator=True")
        if landmarks is None:
            raise ValueError(
                "reconstruct() needs landmarks for the hull mask (the "
                "reference demo generator path has the same requirement)")
        imgs, kpts = self._prepare(images, landmarks)
        S = self.image_size
        hull = np.stack(
            [T.convex_hull_mask(k, (S, S)) for k in kpts]
        ).astype(np.float32)[..., None]  # (B,S,S,1), 1 = background
        out = self._reconstruct_jit(
            self.state.encoder, self.state.generator,
            jnp.asarray(imgs), jnp.asarray(hull), jax.random.PRNGKey(seed))
        return {"cropped_img": imgs,
                **{k: np.asarray(v) for k, v in out.items()}}

    @property
    def _reconstruct_jit(self):
        import jax

        if not hasattr(self, "_reconstruct_fn"):
            system = self.system

            @jax.jit
            def run(enc_vars, gen_vars, img, hull, key):
                out = system.infer(enc_vars, img)
                # shared budget/mask math: SmirkSystem.reconstruct (also
                # used by cli/demo.py and serving.export_reconstruct)
                masked, recon = system.reconstruct(
                    gen_vars, out, img, hull, key)
                return {**out, "masked_img": masked,
                        "reconstructed_img": recon}

            self._reconstruct_fn = run
        return self._reconstruct_fn

    def render_params(self, params: Dict[str, np.ndarray]
                      ) -> Dict[str, np.ndarray]:
        """FLAME params (from __call__/encode, possibly edited) -> fresh
        geometry + render. Enables expression editing workflows: encode,
        tweak `expression_params`/`jaw_params`, re-render."""
        import jax.numpy as jnp

        p = {k: jnp.asarray(v) for k, v in params.items()}
        out = self._render_jit(p)
        return {k: np.asarray(v) for k, v in out.items()}

    @property
    def _render_jit(self):
        import jax

        if not hasattr(self, "_render_fn"):
            system = self.system

            @jax.jit
            def run(p):
                flame_out = system.flame(p)
                rend = system.renderer(
                    flame_out["vertices"], p["cam"], inference=True)
                return {**flame_out, **rend}

            self._render_fn = run
        return self._render_fn
