"""SMIRK training system: pure two-path train step, optax two-optimizer setup.

Re-designs the reference trainer (src/base_trainer.py + src/smirk_trainer.py)
as pure functions over an explicit TrainState, jitted end-to-end (encoders +
FLAME + rasterizer + generator + both backward passes in ONE XLA program):

* the mutable nn.Module with internal optimizers becomes
  `train_step(state, batch, rng, parity) -> (state, metrics)`;
* `requires_grad_` freeze toggling becomes `stop_gradient` on parameter
  trees + conditional optimizer application; the even/odd batch alternation
  (base_trainer.py:258-268) is the static `parity` argument (two compiled
  variants);
* per-iteration cosine schedules with per-epoch restarts
  (base_trainer.py:53-66) are step-indexed optax schedules;
* the reference's accidental per-epoch reset of the generator's Adam state
  (base_trainer.py:58-62 checks `fuse_generator_optimizer` but the attribute
  is `smirk_generator_optimizer`) is consciously FIXED: optimizer state
  persists across epochs.

Frozen teachers (VGG, EMOCA emotion net, MICA) are optional variable trees;
when None their losses are 0 (matching configs with zero weights).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from smirk_tpu import masking as masking_lib
from smirk_tpu.config import Config
from smirk_tpu.flame import FlameModel
from smirk_tpu.losses import landmark_mse, masked_landmark_mse, param_regularization
from smirk_tpu.models.emoca_resnet import emotion_embedding_distance
from smirk_tpu.models.encoders import SmirkEncoder
from smirk_tpu.models.generator import SmirkGenerator
from smirk_tpu.models.mica import Mica
from smirk_tpu.models.vgg import perceptual_loss
from smirk_tpu.render.renderer import Renderer


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    encoder: Any  # {'params', 'batch_stats'}
    generator: Any  # {'params', 'batch_stats'} or None
    base_encoder: Any  # frozen copy for regularization/viz, or None
    enc_opt: Any
    gen_opt: Any


def _cosine_epoch_restart(peak: float, steps_per_epoch: int, eta_min_frac=0.01):
    """torch CosineAnnealingLR(T_max=steps/epoch), restarted every epoch
    (reference train.py:48 + base_trainer.py:53-66)."""
    eta_min = eta_min_frac * peak

    def sched(step):
        t = jnp.mod(step, steps_per_epoch)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t / steps_per_epoch))
        return eta_min + (peak - eta_min) * cos

    return sched


class SmirkSystem:
    """Static module bundle + the jitted train/eval step functions."""

    def __init__(
        self,
        config: Config,
        bundle: Dict[str, np.ndarray],
        *,
        steps_per_epoch: int = 1000,
        vgg_variables=None,
        emotion_variables=None,
        mica_variables=None,
        templates: Optional[np.ndarray] = None,
        use_pallas: Optional[bool] = None,
        raster_compact: Optional[int] = None,
        generator_features: int = 32,
        generator_res_blocks: int = 5,
    ):
        self.config = config
        c = config
        self.flame = FlameModel(
            bundle, n_shape=c.arch.num_shape, n_exp=c.arch.num_expression
        )
        self.renderer = Renderer(
            bundle,
            render_full_head=c.render.full_head,
            image_size=c.image_size,
            use_pallas=use_pallas,
            raster_compact=raster_compact,
        )
        compute_dtype = jnp.bfloat16 if c.arch.bf16_compute else None
        self.encoder = SmirkEncoder(
            n_exp=c.arch.num_expression,
            n_shape=c.arch.num_shape,
            backbone_pose=c.arch.backbone_pose,
            backbone_shape=c.arch.backbone_shape,
            backbone_expression=c.arch.backbone_expression,
            dtype=compute_dtype,
        )
        self.generator = (
            SmirkGenerator(in_channels=6, out_channels=3,
                           init_features=generator_features,
                           res_blocks=generator_res_blocks,
                           dtype=compute_dtype)
            if c.arch.enable_fuse_generator
            else None
        )
        # Frozen-module twins for the cycle path: same params, possibly
        # lower compute dtype (arch.bf16_cycle_frozen — a targeted subset
        # of bf16_compute for fp32 runs; flax modules are pure configs, so
        # twins share the variables). Aliases when the dtype matches.
        frozen_dtype = (
            jnp.bfloat16 if (c.arch.bf16_compute or c.arch.bf16_cycle_frozen)
            else None
        )
        if frozen_dtype == compute_dtype:
            self.encoder_frozen = self.encoder
            self.generator_frozen = self.generator
        else:
            self.encoder_frozen = SmirkEncoder(
                n_exp=c.arch.num_expression,
                n_shape=c.arch.num_shape,
                backbone_pose=c.arch.backbone_pose,
                backbone_shape=c.arch.backbone_shape,
                backbone_expression=c.arch.backbone_expression,
                dtype=frozen_dtype,
            )
            self.generator_frozen = (
                SmirkGenerator(in_channels=6, out_channels=3,
                               init_features=generator_features,
                               res_blocks=generator_res_blocks,
                               dtype=frozen_dtype)
                if c.arch.enable_fuse_generator
                else None
            )
        self.face_probabilities = jnp.asarray(bundle["face_probabilities"])
        from smirk_tpu.render import geometry as _geom

        fidx, cidx = _geom.build_vertex_face_incidence(
            bundle["faces"], int(np.asarray(bundle["faces"]).max()) + 1
        )
        self.flame_incidence = (jnp.asarray(fidx), jnp.asarray(cidx))
        self.vgg_variables = vgg_variables
        self.emotion_variables = emotion_variables
        self.mica_variables = mica_variables
        self.mica = Mica() if mica_variables is not None else None
        # FaMoS expression templates stacked (T, >= n_exp); zeros fallback
        if templates is None:
            templates = np.zeros((1, c.arch.num_expression), np.float32)
        self.templates = jnp.asarray(
            templates[:, : c.arch.num_expression], jnp.float32
        )

        self.num_mask_points = int(c.train.mask_ratio * c.image_size**2)

        # --- optimizers (reference base_trainer.py:28-66) ---
        # per-submodule trainability (reference picks param groups,
        # base_trainer.py:43-51); frozen submodules get zero updates.
        # The cosine LR is indexed by state.step (the training-iteration
        # counter), NOT by optax's internal update count: with the cycle
        # path on, each optimizer updates up to twice per iteration (phase 1
        # + its unfrozen phase-2 turn), while the reference steps its
        # scheduler exactly once per iteration (smirk_trainer.py:397) and
        # uses one LR for both backward passes. Adam's bias-correction
        # count stays per-update-call, matching torch Adam's own counter.
        enc_peak = 0.25 * c.train.lr
        self.enc_tx = optax.multi_transform(
            {
                "train": optax.scale_by_adam(),
                "freeze": optax.set_to_zero(),
            },
            self._encoder_labels,
        )
        self.enc_lr = _cosine_epoch_restart(enc_peak, steps_per_epoch)
        self.gen_tx = optax.scale_by_adam(b1=0.5, b2=0.999)
        self.gen_lr = _cosine_epoch_restart(c.train.lr, steps_per_epoch)

        self._train_step = jax.jit(
            self._step_impl, static_argnames=("parity", "train")
        )
        self.step_mode = os.environ.get(
            "SMIRK_STEP_MODE", c.train.step_mode)
        self._split1 = jax.jit(self._split1_impl, static_argnames=("final",))
        self._split2 = jax.jit(self._split2_impl, static_argnames=("parity",))

    # ---------------------------- state setup ----------------------------

    def _encoder_labels(self, params):
        flags = {
            "pose_encoder": self.config.train.optimize_pose,
            "shape_encoder": self.config.train.optimize_shape,
            "expression_encoder": self.config.train.optimize_expression,
        }
        return {
            k: jax.tree_util.tree_map(
                lambda _: "train" if flags.get(k, False) else "freeze", v
            )
            for k, v in params.items()
        }

    def init_state(self, rng) -> TrainState:
        img = jnp.zeros((1, self.config.image_size, self.config.image_size, 3))
        k_enc, k_gen = jax.random.split(rng)
        enc_vars = self.encoder.init(k_enc, img)
        enc_vars = {"params": enc_vars["params"],
                    "batch_stats": enc_vars["batch_stats"]}
        gen_vars = None
        if self.generator is not None:
            gv = self.generator.init(k_gen, jnp.zeros(
                (1, self.config.image_size, self.config.image_size, 6)))
            gen_vars = {"params": gv["params"], "batch_stats": gv["batch_stats"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            encoder=enc_vars,
            generator=gen_vars,
            base_encoder=jax.tree_util.tree_map(lambda x: x, enc_vars),
            enc_opt=self.enc_tx.init(enc_vars["params"]),
            gen_opt=self.gen_tx.init(gen_vars["params"]) if gen_vars else None,
        )

    # ------------------------- module application -------------------------

    def _apply_encoder(self, enc_vars, img, train):
        if train:
            out, mut = self.encoder.apply(
                enc_vars, img, train=True, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return self.encoder.apply(enc_vars, img, train=False), enc_vars["batch_stats"]

    def _apply_generator(self, gen_vars, x, train):
        if train:
            out, mut = self.generator.apply(
                gen_vars, x, train=True, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return self.generator.apply(gen_vars, x, train=False), gen_vars["batch_stats"]

    # ------------------------------- path 1 -------------------------------

    def _loss1(self, enc_params, gen_params, enc_stats, gen_stats, batch, rng,
               train, base_encoder=None):
        """First path: landmarks + regularization + masked reconstruction.

        Reference smirk_trainer.py:34-179.
        """
        c = self.config
        w = c.train.loss_weights
        img = batch["img"]
        B = img.shape[0]
        enc_vars = {"params": enc_params, "batch_stats": enc_stats}

        enc_out, enc_stats = self._apply_encoder(enc_vars, img, train)
        flame_out = self.flame(enc_out)
        rend = self.renderer(
            flame_out["vertices"],
            enc_out["cam"],
            {
                "landmarks_fan": flame_out["landmarks_fan"],
                "landmarks_mp": flame_out["landmarks_mp"],
            },
            # Pretrain (no generator, config_pretrain.yaml:49) has no
            # image-space loss — the render is viz-only, so use the fused
            # non-differentiable kernel. (Also: the differentiable raster
            # with fully-unused gradients reproducibly crashes this
            # toolchain's remote Mosaic compile, tools/tpu_step_bisect3.py.)
            inference=self.generator is None,
        )

        losses = {}
        # Monitoring only (never weighted into a loss): max compact-raster
        # chunks dropped past the budget across the shard. Non-zero means
        # some tiles rendered EMPTY with zero gradients (see _compact_plan)
        # — the auto budget keeps ~1.4x headroom, so anything > 0 flags an
        # atypical face scale/mesh corrupting training renders.
        losses["raster_overflow"] = jnp.max(
            rend["raster_overflow"]).astype(jnp.float32)
        losses["landmark_loss_fan"] = masked_landmark_mse(
            rend["landmarks_fan"], batch["landmarks_fan"][..., :2],
            batch["flag_landmarks_fan"],
        )
        losses["landmark_loss_mp"] = landmark_mse(
            rend["landmarks_mp"], batch["landmarks_mp"][..., :2]
        )

        # regularization toward the frozen base model or zeros
        # (smirk_trainer.py:64-72)
        if c.train.use_base_model_for_regularization and base_encoder is not None:
            base_out = self.encoder.apply(
                jax.lax.stop_gradient(base_encoder), img, train=False
            )
            base_out = jax.lax.stop_gradient(base_out)
        else:
            base_out = {
                "expression_params": jnp.zeros((B, c.arch.num_expression)),
                "shape_params": jnp.zeros((B, c.arch.num_shape)),
                "jaw_params": jnp.zeros((B, 3)),
            }
        losses["expression_regularization"] = param_regularization(
            enc_out["expression_params"], base_out["expression_params"]
        )
        losses["shape_regularization"] = param_regularization(
            enc_out["shape_params"], base_out["shape_params"]
        )
        losses["jaw_regularization"] = param_regularization(
            enc_out["jaw_params"], base_out["jaw_params"]
        )

        recon_img = None
        masked_img = None
        if self.generator is not None:
            gen_vars = {"params": gen_params, "batch_stats": gen_stats}
            kpts, kmask = jax.random.split(rng)
            npoints, _ = masking_lib.sample_mesh_points(
                kpts,
                rend["transformed_vertices"],
                self.flame.faces,
                self.face_probabilities,
                self.num_mask_points,
                c.image_size,
                incidence=self.flame_incidence,
            )
            extra = masking_lib.transfer_pixels(img, npoints, npoints)
            masked_img = masking_lib.compose_mask(
                kmask, img, batch["mask"], extra,
                dilation_radius=c.train.mask_dilation_radius,
                rendered_mask=rend["rendered_mask"],
            )
            gen_in = jnp.concatenate([rend["rendered_img"], masked_img], -1)
            recon_img, gen_stats = self._apply_generator(gen_vars, gen_in, train)

            rec_err = jnp.abs(recon_img - img)
            losses["reconstruction_loss"] = rec_err.mean()
            if self.vgg_variables is not None and w.perceptual_vgg_loss > 0:
                losses["perceptual_vgg_loss"] = perceptual_loss(
                    self.vgg_variables, recon_img, img
                )
            else:
                losses["perceptual_vgg_loss"] = 0.0
            if self.emotion_variables is not None and w.emotion_loss > 0:
                # re-forward with generator params frozen + eval-mode BN
                # (smirk_trainer.py:108-119)
                recon_p = self.generator.apply(
                    jax.lax.stop_gradient(gen_vars), gen_in, train=False
                )
                losses["emotion_loss"] = emotion_embedding_distance(
                    self.emotion_variables, recon_p, img, metric="l2"
                ).mean()
            else:
                losses["emotion_loss"] = 0.0
        else:
            losses["reconstruction_loss"] = 0.0
            losses["perceptual_vgg_loss"] = 0.0
            losses["emotion_loss"] = 0.0

        if self.mica is not None and w.mica_loss > 0:
            mica_shape = jax.lax.stop_gradient(
                self.mica.apply(self.mica_variables, batch["img_mica"])
            )[..., : c.arch.num_shape]
            losses["mica_loss"] = jnp.mean(
                (enc_out["shape_params"] - mica_shape) ** 2
            )
        else:
            losses["mica_loss"] = 0.0

        shape_losses = (
            losses["shape_regularization"] * w.shape_regularization
            + losses["mica_loss"] * w.mica_loss
        )
        expression_losses = (
            losses["expression_regularization"] * w.expression_regularization
            + losses["jaw_regularization"] * w.jaw_regularization
        )
        landmark_losses = (
            losses["landmark_loss_fan"] + losses["landmark_loss_mp"]
        ) * w.landmark_loss
        fuse_losses = (
            losses["perceptual_vgg_loss"] * w.perceptual_vgg_loss
            + losses["reconstruction_loss"] * w.reconstruction_loss
            + losses["emotion_loss"] * w.emotion_loss
        )
        total = landmark_losses
        if c.train.optimize_shape:
            total = total + shape_losses
        if c.train.optimize_expression:
            total = total + expression_losses
        if self.generator is not None:
            total = total + fuse_losses

        aux = {
            "losses": losses,
            "enc_stats": enc_stats,
            "gen_stats": gen_stats if self.generator is not None else None,
            "encoder_output": jax.lax.stop_gradient(enc_out),
            "transformed_vertices": jax.lax.stop_gradient(
                rend["transformed_vertices"]
            ),
            "rendered_img": jax.lax.stop_gradient(rend["rendered_img"]),
            "masked_img": masked_img,
            "reconstructed_img": (
                jax.lax.stop_gradient(recon_img) if recon_img is not None else None
            ),
            # per-pixel reconstruction-loss heatmap (smirk_trainer.py:99-101)
            "loss_img": (
                jax.lax.stop_gradient(rec_err.mean(-1, keepdims=True))
                if recon_img is not None else None
            ),
            # predicted landmarks for the viz overlays (base_trainer.py:138-142)
            "landmarks_fan": jax.lax.stop_gradient(rend["landmarks_fan"]),
            "landmarks_mp": jax.lax.stop_gradient(rend["landmarks_mp"]),
        }
        return total, aux

    # ------------------------------- path 2 -------------------------------

    def _augment_feats(self, rng, feats, Ke):
        """Parameter augmentation for the cycle path.

        Reference smirk_trainer.py:199-248: 4 random groups (random
        expressions / batch permutation / template injection / zero), jaw &
        eyelid jitter for all. Static group sizes from a permutation split.
        """
        c = self.config
        D = feats["expression_params"].shape[1]
        n = feats["expression_params"].shape[0]  # Ke * B already tiled
        q = n // 4
        ks = jax.random.split(rng, 20)
        perm = jax.random.permutation(ks[0], n)
        g0, g1, g2, g3 = perm[:q], perm[q:2 * q], perm[2 * q:3 * q], perm[3 * q:]

        expr = feats["expression_params"]
        # group 0: random expressions
        pm = jax.random.bernoulli(ks[1], 0.5, (q, D)).astype(expr.dtype)
        new0 = (
            jax.random.normal(ks[2], (q, D))
            * (1 + 2 * jax.random.uniform(ks[3], (q, 1)))
            * pm
            + expr[g0]
        )
        new0 = jnp.clip(new0, -4.0, 4.0) + 0.2 * jax.random.uniform(
            ks[4], (q, 1)
        ) * jax.random.normal(ks[5], (q, D))
        expr = expr.at[g0].set(new0)
        # group 1: scaled batch permutation + noise
        inner = jax.random.permutation(ks[6], q)
        new1 = (0.25 + 1.25 * jax.random.uniform(ks[7], (q, 1))) * expr[g1][inner] \
            + 0.2 * jax.random.uniform(ks[8], (q, 1)) * jax.random.normal(ks[9], (q, D))
        expr = expr.at[g1].set(new1)
        # group 2: template injection + noise
        tidx = jax.random.randint(ks[10], (q,), 0, self.templates.shape[0])
        scale2 = 0.25 + 1.25 * jax.random.uniform(ks[11], (q, 1))
        new2 = scale2 * self.templates[tidx] + 0.2 * jax.random.uniform(
            ks[12], (q, 1)
        ) * jax.random.normal(ks[13], (q, D))
        expr = expr.at[g2].set(new2)

        # jaw jitter for all rows
        jaw = feats["jaw_params"]
        scale_mask = jnp.asarray([1.0, 0.1, 0.1])[None] * jax.random.bernoulli(
            ks[14], 0.5, (n, 1)
        ).astype(jaw.dtype)
        jaw = jaw + jax.random.normal(ks[15], jaw.shape) * 0.2 * scale_mask
        jaw = jaw.at[..., 0].set(jnp.clip(jaw[..., 0], 0.0, 0.5))

        kk = ks[16:20]  # tail-op keys (never reuse a consumed key: ks[0]
        # already drove the group permutation, so deriving these from it
        # would correlate group assignment with the tail randomness)
        # the encoder always emits eyelid_params (encoders.py); gate on the
        # config flag alone, same as _loss2's cycle term
        eyelid = feats["eyelid_params"]
        if c.arch.use_eyelids:
            eyelid = jnp.clip(
                eyelid + (-1 + 2 * jax.random.uniform(kk[0], eyelid.shape)) * 0.25,
                0.0, 1.0,
            )

        # group 3: zero expression (+noise), zero jaw, random eyelids
        noise3 = 0.2 * jax.random.uniform(kk[1], (g3.shape[0], 1)) * \
            jax.random.normal(kk[2], (g3.shape[0], D))
        expr = expr.at[g3].set(noise3)
        jaw = jaw.at[g3].set(0.0)
        if c.arch.use_eyelids:
            eyelid = eyelid.at[g3].set(
                jax.random.uniform(kk[3], (g3.shape[0], eyelid.shape[1]))
            )

        out = dict(feats)
        out["expression_params"] = expr
        out["jaw_params"] = jaw
        out["eyelid_params"] = eyelid  # unmodified when use_eyelids is off
        return jax.lax.stop_gradient(out)

    def _loss2(self, enc_params, gen_params, enc_stats, gen_stats, batch,
               enc_out, trans_verts, rng, freeze_encoder, freeze_generator):
        """Cycle path (reference smirk_trainer.py:184-332)."""
        c = self.config
        img = batch["img"]
        B, H, W, C = img.shape
        Ke = c.train.Ke
        k_aug, k_p1, k_mask, _ = jax.random.split(rng, 4)

        feats = {
            k: jnp.concatenate([jax.lax.stop_gradient(v)] * Ke, 0)
            for k, v in enc_out.items()
        }
        feats = self._augment_feats(k_aug, feats, Ke)

        # no-grad render of the augmented params (smirk_trainer.py:251-259);
        # inference=True uses the fused non-differentiable raster on TPU —
        # valid here because the cycle path detaches the render anyway
        flame2 = self.flame(feats)
        rend2 = self.renderer(flame2["vertices"], feats["cam"], inference=True)
        rendered_img_2nd = jax.lax.stop_gradient(rend2["rendered_img"])

        points1, coords = masking_lib.sample_mesh_points(
            k_p1, trans_verts, self.flame.faces, self.face_probabilities,
            self.num_mask_points, c.image_size,
            incidence=self.flame_incidence,
        )
        coords = {
            "sampled_faces_indices": jnp.concatenate(
                [coords["sampled_faces_indices"]] * Ke, 0),
            "barycentric_coords": jnp.concatenate(
                [coords["barycentric_coords"]] * Ke, 0),
        }
        points2, _ = masking_lib.sample_mesh_points(
            k_p1, rend2["transformed_vertices"], self.flame.faces,
            self.face_probabilities, self.num_mask_points, c.image_size,
            coords=coords,
        )
        img_k = jnp.concatenate([img] * Ke, 0)
        extra = masking_lib.transfer_pixels(
            img_k, jnp.concatenate([points1] * Ke, 0), points2
        )
        masked_img_2nd = masking_lib.compose_mask(
            k_mask, img_k, jnp.concatenate([batch["mask"]] * Ke, 0), extra,
            dilation_radius=c.train.mask_dilation_radius,
            rendered_mask=jax.lax.stop_gradient(rend2["rendered_mask"]),
            extra_noise=True, random_mask=0.005,
        )

        gen_in = jax.lax.stop_gradient(
            jnp.concatenate([rendered_img_2nd, masked_img_2nd], -1)
        )
        # optional rematerialization of the cycle's two heavy applies
        # (train.remat_cycle): recompute forwards in the backward pass
        remat = jax.checkpoint if c.train.remat_cycle else (lambda f: f)
        if freeze_generator:
            recon = remat(
                lambda v, x: self.generator_frozen.apply(v, x, train=False)
            )(jax.lax.stop_gradient(
                {"params": gen_params, "batch_stats": gen_stats}), gen_in)
            recon = jax.lax.stop_gradient(recon)
        else:
            recon, gen_stats = remat(
                lambda v, x: self._apply_generator(v, x, True)
            )({"params": gen_params, "batch_stats": gen_stats}, gen_in)

        if freeze_encoder:
            # frozen re-encode: gradients DO flow through it back to the
            # generator via `recon` (parity 0's dominant backward cost) —
            # encoder_frozen may run it in bf16 (arch.bf16_cycle_frozen)
            recon_feats = remat(
                lambda v, x: self.encoder_frozen.apply(v, x, train=False)
            )({"params": jax.lax.stop_gradient(enc_params),
               "batch_stats": enc_stats}, recon)
        else:
            recon_feats, enc_stats = remat(
                lambda v, x: self._apply_encoder(v, x, True)
            )({"params": enc_params, "batch_stats": enc_stats}, recon)

        cycle = landmark_mse(recon_feats["expression_params"],
                             feats["expression_params"]) \
            + 10.0 * landmark_mse(recon_feats["jaw_params"], feats["jaw_params"])
        if c.arch.use_eyelids:
            cycle = cycle + 10.0 * landmark_mse(
                recon_feats["eyelid_params"], feats["eyelid_params"]
            )
        if not freeze_generator:
            cycle = cycle + landmark_mse(
                recon_feats["shape_params"], feats["shape_params"]
            )

        total = cycle * c.train.loss_weights.cycle_loss
        aux = {
            "losses": {
                "cycle_loss": cycle,
                # monitoring only — see _loss1's raster_overflow
                "raster_overflow_2nd": jnp.max(
                    rend2["raster_overflow"]).astype(jnp.float32),
            },
            "enc_stats": enc_stats,
            "gen_stats": gen_stats,
            # cycle-path viz (reference '2nd_path' stack, smirk_trainer.py:
            # 330-332): the re-render of recon_feats happens lazily in
            # make_visualizations to keep the hot step lean
            "viz": {
                "rendered_img_2nd": rendered_img_2nd,
                "masked_img_2nd": jax.lax.stop_gradient(masked_img_2nd),
                "reconstructed_img_2nd": jax.lax.stop_gradient(recon),
                "recon_feats": jax.lax.stop_gradient(recon_feats),
            },
        }
        return total, aux

    # ------------------------------ full step ------------------------------

    @staticmethod
    def _apply_lr(updates, lr):
        """scale_by_adam emits the ascent direction; descend at lr (the
        reference's one-LR-per-iteration, indexed by state.step)."""
        return jax.tree_util.tree_map(lambda u: -lr * u, updates)

    def _phase1(self, state: TrainState, batch, rng1):
        """Path-1 grad + updates -> (mid-state fields dict, metrics, aux1)."""
        enc_params = state.encoder["params"]
        enc_stats = state.encoder["batch_stats"]
        gen_params = state.generator["params"] if state.generator else None
        gen_stats = state.generator["batch_stats"] if state.generator else None

        (loss1, aux1), grads = jax.value_and_grad(
            self._loss1, argnums=(0, 1), has_aux=True
        )(enc_params, gen_params, enc_stats, gen_stats, batch, rng1, True,
          state.base_encoder)
        enc_stats = aux1["enc_stats"]
        gen_stats = aux1["gen_stats"]

        enc_updates, enc_opt = self.enc_tx.update(
            grads[0], state.enc_opt, enc_params
        )
        enc_params = optax.apply_updates(
            enc_params, self._apply_lr(enc_updates, self.enc_lr(state.step)))
        gen_opt = state.gen_opt
        if self.generator is not None:
            gen_updates, gen_opt = self.gen_tx.update(
                grads[1], state.gen_opt, gen_params
            )
            gen_params = optax.apply_updates(
                gen_params,
                self._apply_lr(gen_updates, self.gen_lr(state.step)))

        metrics = dict(aux1["losses"])
        metrics["loss_first_path"] = loss1
        mid = dict(enc_params=enc_params, enc_stats=enc_stats,
                   gen_params=gen_params, gen_stats=gen_stats,
                   enc_opt=enc_opt, gen_opt=gen_opt)
        return mid, metrics, aux1

    def _phase2(self, mid, batch, enc_out, trans_verts, rng2, parity: int,
                step=None):
        """Cycle-path grad + updates on the phase-1-updated params. `step`
        is the iteration counter for the LR schedule (same LR as phase 1)."""
        freeze_encoder = parity % 2 == 0  # base_trainer.py:267
        freeze_generator = not freeze_encoder
        enc_params, gen_params = mid["enc_params"], mid["gen_params"]
        enc_opt, gen_opt = mid["enc_opt"], mid["gen_opt"]

        (loss2, aux2), grads2 = jax.value_and_grad(
            self._loss2, argnums=(0, 1), has_aux=True
        )(
            enc_params, gen_params, mid["enc_stats"], mid["gen_stats"],
            batch, enc_out, trans_verts, rng2,
            freeze_encoder, freeze_generator,
        )

        if not freeze_encoder:
            enc_updates, enc_opt = self.enc_tx.update(
                grads2[0], enc_opt, enc_params
            )
            enc_params = optax.apply_updates(
                enc_params, self._apply_lr(enc_updates, self.enc_lr(step)))
        if not freeze_generator:
            # generator grad clip 0.1 (smirk_trainer.py:377-379)
            g = grads2[1]
            gnorm = optax.global_norm(g)
            scale = jnp.minimum(1.0, 0.1 / jnp.maximum(gnorm, 1e-12))
            g = jax.tree_util.tree_map(lambda t: t * scale, g)
            gen_updates, gen_opt = self.gen_tx.update(g, gen_opt, gen_params)
            gen_params = optax.apply_updates(
                gen_params, self._apply_lr(gen_updates, self.gen_lr(step)))

        metrics2 = dict(aux2["losses"])
        metrics2["loss_second_path"] = loss2
        mid = dict(enc_params=enc_params, enc_stats=aux2["enc_stats"],
                   gen_params=gen_params, gen_stats=aux2["gen_stats"],
                   enc_opt=enc_opt, gen_opt=gen_opt)
        return mid, metrics2, aux2["viz"]

    def _mid_to_state(self, state: TrainState, mid, bump_step: bool):
        return state.replace(
            step=state.step + (1 if bump_step else 0),
            encoder={"params": mid["enc_params"],
                     "batch_stats": mid["enc_stats"]},
            generator=(
                {"params": mid["gen_params"], "batch_stats": mid["gen_stats"]}
                if self.generator is not None
                else None
            ),
            enc_opt=mid["enc_opt"],
            gen_opt=mid["gen_opt"],
        )

    def _cycle_enabled(self) -> bool:
        return (self.config.train.loss_weights.cycle_loss > 0
                and self.generator is not None)

    def _step_impl(self, state: TrainState, batch, rng, parity: int,
                   train: bool):
        rng1, rng2 = jax.random.split(jax.random.fold_in(rng, state.step))

        if not train:
            _, aux1 = self._loss1(
                state.encoder["params"],
                state.generator["params"] if state.generator else None,
                state.encoder["batch_stats"],
                state.generator["batch_stats"] if state.generator else None,
                batch, rng1, train=False, base_encoder=state.base_encoder,
            )
            metrics = dict(aux1["losses"])
            return state, metrics, aux1

        mid, metrics, aux1 = self._phase1(state, batch, rng1)
        if self._cycle_enabled():
            mid, metrics2, viz2 = self._phase2(
                mid, batch, aux1["encoder_output"],
                aux1["transformed_vertices"], rng2, parity,
                step=state.step,
            )
            metrics.update(metrics2)
            aux1 = dict(aux1)
            aux1["second_path"] = viz2
        return self._mid_to_state(state, mid, bump_step=True), metrics, aux1

    # Split-step mode (train.step_mode="split"): path 1 and the cycle path
    # as TWO smaller jitted programs with identical math — same rng
    # derivation (both fold in the pre-increment state.step), same update
    # order. Smaller programs compile faster on the remote Mosaic helper
    # and bound per-program device resources.
    def _split1_impl(self, state: TrainState, batch, rng, final: bool):
        rng1, _ = jax.random.split(jax.random.fold_in(rng, state.step))
        mid, metrics, aux1 = self._phase1(state, batch, rng1)
        return self._mid_to_state(state, mid, bump_step=final), metrics, aux1

    def _split2_impl(self, state: TrainState, batch, enc_out, trans_verts,
                     rng, parity: int):
        _, rng2 = jax.random.split(jax.random.fold_in(rng, state.step))
        mid = dict(enc_params=state.encoder["params"],
                   enc_stats=state.encoder["batch_stats"],
                   gen_params=state.generator["params"],
                   gen_stats=state.generator["batch_stats"],
                   enc_opt=state.enc_opt, gen_opt=state.gen_opt)
        mid, metrics2, viz2 = self._phase2(
            mid, batch, enc_out, trans_verts, rng2, parity, step=state.step
        )
        return self._mid_to_state(state, mid, bump_step=True), metrics2, viz2

    def train_step(self, state, batch, rng, parity: int):
        if self.step_mode == "split":
            cycle = self._cycle_enabled()
            state, metrics, aux1 = self._split1(
                state, batch, rng, final=not cycle)
            if cycle:
                state, metrics2, viz2 = self._split2(
                    state, batch, aux1["encoder_output"],
                    aux1["transformed_vertices"], rng, parity=parity % 2)
                metrics = {**metrics, **metrics2}
                aux1 = dict(aux1)
                aux1["second_path"] = viz2
            return state, metrics, aux1
        return self._train_step(state, batch, rng, parity=parity % 2, train=True)

    def eval_step(self, state, batch, rng):
        return self._train_step(state, batch, rng, parity=0, train=False)

    # ------------------------------ inference ------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def infer(self, encoder_vars, img):
        """image batch -> params + geometry + render (demo.py:107-114)."""
        enc_out = self.encoder.apply(encoder_vars, img, train=False)
        flame_out = self.flame(enc_out)
        rend = self.renderer(
            flame_out["vertices"], enc_out["cam"],
            {"landmarks_fan": flame_out["landmarks_fan"],
             "landmarks_mp": flame_out["landmarks_mp"]},
            inference=True,  # fused gather-free raster on TPU
        )
        return {**enc_out, **flame_out, **rend}

    def reconstruct(self, generator_vars, infer_out, img, hull, key):
        """Analysis-by-neural-synthesis reconstruction from infer() outputs
        (reference demo.py:133-182 generator branch): mesh-anchored pixel
        hints with the demo's randomized per-image budget
        (rsing/rscale/rbound), hull-masked input, fuse generator on
        [render | masked]. hull (B,H,W,1): 1 = background (reference
        create_mask polarity). Returns (masked_img, reconstructed_img).

        The SINGLE source for this math — cli/demo.py, api.Predictor
        .reconstruct, and serving.export_reconstruct all call it, so the
        budget formula / mask constants cannot de-synchronize."""
        c = self.config
        S = c.image_size
        mul = float(c.train.mask_ratio_mul)
        dilation = int(c.train.mask_dilation_radius)
        n_upper = int(float(c.train.mask_ratio) * mul * S * S)
        B = img.shape[0]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # incidence tables make the frontal-facing gate's vertex normals
        # gathers instead of scatters — omitting them cost 140 ms/batch64
        # (73% of the whole reconstruct path; PARITY round-5 bisect)
        npoints, _ = masking_lib.sample_mesh_points(
            k1, infer_out["transformed_vertices"], self.flame.faces,
            self.face_probabilities, n_upper, S,
            incidence=self.flame_incidence)
        rsing = jax.random.randint(k2, (B,), 0, 2) * 2 - 1
        rscale = jax.random.uniform(k3, (B,)) * (mul - 1) + 1
        rbound = (n_upper / mul * (rscale ** rsing)).astype(jnp.int32)
        extra = masking_lib.transfer_pixels(
            img, npoints, npoints, valid_count=rbound)
        masked = masking_lib.compose_mask(
            k4, img, hull, extra, dilation_radius=dilation,
            rendered_mask=infer_out["rendered_mask"],
            extra_noise=True, random_mask=0.01)
        recon = self.generator.apply(
            generator_vars,
            jnp.concatenate([infer_out["rendered_img"], masked], -1),
            train=False)
        return masked, recon

    # ---------------------------- visualization ----------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _viz_impl(self, state: TrainState, batch, aux):
        enc_out = aux["encoder_output"]
        B = batch["img"].shape[0]
        zero_cam = jnp.tile(jnp.asarray([[7.0, 0.0, 0.0]]), (B, 1))

        viz = {
            "rendered_img": aux["rendered_img"],
            "masked_img": aux.get("masked_img"),
            "reconstructed_img": aux.get("reconstructed_img"),
            "loss_img": aux.get("loss_img"),
            "landmarks_fan": aux.get("landmarks_fan"),
            "landmarks_mp": aux.get("landmarks_mp"),
        }
        base_out = self.encoder.apply(state.base_encoder, batch["img"],
                                      train=False)
        base_flame = self.flame(base_out)
        # inference=True everywhere in viz: no gradients flow here, and the
        # fused kernel keeps this jitted program small (bit-identical
        # output; the TPU worker has a hard resident-program budget)
        viz["rendered_img_base"] = self.renderer(
            base_flame["vertices"], base_out["cam"], inference=True
        )["rendered_img"]

        zero_flame = self.flame(enc_out, zero_expression=True, zero_pose=True)
        viz["rendered_img_zero"] = self.renderer(
            zero_flame["vertices"], zero_cam, inference=True
        )["rendered_img"]

        # MICA teacher panels (base_trainer.py:196-216): zero-pose render of
        # the MICA-predicted shape + the 112px arcface crop upsampled
        if self.mica is not None and "img_mica" in batch:
            mica_shape = self.mica.apply(
                self.mica_variables, batch["img_mica"]
            )[..., : self.config.arch.num_shape]
            mica_out = dict(enc_out)
            mica_out["shape_params"] = mica_shape
            mica_flame = self.flame(
                mica_out, zero_expression=True, zero_pose=True
            )
            viz["rendered_img_mica_zero"] = self.renderer(
                mica_flame["vertices"], zero_cam, inference=True
            )["rendered_img"]
            viz["img_mica"] = jax.image.resize(
                batch["img_mica"],
                (B, self.config.image_size, self.config.image_size, 3),
                method="bilinear",
            )

        # cycle-path quadruples (smirk_trainer.py:295-303,330-332): for each
        # sample, Ke groups of [augmented render | masked | reconstruction |
        # re-render of the re-encoded params]; the re-render happens here,
        # outside the hot step
        sp = aux.get("second_path")
        if sp is not None:
            recon_feats = sp["recon_feats"]
            flame2 = self.flame(recon_feats)
            rerender = self.renderer(
                flame2["vertices"], recon_feats["cam"], inference=True
            )["rendered_img"]
            KeB, H, W, C = rerender.shape
            Ke = KeB // B
            panels = [sp["rendered_img_2nd"], sp["masked_img_2nd"],
                      sp["reconstructed_img_2nd"], rerender]
            # (Ke*B,...) k-major -> (B, Ke, 4, H, W, C) -> (B*Ke*4, ...)
            stack = jnp.stack(
                [p.reshape(Ke, B, H, W, C).transpose(1, 0, 2, 3, 4)
                 for p in panels],
                axis=2,
            )
            viz["2nd_path"] = stack.reshape(B * Ke * 4, H, W, C)
        return viz

    def make_visualizations(self, state: TrainState, batch, aux):
        """Extra viz renders (reference create_visualizations,
        base_trainer.py:165-224): base-encoder render, zero-pose/expression
        render, MICA panels, loss heatmap, and the cycle-path '2nd_path'
        stack — one jitted program (viz runs off the hot loop cadence)."""
        # the losses dict and batch-stat trees aren't needed for viz; drop
        # them so the jit signature stays small
        aux_viz = {k: aux.get(k) for k in (
            "encoder_output", "rendered_img", "masked_img",
            "reconstructed_img", "loss_img", "landmarks_fan", "landmarks_mp",
            "second_path",
        )}
        return self._viz_impl(state, batch, aux_viz)
