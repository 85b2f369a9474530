"""Mesh renderer: orthographic projection + face-region cut + rasterize +
shading, the TPU-native equivalent of reference src/renderer/renderer.py.

Differences by design:
* images are NHWC in [0,1] (TPU-friendly layout); the reference is NCHW;
* the coverage mask is returned explicitly instead of being recomputed
  downstream from `rendered_img == 0` (smirk_trainer.py:79,290);
* everything is a pure function of (vertices, cam) given frozen constants, so
  the whole render sits inside one jit with the encoders.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smirk_tpu.assets import keep_vertices_and_update_faces
from smirk_tpu.render import camera as camera_lib
from smirk_tpu.render import geometry, shading
from smirk_tpu.render import rasterizer as raster_lib

Z_OFFSET = 10.0  # reference renderer.py:144: keep min z > rasterizer near


class Renderer:
    def __init__(
        self,
        bundle: Dict[str, np.ndarray],
        render_full_head: bool = False,
        image_size: int = 224,
        bin_capacity: Optional[int] = None,
        use_pallas: Optional[bool] = None,
        raster_compact: Optional[int] = None,
        bin_approx: Optional[float] = 0.95,
        diff_bin_approx: Optional[float] = 0.95,
        bin_miss_check: Optional[bool] = None,
    ):
        self.image_size = image_size
        self.use_pallas = use_pallas
        self.bin_approx = bin_approx
        # approx binning for the DIFFERENTIABLE raster too (round 3): the
        # exact top_k costs 11.7ms vs 6.0ms/batch64, and at the auto
        # capacity approx returned the complete membership (measured zero
        # misses on this mesh; tools/tpu_bin_attack.py), making values and
        # gradients bit-identical. CAVEAT: zero-miss is an empirical result
        # at this mesh/capacity, not an approx_max_k API guarantee — on
        # unusual meshes/scales set SMIRK_DIFF_BIN_EXACT=1 (or
        # diff_bin_approx=None) to restore exact top_k.
        self.diff_bin_approx = diff_bin_approx
        if os.environ.get("SMIRK_DIFF_BIN_EXACT"):
            self.diff_bin_approx = None
        # Round-4 hardening (VERDICT r3 item 1): whenever the TRAINING
        # (differentiable) path uses approx binning, selection misses are
        # folded into the raster_overflow surface BY DEFAULT (pre- vs
        # post-selection counts, rasterizer.selection_misses), so a recall
        # failure can no longer perturb values/gradients silently — it
        # shows in the `raster_overflow` train metric the trainer already
        # logs. Round 5: the fused INFERENCE path is armed by default too —
        # the check was measured FREE at batch 64 on v5e (armed 3271.3 vs
        # unarmed 3262.8 fps, i.e. noise; tools/tpu_infer_misscheck_bench
        # .py 2026-08-20), and callers that don't consume `raster_overflow`
        # pay nothing (XLA dead-code-eliminates the check), while serving
        # exports now expose the count (serving.OUTPUT_KEYS). Overrides: an
        # explicit bin_miss_check= argument or env SMIRK_BIN_MISS_CHECK=1/0
        # arms/disarms BOTH paths (empty string = unset, keep defaults).
        env = os.environ.get("SMIRK_BIN_MISS_CHECK")
        if bin_miss_check is None and env:
            bin_miss_check = env != "0"
        if bin_miss_check is None:
            self.bin_miss_check_diff = self.diff_bin_approx is not None
            self.bin_miss_check_fused = self.bin_approx is not None
        else:
            self.bin_miss_check_diff = bool(bin_miss_check)
            self.bin_miss_check_fused = bool(bin_miss_check)

        faces = np.asarray(bundle["faces"], np.int64)
        if render_full_head:
            self.kept_vertices = np.arange(int(faces.max()) + 1)
            render_faces = faces.astype(np.int32)
        else:
            # cut mesh to the FLAME 'face' region, 1787/5023 verts
            # (reference renderer.py:70-76)
            render_faces, self.kept_vertices = keep_vertices_and_update_faces(
                faces, np.asarray(bundle["face_vertex_ids"])
            )
        self.faces = jnp.asarray(render_faces, jnp.int32)
        self.num_render_verts = len(self.kept_vertices)
        self._kept = jnp.asarray(self.kept_vertices, jnp.int32)
        # static incidence tables: vertex normals as gathers, not scatters
        fidx, cidx = geometry.build_vertex_face_incidence(
            render_faces, self.num_render_verts
        )
        self._inc_face = jnp.asarray(fidx)
        self._inc_corner = jnp.asarray(cidx)

        # constant gray albedo per corner (reference renderer.py:63,80-81)
        colors = np.full((self.num_render_verts, 3), shading.GRAY_ALBEDO, np.float32)
        self.face_colors = jnp.asarray(colors[render_faces])  # (F,3,3)

        if bin_capacity is None:
            # auto: ~4x the uniform faces-per-tile average (z-priority keeps
            # the closest on overflow), capped at the full face count.
            # Floor 384 measured on the face mesh at 224px: coverage equal to
            # cap-512, mean pixel diff 3e-4, 2389 vs 2097 fps.
            F = len(render_faces)
            tiles = max(1, -(-image_size // raster_lib.TILE_ROWS)
                        * -(-image_size // raster_lib.TILE_COLS))
            need = max(384, -(-4 * F // tiles // 32) * 32)
            bin_capacity = min(-(-F // 32) * 32, need)
        self.bin_capacity = bin_capacity

        if raster_compact is None and os.environ.get("SMIRK_RASTER_COMPACT"):
            # experiment/mitigation override without config plumbing
            # (0 = padded per-tile kernels)
            raster_compact = int(os.environ["SMIRK_RASTER_COMPACT"])
        if raster_compact is None:
            # auto: compact chunk budget = 1.5 face-chunks per face + one
            # rounding chunk per tile, clamped to [96, worst case]. Occupied
            # chunks ~= (face, tile) incidence / 32 + per-tile rounding;
            # measured occupancy for the full-coverage face submesh
            # (F=3408): 144-156 chunks at 224px, 111 at 64px -> this budget
            # (216 / 168) keeps ~1.4x headroom at both scales. The
            # record-gather cost scales with the budget — measured e2e fps
            # at 224px batch 64: padded 2357, budget 336 -> 2875, 224 ->
            # 3130, 192 -> 3197 (tools/tpu_compact_validate.py +
            # tpu_compact_budget_bench.py); output/gradients are exact
            # whenever the occupied chunks fit, and overflow degrades
            # gracefully (trailing tiles drop farthest-face chunks first).
            # 0 disables (padded per-tile kernel).
            CH = raster_lib.V3_CHUNK
            ty = -(-image_size // raster_lib.TILE_ROWS)
            tx = -(-image_size // raster_lib.TILE_COLS)
            Tp = -(-(ty * tx) // 8) * 8
            worst = Tp * (self.bin_capacity // CH)
            F = int(self.faces.shape[0])
            est = -(-(F * 3) // (2 * CH)) + Tp
            raster_compact = min(worst, max(96, -(-est // 8) * 8))
        self.raster_compact = raster_compact

    def measure_compact_occupancy(self, vertices, cam) -> dict:
        """Measured occupied-chunk count vs the compact budget for a given
        scene — the self-revalidation hook for the auto-budget headroom
        claim (~1.4x, tuned on synthetic deformations; VERDICT r2 item 8).
        Runs on any backend (pure jnp binning). Returns per-image max
        occupancy, the budget, and headroom = budget / occupancy."""
        tv = self.project(vertices, cam)
        sub_tv = tv[:, self._kept]
        sub_tv = jnp.concatenate(
            [sub_tv[..., :2], sub_tv[..., 2:] + Z_OFFSET], axis=-1
        )
        face_verts = geometry.face_vertices(sub_tv, self.faces)
        _, counts = raster_lib.bin_faces(
            face_verts, self.image_size, self.bin_capacity
        )
        CH = raster_lib.V3_CHUNK
        occupied = int(np.asarray(-(-counts // CH)).sum(axis=1).max())
        budget = int(self.raster_compact) if self.raster_compact else 0
        return {
            "occupied_chunks": occupied,
            "budget": budget,
            "headroom": (budget / occupied) if occupied else float("inf"),
        }

    def project(self, vertices: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
        """Full-mesh NDC vertices (y/z flipped), reference renderer.py:101-102."""
        return camera_lib.orth_proj_ndc(vertices, cam)

    def __call__(
        self,
        vertices: jnp.ndarray,  # (B,V,3) FLAME world-space vertices
        cam: jnp.ndarray,  # (B,3) [scale, tx, ty]
        landmarks: Optional[Dict[str, jnp.ndarray]] = None,
        inference: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        out = {}
        transformed_vertices = self.project(vertices, cam)
        out["transformed_vertices"] = transformed_vertices
        if landmarks:
            for key, lmk in landmarks.items():
                out[key] = camera_lib.project_landmarks(lmk, cam)

        use_fused = inference and (
            self.use_pallas
            if self.use_pallas is not None
            else jax.default_backend() not in ("cpu",)
        )
        render_fn = self.render_inference if use_fused else self.render
        rendered, mask, pix_to_face, overflow = render_fn(
            vertices, transformed_vertices
        )
        out["rendered_img"] = rendered
        out["rendered_mask"] = mask
        out["pix_to_face"] = pix_to_face
        # (B,) int32 count of compact-raster chunks dropped past the budget
        # (+ approx-binning selection misses; armed by default on the
        # differentiable path, see __init__).
        # 0 = bit-exact render; > 0 = trailing tiles rendered EMPTY (and,
        # on the training path, carry zero gradients). Training logs the
        # batch max as `raster_overflow`; watch it on atypical face scales.
        out["raster_overflow"] = overflow
        return out

    def render(self, vertices: jnp.ndarray, transformed_vertices: jnp.ndarray):
        """vertices + NDC vertices -> (shaded image (B,H,W,3), mask, p2f,
        overflow (B,) int32 — dropped compact chunks, 0 = exact).

        Mirrors reference Renderer.render (renderer.py:121-168): cut to face
        region, z+10, vertex normals as interpolated attributes, 5-light
        directional shading on gray albedo.
        """
        sub_v = vertices[:, self._kept]
        sub_tv = transformed_vertices[:, self._kept]
        sub_tv = jnp.concatenate(
            [sub_tv[..., :2], sub_tv[..., 2:] + Z_OFFSET], axis=-1
        )

        normals = geometry.vertex_normals_gather(
            sub_v, self.faces, self._inc_face, self._inc_corner
        )  # (B,Vf,3)
        face_normals = geometry.face_vertices(normals, self.faces)  # (B,F,3,3)

        face_verts = geometry.face_vertices(sub_tv, self.faces)  # (B,F,3,3)
        # albedo is a constant gray (renderer.py:63), so only the normal
        # attribute needs per-pixel interpolation — halves the gather traffic
        pixel_vals, mask, pix_to_face, overflow = raster_lib.rasterize(
            face_verts,
            face_normals,
            self.image_size,
            capacity=self.bin_capacity,
            use_pallas=self.use_pallas,
            compact=self.raster_compact or None,
            bin_approx=self.diff_bin_approx,
            bin_miss_check=self.bin_miss_check_diff,
        )
        shade = shading.directional_shading(pixel_vals)
        return shading.GRAY_ALBEDO * shade * mask, mask, pix_to_face, overflow

    def render_inference(self, vertices, transformed_vertices):
        """Gather-free inference render via the fused Pallas kernel
        (coverage + normal-plane evaluation in one pass). Non-differentiable;
        numerically equivalent to `render` up to fp ordering. Inputs are
        stop-gradiented so the kernel can sit inside a differentiated
        program (e.g. the pretrain step's viz-only render) — without this,
        linearization fails on the vjp-less pallas_call even when nothing
        consumes the render's gradient."""
        vertices = jax.lax.stop_gradient(vertices)
        transformed_vertices = jax.lax.stop_gradient(transformed_vertices)
        sub_v = vertices[:, self._kept]
        sub_tv = jnp.concatenate(
            [transformed_vertices[:, self._kept][..., :2],
             transformed_vertices[:, self._kept][..., 2:] + Z_OFFSET], axis=-1
        )
        normals = geometry.vertex_normals_gather(
            sub_v, self.faces, self._inc_face, self._inc_corner
        )
        face_normals = geometry.face_vertices(normals, self.faces)
        face_verts = geometry.face_vertices(sub_tv, self.faces)
        normal_img, pix_to_face, _, overflow = raster_lib.rasterize_normals_fused(
            face_verts, face_normals, self.image_size,
            capacity=self.bin_capacity,
            interpret=raster_lib.default_interpret(),
            compact=self.raster_compact or None,
            return_overflow=True,
            # approximate top-k binning, TPU-native; measured bit-identical
            # output at 16.2 -> 15.2 ms/batch64 (tools/tpu_approx_bin_bench
            # .py). The differentiable raster defaults to approx too since
            # round 3 (diff_bin_approx above; SMIRK_DIFF_BIN_EXACT
            # restores exact top_k).
            bin_approx=self.bin_approx,
            bin_miss_check=self.bin_miss_check_fused,
        )
        mask = (pix_to_face >= 0)[..., None].astype(normal_img.dtype)
        shade = shading.directional_shading(normal_img)
        return shading.GRAY_ALBEDO * shade * mask, mask, pix_to_face, overflow
