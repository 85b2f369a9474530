"""Serving export: the flagship inference step as a portable AOT artifact.

Packages `image batch -> {params, vertices, landmarks, rendered image}`
(the demo.py:107-114 pipeline) as a serialized `jax.export` StableHLO
artifact with the weights baked in as constants. The artifact is
self-contained: a serving host deserializes and calls it without the
framework's Python model code, and (for platforms=("tpu",)) without
retracing/recompiling Python at startup.

The reference has no serving story (torch checkpoints + the demo scripts);
this is the production-deployment counterpart for the TPU framework.

Shapes are static (the Pallas raster requires static grids): export one
artifact per serving batch size, or a small set (1, 8, 32) and bucket
requests host-side.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

ARTIFACT_SUFFIX = ".stablehlo"
META_SUFFIX = ".json"

OUTPUT_KEYS = (
    "pose_params", "cam", "shape_params", "expression_params",
    "eyelid_params", "jaw_params", "vertices", "landmarks_fan",
    "landmarks_mp", "rendered_img", "rendered_mask",
)


def make_inference_fn(system, encoder_vars) -> Callable:
    """Pure image->outputs closure over frozen weights (demo.py pipeline)."""

    def forward(img):
        enc_out = system.encoder.apply(encoder_vars, img, train=False)
        flame_out = system.flame(enc_out)
        rend = system.renderer(
            flame_out["vertices"], enc_out["cam"],
            {"landmarks_fan": flame_out["landmarks_fan"],
             "landmarks_mp": flame_out["landmarks_mp"]},
            inference=True,
        )
        out = {**enc_out, **flame_out, **rend}
        return {k: out[k] for k in OUTPUT_KEYS if k in out}

    return forward


def export_inference(
    system,
    encoder_vars,
    path: str,
    batch_size: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the inference step to `path` (+ sidecar metadata json).

    platforms: lowering targets, e.g. ("tpu",) to cross-lower a TPU
    artifact from a CPU host; None = the current backend.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from smirk_tpu.render import rasterizer as raster_lib

    size = system.config.image_size
    fn = make_inference_fn(system, encoder_vars)
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32)
    # cross-lowering for an accelerator target from a CPU host must emit the
    # real Mosaic kernels, not the interpret-mode lax graph
    force_compiled = bool(platforms) and any(
        p not in ("cpu",) for p in platforms
    )
    if force_compiled:
        raster_lib.set_interpret_override(False)
    try:
        exp = jax_export.export(
            jax.jit(fn), platforms=tuple(platforms) if platforms else None
        )(spec)
    finally:
        if force_compiled:
            raster_lib.set_interpret_override(None)
    blob = exp.serialize()

    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(blob))
    meta = {
        "input": {"shape": [batch_size, size, size, 3], "dtype": "float32",
                  "layout": "NHWC", "range": "[0, 1] RGB"},
        "outputs": list(OUTPUT_KEYS),
        "platforms": list(exp.platforms),
        "bytes": len(blob),
    }
    with open(path + META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return path


def export_inference_sharded(
    system,
    encoder_vars,
    path: str,
    batch_size: int = 64,
    n_devices: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Mesh-aware export: the batch is sharded over a 1-D `data` mesh of
    `n_devices`, weights replicated, so one artifact serves batches larger
    than the per-chip limit (ROADMAP "multi-chip serving"). The artifact
    records the device count; `load_inference` rebuilds the mesh from the
    serving host's local devices and shards the input automatically.

    XLA inserts no collectives here (inference is batch-parallel end to
    end), so the lowered module is the single-chip program replicated —
    scaling is linear over ICI-attached chips.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from smirk_tpu.render import rasterizer as raster_lib

    devs = jax.devices()
    if len(devs) < n_devices:
        raise ValueError(
            f"export needs {n_devices} devices visible, have {len(devs)} "
            "(on a CPU host set --xla_force_host_platform_device_count)"
        )
    if batch_size % n_devices:
        raise ValueError("batch_size must divide evenly across devices")
    mesh = Mesh(np.asarray(devs[:n_devices]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    size = system.config.image_size
    fn = make_inference_fn(system, encoder_vars)
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32)
    force_compiled = bool(platforms) and any(
        p not in ("cpu",) for p in platforms
    )
    if force_compiled:
        raster_lib.set_interpret_override(False)
    try:
        exp = jax_export.export(
            jax.jit(fn, in_shardings=shard, out_shardings=shard),
            platforms=tuple(platforms) if platforms else None,
        )(spec)
    finally:
        if force_compiled:
            raster_lib.set_interpret_override(None)
    blob = exp.serialize()

    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(blob))
    meta = {
        "input": {"shape": [batch_size, size, size, 3], "dtype": "float32",
                  "layout": "NHWC", "range": "[0, 1] RGB"},
        "outputs": list(OUTPUT_KEYS),
        "platforms": list(exp.platforms),
        "nr_devices": exp.nr_devices,
        "mesh": {"axes": ["data"], "shape": [n_devices]},
        "bytes": len(blob),
    }
    with open(path + META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_inference(path: str) -> Callable[[np.ndarray], Dict[str, np.ndarray]]:
    """Deserialize an exported artifact into a callable (no model code).

    Single-device artifacts call directly; sharded artifacts rebuild a 1-D
    mesh from the first `nr_devices` local devices and shard the input
    batch before calling.
    """
    import jax
    from jax import export as jax_export
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if not path.endswith(ARTIFACT_SUFFIX):
        path = path + ARTIFACT_SUFFIX
    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    if exp.nr_devices == 1:
        return exp.call

    devs = jax.devices()
    if len(devs) < exp.nr_devices:
        raise ValueError(
            f"artifact was exported for {exp.nr_devices} devices; "
            f"host has {len(devs)}"
        )
    mesh = Mesh(np.asarray(devs[: exp.nr_devices]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    def call(img):
        return exp.call(jax.device_put(img, shard))

    return call
