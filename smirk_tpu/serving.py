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
    # (B,) int32: compact-raster chunks dropped past budget + approx-binning
    # selection misses (armed by default round 5, measured free — renderer
    # __init__ notes). 0 = bit-exact render; serving clients get the guard
    # the training metric stream already had.
    "raster_overflow",
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


def make_reconstruct_fn(system, encoder_vars, generator_vars) -> Callable:
    """Pure (img, hull, key)->outputs closure: the analysis-by-neural-
    synthesis reconstruction (reference demo.py:133-182 generator branch).
    The budget/mask math is SmirkSystem.reconstruct — the same code the
    Predictor API and cli/demo.py run, so artifacts cannot de-synchronize
    from the in-process paths. `hull` is the convex-hull background mask
    (B,H,W,1), 1 = background (computed host-side from landmarks,
    data/transforms.convex_hull_mask); `key` is a raw uint32 (2,) PRNG
    key driving the randomized point budget."""

    def forward(img, hull, key):
        out = system.infer(encoder_vars, img)
        masked, recon = system.reconstruct(
            generator_vars, out, img, hull, key)
        keep = {k: out[k] for k in OUTPUT_KEYS if k in out}
        return {**keep, "masked_img": masked, "reconstructed_img": recon}

    return forward


def _export_artifact(system, jit_fn, batch_size: int, path: str,
                     platforms: Optional[Sequence[str]],
                     extra_meta: Optional[dict] = None,
                     extra_specs: Sequence = (),
                     outputs: Sequence[str] = OUTPUT_KEYS) -> str:
    """Shared export tail: lower `jit_fn` on the (batch,H,W,3) input spec
    (plus `extra_specs`), serialize, and write artifact + sidecar
    metadata. Cross-lowering for an accelerator target from a CPU host
    must emit the real Mosaic kernels, not the interpret-mode lax graph —
    hence the interpret override guard."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from smirk_tpu.render import rasterizer as raster_lib

    size = system.config.image_size
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32)
    force_compiled = bool(platforms) and any(
        p not in ("cpu",) for p in platforms
    )
    if force_compiled:
        raster_lib.set_interpret_override(False)
    try:
        exp = jax_export.export(
            jit_fn, platforms=tuple(platforms) if platforms else None
        )(spec, *extra_specs)
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
        "outputs": list(outputs),
        "platforms": list(exp.platforms),
        **(extra_meta or {}),
        "bytes": len(blob),
    }
    with open(path + META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return path


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

    fn = make_inference_fn(system, encoder_vars)
    return _export_artifact(system, jax.jit(fn), batch_size, path, platforms)


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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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

    fn = make_inference_fn(system, encoder_vars)
    return _export_artifact(
        system, jax.jit(fn, in_shardings=shard, out_shardings=shard),
        batch_size, path, platforms,
        extra_meta={"nr_devices": n_devices,
                    "mesh": {"axes": ["data"], "shape": [n_devices]}},
    )


def export_reconstruct(
    system,
    encoder_vars,
    generator_vars,
    path: str,
    batch_size: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the full analysis-by-neural-synthesis reconstruction
    (encode -> render -> mesh-anchored hints -> hull mask -> fuse
    generator) as a serving artifact. Inputs: img (B,H,W,3) f32 [0,1],
    hull (B,H,W,1) f32 background mask (1 = background), key uint32 (2,)
    PRNG key for the randomized point budget."""
    import jax
    import jax.numpy as jnp

    size = system.config.image_size
    fn = make_reconstruct_fn(system, encoder_vars, generator_vars)
    extra_specs = (
        jax.ShapeDtypeStruct((batch_size, size, size, 1), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return _export_artifact(
        system, jax.jit(fn), batch_size, path, platforms,
        extra_meta={
            "kind": "reconstruct",
            "extra_inputs": [
                {"name": "hull", "shape": [batch_size, size, size, 1],
                 "dtype": "float32", "note": "1 = background"},
                {"name": "key", "shape": [2], "dtype": "uint32"},
            ],
        },
        extra_specs=extra_specs,
        outputs=tuple(OUTPUT_KEYS) + ("masked_img", "reconstructed_img"),
    )


class InferenceServer:
    """Request-level wrapper over a loaded artifact: accepts any batch size
    by chunking to the exported batch (padding the tail with zeros and
    trimming the outputs), the usual bucketing strategy for static-shape
    accelerators. Thread-safe for the stdlib ThreadingHTTPServer: jax
    dispatch is internally synchronized."""

    def __init__(self, artifact_path: str):
        if not artifact_path.endswith(ARTIFACT_SUFFIX):
            artifact_path = artifact_path + ARTIFACT_SUFFIX
        self.call = load_inference(artifact_path)
        with open(artifact_path + META_SUFFIX) as f:
            self.meta = json.load(f)
        self.batch = int(self.meta["input"]["shape"][0])
        self.input_shape = tuple(self.meta["input"]["shape"][1:])
        self.kind = self.meta.get("kind", "inference")

    def predict(self, img: np.ndarray,
                hull: Optional[np.ndarray] = None,
                seed: int = 0) -> Dict[str, np.ndarray]:
        """Run the artifact over any batch size (chunk + pad + trim).

        Reconstruct artifacts additionally need `hull` (N,H,W,1) background
        masks (1 = background) and take a point-budget `seed`; each chunk
        folds its index into the seed so identical chunk contents draw
        distinct budgets.
        """
        img = np.asarray(img, np.float32)
        if img.shape[1:] != self.input_shape:
            raise ValueError(
                f"input shape {img.shape[1:]} != exported {self.input_shape}"
            )
        n = img.shape[0]
        if n == 0:
            raise ValueError("empty batch: need at least one image")
        if self.kind == "reconstruct":
            if hull is None:
                raise ValueError(
                    "reconstruct artifact needs `hull` (N,H,W,1) background "
                    "masks (1 = background; data/transforms.convex_hull_mask)")
            hull = np.asarray(hull, np.float32)
            if hull.shape != img.shape[:3] + (1,):
                raise ValueError(
                    f"hull shape {hull.shape} != {img.shape[:3] + (1,)}")
        chunks = []
        for ci, lo in enumerate(range(0, n, self.batch)):
            part = img[lo: lo + self.batch]
            pad = self.batch - part.shape[0]
            if pad:
                part = np.concatenate(
                    [part, np.zeros((pad,) + self.input_shape, np.float32)]
                )
            if self.kind == "reconstruct":
                hpart = hull[lo: lo + self.batch]
                if pad:
                    hpart = np.concatenate(
                        [hpart, np.ones((pad,) + hpart.shape[1:],
                                        np.float32)])
                # mask to 64 bits first (PRNGKey semantics): negative or
                # oversized seeds would overflow the uint32 construction
                s = (int(seed) + ci) & 0xFFFFFFFFFFFFFFFF
                key = np.asarray([s >> 32, s & 0xFFFFFFFF], np.uint32)
                out = self.call(part, hpart, key)
            else:
                out = self.call(part)
            chunks.append({k: np.asarray(v) for k, v in out.items()})
        return {
            k: np.concatenate([c[k] for c in chunks])[:n]
            for k in chunks[0]
        }


def create_http_server(artifact_path: str, host: str = "0.0.0.0",
                       port: int = 8000):
    """Production serving daemon over the stdlib http server.

    Protocol:
      GET  /healthz  -> 200 "ok" (readiness probe)
      GET  /meta     -> the artifact's sidecar metadata json
      POST /predict  -> body: npz with key "img" (N,H,W,3) float32 in [0,1]
                        (+ "hull" (N,H,W,1) and optional scalar "seed" for
                        reconstruct artifacts);
                        response: npz of the artifact's output arrays

    Returns the ThreadingHTTPServer (caller runs serve_forever())."""
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    server_obj = InferenceServer(artifact_path)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code, body: bytes, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/meta":
                self._send(200, json.dumps(server_obj.meta).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(n)))
                out = server_obj.predict(
                    data["img"],
                    hull=data["hull"] if "hull" in data else None,
                    seed=int(data["seed"]) if "seed" in data else 0)
                buf = io.BytesIO()
                np.savez(buf, **out)
                self._send(200, buf.getvalue())
            except Exception as e:  # noqa: BLE001 — report, don't kill serving
                self._send(400, str(e).encode(), "text/plain")

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.inference = server_obj
    return srv


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
    repl = NamedSharding(mesh, P())

    def call(img, *rest):
        # image-like operands (rank 4, batch-leading: img, hull) shard
        # over the mesh; small operands (PRNG keys) replicate. Rank, not
        # shape[0], decides: a (2,) key would collide with batch_size=2.
        batch = np.asarray(img).shape[0]
        placed = [
            jax.device_put(
                a, shard
                if (np.asarray(a).ndim == 4
                    and np.asarray(a).shape[0] == batch)
                else repl)
            for a in rest
        ]
        return exp.call(jax.device_put(img, shard), *placed)

    return call
