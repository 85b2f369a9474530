"""Checkpointing: full-train-state save/restore + model-only export.

Improves on the reference (base_trainer.py:226-254: encoder/generator
state_dict only, optimizer state dropped) by checkpointing the FULL
TrainState {params, batch_stats, optimizer moments, step} for exact resume —
the reference's restart-based recovery loses Adam state.

Two backends, routed by path: `*.npz` -> single-file numpy (exact,
single-host, zero deps); anything else -> an orbax checkpoint directory
(async save off the training thread, multi-host-safe: orbax coordinates
across jax processes and handles sharded arrays). `finalize()` blocks on
pending async saves — call it before process exit.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        key = "/".join(
            str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k))
            for k in keypath
        )
        out[key] = np.asarray(leaf)
    return out


_async_checkpointer = None


def _orbax():
    """Lazy module-level AsyncCheckpointer (one background thread pool)."""
    global _async_checkpointer
    import orbax.checkpoint as ocp

    if _async_checkpointer is None:
        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler()
        )
    return _async_checkpointer


def save_state_orbax(state, path: str) -> None:
    """Async orbax save to a checkpoint directory (multi-host-safe: every
    jax process must call this; orbax coordinates the commit)."""
    import orbax.checkpoint as ocp

    ckptr = _orbax()
    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(state),
               force=True)


def restore_state_orbax(state_template, path: str):
    import orbax.checkpoint as ocp

    ckptr = _orbax()
    ckptr.wait_until_finished()
    return ckptr.restore(
        os.path.abspath(path), args=ocp.args.StandardRestore(state_template)
    )


def finalize() -> None:
    """Block until pending async orbax saves are committed."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def save_state(state, path: str) -> None:
    """Save a TrainState (or any pytree): `*.npz` -> single-file numpy
    (atomic), else an orbax checkpoint directory (async)."""
    if not path.endswith(".npz"):
        save_state_orbax(state, path)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(state))
    os.replace(tmp, path)


def restore_state(state_template, path: str):
    """Restore into the structure of `state_template` (shapes must match)."""
    if not path.endswith(".npz"):
        return restore_state_orbax(state_template, path)
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(state_template)
    treedef = jax.tree_util.tree_structure(state_template)
    leaves = []
    for keypath, template in flat[0]:
        key = "/".join(
            str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k))
            for k in keypath
        )
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        if arr.shape != np.shape(template):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"template {np.shape(template)}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _metadata_has_top_level_key(meta: dict, key: str) -> bool:
    """True iff an orbax _METADATA tree has a leaf whose keypath STARTS at
    `key` (first key_metadata entry) — i.e. `key` is a top-level subtree."""
    for leaf in meta.get("tree_metadata", {}).values():
        km = leaf.get("key_metadata") or []
        if km and km[0].get("key") == key:
            return True
    return False


def save_model(state, path: str) -> None:
    """Model-only export (encoder+generator variables), the equivalent of
    the reference's filtered state_dict save (base_trainer.py:226-233)."""
    payload = {"encoder": state.encoder}
    if state.generator is not None:
        payload["generator"] = state.generator
    save_state(payload, path)


def load_model(state, path: str):
    """Load a model-only export back into a TrainState. A checkpoint with a
    generator loads fine into a generator-less state (the extra subtree is
    ignored, matching the reference's strict=False load semantics)."""
    if path.endswith(".npz"):
        data = np.load(path)
        disk_gen = any(k.startswith("generator/") for k in data.files)
    else:  # orbax directory: the pytree structure lives in _METADATA
        meta = os.path.join(os.path.abspath(path), "_METADATA")
        with open(meta) as f:
            tree = json.load(f)
        # the metadata is a nested dict mirroring the saved pytree; the
        # generator must be a TOP-LEVEL key (a parameter merely named
        # '*generator*' inside the encoder tree must not flip this)
        disk_gen = _metadata_has_top_level_key(tree, "generator")
    want_gen = disk_gen and state.generator is not None
    if disk_gen and not want_gen and not path.endswith(".npz"):
        # orbax StandardRestore requires a structurally-matching template;
        # restore the saved tree as-is and keep only the encoder
        ckptr = _orbax()
        ckptr.wait_until_finished()
        raw = ckptr.restore(os.path.abspath(path))
        return state.replace(encoder=raw["encoder"])
    template = {"encoder": state.encoder}
    if want_gen:
        template["generator"] = state.generator
    restored = restore_state(template, path)
    return state.replace(
        encoder=restored["encoder"],
        generator=restored.get("generator", state.generator),
    )
