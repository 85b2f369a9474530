"""Torch-checkpoint importer: SMIRK `.pt` state dicts -> flax variable trees.

Needed for the parity gate against the reference's released checkpoint
(`SMIRK_em1.pt`, keys `smirk_encoder.*` / `smirk_generator.*`, saved by
reference base_trainer.py:226-233). Works on plain tensor dicts, so torch is
only needed to *load* the pickle (numpy dicts work too).

Layout conversions (torch -> flax):
  conv weight        OIHW -> HWIO
  depthwise conv     (C,1,kh,kw) -> (kh,kw,1,C)       (same transpose)
  conv transpose     (I,O,kh,kw) -> flip(kh,kw) + transpose -> (kh,kw,I,O)
  linear weight      (O,I) -> (I,O)
  batchnorm          weight/bias -> params.scale/bias;
                     running_mean/var -> batch_stats.mean/var
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def convert_conv_transpose(w) -> np.ndarray:
    # torch (in, out, kh, kw); flax ConvTranspose (lax.conv_transpose,
    # transpose_kernel=False) expects the forward-conv-oriented kernel
    # (kh, kw, in, out) *spatially flipped* relative to torch's.
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def convert_linear(w) -> np.ndarray:
    return _np(w).T.copy()


# generator block name shorthands used in the reference OrderedDicts
# (smirk_generator.py:88-119: "enc1conv1" etc.)
_GEN_SHORT = {
    "encoder1": "enc1", "encoder2": "enc2", "encoder3": "enc3",
    "encoder4": "enc4", "decoder1": "dec1", "decoder2": "dec2",
    "decoder3": "dec3", "decoder4": "dec4", "bottleneck": "bottleneck",
}
# ResnetBlock conv_block Sequential indices (pad,conv,norm,relu,pad,conv,norm)
_RES_IDX = {"conv1": 1, "norm1": 2, "conv2": 5, "norm2": 6}

_LEAF_TO_TORCH = {
    "kernel": "weight", "scale": "weight", "bias": "bias",
    "mean": "running_mean", "var": "running_var",
    "weight": "weight",  # PReLU slope param
}

_TRAILING_IDX = re.compile(r"_(\d+)(?=_|$)")


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Map a flax variable path (collection stripped) to the torch key."""
    *mods, leaf = path
    mods = list(mods)

    # generator translations
    if mods and mods[0] in _GEN_SHORT and len(mods) > 1:
        short = _GEN_SHORT[mods[0]]
        return f"{mods[0]}.{short}{mods[1]}.{_LEAF_TO_TORCH[leaf]}"
    m = re.fullmatch(r"resnet_blocks_(\d+)", mods[0]) if mods else None
    if m:
        return (
            f"resnet_blocks.{m.group(1)}.conv_block."
            f"{_RES_IDX[mods[1]]}.{_LEAF_TO_TORCH[leaf]}"
        )

    # generic: any trailing _<digits> segments become torch list indices
    # (blocks_0_1 -> blocks.0.1, layer1_0 -> layer1.0, downsample_0 ->
    # downsample.0, network_2 -> network.2, features_14 -> features.14)
    out = [_TRAILING_IDX.sub(r".\1", m_) for m_ in mods]
    return ".".join(out + [_LEAF_TO_TORCH[leaf]])


def import_state_dict(
    state_dict: Mapping[str, Any],
    flax_variables: Dict[str, Any],
    prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax variable tree (params + batch_stats template, e.g. from
    `module.init`) with tensors from a torch state dict.

    `prefix` is prepended to translated keys (e.g. "smirk_encoder.").
    Returns a new variable tree of numpy arrays.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    treedef = jax.tree_util.tree_structure(flax_variables)

    leaves = []
    missing = []
    for keypath, template in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        collection, *modpath = path
        tkey = prefix + flax_path_to_torch_key(tuple(modpath))
        if tkey not in state_dict:
            if strict:
                missing.append(tkey)
            leaves.append(template)
            continue
        t = state_dict[tkey]
        leafname = modpath[-1]
        is_transpose_conv = modpath[-2].startswith("upconv") if len(modpath) > 1 else False
        if leafname == "kernel" and _np(t).ndim == 4:
            w = convert_conv_transpose(t) if is_transpose_conv else convert_conv(t)
        elif leafname == "kernel" and _np(t).ndim == 2:
            w = convert_linear(t)
        else:
            w = _np(t)
        if w.shape != template.shape:
            raise ValueError(
                f"shape mismatch for {tkey}: torch {w.shape} vs flax "
                f"{template.shape} at {'/'.join(path)}"
            )
        leaves.append(w.astype(np.asarray(template).dtype))
    if missing:
        raise KeyError(f"missing torch keys (first 10): {missing[:10]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def split_smirk_checkpoint(state_dict: Mapping[str, Any]):
    """Split a joint SMIRK checkpoint into encoder / generator sub-dicts
    (keys 'smirk_encoder.*', 'smirk_generator.*'; base_trainer.py:242-254)."""
    enc = {
        k[len("smirk_encoder."):]: v
        for k, v in state_dict.items()
        if k.startswith("smirk_encoder.")
    }
    gen = {
        k[len("smirk_generator."):]: v
        for k, v in state_dict.items()
        if k.startswith("smirk_generator.")
    }
    return enc, gen


def export_state_dict(flax_variables, prefix: str = "") -> Dict[str, Any]:
    """Inverse of import_state_dict: flax variables -> torch-named tensor
    dict (numpy). Lets models trained here be consumed by the reference's
    PyTorch loaders (base_trainer.py:242-254)."""
    import jax

    out: Dict[str, Any] = {}
    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        collection, *modpath = path
        tkey = prefix + flax_path_to_torch_key(tuple(modpath))
        leafname = modpath[-1]
        arr = np.asarray(leaf)
        is_transpose_conv = (
            modpath[-2].startswith("upconv") if len(modpath) > 1 else False
        )
        if leafname == "kernel" and arr.ndim == 4:
            if is_transpose_conv:
                arr = arr.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1].copy()
            else:
                arr = arr.transpose(3, 2, 0, 1).copy()
        elif leafname == "kernel" and arr.ndim == 2:
            arr = arr.T.copy()
        if tkey in out:
            raise ValueError(f"duplicate torch key {tkey}")
        out[tkey] = arr
    return out


def add_bn_trackers(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Add the `num_batches_tracked` buffers torch BatchNorm state dicts
    carry (flax has no equivalent), so an exported dict loads with
    strict=True into reference-style torch modules. Zeros are correct:
    the buffer only drives momentum=None cumulative averaging, which the
    reference never uses."""
    out = dict(state_dict)
    for k in list(state_dict):
        if k.endswith(".running_var"):
            out[k[: -len("running_var")] + "num_batches_tracked"] = np.asarray(
                0, np.int64
            )
    return out


def load_raw_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch .pt/.tar pickle (CPU) or an .npz into a flat tensor
    dict. Unwraps the common {'state_dict': ...} nesting."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def init_backbones_from_state_dicts(
    encoder_variables: Dict[str, Any],
    small_sd: Mapping[str, Any] = None,
    large_sd: Mapping[str, Any] = None,
) -> Dict[str, Any]:
    """ImageNet-pretrained backbone init (reference smirk_encoder.py:7-12
    builds the timm backbones with pretrained=True): map raw timm
    tf_mobilenetv3 state dicts (keys conv_stem./bn1./blocks.i.j...) onto
    the three encoders' feature extractors. Heads keep their init; extra
    timm keys (conv_head, classifier) are ignored."""
    sd: Dict[str, Any] = {}

    def add(enc: str, d: Mapping[str, Any]):
        sd.update({f"{enc}.encoder.{k}": _np(v) for k, v in d.items()})

    if small_sd is not None:
        add("pose_encoder", small_sd)
    if large_sd is not None:
        add("shape_encoder", large_sd)
        add("expression_encoder", large_sd)
    return import_state_dict(sd, encoder_variables, prefix="", strict=False)
