"""Pure loss functions for the SMIRK training paths."""
from __future__ import annotations

import jax.numpy as jnp


def masked_landmark_mse(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray):
    """MSE over the first-17 FAN contour points of samples with valid labels.

    Reference: smirk_trainer.py:57-58 — F.mse_loss over `[valid, :17]`, 0 when
    no sample is valid. `valid` (B,) bool; static shapes via masked mean.
    """
    err = (pred[:, :17] - gt[:, :17]) ** 2  # (B,17,C)
    per_sample = err.mean(axis=(1, 2))
    v = valid.astype(pred.dtype)
    denom = v.sum()
    return jnp.where(denom > 0, (per_sample * v).sum() / jnp.maximum(denom, 1), 0.0)


def landmark_mse(pred: jnp.ndarray, gt: jnp.ndarray):
    """Plain MSE (reference smirk_trainer.py:60)."""
    return jnp.mean((pred - gt) ** 2)


def param_regularization(pred: jnp.ndarray, base: jnp.ndarray):
    """Mean squared deviation from a base prediction (or zeros).

    Reference: smirk_trainer.py:70-72.
    """
    return jnp.mean((pred - base) ** 2)
