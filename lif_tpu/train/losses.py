"""Losses and image metrics for differentiable rendering."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l2_loss", "l1_loss", "psnr"]


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred, target, peak=1.0):
    """Peak signal-to-noise ratio in dB (the BASELINE.json fidelity metric)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-12))
