"""Shared compositing epilogue: background blend + gamma.

The reference applies the same final stage in every mode — blend the
premultiplied composite over the (premultiplied) background color, then
linear->sRGB (rayCastMonoLDI.glsl:361-369). Every renderer epilogue and
the cross-chip fusion merge call this one implementation so a blend
convention change lands exactly once.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import linear_to_srgb

__all__ = ["finish_over_background"]


def finish_over_background(rgb_premult, alpha, background, to_srgb: bool):
    """(…, 3) premultiplied rgb + (…,) alpha over a (4,) background.
    Returns (…, 4)."""
    bg = jnp.asarray(background, jnp.float32)
    out_rgb = bg[:3] * bg[3] * (1.0 - alpha[..., None]) + rgb_premult
    out_a = bg[3] + alpha * (1.0 - bg[3])
    if to_srgb:
        out_rgb = linear_to_srgb(out_rgb)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
