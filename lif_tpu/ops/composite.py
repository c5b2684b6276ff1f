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

__all__ = ["finish_over_background", "smoothstep", "edge_alpha"]


def smoothstep(e0, e1, x):
    """GLSL smoothstep (reference: rayCastMonoLDI.glsl:49-53 taper)."""
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def edge_alpha(found, u1, v1, feathering, mask_alpha, mask_mode):
    """Hit validity + composite alpha at a solved source position — the
    shared tail of every fast-tier finalize (march/scaled/target/rotated
    twins of the reference's taper x mask: rayCastMonoLDI.glsl:49-53,
    :275, :284-291; stereo hard discard rayCastStereoLDI.glsl:304-305).

    found: (… ) 0/1 march hit; u1/v1 normalized source coords of the
    solved position; mask_alpha the sampled mask channel. Returns
    (hit, alpha)."""
    inside = (
        (u1 > 0.0) & (u1 < 1.0) & (v1 > 0.0) & (v1 < 1.0)
    ).astype(jnp.float32)
    f = jnp.maximum(feathering, 1e-6)
    tap = (
        smoothstep(0.0, f, u1) * (1.0 - smoothstep(1.0 - f, 1.0, u1))
        * smoothstep(0.0, f, v1) * (1.0 - smoothstep(1.0 - f, 1.0, v1))
    )
    hit = found * inside
    alpha = hit * tap
    if mask_mode == "multiply":
        alpha = alpha * jnp.clip(mask_alpha, 0.0, 1.0)
    elif mask_mode == "hard":
        keep = (mask_alpha >= 0.5).astype(jnp.float32)
        alpha = alpha * keep
        hit = hit * keep
    elif mask_mode != "none":
        raise ValueError(f"unsupported mask_mode: {mask_mode}")
    return hit, alpha


def finish_over_background(rgb_premult, alpha, background, to_srgb: bool):
    """(…, 3) premultiplied rgb + (…,) alpha over a (4,) background.
    Returns (…, 4)."""
    bg = jnp.asarray(background, jnp.float32)
    out_rgb = bg[:3] * bg[3] * (1.0 - alpha[..., None]) + rgb_premult
    out_a = bg[3] + alpha * (1.0 - bg[3])
    if to_srgb:
        out_rgb = linear_to_srgb(out_rgb)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
