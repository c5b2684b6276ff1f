"""sRGB <-> linear conversions (the IEC 61966-2-1 piecewise curve).

reference: src/shaders/rayCastMonoLDI.glsl:100-107 (linear -> sRGB) and the
WebGL sRGB texture decode applied on sampling (HoloProjector.ts:223).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["linear_to_srgb", "srgb_to_linear"]


def linear_to_srgb(linear):
    """Piecewise sRGB OETF, elementwise."""
    linear = jnp.asarray(linear)
    return jnp.where(
        linear <= 0.0031308,
        linear * 12.92,
        1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(srgb):
    """Piecewise sRGB EOTF, elementwise (inverse of linear_to_srgb)."""
    srgb = jnp.asarray(srgb)
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 1e-12), 2.4),
    )
