"""WebGL-faithful texture sampling as XLA gathers.

Semantics reproduced:
  * LinearFilter + ClampToEdgeWrapping bilinear: sample position
    ``st = uv * res - 0.5``, texel indices clamped to [0, res-1]
    (matches the GL spec for CLAMP_TO_EDGE linear filtering).
  * NearestFilter: ``floor(uv * res)`` clamped.
  * readDisp's 2-texel interior clamp before sampling
    (reference: src/shaders/rayCastMonoLDI.glsl:59-61).

Textures are stored GL-oriented (row 0 = v=0 = image bottom); uv is the GL
texture coordinate in [0,1]^2. Logical resolution ``res=(w, h)`` may be
smaller than the stored array (padded layers); the pad region is never
addressed because indices clamp to the logical extent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bilinear_sample",
    "bilinear_sample_packed",
    "nearest_sample",
    "pack_rgbm",
    "read_disp",
]


def _opaque(*idx):
    """Identity hook for gather indices (kept as a single choke point).

    NOTE: an earlier revision inserted jax.lax.optimization_barrier here; on
    the axon TPU runtime a barrier acts like a dispatch boundary costing
    tens of ms per occurrence, which is catastrophic inside the unrolled
    march. Plain indices lower to fast gathers.
    """
    return idx


def _gather(tex, iy, ix):
    """tex: (H, W) or (H, W, C); iy/ix: integer index arrays of equal shape.

    Implemented as a FLAT 1-D take (iy*W + ix into a reshaped texture):
    2-D advanced indexing lowers to a multi-index-vector gather that hits a
    slow path on TPU, especially under vmap (measured ~2 s/frame vs sub-ms);
    a flat take stays a single plain gather no matter how callers batch the
    index arithmetic.
    """
    h, w = tex.shape[0], tex.shape[1]
    # Flatten BOTH the texture and the index array to 1-D: the TPU gather
    # lowering is shape-sensitive (measured per 1M-element take: 1-D indices
    # ~0.01 ms, 3-D ~1.6 ms, some 2-D shapes ~33 ms). Flat take + reshape is
    # the reliably fast form.
    out_shape = iy.shape
    flat_idx = (iy * w + ix).reshape(-1)
    if tex.ndim == 2:
        return jnp.take(tex.reshape(h * w), flat_idx).reshape(out_shape)
    # (H, W, C): one flat take per channel (channel count is tiny/static).
    flat = tex.reshape(h * w, tex.shape[2])
    return jnp.stack(
        [
            jnp.take(flat[:, c], flat_idx).reshape(out_shape)
            for c in range(tex.shape[2])
        ],
        axis=-1,
    )


def bilinear_sample(tex, u, v, res_w, res_h):
    """Bilinear sample with clamp-to-edge.

    Args:
      tex: (H, W) or (H, W, C) array, GL-oriented.
      u, v: sample coordinates in [0, 1], any broadcast-compatible shape.
      res_w, res_h: logical texture resolution (<= stored array dims).

    Returns array of shape ``u.shape`` (+ channel dim if tex has one).
    """
    sx = u * res_w - 0.5
    sy = v * res_h - 0.5
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    wmax = jnp.asarray(res_w).astype(jnp.int32) - 1
    hmax = jnp.asarray(res_h).astype(jnp.int32) - 1
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, wmax)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, wmax)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, hmax)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, hmax)
    ix0, ix1, iy0, iy1 = _opaque(ix0, ix1, iy0, iy1)

    t00 = _gather(tex, iy0, ix0)
    t01 = _gather(tex, iy0, ix1)
    t10 = _gather(tex, iy1, ix0)
    t11 = _gather(tex, iy1, ix1)

    if tex.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]

    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def nearest_sample(tex, u, v, res_w, res_h):
    """Nearest-neighbour sample with clamp-to-edge (GL NEAREST)."""
    wmax = jnp.asarray(res_w).astype(jnp.int32) - 1
    hmax = jnp.asarray(res_h).astype(jnp.int32) - 1
    ix = jnp.clip(jnp.floor(u * res_w).astype(jnp.int32), 0, wmax)
    iy = jnp.clip(jnp.floor(v * res_h).astype(jnp.int32), 0, hmax)
    ix, iy = _opaque(ix, iy)
    return _gather(tex, iy, ix)


def pack_rgbm(rgb, mask):
    """Pack (H, W, 3) rgb in [0,1] + (H, W) mask into one int32 channel:
    10 bits per color + 1 mask bit. A single-channel gather is 4x cheaper
    than per-channel gathers on TPU (each take costs ~7 ms/1M elements)."""
    q = jnp.clip(jnp.round(rgb * 1023.0), 0, 1023).astype(jnp.int32)
    m = (mask > 0.5).astype(jnp.int32)
    return (q[..., 0] << 21) | (q[..., 1] << 11) | (q[..., 2] << 1) | m


def _unpack_rgbm(packed):
    r = ((packed >> 21) & 1023).astype(jnp.float32) / 1023.0
    g = ((packed >> 11) & 1023).astype(jnp.float32) / 1023.0
    b = ((packed >> 1) & 1023).astype(jnp.float32) / 1023.0
    m = (packed & 1).astype(jnp.float32)
    return jnp.stack([r, g, b, m], axis=-1)


def bilinear_sample_packed(packed_tex, u, v, res_w, res_h):
    """Bilinear sample of a pack_rgbm texture: 4 int32 taps, unpack, blend.
    Returns (..., 4) = [r, g, b, mask]."""
    sx = u * res_w - 0.5
    sy = v * res_h - 0.5
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    wmax = jnp.asarray(res_w).astype(jnp.int32) - 1
    hmax = jnp.asarray(res_h).astype(jnp.int32) - 1
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, wmax)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, wmax)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, hmax)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, hmax)
    h, w = packed_tex.shape
    flat = packed_tex.reshape(-1)
    shape = u.shape

    def tap(iy, ix):
        return _unpack_rgbm(
            jnp.take(flat, (iy * w + ix).reshape(-1)).reshape(shape)
        )

    t00 = tap(iy0, ix0)
    t01 = tap(iy0, ix1)
    t10 = tap(iy1, ix0)
    t11 = tap(iy1, ix1)
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def read_disp(disp_tex, u, v, v_min, v_max, res_w, res_h):
    """Decode inverse depth from a disparity texture.

    Clamps uv to a 2-texel interior border, bilinearly samples the first
    channel, then maps [0,1] -> [v_max, v_min]:
    ``texel * (vMin - vMax) + vMax``.
    reference: rayCastMonoLDI.glsl:59-61.
    """
    uc = jnp.clip(u, 2.0 / res_w, 1.0 - 2.0 / res_w)
    vc = jnp.clip(v, 2.0 / res_h, 1.0 - 2.0 / res_h)
    texel = bilinear_sample(disp_tex, uc, vc, res_w, res_h)
    if texel.ndim > jnp.ndim(u):  # multi-channel: disparity is channel 0
        texel = texel[..., 0]
    return texel * (v_min - v_max) + v_max
