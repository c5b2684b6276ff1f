"""Pallas TPU kernel: the gather-free first-crossing plane march.

Production implementation of ops/sweep_march.py's translation sweep
(reference semantics: src/shaders/rayCastMonoLDI.glsl:219-297's march,
specialized to aligned views where every inverse-depth plane's warp is a
pure translation). The kernel handles the LATERAL case — translation along
+x only, matched focal, output dims == source dims. The renderer reduces
every translation to this form (a translation in any direction is lateral
in the intermediate frame whose x-axis points along it; rotation is
factored into the phase-B homography, see ops/sweep_fast.render_rotated).

Why a Pallas kernel: the XLA formulation materializes K per-plane (H, W)
intermediates in HBM (~K x 12 B/pixel of traffic). Here the whole K-plane
loop — shifted window fetch, bilinear lerp, crossing detection, secant
interpolation, color lerp — runs on the VPU out of VMEM; HBM traffic
collapses to ~one read of the source per tile plus one write of the
output, independent of K.

Mosaic constraints that shaped the layout (all discovered the hard way):
  * dynamic slice offsets into tiled (VMEM) memrefs must be tile-aligned:
    multiples of 8 in the sublane dim, 128 in the lane dim — for vector
    loads AND for DMA source rectangles.
  * therefore the image is stored TRANSPOSED, (channels, x, y): the
    per-plane integer shift runs along SUBLANES, aligned down to a
    multiple of 8 (pl.multiple_of makes the divisibility provable), and
    the 0..7 residual is resolved by an 8-way lax.switch over STATIC
    slices of the loaded window value — vector ops, no alignment rules.
  * the fractional part of the shift folds into the same switch branch as
    the bilinear lerp (one multiply-add per tap).

Grid: (x-bands, y-chunks). Each program DMAs its (5, bw, 128) source
window (rgb+mask+disp, edge-padded in x, covering every plane's shift via
the static margin) into VMEM once, then loops the K planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sweep_march import TranslationPlan, _finalize, plane_tables

__all__ = ["render_lateral_pallas"]


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def _pick_tw(w: int) -> int:
    for tw in (64, 32, 16, 8):
        if w % tw == 0:
            return tw
    raise ValueError(f"output width {w} must be divisible by 8")


def _kernel(
    ixs,  # (K,) i32 scalar prefetch: per-plane integer x-shifts (padded)
    fxs,  # (K,) f32: bilinear fractions
    izt,  # (K,) f32: plane inverse depths, near -> far
    params,  # (2,) f32: [invz_min, invz_max] disparity decode
    src_hbm,  # (5, Wp, Hp) f32 ANY: r, g, b, mask, disp — TRANSPOSED
    out_ref,  # (6, tw, lc) VMEM out block
    blk,  # (5, bw, lc) f32 VMEM scratch: this tile's source window
    pdiff,  # (tw, lc) f32 scratch: secant bracket state
    prgba,  # (4, tw, lc) f32 scratch
    nfound,  # (1, 1) f32 SMEM scratch: crossed-pixel count
    sem,
    *,
    tw: int,
    bw: int,
    lc: int,
    num_planes: int,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(b * tw, bw), pl.ds(c * lc, lc)], blk, sem
    )
    cp.start()

    izmin = params[0]
    izmax = params[1]
    out_ref[:] = jnp.zeros((6, tw, lc), jnp.float32)
    pdiff[:] = jnp.zeros((tw, lc), jnp.float32)
    prgba[:] = jnp.zeros((4, tw, lc), jnp.float32)
    nfound[0, 0] = 0.0
    cp.wait()

    # data-dependent plane skipping: planes nearer than everything in this
    # tile's source window can never cross (front skip), and once every
    # pixel has crossed, the remaining planes are irrelevant (tail exit).
    # With quantile-placed planes most tiles touch a narrow plane band.
    # State lives in scratch refs so a skipped plane does NO vector work
    # (a functional lax.cond would copy the carries in the skip branch).
    dmax = jnp.max(blk[4]) * (izmin - izmax) + izmax

    def body(k, _):
        # one plane of lead-in before the first potentially-crossing plane
        # keeps pdiff/prgba (the secant bracket) valid at the activation
        # boundary: planes are descending, so izt[k+1] <= dmax activates
        # exactly one plane earlier than izt[k] <= dmax
        active = jnp.logical_and(
            izt[jnp.minimum(k + 1, num_planes - 1)] <= dmax,
            nfound[0, 0] < float(tw * lc),
        )

        @pl.when(active)
        def _():
            o = ixs[k]
            fx = fxs[k]
            izk = izt[k]
            o8 = pl.multiple_of((o // 8) * 8, 8)
            r = o - o8
            win = blk[:, pl.ds(o8, tw + 16), :]  # (5, tw+16, lc) value

            def shifted(rr):
                # residual integer shift + fractional lerp, fused per branch
                return lambda: (
                    win[:, rr : rr + tw, :] * (1.0 - fx)
                    + win[:, rr + 1 : rr + tw + 1, :] * fx
                )

            tex5 = jax.lax.switch(r, [shifted(rr) for rr in range(8)])

            d = tex5[4] * (izmin - izmax) + izmax
            diff = d - izk
            found = out_ref[5]
            crossed = jnp.logical_and(found < 0.5, diff > 0.0)

            prev_iz = izt[jnp.maximum(k - 1, 0)]
            t = jnp.clip(
                pdiff[:] / jnp.minimum(pdiff[:] - diff, -1e-12), 0.0, 1.0
            )
            t = jnp.where(k == 0, jnp.ones_like(t), t)
            iz_c = prev_iz + t * (izk - prev_iz)
            out_ref[4] = jnp.where(crossed, iz_c, out_ref[4])

            rgba = tex5[0:4]
            rgba_c = prgba[:] + t[None] * (rgba - prgba[:])
            out_ref[0:4] = jnp.where(crossed[None], rgba_c, out_ref[0:4])

            nfound[0, 0] = nfound[0, 0] + jnp.sum(crossed.astype(jnp.float32))
            out_ref[5] = jnp.maximum(found, crossed.astype(jnp.float32))
            pdiff[:] = diff
            prgba[:] = rgba

        return 0

    jax.lax.fori_loop(0, num_planes, body, 0)


@functools.partial(
    jax.jit, static_argnames=("plan", "num_planes", "interpret")
)
def _sweep_lateral(
    src_t,  # (5, Wp, Hp) f32 transposed padded stack
    ix_t,
    fx_t,
    plane_invz,
    invz_min,
    invz_max,
    plan: TranslationPlan,
    num_planes: int,
    interpret: bool = False,
):
    w, h = plan.out_w, plan.out_h
    tw = _pick_tw(w)
    lc = 128
    bw = _round_up(plan.tab_span_x + tw + 16, 8)
    wp, hp = src_t.shape[1], src_t.shape[2]
    assert (w - tw) + bw <= wp, (plan, bw, wp)
    assert hp % lc == 0, hp
    params = jnp.stack(
        [jnp.asarray(invz_min, jnp.float32), jnp.asarray(invz_max, jnp.float32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(w // tw, hp // lc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (6, tw, lc), lambda b, c, *_: (0, b, c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((5, bw, lc), jnp.float32),
            pltpu.VMEM((tw, lc), jnp.float32),
            pltpu.VMEM((4, tw, lc), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, tw=tw, bw=bw, lc=lc, num_planes=num_planes
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((6, w, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        ix_t.astype(jnp.int32),
        fx_t.astype(jnp.float32),
        jnp.asarray(plane_invz, jnp.float32),
        params,
        src_t,
    )
    # transpose back to image orientation and drop the lane padding
    out = out[:, :, :h].transpose(0, 2, 1)  # (6, H, W)
    return out[5], out[4], out[0:4].transpose(1, 2, 0)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "num_planes", "mask_mode", "to_srgb", "interpret"),
)
def render_translation_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    c1,
    f1,
    plane_invz,
    background,
    plan: TranslationPlan,
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    interpret: bool = False,
):
    """Drop-in equivalent of sweep_march.render_translation_xla on TPU for
    the LATERAL case: c1 = [cx, 0, 0], out dims == src dims, f1 == f2.
    The caller (models/renderer) guarantees the reduction."""
    h, w = disp.shape
    assert plan.out_w == w and plan.out_h == h, (plan, disp.shape)
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    invz = jnp.asarray(plane_invz, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    ix_t, fx_t, _, _ = plane_tables(plan, invz, c1, f1)

    # transposed (channels, x, y) stack; x edge-padded for the shift range,
    # y padded to the 128-lane grid (values there never reach the output)
    tw = _pick_tw(w)
    bw = _round_up(plan.tab_span_x + tw + 16, 8)
    pad_hi_x = max(0, (w - tw) + bw - w - plan.pad_lo_x)
    hp = _round_up(h, 128)
    rgbm = jnp.concatenate(
        [rgb.astype(jnp.float32), mask.astype(jnp.float32)[..., None]], axis=-1
    )
    stack = jnp.concatenate(
        [rgbm, disp.astype(jnp.float32)[..., None]], axis=-1
    )  # (H, W, 5)
    src_t = stack.transpose(2, 1, 0)  # (5, W, H)
    src_t = jnp.pad(
        src_t,
        ((0, 0), (plan.pad_lo_x, pad_hi_x), (0, hp - h)),
        mode="edge",
    )
    found, rstar, rgba_star = _sweep_lateral(
        src_t, ix_t, fx_t, invz, izmin, izmax,
        plan=plan, num_planes=num_planes, interpret=interpret,
    )
    return _finalize(
        plan, found, rstar, rgba_star, c1, f1, izmin, background,
        feathering, mask_mode, to_srgb,
    )
