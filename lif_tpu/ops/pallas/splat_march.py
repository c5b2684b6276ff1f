"""Pallas TPU kernel: depth-tested billboard scatter via plane binning.

The "Pallas depth-tested scatter rasterizer" role from BASELINE.json's
north star (reference: src/shaders/holoVertex.glsl:130-149, 243-273 —
one instanced quad per source pixel, z-buffered), produced WITHOUT a
scatter: on the lateral family the scatter has an exact gather dual.

Derivation. forward_splat (ops/splat.py) sends source pixel p (center
p + 0.5) to u = p + 0.5 + delta(p), delta(p) = f1 * c1x * invz(p), and
covers the footprint=2 target pixels o in {floor(u - 0.5),
floor(u - 0.5) + 1} with |o + 0.5 - u| <= max(su, 1)/2, where the
screen-space footprint su = point_size * sqrt(((p + .5 - cx)/fx)^2 +
((py + .5 - cy)/fy)^2 + 1) is a STATIC field (the depth cancels:
dist/depth is a pure function of the pixel ray). Lateral motion keeps
rows aligned (v = py + 0.5 exactly), and su < 2 means the y footprint
never leaves the row. So target pixel o is covered by p = o - m for
integer shifts m with |m - delta(o - m)| <= su(o - m)/2 — and
|m - delta| <= su/2 < 1 forces m in {floor(delta), floor(delta) + 1}:
EVERY covered (o, p) pair is found by sweeping the integer-parallax
plane ladder and testing the plane-warped texel against its own shift.
The z-test (nearest wins, ties to the lowest source id — the XLA
scatter's resolve) becomes: candidates at plane m have invz inside
bin m, adjacent bins overlap by at most (su_max - 1)/2 < 1 bin, so the
first plane (near -> far) with coverage wins unless the NEXT plane's
candidate is strictly nearer — one extra comparison, not a z-buffer.

The kernel reuses the lateral march's transposed resident-window layout
(ops/pallas/sweep_march.py): grid (x-bands, y-chunks, poses), one
source read per tile for the whole pose batch, integer-shift slices
(no lerp — billboard reads POINT texels), scalar-prefetch shift
tables, and the value-interval occupancy skip (bin-occupancy IS the
billboard's activity test). Pass 1 resolves winner plane + texel;
pass 2 fetches the winner's own color texel (no interpolation —
holoVertex forwards the source texel unchanged).

Scope: lateral poses (c1 = [cx, 0, 0]), matched focal f2 == f1,
centered principal point, su < 2 (always true at point_size <= ~1.5
for normal FOVs; the planner asserts). Other poses take the XLA
scatter (ops/splat.forward_splat) — the general-pose fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sweep_march import TranslationPlan
from .sweep_march import _pick_tw, _skip_tables, _COARSE

__all__ = ["render_billboard_batch_pallas", "billboard_shift_tables"]


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def billboard_shift_tables(
    f1: float, cxs, izmin: float, izmax: float, plan: TranslationPlan,
):
    """Integer-shift ladder per pose: every integer parallax the decode
    range can produce, one extra on each side (a texel with delta just
    past the range endpoint can still be covered by the neighbouring
    integer shift). Shifts are WINDOW STARTS into the padded source
    (the march's plane_tables convention: ix = pad_lo_x - m for
    src_w == out_w), padded to one shared bucketed K with
    out-of-plan sentinels clamped into the pad (their own-bin test can
    never pass there: the pad replicates edge texels whose delta sits
    inside the real range). Returns (ixs (B, K) i32, m (B, K) f32, K).
    """
    ms = []
    for cx in cxs:
        a = float(f1) * float(cx)
        lo, hi = sorted((a * izmin, a * izmax))
        ms.append(np.arange(int(np.floor(lo)), int(np.ceil(hi)) + 2))
    k = max(len(m) for m in ms)
    k = max(8, _round_up(k, 8))
    ix_all, m_all = [], []
    for m, cx in zip(ms, cxs):
        a = float(f1) * float(cx)
        # near -> far: descending invz = descending |delta| toward the
        # far end; order by DESCENDING invz = m descending if a > 0
        m = m[::-1] if a > 0 else m
        pad = k - len(m)
        # pad with sentinel shifts one beyond the far end (never covered)
        sent = m[-1] + (1 if len(m) < 2 or m[-1] > m[0] else -1)
        m_full = np.concatenate([m, np.full(pad, sent)])
        ix = plan.pad_lo_x - m_full
        ix = np.clip(ix, 0, plan.tab_span_x)
        ix_all.append(ix.astype(np.int32))
        m_all.append((plan.pad_lo_x - ix).astype(np.float32))
    return np.stack(ix_all), np.stack(m_all), k


def _kernel(
    ixs,  # (B * K,) i32 scalar prefetch: per-pose window starts —
    #      FLATTENED (SMEM pads a multi-dim operand's last dim to 128,
    #      an ~4-18x blowup that would cap the pose batch; see
    #      sweep_march's cm3 comment)
    mms,  # (B * K,) f32: the integer shift value m of each plane
    abp,  # (B * 3,) f32: [A, Bc, su_half_max] per pose —
    #      delta(t) = A * t + Bc (A = f1*c1x*(izmin-izmax),
    #      Bc = f1*c1x*izmax); su_half_max bounds su/2 for the skip test
    cm3,  # flattened sliding max (texel units) — see sweep_march
    cmn3,  # flattened sliding min
    occ2,  # flattened value-interval occupancy bitmask
    src_hbm,  # (5, Wp, Hp) f32 ANY — r, g, b, mask, disp TRANSPOSED
    out_ref,  # (1, 6, tw, lc) VMEM out block
    blk,  # (5, bw, lc) f32 VMEM scratch: resident source window
    btex,  # (tw, lc) f32 scratch: winner's disparity texel
    kstar,  # (tw, lc) f32 scratch: winner plane (-1 = none)
    crossflag,  # (K,) f32 SMEM: per-plane winner counts
    nfound,  # (1, 1) f32 SMEM
    sem,
    *,
    tw: int,
    bw: int,
    lc: int,
    num_planes: int,
    nb: int,
    n_hc: int,
    w_real: int,
    pad_lo_x: int,
    inv_f: float,  # 1 / fx (= 1 / f2, matched)
    cx0: float,  # principal point x (pixels)
    cy0: float,
    point_size: float,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    p = pl.program_id(2)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(b * tw, bw), pl.ds(c * lc, lc)], blk, sem
    )

    @pl.when(p == 0)
    def _():
        cp.start()

    out_ref[:] = jnp.zeros((1, 6, tw, lc), jnp.float32)
    btex[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    kstar[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    nfound[0, 0] = 0.0

    @pl.when(p == 0)
    def _():
        cp.wait()

    A = abp[p * 3]
    Bc = abp[p * 3 + 1]
    su_half_max = abp[p * 3 + 2]
    # y footprint term of su, per lane (output rows = source rows).
    # iota in i32 then cast: Mosaic rejects a float-typed tpu.iota on
    # real hardware (verified interpret-only otherwise)
    yq = (c * lc).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (tw, lc), 1
    ).astype(jnp.float32)
    yterm = ((yq + 0.5 - cy0) * inv_f) ** 2
    jx = jax.lax.broadcasted_iota(jnp.int32, (tw, lc), 0).astype(
        jnp.float32)

    def _bits_below(n):
        return jnp.where(
            n >= 32, jnp.int32(-1),
            (jnp.int32(1) << jnp.clip(n, 0, 31)) - jnp.int32(1),
        )

    def _active(k):
        """Scalar skip test: does any texel in this tile's window have
        its delta-bin within su_half_max of plane k's shift? In texel
        units the bin is an interval around t_c = (m - Bc)/A; the
        sliding max/min + occupancy tables answer conservatively (the
        pad-sentinel planes sit beyond the decode range, so their
        interval misses every real texel)."""
        m = mms[p * num_planes + k]
        co = b * (tw // _COARSE) + ixs[p * num_planes + k] // _COARSE
        absA = jnp.abs(A)
        # A ~ 0 (identity pose): delta is the constant Bc for every
        # texel — the t-interval would be ill-conditioned, so test the
        # constant directly and let every texel share the verdict
        const_hit = jnp.abs(m - Bc) <= su_half_max + 1e-3
        t_c = (m - Bc) / jnp.where(absA < 1e-12, 1e-12, A)
        t_h = (su_half_max + 1e-3) / jnp.maximum(absA, 1e-12)
        t_lo = jnp.where(absA < 1e-9, jnp.where(const_hit, -1.0, 2.0),
                         t_c - t_h)
        t_hi = jnp.where(absA < 1e-9, jnp.where(const_hit, 2.0, -1.0),
                         t_c + t_h)
        rng_ok = jnp.logical_and(
            cm3[co * n_hc + c] >= t_lo, cmn3[co * n_hc + c] <= t_hi
        )
        b0 = jnp.clip(jnp.floor(t_lo * 64.0).astype(jnp.int32) - 1, 0, 63)
        b1 = jnp.clip(jnp.floor(t_hi * 64.0).astype(jnp.int32) + 1, 0, 63)
        cell2 = (co * n_hc + c) * 2
        m0 = _bits_below(jnp.clip(b1 + 1, 0, 32)) & ~_bits_below(
            jnp.clip(b0, 0, 32))
        m1 = _bits_below(jnp.clip(b1 - 31, 0, 32)) & ~_bits_below(
            jnp.clip(b0 - 32, 0, 32))
        occ_hit = ((occ2[cell2] & m0) | (occ2[cell2 + 1] & m1)) != 0
        return jnp.logical_and(rng_ok, occ_hit)

    def _cover(k):
        """(covered, texel) of plane k's candidates: the k-shifted
        disparity slice tested against its own shift's bin."""
        o8 = pl.multiple_of((ixs[p * num_planes + k] // 8) * 8, 8)
        r = ixs[p * num_planes + k] - o8
        win = blk[4:5, pl.ds(o8, tw + 8), :]

        def sliced(rr):
            return lambda: win[0, rr : rr + tw, :]

        t_w = jax.lax.switch(r, [sliced(rr) for rr in range(8)])
        m = mms[p * num_planes + k]
        delta = A * t_w + Bc
        # source pixel x of the candidate: p_src = j + (ix - pad_lo_x)
        psrc = jx + (ixs[p * num_planes + k] - pad_lo_x).astype(jnp.float32) + (b * tw
                                                                 ).astype(
            jnp.float32)
        xterm = ((psrc + 0.5 - cx0) * inv_f) ** 2
        su_half = 0.5 * point_size * jnp.sqrt(xterm + yterm + 1.0)
        su_half = jnp.maximum(su_half, 0.5)
        inb = jnp.logical_and(psrc >= 0.0, psrc <= float(w_real - 1))
        covered = jnp.logical_and(
            (m - delta) ** 2 <= su_half * su_half, inb
        )
        return covered, t_w

    def body(k, _):
        crossflag[k] = 0.0
        km1 = jnp.maximum(k - 1, 0)
        # visit while new winners are possible OR the previous plane
        # froze winners that this plane might still beat (bin overlap)
        act = jnp.logical_or(
            nfound[0, 0] < float(tw * lc), crossflag[km1] > 0.0
        )

        @pl.when(jnp.logical_and(_active(k), act))
        def _():
            covered, t_w = _cover(k)
            newly = jnp.logical_and(kstar[:] < -0.5, covered)
            # upgrade: the previous plane's fresh winner loses iff this
            # plane's candidate is strictly nearer (larger texel), or
            # ties with a lower source id: rows are equal, so lower id =
            # smaller source x = LARGER shift m = smaller window start
            tie_lower_id = (ixs[p * num_planes + k]
                            < ixs[p * num_planes + km1])
            beats = jnp.logical_or(
                t_w > btex[:],
                jnp.logical_and(t_w == btex[:], tie_lower_id),
            )
            upg = jnp.logical_and(
                jnp.logical_and(kstar[:] == km1.astype(jnp.float32),
                                k > 0),
                jnp.logical_and(covered, beats),
            )
            sel = jnp.logical_or(newly, upg)
            cnt_new = jnp.sum(newly.astype(jnp.float32))
            kstar[:] = jnp.where(sel, jnp.float32(k), kstar[:])
            btex[:] = jnp.where(sel, t_w, btex[:])
            crossflag[k] = jnp.sum(sel.astype(jnp.float32))
            nfound[0, 0] = nfound[0, 0] + cnt_new

        return 0

    jax.lax.fori_loop(0, num_planes, body, 0)

    out_ref[0, 5] = (kstar[:] > -0.5).astype(jnp.float32)
    out_ref[0, 4] = btex[:]

    def pass2(k, _):
        @pl.when(crossflag[k] > 0.0)
        def _():
            sel = kstar[:] == jnp.float32(k)
            o8 = pl.multiple_of((ixs[p * num_planes + k] // 8) * 8, 8)
            r = ixs[p * num_planes + k] - o8
            win = blk[0:4, pl.ds(o8, tw + 8), :]

            def sliced(rr):
                return lambda: win[:, rr : rr + tw, :]

            rgba = jax.lax.switch(r, [sliced(rr) for rr in range(8)])
            out_ref[0, 0:4] = jnp.where(sel[None], rgba, out_ref[0, 0:4])

        return 0

    jax.lax.fori_loop(0, num_planes, pass2, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "f1", "cx0", "cy0", "point_size",
        "to_srgb", "show_depth", "interpret",
    ),
)
def render_billboard_batch_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    c1,  # (B, 3): [cx, 0, 0] per pose (march convention)
    f1: float,  # host float (static: the su field bakes 1/f1 in)
    ixs,  # (B, K) i32 from billboard_shift_tables
    mms,  # (B, K) f32
    background,
    plan: TranslationPlan,
    num_planes: int,
    cx0: float,
    cy0: float,
    point_size: float = 1.0,
    to_srgb: bool = True,
    show_depth: bool = False,
    interpret: bool = False,
    prepared=None,
):
    """Batched billboard splat on TPU: one kernel launch for the whole
    lateral pose batch. Output semantics match ops/splat.forward_splat
    (footprint=2, matched focal, centered target pp): z-buffered
    nearest source texel, alpha 1 on hit, background elsewhere.
    Returns (B, H, W, 4)."""
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    batch = c1.shape[0]
    a_pose = jnp.float32(f1) * c1[:, 0]
    A = a_pose * (izmin - izmax)
    Bc = a_pose * izmax
    h, w = disp.shape
    tw = _pick_tw(plan.out_w)
    # su bound at the widest corner (static; su < 2 asserted by caller)
    corner = np.sqrt(
        ((w + 1.0) / 2.0 / float(f1)) ** 2
        + ((h + 1.0) / 2.0 / float(f1)) ** 2 + 1.0
    )
    su_half_max = jnp.full((batch,), 0.5 * point_size * corner,
                           jnp.float32)
    abp = jnp.stack([A, Bc, su_half_max], axis=1).reshape(-1)  # (B*3,)

    if prepared is None:
        from .sweep_march import prepare_translation_src

        prepared = prepare_translation_src(rgb, disp, mask, plan)
    src_t, cm3, cmn3, occ2 = prepared
    bw = _round_up(plan.tab_span_x + tw + 8, 64)
    wp, hp = src_t.shape[1], src_t.shape[2]
    assert (plan.out_w - tw) + bw <= wp, (plan, bw, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(plan.out_w // tw, hp // 128, batch),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 6, tw, 128),
            lambda b, c, p, *_: (p, 0, b, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((5, bw, 128), jnp.float32),
            pltpu.VMEM((tw, 128), jnp.float32),  # btex
            pltpu.VMEM((tw, 128), jnp.float32),  # kstar
            pltpu.SMEM((num_planes,), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, tw=tw, bw=bw, lc=128, num_planes=num_planes,
        nb=plan.out_w // tw, n_hc=hp // 128, w_real=w,
        pad_lo_x=plan.pad_lo_x, inv_f=1.0 / float(f1), cx0=float(cx0),
        cy0=float(cy0), point_size=float(point_size),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 6, plan.out_w, hp), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(ixs, jnp.int32).reshape(-1),
        jnp.asarray(mms, jnp.float32).reshape(-1),
        abp,
        cm3.reshape(-1),
        cmn3.reshape(-1),
        occ2.reshape(-1),
        src_t,
    )
    out = out[:, :, :, :h].transpose(0, 1, 3, 2)  # (B, 6, H, W)
    hit = out[:, 5]
    rgba = out[:, 0:4].transpose(0, 2, 3, 1)
    background = jnp.asarray(background, jnp.float32)
    if show_depth:
        gray = out[:, 4]
        rgb_img = jnp.stack([gray] * 3, axis=-1)
    else:
        rgb_img = rgba[..., :3]
    rgb_img = jnp.where(
        hit[..., None] > 0.0, rgb_img, background[:3] * background[3]
    )
    a_img = jnp.where(hit > 0.0, 1.0, background[3])
    if to_srgb:
        from ...core.color import linear_to_srgb

        rgb_img = linear_to_srgb(rgb_img)
    return jnp.concatenate([rgb_img, a_img[..., None]], axis=-1)
