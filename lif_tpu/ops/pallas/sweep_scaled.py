"""Pallas TPU kernel: the gather-free SCALED first-crossing plane march.

Production implementation of ops/sweep_scaled.py (reference semantics:
src/shaders/rayCastMonoLDI.glsl:219-297's march for any aligned pose —
s1 is affine in invZ, rayCastMonoLDI.glsl:249). Each plane's warp is
separable-affine per axis: dx(j) = tx + ex*(j - cx0), dy(i) = ty +
ey*(i - cy0) — translation AND uniform scale (z-dolly, focal ratio) in
one family. The warp is gather-free AND roll-free (dynamic
`tpu.dynamic_rotate` silently miscompiles on non-power-of-two tile
counts on this toolchain — probed, scratch/probe_roll3.py): per axis,
an 8-aligned dynamic ref slice + an 8-way residual switch (the lateral
kernel's proven mechanism) + a candidate-offset hat-weight sum whose
unrolled length a class switch matches to the plane's actual scale
spread; the y axis rides the same sublane mechanism through an
in-kernel transpose. Two adjacent candidates reproduce the bilinear
lerp exactly; extra candidates cover the scale spread across a tile.

Work-avoidance mirrors the lateral kernel (ops/pallas/sweep_march.py):
texel-space pass 1 (disparity only, secant ratio invariant to the
affine decode), crossing-flagged pass 2 for colors, a conservative
coarse-max skip table, bracket refresh after skip runs, early-out when
every pixel crossed, and the pose axis innermost over one resident
source window per (band, chunk).

What is new against the lateral kernel:
  * per-pose per-plane tables ride a pose-BLOCKED SMEM input (B, 6, K)
    instead of scalar prefetch — SMEM holds one pose's (6, K) slice at
    a time, so the batch size is unbounded by SMEM (the lateral
    kernel's B~100 cap; VERDICT r2 item 3).
  * depth_only mode skips pass 2 entirely: the two-phase rotated path
    (Phase A) needs only found/invz*.
  * in-bracket `refine` re-warps at interpolated tables (all four table
    entries are affine in invz, so sub-plane warps are exact lerps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bounds import HAT_FIN_SCALE, plane_loop_bounds
from ..sweep_scaled import (
    ScaledPlan,
    _LC,
    _pad_stack,
    _round_up,
    finalize_scaled,
    scaled_tables,
)

__all__ = ["render_scaled_pallas", "render_scaled_batch_pallas"]

_COARSE = 8  # coarse skip-table cell width in x (one sublane group)


def _kernel(
    cm3,  # (Wp/8 * Hc,) f32 scalar prefetch: sliding-window disp max —
    #     FLATTENED: SMEM pads a multi-dim prefetch operand's last dim
    #     to 128 (1-D only to 512 elements), ~18x blowup for Hc=7
    klo_t,  # (B * nb * Hc,) i32: first plane whose skip test can pass
    khi_t,  # (B * nb * Hc,) i32: exclusive end (window MIN in front)
    tab_ref,  # (1, 6, K) SMEM, pose-blocked: tx, ex, ty, ey, izt, tkt
    src_hbm,  # (C, Wp, Hp) f32 ANY — C=5 (full) or 1 (depth_only: disp)
    out_ref,  # (1, OC, tw, lc) VMEM out block
    blk,  # (C, bw, ylen) f32 VMEM scratch: the source window
    tsp,  # (ylen, tw) f32 VMEM scratch: transposed x-collapsed slab
    pdiff,  # (tw, lc) f32 scratch: secant bracket state (texel units)
    kstar,  # (tw, lc) f32 scratch: crossing plane index (-1 = none)
    pdiffc,  # (tw, lc) f32 scratch
    diffc,  # (tw, lc) f32 scratch
    prgba,  # (4, tw, lc) f32 scratch: previous flagged plane's colors
    crossflag,  # (K,) f32 SMEM scratch
    lastk,  # (1, 1) i32 SMEM scratch
    nfound,  # (1, 1) f32 SMEM scratch
    sem,
    *,
    plan: ScaledPlan,
    num_planes: int,
    refine: int,
    depth_only: bool,
):
    tw, lc, mx, my = plan.tw, _LC, plan.mx, plan.my
    twx = plan.twx
    ylen = plan.ylen
    nb = plan.out_w // tw  # static strides of the flattened SMEM tables
    n_hc = plan.hp_out // _LC
    nch = 1 if depth_only else 5
    dch = nch - 1  # disparity channel index within the window
    b = pl.program_id(0)
    c = pl.program_id(1)
    p = pl.program_id(2)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(b * tw, plan.bw), pl.ds(c * lc, ylen)],
        blk, sem,
    )

    @pl.when(p == 0)
    def _():
        cp.start()

    oc = 2 if depth_only else 6
    out_ref[:] = jnp.zeros((1, oc, tw, lc), jnp.float32)
    pdiff[:] = jnp.zeros((tw, lc), jnp.float32)
    kstar[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    pdiffc[:] = jnp.zeros((tw, lc), jnp.float32)
    diffc[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    lastk[0, 0] = -1
    nfound[0, 0] = 0.0

    @pl.when(p == 0)
    def _():
        cp.wait()

    cx0 = (plan.out_w - 1) / 2.0
    cy0 = (plan.out_h - 1) / 2.0
    x0f = b * tw - cx0  # global x of the band start, centered
    y0f = c * lc - cy0
    plx = float(plan.pad_lo_x)
    spanx = float(plan.tab_span_x)
    kylo = float(plan.ky_lo * _LC)
    mylo = float(plan.my_lo)
    myhi = float(plan.my_hi)
    jx = jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, lc), 1).astype(jnp.float32)

    def _clipx(v):
        return jnp.clip(v, 0.0, spanx)

    # candidate-count classes: a lax.switch picks the smallest unrolled
    # body covering the plane's spread — branch cost like the lateral
    # kernel's 8-way switch, vector cost proportional to the actual
    # spread, and the accumulation stays in registers (no scratch RMW)
    def _classes(nmax):
        ns, n = [], 2
        while n < nmax:
            ns.append(n)
            n *= 2
        ns.append(nmax)
        return ns

    ycls = _classes(my)
    xcls = _classes(mx + 2)
    # y-stage slab: 256 sublanes = 32 tiles (power of two, roll-safe);
    # covers any (lc + my)-row range after the 8-aligned clamped base
    lcwin = 2 * _LC
    iyT = jax.lax.broadcasted_iota(jnp.int32, (lc, 1), 0).astype(jnp.float32)

    def _warp_of(chans, tx, ex, ty, ey):
        """Separable-affine bilinear warp of window channels [lo, hi).

        Pipeline (every primitive probed on this toolchain —
        scratch/probe_roll3.py, probe_roll4.py; `tpu.dynamic_rotate` is
        only safe on POWER-OF-TWO tile counts, which the slab shapes
        guarantee):

          1. x-collapse in the (x-sublane, y-lane) layout: 8-aligned
             dynamic ref slice, a dynamic sublane roll for the residual,
             then a candidate-count class switch whose unrolled hat-
             weight sum tracks the plane's actual scale spread. Two
             adjacent candidates ARE the bilinear lerp.
          2. transpose the x-collapsed slab (in-kernel vector
             transpose), park it in scratch so the y base can be a
             dynamic 8-aligned REF slice.
          3. y-collapse with y on sublanes: the same roll + class
             switch mechanism.
          4. transpose back to (tw, lc).

        Returns the (hi-lo, tw, lc) warped value.
        """
        lo, hi = chans
        # scalar x base (displacement is monotone in j: extremes at ends)
        dxa = _clipx(tx + ex * x0f + plx)
        dxb = _clipx(tx + ex * (x0f + tw - 1) + plx)
        bmin = jnp.floor(jnp.minimum(dxa, dxb)).astype(jnp.int32)
        o8 = pl.multiple_of((bmin // 8) * 8, 8)
        rr = bmin - o8  # sublane residual in [0, 8)
        span_x = jnp.maximum(dxa, dxb) - jnp.minimum(dxa, dxb)
        # scalar y base (window-relative; kylo folds the chunk margin).
        # The y-stage slab base is clamped into the resident extent; the
        # plan's ky_hi headroom keeps every read below lcwin after the
        # residual roll.
        dya = jnp.clip(ty + ey * y0f, -mylo, myhi) + kylo
        dyb = jnp.clip(ty + ey * (y0f + lc - 1), -mylo, myhi) + kylo
        bym = jnp.floor(jnp.minimum(dya, dyb)).astype(jnp.int32)
        y8 = pl.multiple_of(
            jnp.minimum((bym // 8) * 8, ylen - lcwin), 8
        )
        ryr = bym - y8  # residual after the (clamped) 8-aligned base
        span_y = jnp.maximum(dya, dyb) - jnp.minimum(dya, dyb)

        # candidate coordinates (weights hat(q - o), q >= 0 at the base)
        qx = (
            _clipx(tx + ex * (x0f + jx) + plx) - bmin.astype(jnp.float32)
        )  # (tw, 1) — per-sublane in stage 1
        qyT = (
            jnp.clip(ty + ey * (y0f + iyT), -mylo, myhi) + kylo
            - bym.astype(jnp.float32)
        )  # (lc, 1) — per-sublane in stage 3

        # class indices: smallest body with n >= floor(span)+2
        def _cls_idx(span, classes):
            idx = jnp.int32(len(classes) - 1)
            for i in range(len(classes) - 2, -1, -1):
                idx = jnp.where(span + 2.0 <= float(classes[i]),
                                jnp.int32(i), idx)
            return idx

        ic_y = _cls_idx(span_y, ycls)
        ic_x = _cls_idx(span_x, xcls)

        outs = []
        for ch in range(lo, hi):
            slab = blk[ch, pl.ds(o8, twx), :]  # (twx, ylen)
            slab = pltpu.roll(slab, -rr, 0)  # power-of-two tiles: safe

            def _xbody(n, slab=slab):
                def body():
                    xa = jnp.zeros((tw, ylen), jnp.float32)
                    for o in range(n):
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(qx - float(o)))
                        xa = xa + w * slab[o : o + tw, :]
                    return xa

                return body

            xa = jax.lax.switch(ic_x, [_xbody(n) for n in xcls])
            # transpose so y rides the sublane mechanism; scratch parks
            # it for the dynamic 8-aligned base slice
            tsp[:] = xa.T  # (ylen, tw)
            slaby = tsp[pl.ds(y8, lcwin), :]  # (lcwin, tw)
            slaby = pltpu.roll(slaby, -ryr, 0)

            def _ybody(n, slaby=slaby):
                def body():
                    ya = jnp.zeros((lc, tw), jnp.float32)
                    for o in range(n):
                        w = jnp.maximum(
                            0.0, 1.0 - jnp.abs(qyT - float(o))
                        )
                        ya = ya + w * slaby[o : o + lc, :]
                    return ya

                return body

            ya_t = jax.lax.switch(ic_y, [_ybody(n) for n in ycls])
            outs.append(ya_t.T)  # (tw, lc)
        return jnp.stack(outs) if len(outs) > 1 else outs[0][None]

    def _tab(ch, k):
        return tab_ref[0, ch, k]

    def _warp_k(chans, k):
        return _warp_of(
            chans, _tab(0, k), _tab(1, k), _tab(2, k), _tab(3, k)
        )

    def pass1(k, _):
        crossflag[k] = 0.0
        # conservative skip: sliding max of the source disparity over
        # every texel this plane's slab can touch vs the texel threshold
        tx, ex = _tab(0, k), _tab(1, k)
        dxa = _clipx(tx + ex * x0f + plx)
        dxb = _clipx(tx + ex * (x0f + tw - 1) + plx)
        bmin = jnp.floor(jnp.minimum(dxa, dxb)).astype(jnp.int32)
        co = b * (tw // _COARSE) + bmin // _COARSE
        active = jnp.logical_and(
            cm3[co * n_hc + c] > _tab(5, k), nfound[0, 0] < float(tw * lc)
        )

        @pl.when(active)
        def _():
            @pl.when(jnp.logical_and(lastk[0, 0] != k - 1, k > 0))
            def _():
                pdiff[:] = _warp_k((dch, dch + 1), k - 1)[0] - _tab(5, k - 1)

            tex = _warp_k((dch, dch + 1), k)[0]
            diff = tex - _tab(5, k)
            crossed = jnp.logical_and(kstar[:] < -0.5, diff > 0.0)
            cnt = jnp.sum(crossed.astype(jnp.float32))
            kstar[:] = jnp.where(crossed, jnp.float32(k), kstar[:])
            pdiffc[:] = jnp.where(crossed, pdiff[:], pdiffc[:])
            diffc[:] = jnp.where(crossed, diff, diffc[:])
            crossflag[k] = cnt
            nfound[0, 0] = nfound[0, 0] + cnt
            pdiff[:] = diff
            lastk[0, 0] = k

        return 0

    # bounded plane loop (exact — see ops/pallas/sweep_march.py): before
    # k_lo the skip test provably fails; at khi-1 the sliding-window MIN
    # is strictly in front so every remaining pixel crosses
    k_lo = klo_t[(p * nb + b) * n_hc + c]
    k_hi = khi_t[(p * nb + b) * n_hc + c]
    jax.lax.fori_loop(k_lo, k_hi, pass1, 0)

    # secant parameter from the frozen bracket (k* == 0 snaps to t = 1)
    t = jnp.clip(
        pdiffc[:] / jnp.minimum(pdiffc[:] - diffc[:], -1e-12), 0.0, 1.0
    )
    t = jnp.where(kstar[:] == 0.0, jnp.ones_like(t), t)
    found = (kstar[:] > -0.5).astype(jnp.float32)
    out_ref[0, oc - 1] = found
    lastk[0, 0] = -5

    def _refined_s(k, km1):
        """Sub-bracket mini-sweep: refine interior warps at exactly
        lerped tables (all entries affine in invz)."""
        if refine == 0:
            return t
        tk = [_tab(ch, k) for ch in range(4)]
        tk1 = [_tab(ch, km1) for ch in range(4)]
        thk, thk1 = _tab(5, k), _tab(5, km1)
        step = 1.0 / (refine + 1)
        slo = jnp.zeros((tw, lc), jnp.float32)
        pd2 = pdiffc[:]
        d2 = diffc[:]
        sfound = jnp.zeros((tw, lc), bool)
        prev_g = pdiffc[:]
        prev_s = 0.0
        for j in range(1, refine + 1):
            s = j * step
            g = _warp_of(
                (dch, dch + 1),
                tk1[0] + s * (tk[0] - tk1[0]),
                tk1[1] + s * (tk[1] - tk1[1]),
                tk1[2] + s * (tk[2] - tk1[2]),
                tk1[3] + s * (tk[3] - tk1[3]),
            )[0] - (thk1 + s * (thk - thk1))
            csub = jnp.logical_and(~sfound, g > 0.0)
            slo = jnp.where(csub, prev_s, slo)
            pd2 = jnp.where(csub, prev_g, pd2)
            d2 = jnp.where(csub, g, d2)
            sfound = jnp.logical_or(sfound, csub)
            prev_g = g
            prev_s = s
        slo = jnp.where(sfound, slo, prev_s)
        pd2 = jnp.where(sfound, pd2, prev_g)
        t2 = jnp.clip(pd2 / jnp.minimum(pd2 - d2, -1e-12), 0.0, 1.0)
        s_star = slo + step * t2
        return jnp.where(kstar[:] == 0.0, jnp.ones_like(s_star), s_star)

    def pass2(k, _):
        @pl.when(crossflag[k] > 0.0)
        def _():
            sel = kstar[:] == jnp.float32(k)
            km1 = jnp.maximum(k - 1, 0)
            izk = _tab(4, k)
            prev_iz = _tab(4, km1)
            s_star = _refined_s(k, km1)
            iz_c = prev_iz + s_star * (izk - prev_iz)
            out_ref[0, oc - 2] = jnp.where(sel, iz_c, out_ref[0, oc - 2])

            if not depth_only:

                @pl.when(lastk[0, 0] != k - 1)
                def _():
                    prgba[:] = _warp_k((0, 4), km1)

                rgba = _warp_k((0, 4), k)
                rgba_c = prgba[:] + s_star[None] * (rgba - prgba[:])
                out_ref[0, 0:4] = jnp.where(
                    sel[None], rgba_c, out_ref[0, 0:4]
                )
                prgba[:] = rgba
                lastk[0, 0] = k

        return 0

    # same bounds: crossings exist only at planes pass1 visited
    jax.lax.fori_loop(k_lo, k_hi, pass2, 0)


def _build_cm3(plan: ScaledPlan, src_t, reduce=jnp.max):
    """Sliding-window max (or min, for the bounded-loop tail test) of
    the (padded) source disparity: cm3[co, c] bounds every texel a plane
    slab based at coarse cell co in band co//(tw/8), y-chunk c can read
    (x: the slab's twx sublanes + one cell of base slack; y: the full
    (ky_lo+1+ky_hi)-chunk window)."""
    wp, hp = src_t.shape[1], src_t.shape[2]
    ncells = wp // _COARSE
    nchunk = hp // _LC
    cmax = reduce(
        src_t[-1].reshape(ncells, _COARSE, nchunk, _LC), axis=(1, 3)
    )
    # y: each kernel window covers chunks [c, c + ky_lo + ky_hi]
    yspan = plan.ky_lo + 1 + plan.ky_hi
    cpad = jnp.pad(cmax, ((0, 0), (0, yspan - 1)), mode="edge")
    cm2 = reduce(jnp.stack(
        [cpad[:, i : i + nchunk] for i in range(yspan)], axis=0
    ), axis=0)
    # x: slab reach from the base cell
    span = plan.twx // _COARSE + 2
    xpad = jnp.pad(cm2, ((0, span - 1), (0, 0)), mode="edge")
    return reduce(jnp.stack(
        [xpad[i : i + ncells] for i in range(span)], axis=0
    ), axis=0)  # (ncells, Hc)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "num_planes", "batch", "refine", "depth_only",
                     "interpret"),
)
def _sweep_scaled(
    src_t,  # (C, Wp, Hp) padded transposed stack
    tabs,  # (B, 6, K) f32 per-pose tables
    plan: ScaledPlan,
    num_planes: int,
    batch: int,
    refine: int = 0,
    depth_only: bool = False,
    interpret: bool = False,
):
    w = plan.out_w
    tw, lc = plan.tw, _LC
    hp = plan.hp_out
    cm3 = _build_cm3(plan, src_t)
    oc = 2 if depth_only else 6
    nch = 1 if depth_only else 5

    # bounded-loop tables (exact; see the kernel comment and the lateral
    # kernel's twin): replicate pass1's skip-index math over (B, K, nb)
    # and scan for the first plane whose sliding-MAX test passes (k_lo)
    # and the first whose sliding-MIN is strictly in front (k_hi - 1)
    cmin3 = _build_cm3(plan, src_t, reduce=jnp.min)
    nb = w // tw
    cx0 = (plan.out_w - 1) / 2.0
    x0f_b = jnp.arange(nb, dtype=jnp.float32) * tw - cx0  # (nb,)
    plx = float(plan.pad_lo_x)
    spanx = float(plan.tab_span_x)
    tx_t = tabs[:, 0, :]  # (B, K)
    ex_t = tabs[:, 1, :]
    thr_t = tabs[:, 5, :]
    dxa = jnp.clip(
        tx_t[:, :, None] + ex_t[:, :, None] * x0f_b[None, None, :] + plx,
        0.0, spanx,
    )
    dxb = jnp.clip(
        tx_t[:, :, None]
        + ex_t[:, :, None] * (x0f_b + tw - 1)[None, None, :] + plx,
        0.0, spanx,
    )
    bmin = jnp.floor(jnp.minimum(dxa, dxb)).astype(jnp.int32)  # (B, K, nb)
    band_cell = jnp.arange(nb, dtype=jnp.int32) * (tw // _COARSE)
    co_all = band_cell[None, None, :] + bmin // _COARSE
    # conservative by construction: this twin RECOMPUTES the kernel's
    # f32 skip-index math (FMA contraction can flip a floor() by one
    # cell at razor-edge values), so the scan ORs/ANDs over the
    # {co-1, co, co+1} cell neighborhood and widens the plane range by
    # one on each side; HAT_FIN_SCALE/FIN_EPS keep the k_hi crossing
    # guarantee sound against the kernel's clipped-hat weight
    # attenuation (the warp is AFFINE in the pixel index, so band-edge
    # mins bound interior positions and only expression rounding
    # remains — see bounds.py)
    thr_e = thr_t[:, :, None, None]
    klo_t, khi_t = plane_loop_bounds(
        co_all, thr_e, num_planes,
        gather_max=lambda c: cm3[c],      # (B, K, nb) -> (B, K, nb, Hc)
        gather_min=lambda c: cmin3[c],
        ncells=cm3.shape[0],
        neighborhood=(-1, 0, 1),
        widen=1,
        fin_scale=HAT_FIN_SCALE,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(w // tw, hp // lc, batch),
        in_specs=[
            pl.BlockSpec(
                (1, 6, tabs.shape[2]),
                lambda b, c, p, *_: (p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, oc, tw, lc),
            lambda b, c, p, *_: (p, 0, b, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nch, plan.bw, plan.ylen), jnp.float32),
            pltpu.VMEM((plan.ylen, tw), jnp.float32),  # tsp
            pltpu.VMEM((tw, lc), jnp.float32),  # pdiff
            pltpu.VMEM((tw, lc), jnp.float32),  # kstar
            pltpu.VMEM((tw, lc), jnp.float32),  # pdiffc
            pltpu.VMEM((tw, lc), jnp.float32),  # diffc
            pltpu.VMEM((4, tw, lc), jnp.float32),  # prgba
            pltpu.SMEM((num_planes,), jnp.float32),  # crossflag
            pltpu.SMEM((1, 1), jnp.int32),  # lastk
            pltpu.SMEM((1, 1), jnp.float32),  # nfound
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, plan=plan, num_planes=num_planes, refine=refine,
        depth_only=depth_only,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, oc, w, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cm3.reshape(-1), klo_t.reshape(-1), khi_t.reshape(-1), tabs, src_t)
    # back to image orientation, drop lane padding
    out = out[:, :, :, : plan.out_h].transpose(0, 1, 3, 2)  # (B, oc, H, W)
    if depth_only:
        return out[:, 1], out[:, 0]  # found, invz_star
    return out[:, 5], out[:, 4], out[:, 0:4].transpose(0, 2, 3, 1)


def _tables_batch(plan, plane_invz, c1_b, f1, fr, izmin, izmax,
                  dx_user, dy_user, batch, num_planes):
    invz = jnp.asarray(plane_invz, jnp.float32)
    if invz.ndim == 1:
        invz = jnp.broadcast_to(invz, (batch, invz.shape[0]))
    tx, ex, ty, ey = jax.vmap(
        lambda cc, pp: scaled_tables(plan, pp, cc, f1, fr,
                                     dx_user=dx_user, dy_user=dy_user)
    )(jnp.asarray(c1_b, jnp.float32), invz)
    izmin = jnp.asarray(izmin, jnp.float32)
    izmax = jnp.asarray(izmax, jnp.float32)
    tkt = (invz - izmax) / (izmin - izmax)
    return jnp.stack([tx, ex, ty, ey, invz, tkt], axis=1), invz


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "mask_mode", "to_srgb", "refine", "raw",
        "crop_y", "depth_only", "interpret",
    ),
)
def render_scaled_batch_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    c1_b,  # (B, 3)
    f1,
    fr,
    plane_invz,
    background,
    plan: ScaledPlan,
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    refine: int = 0,
    raw: bool = False,
    dx_user: float = 0.0,
    dy_user: float = 0.0,
    crop_y: int = 0,
    depth_only: bool = False,
    interpret: bool = False,
):
    """Batched scaled march on TPU: ONE kernel launch for the pose batch.
    Returns (B, H, W, 4), raw tuples, or (found, invz) when depth_only."""
    c1_b = jnp.asarray(c1_b, jnp.float32)
    batch = c1_b.shape[0]
    tabs, invz = _tables_batch(
        plan, plane_invz, c1_b, f1, fr, invz_min, invz_max,
        dx_user, dy_user, batch, num_planes,
    )
    src_t = _pad_stack(plan, rgb, disp, mask)
    if depth_only:
        src_t = src_t[4:5]
    out = _sweep_scaled(
        src_t, tabs, plan=plan, num_planes=num_planes, batch=batch,
        refine=refine, depth_only=depth_only, interpret=interpret,
    )
    if depth_only:
        return out
    found, rstar, rgba_star = out
    return jax.vmap(
        lambda f, r, rg, cc: finalize_scaled(
            plan, f, r, rg, cc, f1, fr, background, feathering,
            mask_mode, to_srgb, raw=raw, dx_user=dx_user, dy_user=dy_user,
            crop_y=crop_y,
        )
    )(found, rstar, rgba_star, c1_b)


def render_scaled_pallas(
    rgb, disp, mask, invz_min, invz_max, c1, f1, fr, plane_invz,
    background, plan: ScaledPlan, num_planes: int, **kw,
):
    """Single-pose wrapper: a batch of 1 through the batched kernel."""
    out = render_scaled_batch_pallas(
        rgb, disp, mask, invz_min, invz_max,
        jnp.asarray(c1, jnp.float32)[None], f1, fr, plane_invz,
        background, plan=plan, num_planes=num_planes, **kw,
    )
    if isinstance(out, tuple):
        return tuple(o[0] for o in out)
    return out[0]
