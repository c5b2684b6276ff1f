"""Pallas TPU kernel: the gather-free TARGET-RAY first-crossing march.

Production implementation of ops/sweep_target.py (reference semantics:
src/shaders/rayCastMonoLDI.glsl:219-297 — the per-target-pixel march for
ANY relative pose in the yaw family). Unlike the lateral / scaled
kernels, the source position of an output pixel is affine in invz with
PER-ELEMENT coefficients (the rotation homography):

    X(p, v) = AX(p) + v * DX(p)      (y-independent for yaw: the gate)
    Y(p, v) = AY(p) + v * DY(p)      (full 2-D field)

Layout (v2, grouped bands). Each program serves _G = 16 bands of
_TW = 8 target columns — 128 output columns x 128 rows — so the
transposed y-stage and ALL crossing state run at full 128-lane width
(the v1 per-band layout used 8 of 128 lanes and measured 4.1 fps on
the SFMoMA orbit; the group layout is the production shape).

  * x-stage (source x on sublanes), per band: 8-aligned dynamic slice
    of the resident window + dynamic sublane roll (_TWX = 32 sublanes
    = 4 tiles — `tpu.dynamic_rotate` silently miscompiles on
    non-power-of-two tile counts on this toolchain, probed in
    scratch/probe_roll3.py) + a class-switched DIAGONAL hat sum
    (candidates ride the target column, slab[o + j], the scaled
    kernel's slide — the candidate count tracks only the local
    |scale - 1| deviation, not the band footprint). The 16 bands'
    collapses land in one (128, ylen) scratch.
  * one transpose per (plane, channel) moves the group slab to the
    y-on-sublanes layout; candidate source rows SLIDE with the target
    row (slaby[o + i]). Weights are full (lc, 128) fields. The y range
    is SLICED per plane (v4): the slab read covers only _YS1 = 384
    lanes at a 128-aligned dynamic base around the plane's group-shared
    slide base `bym`, the residual is folded by ONE dynamic lane roll
    of the x-collapsed slab (pow2-padded to _XAP lanes — lane
    dynamic_rotate is only sound on power-of-two tile counts, probed
    in scratch/probe_laneroll.py), and only _YS2 = 256 rows are
    transposed. The y-stage consumes at most lc + nyc + 2 < 256 rows,
    so transposing `ylen` (512+ on pose-batch unions) was 2x wasted
    transpose work — measured 20.3 -> 20.0 ms/frame wall on the
    config1 orbit (the transpose is no longer dominant after the
    occupancy skip; kept because it also frees VMEM: the pow2 tsp
    scratch is gone).
  * crossing state lives in the TRANSPOSED (lc, 128) layout end to
    end; the six output channels transpose back once per tile.

Work avoidance mirrors the proven kernels (ops/pallas/sweep_march.py):
texel-space pass 1, crossing-flagged pass 2 for colors, a conservative
group-span coarse-max skip table, bracket refresh after skip runs,
early-out when every pixel crossed, and the pose axis innermost over
one resident source window per (group, chunk) — the window origin
tables are the POSE-BATCH UNION, so the window stays pose-invariant
and is DMA'd once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sweep_target import _G, _LC, _TW, TargetPlan, finalize_target
from .bounds import HAT_FIN_SCALE, plane_loop_bounds

__all__ = ["render_target_batch_pallas"]

_COARSE = 8  # skip-table cell width in source x
_TWX = 32  # x-stage slab sublanes (4 tiles: dynamic roll safe)
_GW = _G * _TW  # output columns per program (= lane width)
_YS1 = 384  # x-stage lane window per plane (3 lane tiles)
_YS2 = 256  # transposed slab rows consumed by the y-stage


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def _classes(nmax, start=2):
    ns, n = [], start
    while n < nmax:
        ns.append(n)
        n *= 2
    ns.append(nmax)
    return ns


def _kernel(
    xlo,  # (ng,) i32 scalar prefetch: per-group window x origin (padded)
    ylo,  # (ng * nc,) i32: per-(group, chunk) window y origin — this and
    #     the next three are FLATTENED: SMEM pads a multi-dim prefetch
    #     operand's last dim to 128 (1-D only to 512 elements), an ~18x
    #     blowup for nc=7 that would cap the pose batch
    cm3,  # (ncellx * nc,) f32: sliding disp max over plan.gspan cells
    occ2,  # (ncellx * nc * 2,) i32: 64-bucket VALUE-INTERVAL occupancy
    #     bitmask (2 words/cell) over the same sliding region — bit b is
    #     set iff some 2x2 texel patch's [min, max] hull intersects
    #     bucket [b/64, (b+1)/64). A first crossing at plane k forces a
    #     continuous interpolated-value path through [thr_k, thr_{k-1}]
    #     (intermediate-value theorem on the march segment; bilinear
    #     values live in patch hulls), so a plane whose threshold
    #     interval hits no occupied bucket cannot host one. Unlike the
    #     max test, this prunes planes BETWEEN surfaces: measured 284 ->
    #     173 active planes/program on the config1 orbit
    #     (scratch/prof4d.py)
    klo_t,  # (B * ng * nc,) i32: first plane whose skip test can pass
    khi_t,  # (B * ng * nc,) i32: exclusive end (window MIN in front)
    pose_ref,  # (1, 1, 16) SMEM pose scalars: p_ts row-major, c_vec
    vt_ref,  # (1, 2, K) SMEM: plane invz (desc) + texel thresholds
    src_hbm,  # (C, Wp, Hp) f32 ANY — r,g,b,mask,disp (C=5) or disp (C=1)
    out_ref,  # (1, oc, GW, lc) VMEM out block (oc=6, or 2 depth_only)
    blk,  # (C, bw, ylen) f32 VMEM scratch: resident source window
    xa16,  # (GW, xap) f32 VMEM scratch: group x-collapsed slab, lanes
    #     [0, ys1) live, [ys1, xap) zeroed (pow2 pad for the lane roll)
    pdiff,  # (lc, GW) f32 scratch — ALL state in TRANSPOSED layout
    kstar,  # (lc, GW) f32
    pdiffc,  # (lc, GW) f32
    diffc,  # (lc, GW) f32
    izout,  # (lc, GW) f32
    cout,  # (4, lc, GW) f32
    prgba,  # (4, lc, GW) f32
    crossflag,  # (K,) f32 SMEM
    lastk,  # (1, 1) i32 SMEM
    nfound,  # (1, 1) f32 SMEM
    sem,
    *,
    plan: TargetPlan,
    num_planes: int,
    refine: int,
    ys1: int,
    xap: int,
    depth_only: bool = False,
):
    tw, lc, gwd = _TW, _LC, _GW
    bw, ylen = plan.bw, plan.ylen
    n_ng = plan.out_w // _GW  # static strides of the flattened SMEM tables
    n_nc = plan.hp_out // _LC
    # depth_only: the window carries ONLY the disp channel (the fetch
    # path reads colors with one exact bilinear gather outside the
    # kernel), so the resident-window DMA and VMEM are 1/5 of the
    # full-color mode's — same trick as ops/pallas/sweep_scaled.py
    dch = 0 if depth_only else 4
    g = pl.program_id(0)
    c = pl.program_id(1)
    p = pl.program_id(2)
    cp = pltpu.make_async_copy(
        src_hbm.at[
            :,
            pl.ds(pl.multiple_of(xlo[g], 8), bw),
            pl.ds(pl.multiple_of(ylo[g * n_nc + c], 128), ylen),
        ],
        blk, sem,
    )

    @pl.when(p == 0)
    def _():
        cp.start()

    if xap > ys1:
        # pad lanes are never written by the x-stage; zero them so
        # 0-weight candidates can't multiply uninitialized NaN patterns
        # (they can rotate into the consumed [:_YS2] slice, always at
        # zero-weight rows — see the roll-coverage argument in _warp)
        xa16[:, ys1:xap] = jnp.zeros((gwd, xap - ys1), jnp.float32)
    pdiff[:] = jnp.zeros((lc, gwd), jnp.float32)
    kstar[:] = jnp.full((lc, gwd), -1.0, jnp.float32)
    pdiffc[:] = jnp.zeros((lc, gwd), jnp.float32)
    diffc[:] = jnp.full((lc, gwd), -1.0, jnp.float32)
    izout[:] = jnp.zeros((lc, gwd), jnp.float32)
    cout[:] = jnp.zeros(cout.shape, jnp.float32)
    lastk[0, 0] = -1
    nfound[0, 0] = 0.0

    @pl.when(p == 0)
    def _():
        cp.wait()

    # ---- per-tile pose fields (from SMEM scalars) ----
    p00, p01, p02 = pose_ref[0, 0, 0], pose_ref[0, 0, 1], pose_ref[0, 0, 2]
    p10, p11, p12 = pose_ref[0, 0, 3], pose_ref[0, 0, 4], pose_ref[0, 0, 5]
    p20, p21, p22 = pose_ref[0, 0, 6], pose_ref[0, 0, 7], pose_ref[0, 0, 8]
    cv0, cv1, cv2 = pose_ref[0, 0, 9], pose_ref[0, 0, 10], pose_ref[0, 0, 11]
    w_out, h_out = float(plan.out_w), float(plan.out_h)
    w_src, h_src = float(plan.src_w), float(plan.src_h)

    xg0 = (g * gwd).astype(jnp.float32)
    yg0 = (c * lc).astype(jnp.float32)
    syc = (yg0 + lc / 2.0 + 0.5) / h_out - 0.5  # chunk-center row

    def _qxy(sx, sy):
        den = p20 * sx + p21 * sy + p22
        return (
            (p00 * sx + p01 * sy + p02) / den,
            (p10 * sx + p11 * sy + p12) / den,
        )

    xoff = (float(plan.pad_x) - xlo[g]).astype(jnp.float32)
    yoff = (float(plan.pad_y) - ylo[g * n_nc + c]).astype(jnp.float32)

    # x fields, (GW, 1), window-relative, DIAGONAL (minus the local
    # sublane index): weight of slab row o + j for column j is
    # hat((pos(j) - j) - bmin - o)
    jv = jax.lax.broadcasted_iota(jnp.int32, (gwd, 1), 0)
    jmod = (jv - (jv // tw) * tw).astype(jnp.float32)
    jvf = jv.astype(jnp.float32)
    sxv = (xg0 + jvf + 0.5) / w_out - 0.5
    qxv, _ = _qxy(sxv, syc)
    adg = (qxv + 0.5) * w_src - 0.5 + xoff - jmod
    dxv = (cv0 - cv2 * qxv) * w_src

    # y fields, TRANSPOSED (lc, GW), slide-relative (candidate rows ride
    # +i): relT = AY - i, window-relative
    ivT = jax.lax.broadcasted_iota(jnp.int32, (lc, 1), 0).astype(jnp.float32)
    jvT = jax.lax.broadcasted_iota(jnp.int32, (lc, gwd), 1).astype(
        jnp.float32
    )
    syT = (yg0 + ivT + 0.5) / h_out - 0.5
    sxT = (xg0 + jvT + 0.5) / w_out - 0.5
    _, qyT = _qxy(sxT, syT)
    ayT = (qyT + 0.5) * h_src - 0.5 + yoff
    dyT = (cv1 - cv2 * qyT) * h_src
    relT = ayT - ivT

    # per-band diag-extreme scalars (j = 0 and j = tw - 1; the diag is a
    # homography chord across 8 columns — interior curvature is far
    # below the plan's +3 slack)
    a0s, d0s, a7s, d7s = [], [], [], []
    for gi in range(_G):
        for jl in (0.0, float(tw - 1)):
            sxe = (xg0 + gi * tw + jl + 0.5) / w_out - 0.5
            qx_e, _ = _qxy(sxe, syc)
            a_e = (qx_e + 0.5) * w_src - 0.5 + xoff - jl
            d_e = (cv0 - cv2 * qx_e) * w_src
            if jl == 0.0:
                a0s.append(a_e)
                d0s.append(d_e)
            else:
                a7s.append(a_e)
                d7s.append(d_e)
    # group x-extent scalars for the skip test (group edges: X monotone)
    sx_gl = (xg0 + 0.5) / w_out - 0.5
    sx_gr = (xg0 + gwd - 1 + 0.5) / w_out - 0.5
    qx_gl, _ = _qxy(sx_gl, syc)
    qx_gr, _ = _qxy(sx_gr, syc)
    ax_gl = (qx_gl + 0.5) * w_src - 0.5 + xoff
    ax_gr = (qx_gr + 0.5) * w_src - 0.5 + xoff
    dx_gl = (cv0 - cv2 * qx_gl) * w_src
    dx_gr = (cv0 - cv2 * qx_gr) * w_src

    # y corner scalars (slide-relative rel = AY - i, and DY) at the 4
    # GROUP-tile corners; per-plane bounds take min/max per TERM
    # (conservative: rel and DY are each corner-extremal, their sum is
    # bounded by the sum of bounds since v > 0)
    y_last = jnp.minimum(yg0 + lc - 1, h_out - 1.0)
    r_cs, d_cs = [], []
    for sxe_v in (sx_gl, sx_gr):
        for yg in (yg0, y_last):
            sye = (yg + 0.5) / h_out - 0.5
            _, qy_c = _qxy(sxe_v, sye)
            r_cs.append((qy_c + 0.5) * h_src - 0.5 + yoff - (yg - yg0))
            d_cs.append((cv1 - cv2 * qy_c) * h_src)
    r_min = jnp.minimum(jnp.minimum(r_cs[0], r_cs[1]),
                        jnp.minimum(r_cs[2], r_cs[3]))
    r_max = jnp.maximum(jnp.maximum(r_cs[0], r_cs[1]),
                        jnp.maximum(r_cs[2], r_cs[3]))
    d_min = jnp.minimum(jnp.minimum(d_cs[0], d_cs[1]),
                        jnp.minimum(d_cs[2], d_cs[3]))
    d_max = jnp.maximum(jnp.maximum(d_cs[0], d_cs[1]),
                        jnp.maximum(d_cs[2], d_cs[3]))

    xcls = _classes(plan.nxc)
    ycls = _classes(plan.nyc, start=4)

    def _cls_idx(span, classes):
        idx = jnp.int32(len(classes) - 1)
        for i in range(len(classes) - 2, -1, -1):
            idx = jnp.where(span <= float(classes[i]), jnp.int32(i), idx)
        return idx

    def _bases(v):
        """Per-plane scalar geometry: per-band slab bases/residuals, the
        shared x class, and the group-shared y slide base/class."""
        bmins, o8s, rrs = [], [], []
        span_x = jnp.float32(0.0)
        for gi in range(_G):
            da = a0s[gi] + v * d0s[gi]
            db = a7s[gi] + v * d7s[gi]
            lo_s = jnp.clip(jnp.minimum(da, db), 0.0, float(bw - 2))
            hi_s = jnp.clip(jnp.maximum(da, db), 0.0, float(bw - 2))
            bm = jnp.floor(lo_s).astype(jnp.int32)
            span_x = jnp.maximum(span_x, hi_s - lo_s)
            o8 = pl.multiple_of(
                jnp.clip((bm // 8) * 8, 0, bw - _TWX), 8
            )
            bmins.append(bm)
            o8s.append(o8)
            rrs.append(bm - o8)
        rlo = jnp.clip(r_min + v * d_min, 0.0, float(ylen - 2))
        rhi = jnp.clip(r_max + v * d_max, 0.0, float(ylen - 2))
        bym = jnp.floor(rlo).astype(jnp.int32)
        span_y = (jnp.ceil(rhi).astype(jnp.int32) - bym + 2).astype(
            jnp.float32
        )
        # 128-aligned lane base of the plane's y window: all real reads
        # live in window rows [bym, rhi + 1] subset of [ybase, ybase + ys1)
        # (unclipped: bym - ybase <= 127 and spans cap at nyc <= 80;
        # clipped: ybase = ylen - ys1 so the window top is covered)
        ybase = pl.multiple_of(
            jnp.clip((bym // 128) * 128, 0, ylen - ys1), 128
        )
        ic_x = _cls_idx(span_x + 3.0, xcls)
        return bmins, o8s, rrs, ic_x, bym, _cls_idx(span_y, ycls), ybase

    def _warp(chans, v, bases):
        """Separable hat-collapse of window channels [lo, hi) at plane
        invz v. Returns (hi-lo, lc, GW) TRANSPOSED values."""
        bmins, o8s, rrs, ic_x, bym, ic_y, ybase = bases
        lo_c, hi_c = chans
        # positions relative to bym, which the lane roll moves to row 0
        yq = jnp.clip(
            relT + v * dyT - bym.astype(jnp.float32), -1.0,
            float(_YS2 - lc),
        )  # (lc, GW)
        rr_y = bym - ybase  # lane-roll residual, in [0, ys1 - 2]
        outs = []
        for ch in range(lo_c, hi_c):

            def _xbody(n):
                def body():
                    for gi in range(_G):
                        slab = blk[
                            ch, pl.ds(o8s[gi], _TWX), pl.ds(ybase, ys1)
                        ]
                        slab = pltpu.roll(slab, -rrs[gi], 0)  # 4 tiles
                        qxd = jnp.clip(
                            adg[gi * tw : (gi + 1) * tw]
                            + v * dxv[gi * tw : (gi + 1) * tw]
                            - bmins[gi].astype(jnp.float32),
                            -1.0, float(_TWX - tw),
                        )  # (tw, 1)
                        xa = jnp.zeros((tw, ys1), jnp.float32)
                        for o in range(n):
                            w = jnp.maximum(
                                0.0, 1.0 - jnp.abs(qxd - float(o))
                            )
                            xa = xa + w * slab[o : o + tw, :]
                        xa16[gi * tw : (gi + 1) * tw, 0:ys1] = xa
                    return 0

                return body

            jax.lax.switch(ic_x, [_xbody(n) for n in xcls])
            # one dynamic LANE roll (xap lanes: pow2 tile count, sound)
            # moves window row bym to lane 0; only the _YS2 rows the
            # y-stage can consume are transposed. Real (nonzero-weight)
            # reads are rows [bym, rhi + 1] -> rolled rows [0, span + 1]
            # with span <= nyc < _YS2 - lc; rows that wrap past the pad
            # carry zero hat weight and the pad lanes are zeroed, so no
            # NaN can propagate through a 0-weight tap.
            slaby = pltpu.roll(xa16[:], -rr_y, 1)[:, :_YS2].T

            def _ybody(n, slaby=slaby):
                def body():
                    ya = jnp.zeros((lc, gwd), jnp.float32)
                    for o in range(n):
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(yq - float(o)))
                        ya = ya + w * slaby[o : o + lc, :]
                    return ya

                return body

            outs.append(jax.lax.switch(ic_y, [_ybody(n) for n in ycls]))
        return jnp.stack(outs) if len(outs) > 1 else outs[0][None]

    def _tab(ch, k):
        return vt_ref[0, ch, k]

    def _bits_below(n):
        # i32 mask of the n low bits, n in [0, 32] (scalar)
        return jnp.where(
            n >= 32, jnp.int32(-1),
            (jnp.int32(1) << jnp.clip(n, 0, 31)) - jnp.int32(1),
        )

    def pass1(k, _):
        crossflag[k] = 0.0
        v = _tab(0, k)
        tk = _tab(1, k)
        # group-extent skip test: the coarse table's sliding span covers
        # every slab the plane's bands can read from this minimum cell
        gpa = ax_gl + v * dx_gl
        gpb = ax_gr + v * dx_gr
        gmin = jnp.clip(
            jnp.minimum(gpa, gpb) - 16.0, 0.0, float(bw - _TWX)
        ).astype(jnp.int32)
        co = (xlo[g] + gmin) // _COARSE
        # occupancy test: does any patch hull in the readable region
        # intersect (thr_k, thr_{k-1}]? Buckets widened one on each side
        # against f32 threshold/bucketing drift; the km1 top end uses
        # 2.0 at k == 0 (the dense oracle has no predecessor there).
        tk_prev = jnp.where(k > 0, _tab(1, jnp.maximum(k - 1, 0)),
                            jnp.float32(2.0))
        b0 = jnp.floor(tk * 64.0).astype(jnp.int32) - 1
        b1 = jnp.minimum(
            jnp.floor(tk_prev * 64.0).astype(jnp.int32) + 1, 63
        )
        cell2 = (co * n_nc + c) * 2
        m0 = _bits_below(jnp.clip(b1 + 1, 0, 32)) & ~_bits_below(
            jnp.clip(b0, 0, 32))
        m1 = _bits_below(jnp.clip(b1 - 31, 0, 32)) & ~_bits_below(
            jnp.clip(b0 - 32, 0, 32))
        occ_hit = ((occ2[cell2] & m0) | (occ2[cell2 + 1] & m1)) != 0
        active = jnp.logical_and(
            jnp.logical_and(cm3[co * n_nc + c] > tk, occ_hit),
            nfound[0, 0] < float(_GW * _LC),
        )

        @pl.when(active)
        def _():
            bases = _bases(v)

            # refresh the secant bracket if the previous plane was
            # skipped (results stay identical to the dense oracle)
            @pl.when(jnp.logical_and(lastk[0, 0] != k - 1, k > 0))
            def _():
                km1 = jnp.maximum(k - 1, 0)
                vm = _tab(0, km1)
                pdiff[:] = _warp((dch, dch + 1), vm, _bases(vm))[0] - _tab(1, km1)

            tex = _warp((dch, dch + 1), v, bases)[0]
            diff = tex - tk
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
    # k_lo the skip test provably fails (including the bucketed ladder's
    # padding planes, whose thresholds exceed every texel), and at khi-1
    # the sliding-window MIN is strictly in front so every remaining
    # pixel crosses
    k_lo = klo_t[(p * n_ng + g) * n_nc + c]
    k_hi = khi_t[(p * n_ng + g) * n_nc + c]
    jax.lax.fori_loop(k_lo, k_hi, pass1, 0)

    t = jnp.clip(
        pdiffc[:] / jnp.minimum(pdiffc[:] - diffc[:], -1e-12), 0.0, 1.0
    )
    t = jnp.where(kstar[:] == 0.0, jnp.ones_like(t), t)
    lastk[0, 0] = -5

    if depth_only:
        # the fetch path: colors come from ONE exact bilinear gather at
        # the solved position outside the kernel (sweep_target.
        # render_target_fetch_batch) — skip the per-plane color warps
        # entirely, but still write the secant-refined invz per pixel.
        # refine > 0 runs the in-bracket depth sub-sweep (sub-plane
        # positions are exact lerps — positions affine in invz), paid
        # only at flagged planes: it restores the dense ladder's depth
        # accuracy under a widened step_px grid (the orbit tier's
        # plane-count lever; matches render_target_xla's refine).
        def pass2d(k, _):
            @pl.when(crossflag[k] > 0.0)
            def _():
                sel = kstar[:] == jnp.float32(k)
                km1 = jnp.maximum(k - 1, 0)
                izk = _tab(0, k)
                prev_iz = _tab(0, km1)
                if refine == 0:
                    s_star = t
                else:
                    step = 1.0 / (refine + 1)
                    slo = jnp.zeros((lc, gwd), jnp.float32)
                    pd2 = pdiffc[:]
                    d2 = diffc[:]
                    sfound = jnp.zeros((lc, gwd), bool)
                    prev_g = pdiffc[:]
                    prev_s = 0.0
                    thk = _tab(1, k)
                    thk1 = _tab(1, km1)
                    for j in range(1, refine + 1):
                        s = j * step
                        vs = prev_iz + s * (izk - prev_iz)
                        g_ = _warp((dch, dch + 1), vs, _bases(vs))[0] - (
                            thk1 + s * (thk - thk1)
                        )
                        csub = jnp.logical_and(~sfound, g_ > 0.0)
                        slo = jnp.where(csub, prev_s, slo)
                        pd2 = jnp.where(csub, prev_g, pd2)
                        d2 = jnp.where(csub, g_, d2)
                        sfound = jnp.logical_or(sfound, csub)
                        prev_g = g_
                        prev_s = s
                    slo = jnp.where(sfound, slo, prev_s)
                    pd2 = jnp.where(sfound, pd2, prev_g)
                    t2 = jnp.clip(
                        pd2 / jnp.minimum(pd2 - d2, -1e-12), 0.0, 1.0
                    )
                    s_star = slo + step * t2
                    s_star = jnp.where(
                        kstar[:] == 0.0, jnp.ones_like(s_star), s_star
                    )
                iz_c = prev_iz + s_star * (izk - prev_iz)
                izout[:] = jnp.where(sel, iz_c, izout[:])

            return 0

        jax.lax.fori_loop(k_lo, k_hi, pass2d, 0)
        # 2-channel output block: [invz, found] — no color channels
        out_ref[0, 1] = (kstar[:] > -0.5).astype(jnp.float32).T
        out_ref[0, 0] = izout[:].T
        return

    def pass2(k, _):
        @pl.when(crossflag[k] > 0.0)
        def _():
            sel = kstar[:] == jnp.float32(k)
            km1 = jnp.maximum(k - 1, 0)
            izk = _tab(0, k)
            prev_iz = _tab(0, km1)

            if refine == 0:
                s_star = t
            else:
                # in-bracket mini-sweep at exactly-lerped invz
                # (positions are affine in v: sub-plane warps are exact)
                step = 1.0 / (refine + 1)
                slo = jnp.zeros((lc, gwd), jnp.float32)
                pd2 = pdiffc[:]
                d2 = diffc[:]
                sfound = jnp.zeros((lc, gwd), bool)
                prev_g = pdiffc[:]
                prev_s = 0.0
                thk = _tab(1, k)
                thk1 = _tab(1, km1)
                for j in range(1, refine + 1):
                    s = j * step
                    vs = prev_iz + s * (izk - prev_iz)
                    g_ = _warp((dch, dch + 1), vs, _bases(vs))[0] - (
                        thk1 + s * (thk - thk1)
                    )
                    csub = jnp.logical_and(~sfound, g_ > 0.0)
                    slo = jnp.where(csub, prev_s, slo)
                    pd2 = jnp.where(csub, prev_g, pd2)
                    d2 = jnp.where(csub, g_, d2)
                    sfound = jnp.logical_or(sfound, csub)
                    prev_g = g_
                    prev_s = s
                slo = jnp.where(sfound, slo, prev_s)
                pd2 = jnp.where(sfound, pd2, prev_g)
                t2 = jnp.clip(
                    pd2 / jnp.minimum(pd2 - d2, -1e-12), 0.0, 1.0
                )
                s_star = slo + step * t2
                s_star = jnp.where(
                    kstar[:] == 0.0, jnp.ones_like(s_star), s_star
                )

            iz_c = prev_iz + s_star * (izk - prev_iz)
            izout[:] = jnp.where(sel, iz_c, izout[:])

            @pl.when(lastk[0, 0] != k - 1)
            def _():
                prgba[:] = _warp((0, 4), _tab(0, km1), _bases(_tab(0, km1)))

            rgba = _warp((0, 4), izk, _bases(izk))
            rgba_c = prgba[:] + s_star[None] * (rgba - prgba[:])
            cout[:] = jnp.where(sel[None], rgba_c, cout[:])
            prgba[:] = rgba
            lastk[0, 0] = k

        return 0

    # same bounds: crossings exist only at planes pass1 visited
    jax.lax.fori_loop(k_lo, k_hi, pass2, 0)

    out_ref[0, 5] = (kstar[:] > -0.5).astype(jnp.float32).T
    out_ref[0, 4] = izout[:].T
    for ch in range(4):
        out_ref[0, ch] = cout[ch].T


def _build_cm3(plan: TargetPlan, src_t, nc, reduce=jnp.max):
    """Sliding disp max (or min, for the bounded-loop tail test):
    cm3[cellx, c] bounds every texel a plane can read while serving
    y-chunk c, for any slab whose group-minimum base lands in 8-px
    source cell `cellx` (sliding span = plan.gspan cells; the y range is
    the exact union of the chunk's window table)."""
    wp, hp = src_t.shape[1], src_t.shape[2]
    ncellx = wp // _COARSE
    cmax_cell = reduce(src_t[-1].reshape(ncellx, _COARSE, hp), axis=1)
    ys = []
    for ci in range(nc):
        lo, hi = plan.cm_ylims[ci]
        lo = max(0, min(lo, hp))
        hi = max(lo + 1, min(hi, hp))
        ys.append(reduce(cmax_cell[:, lo:hi], axis=1))
    cm2 = jnp.stack(ys, axis=1)  # (ncellx, nc)
    span = plan.gspan
    xpad = jnp.pad(cm2, ((0, span - 1), (0, 0)), mode="edge")
    return reduce(jnp.stack(
        [xpad[i : i + ncellx] for i in range(span)], axis=0
    ), axis=0)


def _or_reduce(x, axis):
    return jax.lax.reduce(x, np.int32(0), jax.lax.bitwise_or, (axis,))


def _build_occ2(plan: TargetPlan, src_t, nc):
    """64-bucket value-interval occupancy bitmask per (8-px cell, chunk),
    sliding-OR over the same plan.gspan / cm_ylims region as _build_cm3.
    Bit b of the 2-word mask is set iff some 2x2 texel patch's
    [min, max] hull in the region intersects [b/64, (b+1)/64) — the
    kernel's interval skip test (see the occ2 arg comment)."""
    dsp = src_t[-1]
    wp, hp = dsp.shape
    ncellx = wp // _COARSE
    pmx = jnp.maximum(
        jnp.maximum(dsp[:-1, :-1], dsp[1:, :-1]),
        jnp.maximum(dsp[:-1, 1:], dsp[1:, 1:]),
    )
    pmn = jnp.minimum(
        jnp.minimum(dsp[:-1, :-1], dsp[1:, :-1]),
        jnp.minimum(dsp[:-1, 1:], dsp[1:, 1:]),
    )
    pmx = jnp.pad(pmx, ((0, 1), (0, 1)), mode="edge")
    pmn = jnp.pad(pmn, ((0, 1), (0, 1)), mode="edge")
    blo = jnp.clip(jnp.floor(pmn * 64.0), 0, 63).astype(jnp.int32)
    bhi = jnp.clip(jnp.floor(pmx * 64.0), 0, 63).astype(jnp.int32)

    def below(n):  # elementwise i32 mask of the n low bits, n in [0, 32]
        return jnp.where(
            n >= 32, jnp.int32(-1),
            (jnp.int32(1) << jnp.clip(n, 0, 31)) - jnp.int32(1),
        )

    w0 = below(jnp.clip(bhi + 1, 0, 32)) & ~below(jnp.clip(blo, 0, 32))
    w1 = below(jnp.clip(bhi - 31, 0, 32)) & ~below(
        jnp.clip(blo - 32, 0, 32))
    words = jnp.stack([w0, w1], axis=-1)  # (Wp, Hp, 2)
    cellw = _or_reduce(
        words.reshape(ncellx, _COARSE, hp, 2), 1
    )  # (ncellx, hp, 2)
    ys = []
    for ci in range(nc):
        lo, hi = plan.cm_ylims[ci]
        lo = max(0, min(lo, hp))
        hi = max(lo + 1, min(hi, hp))
        ys.append(_or_reduce(cellw[:, lo:hi], 1))
    occ = jnp.stack(ys, axis=1)  # (ncellx, nc, 2)
    span = plan.gspan
    xpad = jnp.pad(occ, ((0, span - 1), (0, 0), (0, 0)), mode="edge")
    out = occ
    for i in range(1, span):
        out = out | xpad[i : i + ncellx]
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "batch", "refine", "interpret", "depth_only",
    ),
)
def _sweep_target(
    src_t,  # (5, Wp, Hp) padded transposed stack
    xlo,  # (ng,) i32
    ylo,  # (ng, nc) i32
    pose_b,  # (B, 16) f32
    vt_b,  # (B, 2, K) f32
    plan: TargetPlan,
    num_planes: int,
    batch: int,
    refine: int = 0,
    interpret: bool = False,
    depth_only: bool = False,
):
    w = plan.out_w
    ng = w // _GW
    hp = plan.hp_out
    nc = hp // _LC
    cm3 = _build_cm3(plan, src_t, nc)
    occ2 = _build_occ2(plan, src_t, nc)

    # bounded-loop tables (exact; see the kernel comment): replicate
    # pass1's skip-index math over (B, K, ng, nc) with the pose
    # homography evaluated exactly as the kernel does (group edges at
    # the chunk-center row), then scan for the first plane whose
    # sliding-MAX test passes (k_lo) and the first whose sliding-MIN is
    # strictly in front (k_hi - 1)
    cmn3 = _build_cm3(plan, src_t, nc, reduce=jnp.min)
    w_out, h_out = float(plan.out_w), float(plan.out_h)
    w_src = float(plan.src_w)
    pb = pose_b.astype(jnp.float32)  # (B, 16)
    p00, p01, p02 = pb[:, 0], pb[:, 1], pb[:, 2]
    p20, p21, p22 = pb[:, 6], pb[:, 7], pb[:, 8]
    cv0, cv2 = pb[:, 9], pb[:, 11]
    g_idx = jnp.arange(ng, dtype=jnp.float32) * _GW      # (ng,)
    c_idx = jnp.arange(nc, dtype=jnp.float32) * _LC      # (nc,)
    syc = (c_idx + _LC / 2.0 + 0.5) / h_out - 0.5        # (nc,)
    xoff = (float(plan.pad_x) - xlo.astype(jnp.float32))  # (ng,)

    def _edge(sx_g):  # sx_g: (ng,) -> ax, dx of shape (B, ng, nc)
        sx = sx_g[None, :, None]
        sy = syc[None, None, :]
        den = p20[:, None, None] * sx + p21[:, None, None] * sy \
            + p22[:, None, None]
        qx = (p00[:, None, None] * sx + p01[:, None, None] * sy
              + p02[:, None, None]) / den
        ax = (qx + 0.5) * w_src - 0.5 + xoff[None, :, None]
        dx = (cv0[:, None, None] - cv2[:, None, None] * qx) * w_src
        return ax, dx

    ax_gl, dx_gl = _edge((g_idx + 0.5) / w_out - 0.5)
    ax_gr, dx_gr = _edge((g_idx + _GW - 1 + 0.5) / w_out - 0.5)
    v_t = vt_b[:, 0, :]    # (B, K)
    thr_t = vt_b[:, 1, :]
    gpa = ax_gl[:, None] + v_t[:, :, None, None] * dx_gl[:, None]
    gpb = ax_gr[:, None] + v_t[:, :, None, None] * dx_gr[:, None]
    gmin = jnp.clip(
        jnp.minimum(gpa, gpb) - 16.0, 0.0, float(plan.bw - _TWX)
    ).astype(jnp.int32)                                   # (B, K, ng, nc)
    co_all = (xlo.astype(jnp.int32)[None, None, :, None] + gmin) // _COARSE
    c_ids = jnp.arange(nc, dtype=jnp.int32)[None, None, None, :]
    # conservative by construction: this twin RECOMPUTES the kernel's
    # f32 homography/skip-index math (FMA contraction can flip a
    # floor() by one cell at razor-edge values), so the scan ORs/ANDs
    # over the {co-1, co, co+1} cell neighborhood and widens the plane
    # range by one on each side; HAT_FIN_SCALE/FIN_EPS keep the k_hi
    # crossing guarantee sound against the kernel's clipped-hat weight
    # attenuation (the per-band diag is a homography chord whose one
    # possible interior extremum can dip below BOTH edge columns by
    # the curvature deviation — see bounds.py)
    thr_e = thr_t[:, :, None, None]
    klo_t, khi_t = plane_loop_bounds(
        co_all, thr_e, num_planes,
        gather_max=lambda c: cm3[c, c_ids],   # (B, K, ng, nc)
        gather_min=lambda c: cmn3[c, c_ids],
        ncells=cm3.shape[0],
        neighborhood=(-1, 0, 1),
        widen=1,
        fin_scale=HAT_FIN_SCALE,
    )
    ys1 = min(plan.ylen, _YS1)  # plan.ylen is a multiple of 128, >= 256
    xap = 256 if ys1 <= 256 else 512  # pow2 lane pad for the roll
    # depth_only: 1-channel window (disp), 2-channel output [invz,
    # found]; color scratches shrink to minimal tiles (never read)
    nch = 1 if depth_only else 5
    oc = 2 if depth_only else 6
    cdim = 8 if depth_only else _LC

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ng, nc, batch),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 16), lambda g, c, p, *_: (p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 2, vt_b.shape[2]), lambda g, c, p, *_: (p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, oc, _GW, _LC),
            lambda g, c, p, *_: (p, 0, g, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nch, plan.bw, plan.ylen), jnp.float32),
            pltpu.VMEM((_GW, xap), jnp.float32),  # xa16
            pltpu.VMEM((_LC, _GW), jnp.float32),  # pdiff
            pltpu.VMEM((_LC, _GW), jnp.float32),  # kstar
            pltpu.VMEM((_LC, _GW), jnp.float32),  # pdiffc
            pltpu.VMEM((_LC, _GW), jnp.float32),  # diffc
            pltpu.VMEM((_LC, _GW), jnp.float32),  # izout
            pltpu.VMEM((4, cdim, _GW), jnp.float32),  # cout
            pltpu.VMEM((4, cdim, _GW), jnp.float32),  # prgba
            pltpu.SMEM((num_planes,), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, plan=plan, num_planes=num_planes, refine=refine,
        ys1=ys1, xap=xap, depth_only=depth_only,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, oc, w, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(xlo, ylo.reshape(-1), cm3.reshape(-1), occ2.reshape(-1),
      klo_t.reshape(-1), khi_t.reshape(-1), pose_b[:, None, :], vt_b,
      src_t)
    out = out[:, :, :, : plan.out_h].transpose(0, 1, 3, 2)  # (B, oc, H, W)
    if depth_only:
        return out[:, 1], out[:, 0], None
    return out[:, 5], out[:, 4], out[:, 0:4].transpose(0, 2, 3, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "mask_mode", "to_srgb", "refine", "raw",
        "interpret", "depth_only",
    ),
)
def render_target_batch_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    pose_b,  # (B, 16) target_pose_scalars rows
    plane_invz,  # (B, K) descending per-pose ladders
    background,
    plan: TargetPlan,
    xlo,  # (ng,) i32 pose-union window origins (padded coords)
    ylo,  # (ng, nc) i32
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    refine: int = 0,
    raw: bool = False,
    interpret: bool = False,
    depth_only: bool = False,
):
    """Batched target-ray march on TPU: ONE kernel launch for the whole
    pose batch. Returns (B, out_h, out_w, 4) or raw tuples.

    depth_only=True skips the in-kernel color warps and returns
    (found, invz_star) pre-finalize — the fetch path's input. refine
    there runs the DEPTH-ONLY in-bracket sub-sweep (pass2d): paired
    with a widened plane step it keeps the solved invz at dense-ladder
    accuracy while pass 1's trip count drops by the step factor."""
    h, w = disp.shape
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    invz = jnp.asarray(plane_invz, jnp.float32)
    pose_b = jnp.asarray(pose_b, jnp.float32)
    batch = pose_b.shape[0]
    tkt = (invz - izmax) / (izmin - izmax)
    vt_b = jnp.stack([invz, tkt], axis=1)  # (B, 2, K)

    hp_src = _round_up(h + 2 * plan.pad_y, _LC)
    if depth_only:
        # the kernel's resident window only needs disp — 1/5 the DMA
        stack = disp.astype(jnp.float32)[..., None]  # (H, W, 1)
    else:
        rgbm = jnp.concatenate(
            [rgb.astype(jnp.float32), mask.astype(jnp.float32)[..., None]],
            axis=-1,
        )
        stack = jnp.concatenate(
            [rgbm, disp.astype(jnp.float32)[..., None]], axis=-1
        )  # (H, W, 5)
    src_t = stack.transpose(2, 1, 0)  # (C, W, H)
    # round the padded width up to a whole number of 8-px skip-table
    # cells: pad_x is 8-aligned, so a source whose own width is not
    # 8-divisible (outpainted layers have arbitrary margins) would
    # otherwise break _build_cm3's (wp//8, 8, hp) reshape. Extra
    # columns ride the HIGH side (window origins only reference pad_x
    # on the low side) and are edge replicas no window addresses.
    extra_x = -(w + 2 * plan.pad_x) % _COARSE
    src_t = jnp.pad(
        src_t,
        (
            (0, 0),
            (plan.pad_x, plan.pad_x + extra_x),
            (plan.pad_y, hp_src - h - plan.pad_y),
        ),
        mode="edge",
    )
    found, rstar, rgba_star = _sweep_target(
        src_t, jnp.asarray(xlo, jnp.int32), jnp.asarray(ylo, jnp.int32),
        pose_b, vt_b, plan=plan, num_planes=num_planes, batch=batch,
        refine=refine, interpret=interpret, depth_only=depth_only,
    )
    if depth_only:
        return found, rstar
    return jax.vmap(
        lambda f, r, rg, ps: finalize_target(
            ps, f, jnp.where(f > 0.0, r, 0.0), rg,
            jnp.asarray(background, jnp.float32), izmin, izmax,
            plan.out_w, plan.out_h, w, h, feathering, mask_mode,
            to_srgb, raw,
        )
    )(found, rstar, rgba_star, pose_b)
