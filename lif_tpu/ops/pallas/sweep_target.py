"""Pallas TPU kernel: the gather-free TARGET-RAY first-crossing march.

Production implementation of ops/sweep_target.py (reference semantics:
src/shaders/rayCastMonoLDI.glsl:219-297 — the per-target-pixel march for
ANY relative pose in the yaw family). Unlike the lateral / scaled
kernels, the source position of an output pixel is affine in invz with
PER-ELEMENT coefficients (the rotation homography):

    X(p, v) = AX(p) + v * DX(p)      (y-independent for yaw: the gate)
    Y(p, v) = AY(p) + v * DY(p)      (full 2-D field)

Layout and mechanism (narrow bands keep the spans small):
  * bands are _TW = 8 target columns; the within-band position spread
    per plane (homography stretch + parallax gradient) is a few pixels,
    so one plane's bilinear sample over the whole band is a short
    hat-weight candidate sum over ABSOLUTE source columns.
  * x-stage (source x on sublanes): 8-aligned dynamic slice of the
    resident window + dynamic sublane roll (_TWX = 32 sublanes = 4
    tiles — `tpu.dynamic_rotate` silently miscompiles on
    non-power-of-two tile counts on this toolchain, probed in
    scratch/probe_roll3.py) + a class-switched hat sum -> xa(j, ysrc).
  * y-stage: transpose xa so source y rides the sublane mechanism
    (lane-axis dynamic shifts do not exist). The transposed slab is
    parked in a power-of-two-height scratch, rolled by the plane's
    window-relative y base, and candidate source rows SLIDE with the
    target row (slaby[oy + i]) so the candidate count tracks only the
    local y-slope deviation from 1. Weights are full (lc, tw) fields.
  * crossing state lives in the TRANSPOSED (lc, tw) layout end to end;
    the six output channels transpose back once per tile.

Work avoidance mirrors the proven kernels (ops/pallas/sweep_march.py):
texel-space pass 1, crossing-flagged pass 2 for colors, a conservative
coarse-max skip table, bracket refresh after skip runs, early-out when
every pixel crossed, and the pose axis innermost over one resident
source window per (band, chunk) — the window origin tables are the
POSE-BATCH UNION, so the window stays pose-invariant and is DMA'd once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sweep_target import _LC, _TW, TargetPlan, finalize_target

__all__ = ["render_target_batch_pallas"]

_COARSE = 8  # skip-table cell width in source x
_TWX = 32  # x-stage slab sublanes (4 tiles: dynamic roll safe)


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def _pow2_rows(n: int) -> int:
    r = _LC
    while r < n:
        r *= 2
    return r


def _classes(nmax, start=2):
    ns, n = [], start
    while n < nmax:
        ns.append(n)
        n *= 2
    ns.append(nmax)
    return ns


def _kernel(
    xlo,  # (nb,) i32 scalar prefetch: per-band window x origin (padded)
    ylo,  # (nb, nc) i32: per-(band, chunk) window y origin (8-aligned)
    cm3,  # (ncellx, nc) f32: sliding disp max per (x-cell, chunk window)
    pose_ref,  # (1, 1, 16) SMEM pose scalars: p_ts row-major, c_vec
    vt_ref,  # (1, 2, K) SMEM: plane invz (desc) + texel thresholds
    src_hbm,  # (5, Wp, Hp) f32 ANY — r, g, b, mask, disp TRANSPOSED
    out_ref,  # (1, 6, tw, lc) VMEM out block
    blk,  # (5, bw, ylen) f32 VMEM scratch: resident source window
    tsp,  # (tsp_rows, tw) f32 VMEM scratch: transposed slab (pow2 rows)
    pdiff,  # (lc, tw) f32 scratch — ALL state in TRANSPOSED layout
    kstar,  # (lc, tw) f32
    pdiffc,  # (lc, tw) f32
    diffc,  # (lc, tw) f32
    izout,  # (lc, tw) f32
    cout,  # (4, lc, tw) f32
    prgba,  # (4, lc, tw) f32
    crossflag,  # (K,) f32 SMEM
    lastk,  # (1, 1) i32 SMEM
    nfound,  # (1, 1) f32 SMEM
    sem,
    *,
    plan: TargetPlan,
    num_planes: int,
    refine: int,
    tsp_rows: int,
):
    tw, lc = _TW, _LC
    bw, ylen = plan.bw, plan.ylen
    b = pl.program_id(0)
    c = pl.program_id(1)
    p = pl.program_id(2)
    cp = pltpu.make_async_copy(
        src_hbm.at[
            :,
            pl.ds(pl.multiple_of(xlo[b], 8), bw),
            pl.ds(pl.multiple_of(ylo[b, c], 128), ylen),
        ],
        blk, sem,
    )

    @pl.when(p == 0)
    def _():
        cp.start()

    if tsp_rows > ylen:
        # rows beyond ylen are never written by the y-stage; zero them so
        # 0-weight candidates can't multiply uninitialized NaN patterns
        tsp[ylen:tsp_rows, :] = jnp.zeros((tsp_rows - ylen, tw), jnp.float32)
    pdiff[:] = jnp.zeros((lc, tw), jnp.float32)
    kstar[:] = jnp.full((lc, tw), -1.0, jnp.float32)
    pdiffc[:] = jnp.zeros((lc, tw), jnp.float32)
    diffc[:] = jnp.full((lc, tw), -1.0, jnp.float32)
    izout[:] = jnp.zeros((lc, tw), jnp.float32)
    cout[:] = jnp.zeros((4, lc, tw), jnp.float32)
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

    xg0 = (b * tw).astype(jnp.float32)
    yg0 = (c * lc).astype(jnp.float32)
    syc = (yg0 + lc / 2.0 + 0.5) / h_out - 0.5  # chunk-center row

    def _qxy(sx, sy):
        den = p20 * sx + p21 * sy + p22
        return (
            (p00 * sx + p01 * sy + p02) / den,
            (p10 * sx + p11 * sy + p12) / den,
        )

    xoff = (float(plan.pad_x) - xlo[b]).astype(jnp.float32)
    yoff = (float(plan.pad_y) - ylo[b, c]).astype(jnp.float32)

    # x fields, (tw, 1), window-relative
    jv = jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0).astype(jnp.float32)
    sxv = (xg0 + jv + 0.5) / w_out - 0.5
    qxv, _ = _qxy(sxv, syc)
    axv = (qxv + 0.5) * w_src - 0.5 + xoff
    dxv = (cv0 - cv2 * qxv) * w_src

    # y fields, TRANSPOSED (lc, tw), slide-relative (candidate rows ride
    # +i): relT = AY - i, window-relative
    ivT = jax.lax.broadcasted_iota(jnp.int32, (lc, 1), 0).astype(jnp.float32)
    jvT = jax.lax.broadcasted_iota(jnp.int32, (lc, tw), 1).astype(jnp.float32)
    syT = (yg0 + ivT + 0.5) / h_out - 0.5
    sxT = (xg0 + jvT + 0.5) / w_out - 0.5
    _, qyT = _qxy(sxT, syT)
    ayT = (qyT + 0.5) * h_src - 0.5 + yoff
    dyT = (cv1 - cv2 * qyT) * h_src
    relT = ayT - ivT

    # scalar bounds for per-plane bases: band-end x (X monotone in j)
    qx_lo, _ = _qxy((xg0 + 0.5) / w_out - 0.5, syc)
    qx_hi, _ = _qxy((xg0 + tw - 1 + 0.5) / w_out - 0.5, syc)
    ax_lo = (qx_lo + 0.5) * w_src - 0.5 + xoff
    ax_hi = (qx_hi + 0.5) * w_src - 0.5 + xoff
    dx_lo = (cv0 - cv2 * qx_lo) * w_src
    dx_hi = (cv0 - cv2 * qx_hi) * w_src
    # y corner scalars (slide-relative rel = AY - i, and DY) at the 4
    # tile corners; per-plane bounds take min/max per TERM (conservative:
    # rel and DY are each corner-extremal, their sum is bounded by the
    # sum of bounds since v > 0)
    y_last = jnp.minimum(yg0 + lc - 1, h_out - 1.0)
    r_cs, d_cs = [], []
    for sxe_v in (
        (xg0 + 0.5) / w_out - 0.5,
        (xg0 + tw - 1 + 0.5) / w_out - 0.5,
    ):
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
        """Per-plane scalar geometry: x slab base/residual/class and the
        y slide base/class."""
        pa = ax_lo + v * dx_lo
        pb = ax_hi + v * dx_hi
        xlo_s = jnp.clip(jnp.minimum(pa, pb), 0.0, float(bw - 2))
        xhi_s = jnp.clip(jnp.maximum(pa, pb), 0.0, float(bw - 2))
        bmin = jnp.floor(xlo_s).astype(jnp.int32)
        span_x = (jnp.ceil(xhi_s).astype(jnp.int32) - bmin + 2).astype(
            jnp.float32
        )
        o8 = pl.multiple_of(
            jnp.clip((bmin // 8) * 8, 0, bw - _TWX), 8
        )
        rr = bmin - o8
        rlo = jnp.clip(r_min + v * d_min, 0.0, float(ylen - 2))
        rhi = jnp.clip(r_max + v * d_max, 0.0, float(ylen - 2))
        bym = jnp.floor(rlo).astype(jnp.int32)
        span_y = (jnp.ceil(rhi).astype(jnp.int32) - bym + 2).astype(
            jnp.float32
        )
        return (
            bmin, rr, o8, _cls_idx(span_x, xcls),
            bym, _cls_idx(span_y, ycls),
        )

    def _warp(chans, v, bases):
        """Separable hat-collapse of window channels [lo, hi) at plane
        invz v. Returns (hi-lo, lc, tw) TRANSPOSED values."""
        bmin, rr, o8, ic_x, bym, ic_y = bases
        lo_c, hi_c = chans
        xq = jnp.clip(
            axv + v * dxv - bmin.astype(jnp.float32), -1.0, float(_TWX)
        )  # (tw, 1)
        yq = jnp.clip(
            relT + v * dyT - bym.astype(jnp.float32), -1.0,
            float(tsp_rows - lc),
        )  # (lc, tw)
        outs = []
        for ch in range(lo_c, hi_c):
            slab = blk[ch, pl.ds(o8, _TWX), :]  # (_TWX, ylen)
            slab = pltpu.roll(slab, -rr, 0)  # 4 sublane tiles: safe

            def _xbody(n, slab=slab):
                def body():
                    xa = jnp.zeros((tw, ylen), jnp.float32)
                    for o in range(n):
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(xq - float(o)))
                        xa = xa + w * slab[o : o + 1, :]
                    return xa

                return body

            xa = jax.lax.switch(ic_x, [_xbody(n) for n in xcls])
            tsp[0:ylen, :] = xa.T
            slaby = pltpu.roll(tsp[:], -bym, 0)  # pow2 rows: safe

            def _ybody(n, slaby=slaby):
                def body():
                    ya = jnp.zeros((lc, tw), jnp.float32)
                    for o in range(n):
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(yq - float(o)))
                        ya = ya + w * slaby[o : o + lc, :]
                    return ya

                return body

            outs.append(jax.lax.switch(ic_y, [_ybody(n) for n in ycls]))
        return jnp.stack(outs) if len(outs) > 1 else outs[0][None]

    def _tab(ch, k):
        return vt_ref[0, ch, k]

    def pass1(k, _):
        crossflag[k] = 0.0
        v = _tab(0, k)
        tk = _tab(1, k)
        bases = _bases(v)
        co = (xlo[b] + bases[2]) // _COARSE
        active = jnp.logical_and(
            cm3[co, c] > tk, nfound[0, 0] < float(_TW * _LC)
        )

        @pl.when(active)
        def _():
            # refresh the secant bracket if the previous plane was
            # skipped (results stay identical to the dense oracle)
            @pl.when(jnp.logical_and(lastk[0, 0] != k - 1, k > 0))
            def _():
                km1 = jnp.maximum(k - 1, 0)
                vm = _tab(0, km1)
                pdiff[:] = _warp((4, 5), vm, _bases(vm))[0] - _tab(1, km1)

            tex = _warp((4, 5), v, bases)[0]
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

    jax.lax.fori_loop(0, num_planes, pass1, 0)

    t = jnp.clip(
        pdiffc[:] / jnp.minimum(pdiffc[:] - diffc[:], -1e-12), 0.0, 1.0
    )
    t = jnp.where(kstar[:] == 0.0, jnp.ones_like(t), t)
    lastk[0, 0] = -5

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
                slo = jnp.zeros((lc, tw), jnp.float32)
                pd2 = pdiffc[:]
                d2 = diffc[:]
                sfound = jnp.zeros((lc, tw), bool)
                prev_g = pdiffc[:]
                prev_s = 0.0
                thk = _tab(1, k)
                thk1 = _tab(1, km1)
                for j in range(1, refine + 1):
                    s = j * step
                    vs = prev_iz + s * (izk - prev_iz)
                    g = _warp((4, 5), vs, _bases(vs))[0] - (
                        thk1 + s * (thk - thk1)
                    )
                    csub = jnp.logical_and(~sfound, g > 0.0)
                    slo = jnp.where(csub, prev_s, slo)
                    pd2 = jnp.where(csub, prev_g, pd2)
                    d2 = jnp.where(csub, g, d2)
                    sfound = jnp.logical_or(sfound, csub)
                    prev_g = g
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

    jax.lax.fori_loop(0, num_planes, pass2, 0)

    out_ref[0, 5] = (kstar[:] > -0.5).astype(jnp.float32).T
    out_ref[0, 4] = izout[:].T
    for ch in range(4):
        out_ref[0, ch] = cout[ch].T


def _build_cm3(plan: TargetPlan, src_t, nc):
    """Sliding disp max: cm3[cellx, c] bounds every texel a plane slab
    based at 8-px source cell `cellx` can read while serving y-chunk c
    (the chunk's full possible window-row range, conservatively the
    chunk rows +- (ylen - _LC) drift)."""
    wp, hp = src_t.shape[1], src_t.shape[2]
    ncellx = wp // _COARSE
    cmax_cell = src_t[4].reshape(ncellx, _COARSE, hp).max(axis=1)
    ys = []
    for ci in range(nc):
        lo = max(0, ci * _LC + plan.pad_y - (plan.ylen - _LC))
        hi = min(hp, (ci + 1) * _LC + plan.pad_y + (plan.ylen - _LC))
        ys.append(cmax_cell[:, lo:hi].max(axis=1))
    cm2 = jnp.stack(ys, axis=1)  # (ncellx, nc)
    span = _TWX // _COARSE + 1
    xpad = jnp.pad(cm2, ((0, span - 1), (0, 0)), mode="edge")
    return jnp.stack(
        [xpad[i : i + ncellx] for i in range(span)], axis=0
    ).max(axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "num_planes", "batch", "refine", "interpret"),
)
def _sweep_target(
    src_t,  # (5, Wp, Hp) padded transposed stack
    xlo,  # (nb,) i32
    ylo,  # (nb, nc) i32
    pose_b,  # (B, 16) f32
    vt_b,  # (B, 2, K) f32
    plan: TargetPlan,
    num_planes: int,
    batch: int,
    refine: int = 0,
    interpret: bool = False,
):
    w = plan.out_w
    nb = w // _TW
    hp = plan.hp_out
    nc = hp // _LC
    cm3 = _build_cm3(plan, src_t, nc)
    tsp_rows = _pow2_rows(plan.ylen)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, nc, batch),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 16), lambda b, c, p, *_: (p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 2, vt_b.shape[2]), lambda b, c, p, *_: (p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 6, _TW, _LC),
            lambda b, c, p, *_: (p, 0, b, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((5, plan.bw, plan.ylen), jnp.float32),
            pltpu.VMEM((tsp_rows, _TW), jnp.float32),  # tsp
            pltpu.VMEM((_LC, _TW), jnp.float32),  # pdiff
            pltpu.VMEM((_LC, _TW), jnp.float32),  # kstar
            pltpu.VMEM((_LC, _TW), jnp.float32),  # pdiffc
            pltpu.VMEM((_LC, _TW), jnp.float32),  # diffc
            pltpu.VMEM((_LC, _TW), jnp.float32),  # izout
            pltpu.VMEM((4, _LC, _TW), jnp.float32),  # cout
            pltpu.VMEM((4, _LC, _TW), jnp.float32),  # prgba
            pltpu.SMEM((num_planes,), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, plan=plan, num_planes=num_planes, refine=refine,
        tsp_rows=tsp_rows,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, 6, w, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(xlo, ylo, cm3, pose_b[:, None, :], vt_b, src_t)
    out = out[:, :, :, : plan.out_h].transpose(0, 1, 3, 2)  # (B, 6, H, W)
    return out[:, 5], out[:, 4], out[:, 0:4].transpose(0, 2, 3, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "mask_mode", "to_srgb", "refine", "raw",
        "interpret",
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
    xlo,  # (nb,) i32 pose-union window origins (padded coords)
    ylo,  # (nb, nc) i32
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    refine: int = 0,
    raw: bool = False,
    interpret: bool = False,
):
    """Batched target-ray march on TPU: ONE kernel launch for the whole
    pose batch. Returns (B, out_h, out_w, 4) or raw tuples."""
    h, w = disp.shape
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    invz = jnp.asarray(plane_invz, jnp.float32)
    pose_b = jnp.asarray(pose_b, jnp.float32)
    batch = pose_b.shape[0]
    tkt = (invz - izmax) / (izmin - izmax)
    vt_b = jnp.stack([invz, tkt], axis=1)  # (B, 2, K)

    hp_src = _round_up(h + 2 * plan.pad_y, _LC)
    rgbm = jnp.concatenate(
        [rgb.astype(jnp.float32), mask.astype(jnp.float32)[..., None]],
        axis=-1,
    )
    stack = jnp.concatenate(
        [rgbm, disp.astype(jnp.float32)[..., None]], axis=-1
    )  # (H, W, 5)
    src_t = stack.transpose(2, 1, 0)  # (5, W, H)
    src_t = jnp.pad(
        src_t,
        (
            (0, 0),
            (plan.pad_x, plan.pad_x),
            (plan.pad_y, hp_src - h - plan.pad_y),
        ),
        mode="edge",
    )
    found, rstar, rgba_star = _sweep_target(
        src_t, jnp.asarray(xlo, jnp.int32), jnp.asarray(ylo, jnp.int32),
        pose_b, vt_b, plan=plan, num_planes=num_planes, batch=batch,
        refine=refine, interpret=interpret,
    )
    return jax.vmap(
        lambda f, r, rg, ps: finalize_target(
            ps, f, jnp.where(f > 0.0, r, 0.0), rg,
            jnp.asarray(background, jnp.float32), izmin, izmax,
            plan.out_w, plan.out_h, w, h, feathering, mask_mode,
            to_srgb, raw,
        )
    )(found, rstar, rgba_star, pose_b)
