"""Pallas TPU kernel: the gather-free first-crossing plane march.

Production implementation of ops/sweep_march.py's translation sweep
(reference semantics: src/shaders/rayCastMonoLDI.glsl:219-297's march,
specialized to aligned views where every inverse-depth plane's warp is a
pure translation). The kernel handles the LATERAL case — translation along
+x only, matched focal; the source may be WIDER than the output
(outpainted LDI layers — the centered offset rides the shift tables) and
taller sources are center-cropped by the renderer with the taper kept in
uncropped layer space (crop_y). y-only translations reach here through
the renderer's transpose reduction; rotation is factored into the
phase-B homography (ops/sweep_fast.render_rotated).

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

Work-avoidance structure (each refinement measured on the SFMoMA scene):
  * Pass 1 sweeps DISPARITY ONLY in texel space (the secant ratio
    t = pd/(pd - d) is invariant to the affine invz decode, so the decode
    never happens in the hot loop) and records per pixel the crossing
    plane k* and the bracketing diffs. Pass 2 computes color lerps only
    for planes where pass 1 counted a crossing.
  * A per-plane skip test reads ONE precomputed scalar: cm3[co, c] =
    max of the source disparity over the 10-coarse-cell window that
    plane's slice can touch (8-px cells, sliding max built by XLA outside
    the kernel). If that max cannot exceed the plane's texel threshold,
    no pixel in this tile crosses here and the plane costs ~a dozen
    scalar cycles instead of the full vector warp. The test is
    conservative (a max bound), so no crossing is ever missed.
  * Skipped planes leave the secant bracket stale, so the first active
    plane after a skip run re-warps its predecessor to refresh pd —
    results stay ARITHMETICALLY IDENTICAL to the dense XLA oracle.

Grid: (x-bands, y-chunks, poses). Each (band, chunk) program DMAs its
(5, bw, 128) source window (rgb+mask+disp, edge-padded in x, covering
every plane's shift via the static margin) into VMEM once — the pose axis
iterates innermost over the SAME resident window (TPU grids run
sequentially and scratch persists), so a whole batch of novel views costs
one source read plus one output write per view. Batching poses into one
launch is also what amortizes the per-dispatch wall overhead (~50 ms
through the axon relay, which does not pipeline; docs/TPU_NOTES.md) that
would otherwise dominate at these frame times.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sweep_march import TranslationPlan, _finalize, plane_tables
from .bounds import plane_loop_bounds

__all__ = [
    "render_translation_pallas",
    "render_translation_batch_pallas",
    "prepare_translation_src",
]

_COARSE = 8  # coarse skip-table cell width, px (one sublane group)
# extra occupancy sliding-span cells budgeting the inter-plane shift
# delta of the IVT segment (see _plane_active): grids whose adjacent
# planes shift by more than _OCC_EXTRA * _COARSE px guard the interval
# test off (max test only). Snap grids step 1..8 px; the margin covers
# subsampled strides up to 16 px.
_OCC_EXTRA = 2
# planes per grouped-pass1 iteration (variant="grouped"). Measured on the
# SFMoMA 1280x800 batch bench (marginal device ms/frame, B=100): G=2 2.75,
# G=4 2.87, G=8 3.22, ungrouped two-pass 3.12 — small groups amortize the
# per-plane kstar/pdiffc/diffc scratch read-modify-writes into registers
# without paying for wasted tail/inactive plane visits inside a group.
# LIF_MARCH_GROUP / LIF_MARCH_TW: experiment overrides (fresh process
# only — compiled-kernel caches key on shapes, not on these globals);
# scratch/prof_march.py sweeps them.
import os as _os

_GROUP = int(_os.environ.get("LIF_MARCH_GROUP", "2"))


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


_TW_PREF = tuple(
    int(t) for t in _os.environ.get(
        "LIF_MARCH_TW", "128,64,32,16,8"
    ).split(",")
)  # band-width preference (see _pick_tw); env-overridable so
# scratch/prof_march.py can sweep wider bands (256, 320) in a fresh
# process — wider bands amortize per-plane scalar cost over more pixels
# per program at the cost of VMEM window size


def _pick_tw(w: int) -> int:
    # widest band that divides the output: more sublanes per vector op
    # amortize the per-plane scalar work (SMEM loads, branches, loop
    # control — paid once per grid program per plane) better, at the
    # cost of a larger VMEM window + scratch footprint
    for tw in _TW_PREF:
        if w % tw == 0:
            return tw
    raise ValueError(f"output width {w} must be divisible by 8")


def _kernel(
    ixs,  # (B, K) i32 scalar prefetch: per-pose per-plane x-shifts (padded)
    fxs,  # (B, K) f32: bilinear fractions
    izt,  # (B, K) f32: per-pose plane inverse depths, near -> far
    tkt,  # (B, K) f32: per-pose plane thresholds in TEXEL units
    cm3,  # (Wp/8 * Hc,) f32: sliding window max of coarse disp (skip
    #      table), FLATTENED — SMEM pads the last dim of a multi-dim
    #      prefetch operand to 128 (and 1-D only to 512 elements), so a
    #      (ncells, 7) table would occupy ~18x its size; same below
    occ2,  # (Wp/8 * Hc * 2,) i32: 64-bucket VALUE-INTERVAL occupancy
    #      bitmask (2 words/cell) over the same sliding region — bit b
    #      is set iff some x-adjacent texel pair's [min, max] hull
    #      intersects bucket [b/64, (b+1)/64). A first crossing at
    #      plane k forces a continuous lerped-value path through
    #      [thr_k, thr_{k-1}] (intermediate-value theorem on the march
    #      segment; the lateral warp lerps x-neighbours at the SAME
    #      row, so its values live in x-pair hulls). A plane whose
    #      threshold interval hits no occupied bucket cannot host a
    #      crossing — unlike the max test, this prunes planes BETWEEN
    #      surfaces (ported from ops/pallas/sweep_target.py, where it
    #      measured 284 -> 173 active planes on the config1 orbit).
    klo_t,  # (B * nb * Hc,) i32: first plane whose skip test can pass
    khi_t,  # (B * nb * Hc,) i32: exclusive end — window MIN in front there
    src_hbm,  # (5, Wp, Hp) f32 ANY: r, g, b, mask, disp — TRANSPOSED
    out_ref,  # (1, 6, tw, lc) VMEM out block (pose-major)
    blk,  # (5, bw, lc) f32 VMEM scratch: this tile's source window
    pdiff,  # (tw, lc) f32 scratch: secant bracket state (texel units)
    kstar,  # (tw, lc) f32 scratch: crossing plane index (-1 = none yet)
    pdiffc,  # (tw, lc) f32 scratch: bracket diffs frozen at the crossing
    diffc,  # (tw, lc) f32 scratch
    prgba,  # (4, tw, lc) f32 scratch: previous flagged plane's color warp
    crossflag,  # (K,) f32 SMEM scratch: per-plane crossed-pixel counts
    lastk,  # (1, 1) i32 SMEM scratch: last plane whose warp is in pdiff
    nfound,  # (1, 1) f32 SMEM scratch: crossed-pixel count
    sem,
    *,
    tw: int,
    bw: int,
    lc: int,
    num_planes: int,
    refine: int,
    grouped: bool,
    nb: int,
    n_hc: int,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    p = pl.program_id(2)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(b * tw, bw), pl.ds(c * lc, lc)], blk, sem
    )

    # the source window depends on (band, chunk) only; the pose axis is
    # innermost, so the window DMA'd at pose 0 stays resident (scratch
    # persists across TPU grid steps) and serves the whole batch
    @pl.when(p == 0)
    def _():
        cp.start()

    out_ref[:] = jnp.zeros((1, 6, tw, lc), jnp.float32)
    pdiff[:] = jnp.zeros((tw, lc), jnp.float32)
    kstar[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    pdiffc[:] = jnp.zeros((tw, lc), jnp.float32)
    diffc[:] = jnp.full((tw, lc), -1.0, jnp.float32)
    lastk[0, 0] = -1
    nfound[0, 0] = 0.0

    @pl.when(p == 0)
    def _():
        cp.wait()

    def _warp_of(chans, o, fx):
        """Shifted + bilinearly-lerped source channels at integer shift o
        plus fraction fx. chans: static (lo, hi) channel slice. Integer
        shifts (fx exactly 0.0 — every snap-grid plane except the range
        endpoints, plane_tables snaps them) take a lerp-free slice
        branch."""
        o8 = pl.multiple_of((o // 8) * 8, 8)
        r = o - o8
        lo, hi = chans
        win = blk[lo:hi, pl.ds(o8, tw + 16), :]  # (hi-lo, tw+16, lc) value

        def sliced(rr):
            return lambda: win[:, rr : rr + tw, :]

        def shifted(rr):
            # residual integer shift + fractional lerp, fused per branch
            return lambda: (
                win[:, rr : rr + tw, :] * (1.0 - fx)
                + win[:, rr + 1 : rr + tw + 1, :] * fx
            )

        idx = r + 8 * (fx > 0.0).astype(jnp.int32)
        return jax.lax.switch(
            idx,
            [sliced(rr) for rr in range(8)]
            + [shifted(rr) for rr in range(8)],
        )

    def _warp(chans, k_idx):
        return _warp_of(chans, ixs[p, k_idx], fxs[p, k_idx])

    def _bits_below(n):
        # i32 mask of the n low bits, n in [0, 32] (scalar)
        return jnp.where(
            n >= 32, jnp.int32(-1),
            (jnp.int32(1) << jnp.clip(n, 0, 31)) - jnp.int32(1),
        )

    def _plane_active(k):
        """Scalar skip test for plane k: sliding max above threshold AND
        some x-pair value hull intersecting (thr_k, thr_{k-1}] — the
        interval a first crossing must pass through (intermediate-value
        theorem on the continuous march segment from plane k-1 to k).
        The segment's sample positions span BOTH planes' shifts, so the
        occupancy base cell is the minimum of the two (the sliding span
        budgets _OCC_EXTRA cells for the inter-plane delta; grids with
        wider spacing skip the interval test via the d-guard and keep
        the max test only). Buckets widened one on each side against
        f32 threshold/lerp drift; k == 0 uses 2.0 as the predecessor
        threshold (no predecessor in the oracle)."""
        km1 = jnp.maximum(k - 1, 0)
        co_k = ixs[p, k]
        co_p = jnp.where(k > 0, ixs[p, km1], co_k)
        d_px = jnp.abs(co_k - co_p)
        co = b * (tw // _COARSE) + jnp.minimum(co_k, co_p) // _COARSE
        co_max = b * (tw // _COARSE) + ixs[p, k] // _COARSE
        tk = tkt[p, k]
        tk_prev = jnp.where(k > 0, tkt[p, km1], jnp.float32(2.0))
        b0 = jnp.floor(tk * 64.0).astype(jnp.int32) - 1
        b1 = jnp.minimum(
            jnp.floor(tk_prev * 64.0).astype(jnp.int32) + 1, 63
        )
        cell2 = (co * n_hc + c) * 2
        m0 = _bits_below(jnp.clip(b1 + 1, 0, 32)) & ~_bits_below(
            jnp.clip(b0, 0, 32))
        m1 = _bits_below(jnp.clip(b1 - 31, 0, 32)) & ~_bits_below(
            jnp.clip(b0 - 32, 0, 32))
        occ_hit = ((occ2[cell2] & m0) | (occ2[cell2 + 1] & m1)) != 0
        occ_hit = jnp.logical_or(occ_hit, d_px > _OCC_EXTRA * _COARSE)
        return jnp.logical_and(cm3[co_max * n_hc + c] > tk, occ_hit)

    def pass1(k, _):
        crossflag[k] = 0.0
        # skip test (one scalar load + compare + occupancy bit test);
        # conservative, so never misses a crossing. The tail test stops
        # once every pixel has crossed.
        active = jnp.logical_and(
            _plane_active(k), nfound[0, 0] < float(tw * lc)
        )

        @pl.when(active)
        def _():
            # refresh the secant bracket if the previous plane was skipped
            # (keeps results identical to the dense oracle: pd must hold
            # plane k-1's diff at the moment a crossing is interpolated)
            @pl.when(jnp.logical_and(lastk[0, 0] != k - 1, k > 0))
            def _():
                pdiff[:] = _warp((4, 5), k - 1)[0] - tkt[p, k - 1]

            tex = _warp((4, 5), k)[0]
            diff = tex - tkt[p, k]
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

    def pass1_group(g, _):
        """Four consecutive planes per iteration: the per-plane scratch
        read-modify-writes (kstar/pdiffc/diffc/pdiff — the dominant
        VMEM traffic, ~8 full-tile transfers per plane) amortize to one
        per GROUP; diffs chain through registers inside the group.
        Semantics are unchanged: a plane whose skip test fails has
        diff <= 0 everywhere (the test is a sliding MAX bound), so
        computing it inside an active group contributes no crossings;
        tail planes clamp to k_hi - 1, where a repeat visit finds every
        crossing already frozen (kstar >= 0 blocks re-freezing)."""
        k0 = k_lo + _GROUP * g
        ks = [jnp.minimum(k0 + j, k_hi - 1) for j in range(_GROUP)]
        for kk in ks:
            crossflag[kk] = 0.0
        act = nfound[0, 0] < float(tw * lc)
        any_active = jnp.logical_and(
            act,
            functools.reduce(
                jnp.logical_or, [_plane_active(kk) for kk in ks],
            ),
        )

        @pl.when(any_active)
        def _():
            @pl.when(jnp.logical_and(lastk[0, 0] != k0 - 1, k0 > 0))
            def _():
                pdiff[:] = _warp((4, 5), k0 - 1)[0] - tkt[p, k0 - 1]

            pd = pdiff[:]
            ks_f = kstar[:]
            pdc = pdiffc[:]
            dfc = diffc[:]
            total = jnp.float32(0.0)
            for j, kk in enumerate(ks):
                diff = _warp((4, 5), kk)[0] - tkt[p, kk]
                crossed = jnp.logical_and(ks_f < -0.5, diff > 0.0)
                cnt = jnp.sum(crossed.astype(jnp.float32))
                ks_f = jnp.where(crossed, kk.astype(jnp.float32), ks_f)
                pdc = jnp.where(crossed, pd, pdc)
                dfc = jnp.where(crossed, diff, dfc)

                @pl.when(k0 + j < k_hi)
                def _(cnt=cnt, kk=kk):
                    crossflag[kk] = cnt

                total = total + jnp.where(k0 + j < k_hi, cnt, 0.0)
                pd = diff
            kstar[:] = ks_f
            pdiffc[:] = pdc
            diffc[:] = dfc
            pdiff[:] = pd
            nfound[0, 0] = nfound[0, 0] + total
            lastk[0, 0] = ks[-1]

        return 0

    # bounded plane loop (exact): before k_lo the skip test provably
    # fails (cm3 <= threshold for every earlier plane at its own cell),
    # and at khi-1 the window MIN is strictly in front, so every
    # not-yet-found pixel crosses there — planes outside [klo, khi) do
    # nothing in the dense loop. Mean trip measured 38 of 271 planes on
    # the SFMoMA bench pose (scratch/skip_stats.py), a ~7x cut of the
    # per-plane fixed cost.
    k_lo = klo_t[(p * nb + b) * n_hc + c]
    k_hi = khi_t[(p * nb + b) * n_hc + c]
    if grouped:
        n_groups = (k_hi - k_lo + _GROUP - 1) // _GROUP
        jax.lax.fori_loop(0, n_groups, pass1_group, 0)
    else:
        jax.lax.fori_loop(k_lo, k_hi, pass1, 0)

    # per-pixel secant parameter from the frozen bracket (one divide total,
    # not one per plane). The texel-space diffs give the same ratio as the
    # invz-space diffs (the affine decode cancels); k* == 0 snaps to the
    # first plane (t = 1), mirroring the oracle's k == 0 rule.
    t = jnp.clip(
        pdiffc[:] / jnp.minimum(pdiffc[:] - diffc[:], -1e-12), 0.0, 1.0
    )
    t = jnp.where(kstar[:] == 0.0, jnp.ones_like(t), t)
    out_ref[0, 5] = (kstar[:] > -0.5).astype(jnp.float32)
    lastk[0, 0] = -5

    def pass2(k, _):
        @pl.when(crossflag[k] > 0.0)
        def _():
            sel = kstar[:] == jnp.float32(k)
            km1 = jnp.maximum(k - 1, 0)
            izk = izt[p, k]
            prev_iz = izt[p, km1]

            # consecutive flagged planes reuse the previous color warp
            @pl.when(lastk[0, 0] != k - 1)
            def _():
                prgba[:] = _warp((0, 4), km1)

            rgba = _warp((0, 4), k)

            if refine == 0:
                s_star = t
                rgba_c = prgba[:] + s_star[None] * (rgba - prgba[:])
            else:
                # mini-sweep of `refine` interior sub-planes inside the
                # bracket: the per-plane shift is affine in invz, so
                # sub-plane shifts/thresholds are exact lerps of the
                # bracketing planes' — (refine+1)x the effective plane
                # density, paid only at flagged planes. COLOR is warped
                # at the sub-planes too and lerped within the found
                # SUB-bracket (outer-plane color lerp is a bracket-wide
                # tent blur — the march_stride quality killer; on snap
                # grids the sub-planes land back on the integer lattice,
                # so the sub-plane warps are exact translates).
                tx_k = ixs[p, k].astype(jnp.float32) + fxs[p, k]
                tx_k1 = ixs[p, km1].astype(jnp.float32) + fxs[p, km1]
                tk_k = tkt[p, k]
                tk_k1 = tkt[p, km1]
                step = 1.0 / (refine + 1)
                slo = jnp.zeros((tw, lc), jnp.float32)
                pd2 = pdiffc[:]
                d2 = diffc[:]
                c_lo = prgba[:]
                c_hi = rgba
                sfound = jnp.zeros((tw, lc), bool)
                prev_g = pdiffc[:]
                prev_c = prgba[:]
                prev_s = 0.0
                for j in range(1, refine + 2):
                    s = j * step
                    if j <= refine:
                        tx_s = tx_k1 + s * (tx_k - tx_k1)
                        o_s = jnp.floor(tx_s).astype(jnp.int32)
                        fx_s = tx_s - o_s.astype(jnp.float32)
                        w5 = _warp_of((0, 5), o_s, fx_s)
                        g = w5[4] - (tk_k1 + s * (tk_k - tk_k1))
                        c_s = w5[0:4]
                    else:
                        g, c_s = diffc[:], rgba  # the k plane itself
                    csub = jnp.logical_and(~sfound, g > 0.0)
                    slo = jnp.where(csub, prev_s, slo)
                    pd2 = jnp.where(csub, prev_g, pd2)
                    d2 = jnp.where(csub, g, d2)
                    c_lo = jnp.where(csub[None], prev_c, c_lo)
                    c_hi = jnp.where(csub[None], c_s, c_hi)
                    sfound = jnp.logical_or(sfound, csub)
                    prev_g = g
                    prev_c = c_s
                    prev_s = s
                slo = jnp.where(sfound, slo, prev_s)
                pd2 = jnp.where(sfound, pd2, prev_g)
                t2 = jnp.clip(
                    pd2 / jnp.minimum(pd2 - d2, -1e-12), 0.0, 1.0
                )
                s_star = slo + step * t2
                k0sel = kstar[:] == 0.0
                s_star = jnp.where(k0sel, jnp.ones_like(s_star), s_star)
                rgba_c = c_lo + t2[None] * (c_hi - c_lo)
                # k* == 0 snaps to the first plane; color snaps with it
                rgba_c = jnp.where(k0sel[None], rgba, rgba_c)

            iz_c = prev_iz + s_star * (izk - prev_iz)
            out_ref[0, 4] = jnp.where(sel, iz_c, out_ref[0, 4])
            out_ref[0, 0:4] = jnp.where(sel[None], rgba_c, out_ref[0, 0:4])
            prgba[:] = rgba
            lastk[0, 0] = k

        return 0

    # same bounds: crossings exist only at planes pass1 visited
    jax.lax.fori_loop(k_lo, k_hi, pass2, 0)


def prepare_translation_src(rgb, disp, mask, plan: TranslationPlan):
    """Pose-independent source preparation for the lateral march: the
    transposed (channels, x, y) padded stack plus its skip tables.
    Traced (safe inside an outer jit); pose-chunked callers compute this
    ONCE per dispatch and thread it through the chunk loop, since it
    depends only on the textures and the static plan.

    The source must already be pre-shifted (skew fold) and center-cropped
    (outpainted layers) exactly as the textures passed alongside would
    be."""
    h, w = disp.shape
    assert plan.src_w == w and plan.src_h == h, (plan, disp.shape)
    assert plan.out_h == h, (plan, "center-crop taller sources first")
    tw = _pick_tw(plan.out_w)
    bw = _round_up(plan.tab_span_x + tw + 16, 64)
    # the last out band starts at out_w - tw; its window must fit in the
    # padded source. The padded width is then rounded up to a multiple of
    # _COARSE so the skip-table reshape (wp // _COARSE cells) is exact for
    # ANY source width — an outpainted layer whose margin already covers
    # the shift range can otherwise reach here with pad_hi_x == 0 and a
    # non-8-divisible wp.
    pad_hi_x = max(0, (plan.out_w - tw) + bw - w - plan.pad_lo_x)
    pad_hi_x += -(w + plan.pad_lo_x + pad_hi_x) % _COARSE
    hp = _round_up(h, 128)
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
        ((0, 0), (plan.pad_lo_x, pad_hi_x), (0, hp - h)),
        mode="edge",
    )
    cm3, cmin3, occ2 = _skip_tables(src_t, tw)
    return src_t, cm3, cmin3, occ2


def _skip_tables(src_t, tw: int):
    """Pose-independent skip tables of a padded transposed source stack:
    sliding max/min of the coarse disparity cells (cm3/cmin3) and the
    64-bucket value-interval occupancy bitmask (occ2). Hoisted out of
    _sweep_lateral so pose-chunked trajectories build them ONCE per
    dispatch instead of once per lax.map chunk (measured +0.76 ms/frame
    of per-chunk recompute at pose_chunk=48, scratch/prof_march.py
    --stages)."""
    wp, hp = src_t.shape[1], src_t.shape[2]
    lc = 128
    # skip table: coarse (8-px) per-cell max of disparity, then a sliding
    # max over the cells a (tw+17)-px slice can touch, per 128-lane
    # y-chunk. cm3[co, c] bounds every texel _warp(k) can read when
    # ixs[k] // 8 == co - b*(tw//8).
    ncells = wp // _COARSE
    cmax = src_t[4].reshape(ncells, _COARSE, hp // lc, lc).max(axis=(1, 3))
    span = (tw + 16) // _COARSE + 1  # 10 cells for tw=64
    padded = jnp.pad(cmax, ((0, span - 1), (0, 0)), mode="edge")
    cm3 = jnp.stack(
        [padded[i : i + ncells] for i in range(span)], axis=0
    ).max(axis=0)  # (ncells, Hc)

    # 64-bucket value-interval occupancy over the same sliding region
    # (see the kernel's occ2 comment): hulls of X-ADJACENT texel pairs
    # (the lateral warp lerps x-neighbours at the same row — a 2x2 hull
    # would be needlessly loose), bucket masks OR-reduced per 8-px cell
    # and 128-lane chunk, then the sliding OR across the span.
    dsp = src_t[4]  # (Wp, Hp)
    pmx = jnp.maximum(dsp, jnp.pad(dsp[1:], ((0, 1), (0, 0)), mode="edge"))
    pmn = jnp.minimum(dsp, jnp.pad(dsp[1:], ((0, 1), (0, 0)), mode="edge"))
    blo = jnp.clip(jnp.floor(pmn * 64.0), 0, 63).astype(jnp.int32)
    bhi = jnp.clip(jnp.floor(pmx * 64.0), 0, 63).astype(jnp.int32)

    def _below(n):  # elementwise i32 mask of the n low bits, n in [0, 32]
        return jnp.where(
            n >= 32, jnp.int32(-1),
            (jnp.int32(1) << jnp.clip(n, 0, 31)) - jnp.int32(1),
        )

    w0 = _below(jnp.clip(bhi + 1, 0, 32)) & ~_below(jnp.clip(blo, 0, 32))
    w1 = _below(jnp.clip(bhi - 31, 0, 32)) & ~_below(
        jnp.clip(blo - 32, 0, 32))

    def _orr(x, axis):
        return jax.lax.reduce(
            x, jnp.int32(0), jax.lax.bitwise_or, (axis,)
        )

    occ_cell = jnp.stack(
        [
            _orr(_orr(w.reshape(ncells, _COARSE, hp // lc, lc), 1), 2)
            for w in (w0, w1)
        ],
        axis=-1,
    )  # (ncells, Hc, 2)
    span_occ = span + _OCC_EXTRA  # inter-plane IVT-segment margin
    opad = jnp.pad(
        occ_cell, ((0, span_occ - 1), (0, 0), (0, 0)), mode="edge"
    )
    occ2 = occ_cell
    for i in range(1, span_occ):
        occ2 = occ2 | opad[i : i + ncells]

    # min tables for the bounded-loop k_hi (window MIN strictly in front)
    cmin = src_t[4].reshape(ncells, _COARSE, hp // lc, lc).min(axis=(1, 3))
    padded_n = jnp.pad(cmin, ((0, span - 1), (0, 0)), mode="edge")
    cmin3 = jnp.stack(
        [padded_n[i : i + ncells] for i in range(span)], axis=0
    ).min(axis=0)  # (ncells, Hc)
    return cm3, cmin3, occ2


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "batch", "refine", "variant", "interpret",
    ),
)
def _sweep_lateral(
    src_t,  # (5, Wp, Hp) f32 transposed padded stack
    cm3,  # (ncells, Hc) f32 from _skip_tables(src_t, tw)
    cmin3,  # (ncells, Hc) f32
    occ2,  # (ncells, Hc, 2) i32
    ix_t,  # (B, K) i32 per-pose plane shift tables
    fx_t,  # (B, K) f32
    plane_invz,
    invz_min,
    invz_max,
    plan: TranslationPlan,
    num_planes: int,
    batch: int,
    refine: int = 0,
    variant: str = "grouped",
    interpret: bool = False,
):
    w, h = plan.out_w, plan.out_h
    tw = _pick_tw(w)
    lc = 128
    bw = _round_up(plan.tab_span_x + tw + 16, 64)
    wp, hp = src_t.shape[1], src_t.shape[2]
    assert (w - tw) + bw <= wp, (plan, bw, wp)
    assert hp % lc == 0, hp
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    izt = jnp.asarray(plane_invz, jnp.float32)  # (B, K) per-pose grids
    # plane thresholds in texel units: texel > tk  <=>  decoded d > izt
    # (the decode texel*(izmin-izmax)+izmax is affine with positive slope)
    tkt = (izt - izmax) / (izmin - izmax)

    ixs_i = ix_t.astype(jnp.int32).reshape(batch, num_planes)
    band_cell = jnp.arange(w // tw, dtype=jnp.int32) * (tw // _COARSE)
    co_all = band_cell[None, None, :] + (ixs_i // _COARSE)[:, :, None]
    thr_b = tkt[:, :, None, None]  # (B, K, 1, 1)
    # skip index is pure integer (ixs // 8) — bit-equal to the kernel's,
    # so no cell neighborhood / plane widening; FIN_EPS covers the ~3-ulp
    # f32 dip of the kernel's two-tap lerp below the window min (see
    # bounds.py)
    klo_t, khi_t = plane_loop_bounds(
        co_all, thr_b, num_planes,
        gather_max=lambda c: cm3[c],      # (B, K, nb, Hc)
        gather_min=lambda c: cmin3[c],
        ncells=cm3.shape[0],
    )

    scratch = [
        pltpu.VMEM((5, bw, lc), jnp.float32),
        pltpu.VMEM((tw, lc), jnp.float32),  # pdiff
        pltpu.VMEM((tw, lc), jnp.float32),  # kstar
        pltpu.VMEM((tw, lc), jnp.float32),  # pdiffc
        pltpu.VMEM((tw, lc), jnp.float32),  # diffc
        pltpu.VMEM((4, tw, lc), jnp.float32),  # prgba
        pltpu.SMEM((num_planes,), jnp.float32),  # crossflag
        pltpu.SMEM((1, 1), jnp.int32),  # lastk
        pltpu.SMEM((1, 1), jnp.float32),  # nfound
        pltpu.SemaphoreType.DMA,
    ]
    kernel = functools.partial(
        _kernel, tw=tw, bw=bw, lc=lc, num_planes=num_planes,
        refine=refine, grouped=(variant == "grouped"),
        nb=w // tw, n_hc=hp // lc,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(w // tw, hp // lc, batch),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 6, tw, lc),
            lambda b, c, p, *_: (p, 0, b, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    # cm3/klo/khi ride SMEM flattened: a multi-dim prefetch operand pads
    # its LAST dim to 128 (and 2nd-to-last to 8), so the (B, nb, 7)
    # bounds tables would cost ~18x their size and cap the pose batch
    # (measured: chunk=48 overflowed the 1 MB SMEM budget by 160 KB)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, 6, w, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        ixs_i,
        fx_t.astype(jnp.float32).reshape(batch, num_planes),
        izt,
        tkt,
        cm3.reshape(-1),
        occ2.reshape(-1),
        klo_t.reshape(-1),
        khi_t.reshape(-1),
        src_t,
    )
    # transpose back to image orientation and drop the lane padding
    out = out[:, :, :, :h].transpose(0, 1, 3, 2)  # (B, 6, H, W)
    return out[:, 5], out[:, 4], out[:, 0:4].transpose(0, 2, 3, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "num_planes", "mask_mode", "to_srgb", "refine", "raw",
        "crop_y", "variant", "interpret",
    ),
)
def render_translation_batch_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    c1,  # (B, 3): per-pose projector position in the camera frame
    f1,
    plane_invz,
    background,
    plan: TranslationPlan,
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    refine: int = 0,
    raw: bool = False,
    offset=(0.0, 0.0),
    crop_y: int = 0,
    variant: str = "grouped",
    interpret: bool = False,
    prepared=None,
):
    """Batched equivalent of sweep_march.render_translation_xla on TPU for
    the LATERAL case: c1[i] = [cx_i, 0, 0], f1 == f2. The source may be
    WIDER than the output (outpainted LDI layers — the centered-window
    offset bx rides the shift tables); source HEIGHT must equal the
    output height (the y-chunk grid maps src and out rows 1:1 — callers
    center-crop taller sources, renderer._fast_core). plane_invz may
    be (K,) shared or (B, K) per-pose (snap grids). Returns
    (B, H, W, 4); the whole batch is ONE kernel launch sharing one source
    read per tile.

    prepared: optional (src_t, cm3, cmin3, occ2) from
    prepare_translation_src — pose-chunked callers hoist the padded
    source stack and its skip tables out of the chunk loop (they depend
    only on the textures); rgb/disp/mask are then unused.

    variant: 'grouped' (default — pass 1 visits _GROUP planes per loop
    iteration, chaining the crossing state through registers) or
    'two_pass' (one plane per iteration). Identical outputs (equality-
    tested); grouped measures ~12% faster on the SFMoMA batch bench."""
    izmin = jnp.asarray(invz_min, jnp.float32)
    izmax = jnp.asarray(invz_max, jnp.float32)
    invz = jnp.asarray(plane_invz, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    batch = c1.shape[0]
    if invz.ndim == 1:
        invz = jnp.broadcast_to(invz, (batch, invz.shape[0]))
    ix_t, fx_t, _, _ = jax.vmap(
        lambda cc, pp: plane_tables(plan, pp, cc, f1, dx=offset[0])
    )(c1, invz)

    if prepared is None:
        prepared = prepare_translation_src(rgb, disp, mask, plan)
    src_t, cm3, cmin3, occ2 = prepared
    found, rstar, rgba_star = _sweep_lateral(
        src_t, cm3, cmin3, occ2, ix_t, fx_t, invz, izmin, izmax,
        plan=plan, num_planes=num_planes, batch=batch, refine=refine,
        variant=variant, interpret=interpret,
    )
    return jax.vmap(
        lambda f, r, rg, cc: _finalize(
            plan, f, r, rg, cc, f1, izmin, background,
            feathering, mask_mode, to_srgb, raw=raw, offset=offset,
            crop_y=crop_y,
        )
    )(found, rstar, rgba_star, c1)


def render_translation_pallas(
    rgb,
    disp,
    mask,
    invz_min,
    invz_max,
    c1,  # (3,)
    f1,
    plane_invz,
    background,
    plan: TranslationPlan,
    num_planes: int,
    feathering: float = 0.1,
    mask_mode: str = "none",
    to_srgb: bool = True,
    refine: int = 0,
    raw: bool = False,
    offset=(0.0, 0.0),
    crop_y: int = 0,
    interpret: bool = False,
):
    """Single-pose wrapper: a batch of 1 through the batched kernel."""
    out = render_translation_batch_pallas(
        rgb, disp, mask, invz_min, invz_max,
        jnp.asarray(c1, jnp.float32)[None], f1, plane_invz, background,
        plan=plan, num_planes=num_planes, feathering=feathering,
        mask_mode=mask_mode, to_srgb=to_srgb, refine=refine, raw=raw,
        offset=offset, crop_y=crop_y, interpret=interpret,
    )
    if raw:
        return out[0][0], out[1][0], out[2][0], out[3][0]
    return out[0]
