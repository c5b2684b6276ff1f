"""Shared [k_lo, k_hi) bounded-loop table scan for the sweep kernels.

Each Pallas sweep kernel's host-side twin replicates the kernel's
per-plane skip-index math over (B, K, bands, chunks) and derives, per
grid program, the half-open plane range the kernel must visit:

* ``k_lo``: the first plane whose sliding-MAX coarse test passes —
  earlier planes are provably inactive (the kernel's own skip test
  would reject them), so the loop can start there.
* ``k_hi``: one past the first plane at which the sliding-window MIN
  of every texel the warp can read is strictly in front of the plane
  — every still-unfound pixel is then guaranteed to cross, so no
  later plane can be anyone's FIRST crossing.

The k_hi guarantee must survive f32, and exact-arithmetic reasoning
("a convex combination is >= the min") does not: the kernels collapse
their windows with clipped hat weights, and the weight sum drops
below 1 whenever a position dips under the slab base (the clip floor
at -1.0), attenuating the interpolated value BELOW the window min:

* lateral march: pure two-tap lerp — (1-fx) rounds, the sum rounds;
  dip <= ~3 ulps of the texel magnitude (<= ~4e-7 in [0,1] units);
* scaled kernel: positions are affine in the pixel index, so band-edge
  mins DO bound interior values and only expression rounding remains
  (<= ~1e-4 px at window spans ~1e3, i.e. weight dip <= ~1e-4);
* target kernel: the per-band diag is a homography chord — at most
  one interior extremum, which can dip below BOTH edge columns by the
  chord-curvature deviation over the 8-px band (<< 1e-3 px for any
  pose the planner accepts) plus the same expression rounding.

``fin_scale``/``fin_eps`` make the finish test conservative against
all of these: it becomes  ``min * fin_scale > thr + fin_eps``, so a
relative weight attenuation up to (1 - fin_scale) and absolute
rounding up to fin_eps cannot break the crossing guarantee (texels
are >= 0, so value >= weight_sum * window_min). The cost is at most
~1 extra plane per band: plane thresholds step by ~1/K in texel
units, far coarser than the margins.
"""

from __future__ import annotations

import jax.numpy as jnp

# Absolute slack (texel units, values in [0, 1]) covering comparison
# and lerp rounding: ~40x the worst ~3-ulp dip at magnitude 1.
FIN_EPS = 1e-5

# Relative slack for the separable hat-collapse kernels (scaled /
# target): covers combined x+y weight attenuation up to 1/256 px,
# ~4-40x the bounded curvature + rounding dips documented above.
HAT_FIN_SCALE = 1.0 - 1.0 / 256.0


def plane_loop_bounds(
    co_all,
    thr,
    num_planes: int,
    *,
    gather_max,
    gather_min,
    ncells: int,
    neighborhood=(0,),
    widen: int = 0,
    fin_scale: float = 1.0,
    fin_eps: float = FIN_EPS,
):
    """Scan per-plane activity/finish masks into int32 (k_lo, k_hi).

    ``co_all``: (B, K, ...) coarse-cell indices, the kernel's own skip
    index recomputed on host. ``thr``: plane thresholds broadcastable
    against the gathered tables. ``gather_max(cells)`` /
    ``gather_min(cells)`` look up the sliding coarse max/min tables at
    clipped cell indices (the gather layout differs per kernel).

    ``neighborhood``/``widen`` absorb twin-vs-kernel f32 divergence
    where the twin CANNOT be bit-exact (the scaled/target twins
    re-derive the kernel's skip index with possibly different FMA
    contraction, so a floor() can flip by one cell at razor-edge
    values): the activity test is OR-ed (finish AND-ed) over the cell
    neighborhood, and the plane range grows by ``widen`` on each side.
    The lateral march's skip index is pure integer math — bit-equal by
    construction — so it passes ``(0,)`` / ``widen=0``.
    """
    act = None
    fin = None
    thr_fin = thr + fin_eps
    for d in neighborhood:
        cod = jnp.clip(co_all + d, 0, ncells - 1)
        a = gather_max(cod) > thr
        f = gather_min(cod) * fin_scale > thr_fin
        act = a if act is None else act | a
        fin = f if fin is None else fin & f
    klo = jnp.where(
        act.any(axis=1), jnp.argmax(act, axis=1) - widen, num_planes
    )
    klo = jnp.maximum(klo, 0)
    khi = jnp.where(
        fin.any(axis=1), jnp.argmax(fin, axis=1) + 1 + widen, num_planes
    )
    khi = jnp.maximum(jnp.minimum(khi, num_planes), klo)
    return klo.astype(jnp.int32), khi.astype(jnp.int32)
