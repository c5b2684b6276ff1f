"""Multi-chip rendering: image-tile, frame, and projector parallelism.

The reference is single-browser/single-GPU (SURVEY.md section 2.5); this is
the TPU-native scaling design it lacks:

  * TILE parallelism (the TP/SP analog): the output framebuffer is sharded
    over a mesh axis; every device renders its row-band of the same virtual
    image (pure map — each ray march reads only the replicated source
    textures, so no collectives are needed until assembly).
  * FRAME parallelism (the DP analog): a trajectory's cameras are sharded
    over a mesh axis; each device renders different frames.
  * PROJECTOR (view) parallelism (the EP analog): each device renders a
    different projector; the fused image is a nearest-depth merge across
    the view axis using `pmax`/`psum` collectives over ICI.

All entry points take an explicit `jax.sharding.Mesh`; tests exercise them
on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.pose import relative_view_pose
from ..ops import raycast as _raycast

__all__ = [
    "make_mesh",
    "render_view_tiled",
    "render_trajectory_sharded",
    "render_fast_trajectory_sharded",
    "render_fused_projectors",
]


def make_mesh(axis_names=("tile",), shape=None, devices=None) -> Mesh:
    """A Mesh over the available devices (1-D by default)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devices.reshape(shape), axis_names)


def _projector_kernel_args(projector, camera):
    """(array args..., static kwargs) for ops.raycast.render_mono."""
    pos, rot = relative_view_pose(
        np.asarray(projector.position, np.float64),
        np.asarray(projector.rotation, np.float64),
        np.asarray(camera.position, np.float64),
        np.asarray(camera.rotation, np.float64),
    )
    baseline = jnp.asarray(projector.baseline, jnp.float32)
    arrays = (
        jnp.asarray(projector.rgb),
        jnp.asarray(projector.disp),
        jnp.asarray(projector.mask),
        jnp.asarray(projector.layer_res),
        jnp.asarray(projector.invz_min, jnp.float32) / baseline,
        jnp.asarray(projector.invz_max, jnp.float32) / baseline,
        jnp.asarray(projector.focal),
        jnp.asarray(projector.skew),
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rot, jnp.float32),
        jnp.asarray(camera.focal_px, jnp.float32),
        jnp.asarray(camera.skew, jnp.float32),
    )
    return arrays


def render_view_tiled(
    projector,
    camera,
    mesh: Mesh,
    axis_name: str = "tile",
    background=(0.0, 0.0, 0.0, 0.0),
    mask_mode: str | None = None,
    **kwargs,
):
    """Render one view with the output image row-sharded over `axis_name`.

    Source textures are replicated; device i renders rows
    [i*H/n, (i+1)*H/n). Returns the assembled (H, W, 4) image (sharded
    array; XLA inserts the gather on host fetch)."""
    n = mesh.shape[axis_name]
    if camera.height % n:
        raise ValueError(f"height {camera.height} not divisible by {n} tiles")
    tile_h = camera.height // n
    if mask_mode is None:
        mask_mode = "multiply" if projector.num_layers > 1 else "none"

    arrays = _projector_kernel_args(projector, camera)
    bg = jnp.asarray(background, jnp.float32)

    def tile_fn(*args):
        i = jax.lax.axis_index(axis_name)
        return _raycast.render_mono(
            *args[:-1],
            args[-1],
            out_w=camera.width,
            out_h=tile_h,
            num_layers=projector.num_layers,
            full_h=camera.height,
            row_start=i * tile_h,
            mask_mode=mask_mode,
            **kwargs,
        )

    fn = shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=tuple(P() for _ in range(len(arrays) + 1)),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    return fn(*arrays, bg)


def render_trajectory_sharded(
    projector,
    cameras_positions,
    cameras_rotations,
    camera_template,
    mesh: Mesh,
    axis_name: str = "frame",
    background=(0.0, 0.0, 0.0, 0.0),
    mask_mode: str | None = None,
    **kwargs,
):
    """Render a batch of frames, sharded over `axis_name` (data parallel).

    `cameras_positions` (F, 3) / `cameras_rotations` (F, 3, 3) are world
    camera poses; F must be divisible by the axis size. Frames are rendered
    with the batch-polymorphic kernel (leading batch dim broadcast, not
    vmap). Returns (F, H, W, 4) sharded on frames."""
    n = mesh.shape[axis_name]
    f = len(cameras_positions)
    if f % n:
        raise ValueError(f"{f} frames not divisible by {n} devices")
    if mask_mode is None:
        mask_mode = "multiply" if projector.num_layers > 1 else "none"

    # camera-local projector pose per frame (host-side, tiny)
    pos = np.zeros((f, 3), np.float32)
    rot = np.zeros((f, 3, 3), np.float32)
    for i in range(f):
        p_i, r_i = relative_view_pose(
            np.asarray(projector.position, np.float64),
            np.asarray(projector.rotation, np.float64),
            np.asarray(cameras_positions[i], np.float64),
            np.asarray(cameras_rotations[i], np.float64),
        )
        pos[i] = p_i
        rot[i] = r_i

    baseline = jnp.asarray(projector.baseline, jnp.float32)
    shared = (
        jnp.asarray(projector.rgb),
        jnp.asarray(projector.disp),
        jnp.asarray(projector.mask),
        jnp.asarray(projector.layer_res),
        jnp.asarray(projector.invz_min, jnp.float32) / baseline,
        jnp.asarray(projector.invz_max, jnp.float32) / baseline,
        jnp.asarray(projector.focal),
        jnp.asarray(projector.skew),
    )
    cam = camera_template

    def frames_fn(pos_shard, rot_shard, *args):
        return _raycast.render_mono(
            *args[:8],
            pos_shard,  # (F/n, 3) -> batch dims broadcast in the kernel
            rot_shard,
            jnp.asarray(cam.focal_px, jnp.float32),
            jnp.asarray(cam.skew, jnp.float32),
            jnp.asarray(background, jnp.float32),
            out_w=cam.width,
            out_h=cam.height,
            num_layers=projector.num_layers,
            mask_mode=mask_mode,
            **kwargs,
        )

    fn = shard_map(
        frames_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)) + tuple(P() for _ in shared),
        out_specs=P(axis_name, None, None, None),
        check_vma=False,
    )
    return fn(jnp.asarray(pos), jnp.asarray(rot), *shared)


def _fuse_across_views(rgba, front_inv_depth, background, axis_name,
                       to_srgb: bool = True, fuse_tol: float | None = None):
    """Tolerance-blended nearest-surface merge across the sharded view axis.

    rgba: this view's composited (premultiplied) LDI render; front_inv_depth
    its frontmost hit in ABSOLUTE 1/m units (comparable across projectors
    with different baselines), 0 where nothing was hit. The frontmost
    surface is found with `pmax`; candidates within the relative depth
    tolerance blend with triangular weights via `psum`s (the same
    _fusion_weights spec as the single-chip render_fused_fast — a hard
    argmax flips winners on depth-discretization noise when several
    projectors see the same surface). Deterministic under any device
    order; fuse_tol=0 recovers hard nearest-wins with tie averaging."""
    from ..config import DEFAULT_CONFIG
    from ..models.renderer import _fusion_weights

    tol = DEFAULT_CONFIG.fuse_tol if fuse_tol is None else fuse_tol
    hit = rgba[..., 3] > 0.0
    key = jnp.where(hit, front_inv_depth, -jnp.inf)
    best = jax.lax.pmax(key, axis_name)
    w = _fusion_weights(key, best, hit, tol)
    wsum = jnp.maximum(jax.lax.psum(w, axis_name), 1e-12)
    color = jax.lax.psum(w[..., None] * rgba[..., :3], axis_name) / wsum[..., None]
    alpha = jax.lax.psum(w * rgba[..., 3], axis_name) / wsum
    alpha = jnp.where(jnp.isfinite(best), alpha, 0.0)
    from ..ops.composite import finish_over_background

    return finish_over_background(color, alpha, background, to_srgb=to_srgb)


def render_fused_projectors(
    projectors,
    camera,
    mesh: Mesh,
    axis_name: str = "view",
    background=(0.0, 0.0, 0.0, 0.0),
    mask_mode: str | None = None,
    to_srgb: bool = True,
    fuse_tol: float | None = None,
    **kwargs,
):
    """Fuse multiple projectors into one view, projector-sharded.

    Each device raycasts ITS projector — the FULL LDI stack, composited
    front-to-back with the reference's mask semantics — then the fused
    image is assembled with collectives over ICI: the frontmost absolute
    inverse depth via `pmax`, then a tolerance-blended merge with
    weighted `psum`s (_fuse_across_views). This is the multi-projector fusion the reference
    lacks (it renders only the first projector; HoloRenderer.ts:186-189).

    mask_mode: None -> per-projector reference default (multiply for LDI,
    none for single-layer), or explicit 'multiply'/'none'.
    """
    n = mesh.shape[axis_name]
    if len(projectors) != n:
        raise ValueError(f"need exactly {n} projectors for a {n}-way mesh")

    p0 = projectors[0]
    num_layers = max(p.num_layers for p in projectors)
    poss, rots = [], []
    for p in projectors:
        if (p.height, p.width) != (p0.height, p0.width):
            raise ValueError("fused projectors must share dimensions")
        pos, rot = relative_view_pose(
            np.asarray(p.position, np.float64),
            np.asarray(p.rotation, np.float64),
            np.asarray(camera.position, np.float64),
            np.asarray(camera.rotation, np.float64),
        )
        poss.append(pos)
        rots.append(rot)

    stack = lambda xs, dt=jnp.float32: jnp.asarray(np.stack(xs), dt)
    bg = jnp.asarray(background, jnp.float32)
    modes = tuple(
        (mask_mode or ("multiply" if p.num_layers > 1 else "none"))
        for p in projectors
    )
    if len(set(modes)) != 1:
        # shard_map traces ONE program for all shards; mixed per-view mask
        # modes would need branching on the axis index. Use the common
        # reference behaviour of the group.
        modes = ("multiply",) * n
    mode = modes[0]
    layer_counts = tuple(p.num_layers for p in projectors)

    def view_fn(rgb, disp, m_arr, layer_res, izmin, izmax, focal, skew,
                pos, rot, nlay):
        # shard_map gives each device a leading dim of 1; drop it
        rgb, disp, m_arr = rgb[0], disp[0], m_arr[0]
        layer_res, izmin, izmax = layer_res[0], izmin[0], izmax[0]
        focal, skew, pos, rot = focal[0], skew[0], pos[0], rot[0]
        nlay = nlay[0]

        s2x, s2y = _raycast._pixel_grid(camera.width, camera.height)
        from ..core.transforms import mat_from_focal, mm

        fskr2 = _raycast.build_fskr2(
            jnp.asarray(camera.focal_px, jnp.float32),
            float(camera.width),
            float(camera.height),
            jnp.asarray(camera.skew, jnp.float32),
        )
        skr1 = _raycast.build_skr1(skew, rot)

        acc_rgb = jnp.zeros((camera.height, camera.width, 3), jnp.float32)
        acc_a = jnp.zeros((camera.height, camera.width), jnp.float32)
        front = jnp.zeros((camera.height, camera.width), jnp.float32)
        for i in range(num_layers):
            w_i = layer_res[i, 0]
            h_i = layer_res[i, 1]
            fskr1 = mm(
                mat_from_focal(focal[i] / w_i, focal[i] / h_i), skr1
            )
            rgba, invz2, _ = _raycast.raycast_layer(
                s2x, s2y, fskr1, pos, fskr2, jnp.zeros(3, jnp.float32),
                rgb[i], disp[i], m_arr[i], izmin[i], izmax[i],
                w_i, h_i, bg[:3], 0.1, mask_mode=mode, **kwargs,
            )
            live = (jnp.float32(i) < nlay).astype(jnp.float32)
            a = rgba[..., 3] * live
            acc_rgb = acc_rgb + (1.0 - acc_a[..., None]) * a[..., None] * rgba[..., :3]
            # frontmost hit inverse depth. invz2 is ALREADY absolute 1/m:
            # the layer izmin/izmax fed to the kernel were divided by
            # baseline above, and depth = baseline/invz_LIF — so it
            # compares across projectors with different baselines as-is
            # (dividing by baseline again was a measured bug that made
            # the farther surface win; tests/test_fusion.py)
            new_hit = (a > 0.0) & (front == 0.0)
            front = jnp.where(new_hit, invz2, front)
            acc_a = acc_a + (1.0 - acc_a) * a
        view_rgba = jnp.concatenate([acc_rgb, acc_a[..., None]], axis=-1)
        return _fuse_across_views(
            view_rgba, front, bg, axis_name, to_srgb=to_srgb,
            fuse_tol=fuse_tol,
        )[None]

    fn = shard_map(
        view_fn,
        mesh=mesh,
        in_specs=tuple(P(axis_name) for _ in range(11)),
        out_specs=P(axis_name, None, None, None),
        check_vma=False,
    )
    def padL(a, pad_edge=True):
        """Pad a per-layer leading axis to the shared num_layers (edge
        padding keeps intrinsics/dims valid; padded layers are dead via
        the `live` gate)."""
        a = np.asarray(a)
        if a.shape[0] == num_layers:
            return a
        reps = [(0, num_layers - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, reps, mode="edge" if pad_edge else "constant")

    out = fn(
        stack([padL(p.rgb) for p in projectors]),
        stack([padL(p.disp) for p in projectors]),
        stack([padL(p.mask) for p in projectors]),
        stack([padL(p.layer_res) for p in projectors]),
        stack([padL(np.asarray(p.invz_min) / float(p.baseline)) for p in projectors]),
        stack([padL(np.asarray(p.invz_max) / float(p.baseline)) for p in projectors]),
        stack([padL(p.focal) for p in projectors]),
        stack([np.asarray(p.skew) for p in projectors]),
        stack(poss),
        stack(rots),
        stack([float(c) for c in layer_counts]),
    )
    return out[0]  # all shards carry the same fused image


def render_fast_trajectory_sharded(
    projector,
    cameras_positions,
    camera_template,
    mesh: Mesh,
    axis_name: str = "frame",
    background=(0.0, 0.0, 0.0, 0.0),
    num_planes: int | None = None,
    feathering: float = 0.1,
    mask_mode: str | None = None,
    to_srgb: bool = True,
):
    """Data-parallel trajectory rendering on the PRODUCTION fast kernel:
    frames shard over `axis_name`, each device runs the batched
    first-crossing march (Pallas on TPU, the XLA oracle elsewhere) on its
    frame shard against replicated source textures. The multi-chip
    counterpart of models.renderer.render_fast_batch; the raycast-kernel
    variant is render_trajectory_sharded.

    `cameras_positions` (F, 3) world camera positions; poses must be
    LATERAL relative to the projector (x-only translation, no rotation,
    matched focal/dims) — the march's reduction. F must divide by the
    axis size. Returns (F, H, W, 4) sharded on frames.
    """
    from ..models.renderer import (
        _march_eligible,
        _march_plan_tables,
        _prepared_textures,
    )
    from ..ops import composite as _composite
    from ..ops import sweep_march as _sweep_march

    n = mesh.shape[axis_name]
    f = len(cameras_positions)
    if f % n:
        raise ValueError(f"{f} frames not divisible by {n} devices")
    cam = camera_template
    if mask_mode is None:
        # reference default: LDI projectors multiply the mask into alpha
        mask_mode = "multiply" if projector.num_layers > 1 else "none"
    if (
        float(np.abs(np.asarray(projector.skew)).sum()) > 1e-9
        or float(np.abs(np.asarray(cam.skew)).sum()) > 1e-9
    ):
        raise ValueError(
            "render_fast_trajectory_sharded does not support skewed "
            "frustums; use render_fast_batch per shard"
        )

    pos = np.zeros((f, 3), np.float64)
    for i in range(f):
        p_i, r_i = relative_view_pose(
            np.asarray(projector.position, np.float64),
            np.asarray(projector.rotation, np.float64),
            np.asarray(cameras_positions[i], np.float64),
            np.asarray(cam.rotation, np.float64),
        )
        if not np.allclose(r_i, np.eye(3), atol=1e-5) or (
            abs(p_i[1]) > 1e-9 or abs(p_i[2]) > 1e-9
        ):
            raise ValueError(
                "render_fast_trajectory_sharded needs lateral poses; use "
                "render_trajectory_sharded for arbitrary trajectories"
            )
        pos[i] = p_i

    # per-LAYER march setup: the shard body composites the full LDI
    # front-to-back exactly like the single-chip batched core
    # (round-2 VERDICT item 6 lifted the single-layer restriction)
    tex = _prepared_textures(projector)
    plans, tabs, ks, crops, texs, consts = [], [], [], [], [], []
    for lay in tex["layers"]:
        if not _march_eligible(lay, float(cam.focal_px), cam.width,
                               cam.height):
            raise ValueError(
                "render_fast_trajectory_sharded needs matched focal and "
                "even-margin dims per layer and an 8-divisible width"
            )
        crop_y = (lay["h"] - cam.height) // 2
        plan, tables, k = _march_plan_tables(
            dict(lay, h=cam.height), pos[:, 0].tolist(), cam.width,
            cam.height, explicit_planes=num_planes,
        )
        rgb_l, disp_l, mask_l = lay["rgb"], lay["disp"], lay["mask"]
        if crop_y:
            rgb_l = rgb_l[crop_y : crop_y + cam.height]
            disp_l = disp_l[crop_y : crop_y + cam.height]
            mask_l = mask_l[crop_y : crop_y + cam.height]
        plans.append(plan)
        tabs.append(tables)
        ks.append(k)
        crops.append(crop_y)
        texs.append((rgb_l, disp_l, mask_l))
        consts.append((lay["izmin_host"], lay["izmax_host"], lay["focal"]))
    bg = jnp.asarray(background, jnp.float32)
    zero_bg = jnp.zeros(4, jnp.float32)
    plans_t = tuple(plans)
    ks_t = tuple(ks)
    crops_t = tuple(crops)

    def shard_fn(c1_shard, tab_shards, tex_args):
        result_rgb = None
        result_a = None
        for idx in range(len(plans_t)):
            rgb_l, disp_l, mask_l = tex_args[idx]
            izmin_l, izmax_l, focal_l = consts[idx]
            layer = _sweep_march.render_translation_batch(
                rgb_l, disp_l, mask_l, izmin_l, izmax_l,
                c1_shard, focal_l, tab_shards[idx], zero_bg,
                plan=plans_t[idx], num_planes=ks_t[idx],
                feathering=feathering, mask_mode=mask_mode,
                to_srgb=False, crop_y=crops_t[idx],
            )
            la = layer[..., 3]
            if result_rgb is None:
                result_rgb = layer[..., :3]
                result_a = la
            else:
                result_rgb = (
                    result_rgb + (1.0 - result_a[..., None]) * layer[..., :3]
                )
                result_a = result_a + (1.0 - result_a) * la
        return _composite.finish_over_background(
            result_rgb, result_a, bg, to_srgb
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axis_name),
            tuple(P(axis_name) for _ in plans_t),
            tuple((P(), P(), P()) for _ in plans_t),
        ),
        out_specs=P(axis_name, None, None, None),
        check_vma=False,
    )
    return fn(
        jnp.asarray(pos, jnp.float32),
        tuple(tabs),
        tuple(texs),
    )
