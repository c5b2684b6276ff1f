"""Renderer: render-mode dispatch from (projectors, camera) to images.

The TPU-native replacement for the reference's orchestration layer
(reference: src/HoloRenderer.ts:139-332 mode dispatch + uniform marshaling,
src/RaycastPlane.ts:455-731 uniform derivation): instead of scene-graph
hooks and camera-child planes, a pure function computes the camera-local
relative pose and calls the jitted kernels directly.
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.pose import relative_view_pose
from ..ops import raycast as _raycast
from ..ops import stereo as _stereo
from ..ops import sweep_fast as _sweep_fast
from .projector import Projector

__all__ = [
    "RenderMode",
    "render",
    "render_fast_view",
    "render_mono_view",
    "render_stereo_view",
]

RenderMode = Literal["raycast", "stereo", "mesh", "fast"]

# plane-table cache for the fast path: quantile computation reads the whole
# disparity map on the host, which must not happen per frame. Keyed by the
# identity of the projector's disp buffer; the stored strong reference keeps
# the id stable while cached.
_PLANE_CACHE: dict = {}
_PLANE_CACHE_MAX = 64


def _prepared_fast(projector, num_planes):
    """Per-projector constants for the fast path, computed once and cached:
    device-resident per-layer texture slices, quantile plane tables (scene-
    adaptive placement — planes where surfaces are, vital when the invz
    range spans orders of magnitude), skew validity, baseline-normalized
    ranges. Per-frame work must not touch the host or dispatch eager device
    ops (each costs ~28 ms through the axon tunnel)."""
    key = (id(projector.disp), num_planes)
    hit = _PLANE_CACHE.get(key)
    if hit is not None and hit[0] is projector.disp:
        return hit[1]

    baseline = float(np.asarray(projector.baseline))
    skew_ok = float(np.abs(np.asarray(projector.skew)).sum()) < 1e-9
    layers = []
    for i in range(projector.num_layers):
        w_i = int(projector.layer_res[i, 0])
        h_i = int(projector.layer_res[i, 1])
        disp_host = np.asarray(projector.disp[i, :h_i, :w_i])
        izmin_f = float(np.asarray(projector.invz_min[i])) / baseline
        izmax_f = float(np.asarray(projector.invz_max[i])) / baseline
        qs = np.quantile(
            disp_host, np.linspace(0.002, 0.998, num_planes)
        ).astype(np.float32)
        qs = np.maximum.accumulate(qs)  # enforce monotonic
        qs = qs[::-1].copy()  # near (high disp) first
        plane_invz = izmax_f + (izmin_f - izmax_f) * qs
        # keep planes strictly descending (dedupe flat regions)
        eps = (izmin_f - izmax_f) * 1e-5
        plane_invz = plane_invz - np.arange(num_planes, dtype=np.float32) * eps
        layers.append(
            dict(
                rgb=jnp.asarray(projector.rgb[i, :h_i, :w_i]),
                disp=jnp.asarray(projector.disp[i, :h_i, :w_i]),
                mask=jnp.asarray(projector.mask[i, :h_i, :w_i]),
                focal=jnp.float32(float(np.asarray(projector.focal[i]))),
                izmin=jnp.float32(izmin_f),
                izmax=jnp.float32(izmax_f),
                plane_invz=jnp.asarray(plane_invz),
            )
        )
    prepared = {"skew_ok": skew_ok, "layers": layers}

    if len(_PLANE_CACHE) >= _PLANE_CACHE_MAX:
        _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))
    _PLANE_CACHE[key] = (projector.disp, prepared)
    return prepared


def _relative(projector: Projector, camera: Camera):
    """Projector pose in the camera frame (Z-negated position), and the
    baseline-normalized inverse-depth ranges the kernels expect.
    reference: RaycastPlane.ts:597-676 (pose), :476-478 (invZ/baseline)."""
    pos, rot = relative_view_pose(
        np.asarray(projector.position, np.float64),
        np.asarray(projector.rotation, np.float64),
        np.asarray(camera.position, np.float64),
        np.asarray(camera.rotation, np.float64),
    )
    baseline = jnp.asarray(projector.baseline, jnp.float32)
    return (
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rot, jnp.float32),
        jnp.asarray(projector.invz_min, jnp.float32) / baseline,
        jnp.asarray(projector.invz_max, jnp.float32) / baseline,
    )


def render_mono_view(
    projector: Projector,
    camera: Camera,
    background=(0.0, 0.0, 0.0, 0.0),
    feathering: float = 0.1,
    to_srgb: bool = True,
    num_steps: int = _raycast.NUM_STEPS,
    mask_mode: str | None = None,
):
    """Render one projector into the camera: the raycast ('raytracing')
    mode. Returns (H, W, 4) GL-oriented.

    mask_mode defaults to the reference behaviour: LDI projectors multiply
    the bilinear mask into alpha; single-layer maskless projectors use the
    taper only (uNumLayers == 0 path, rayCastMonoLDI.glsl:277-279).
    """
    c1, rot1, izmin, izmax = _relative(projector, camera)
    if mask_mode is None:
        mask_mode = "multiply" if projector.num_layers > 1 else "none"
    return _raycast.render_mono(
        jnp.asarray(projector.rgb),
        jnp.asarray(projector.disp),
        jnp.asarray(projector.mask),
        jnp.asarray(projector.layer_res),
        izmin,
        izmax,
        jnp.asarray(projector.focal),
        jnp.asarray(projector.skew),
        c1,
        rot1,
        jnp.asarray(camera.focal_px, jnp.float32),
        jnp.asarray(camera.skew, jnp.float32),
        jnp.asarray(background, jnp.float32),
        out_w=camera.width,
        out_h=camera.height,
        num_layers=projector.num_layers,
        feathering=feathering,
        num_steps=num_steps,
        mask_mode=mask_mode,
        to_srgb=to_srgb,
    )


def render_stereo_view(
    left: Projector,
    right: Projector,
    camera: Camera,
    background=(0.0, 0.0, 0.0, 0.0),
    feathering: float = 0.1,
    to_srgb: bool = True,
    num_steps: int = _raycast.NUM_STEPS,
):
    """Render blending two projectors (the stereo mode).
    reference: RaycastPlane.ts:812-843 + rayCastStereoLDI.glsl."""
    c1_l, rot1_l, izmin_l, izmax_l = _relative(left, camera)
    c1_r, rot1_r, izmin_r, izmax_r = _relative(right, camera)
    num_layers = min(left.num_layers, right.num_layers)
    return _stereo.render_stereo(
        jnp.asarray(left.rgb),
        jnp.asarray(left.disp),
        jnp.asarray(left.mask),
        jnp.asarray(left.layer_res),
        izmin_l,
        izmax_l,
        jnp.asarray(left.focal),
        jnp.asarray(left.skew),
        c1_l,
        rot1_l,
        jnp.asarray(right.rgb),
        jnp.asarray(right.disp),
        jnp.asarray(right.mask),
        jnp.asarray(right.layer_res),
        izmin_r,
        izmax_r,
        jnp.asarray(right.focal),
        jnp.asarray(right.skew),
        c1_r,
        rot1_r,
        jnp.asarray(camera.focal_px, jnp.float32),
        jnp.asarray(camera.skew, jnp.float32),
        jnp.asarray(background, jnp.float32),
        out_w=camera.width,
        out_h=camera.height,
        num_layers=num_layers,
        feathering=feathering,
        num_steps=num_steps,
        to_srgb=to_srgb,
    )


def render_fast_view(
    projector: Projector,
    camera: Camera,
    background=(0.0, 0.0, 0.0, 0.0),
    feathering: float = 0.1,
    to_srgb: bool = True,
    num_planes: int = 40,
    chunk: int = 2,
    exact_color: bool = False,
):
    """MXU plane-sweep render (ops/sweep_fast) — the fast path.

    Translated (rotation-free) views run the fully gather-free sweep (~70x
    the march's throughput on v5e); rotated views run the two-phase rotated
    path (aligned depth solve + two gathers, ~20x). LDI layers composite
    front-to-back. exact_color=True (aligned case) solves the per-pixel
    surface depth and fetches the color with ONE bilinear gather at the
    exact parallax position — march-like quality at ~half the fast fps."""
    pos_np, rot_np = relative_view_pose(
        np.asarray(projector.position, np.float64),
        np.asarray(projector.rotation, np.float64),
        np.asarray(camera.position, np.float64),
        np.asarray(camera.rotation, np.float64),
    )
    rotated = not np.allclose(rot_np, np.eye(3), atol=1e-5)
    c1 = jnp.asarray(pos_np, jnp.float32)
    rot1 = jnp.asarray(rot_np, jnp.float32)

    prepared = _prepared_fast(projector, num_planes)
    if not prepared["skew_ok"] or float(np.abs(np.asarray(camera.skew)).sum()) > 1e-9:
        raise ValueError("render_fast_view does not support skewed frustums")

    f2 = jnp.float32(float(camera.focal_px))
    zero_bg = jnp.zeros(4, jnp.float32)
    result_rgb = None
    result_a = None
    for lay in prepared["layers"]:
        common = dict(
            out_w=camera.width,
            out_h=camera.height,
            focal1=lay["focal"],
            num_planes=num_planes,
            chunk=chunk,
            feathering=feathering,
            to_srgb=False,
            plane_invz=lay["plane_invz"],
        )
        if rotated:
            layer = _sweep_fast.render_rotated(
                lay["rgb"], lay["disp"], lay["mask"],
                lay["izmin"], lay["izmax"], c1, rot1, f2, zero_bg,
                **common,
            )
        else:
            layer = _sweep_fast.render_sweep_aligned(
                lay["rgb"], lay["disp"], lay["mask"],
                lay["izmin"], lay["izmax"], c1, f2, zero_bg,
                **common,
                exact_color=exact_color,
            )
        la = layer[..., 3]
        if result_rgb is None:
            result_rgb = layer[..., :3]
            result_a = la
        else:
            result_rgb = result_rgb + (1.0 - result_a[..., None]) * layer[..., :3]
            result_a = result_a + (1.0 - result_a) * la
    bg = jnp.asarray(background, jnp.float32)
    out_rgb = bg[:3] * bg[3] * (1.0 - result_a[..., None]) + result_rgb
    out_a = bg[3] + result_a * (1.0 - bg[3])
    if to_srgb:
        from ..core.color import linear_to_srgb

        out_rgb = linear_to_srgb(out_rgb)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)


def render(
    projectors: Projector | Sequence[Projector],
    camera: Camera,
    mode: RenderMode = "raycast",
    **kwargs,
):
    """Render-mode dispatch (the HoloRenderer.onBeforeRender analog,
    reference HoloRenderer.ts:139-204):

      * 'raycast': per-pixel inverse-depth march of the first projector
        (the reference's raytracing mode renders projector 0;
        HoloRenderer.ts:186-189 renders only the first in mesh mode too).
      * 'stereo': two projectors blended in one pass.
      * 'mesh': forward-splat of the projector's pixel grid
        (ops.splat; the reference's default mesh mode).
    """
    plist = list(projectors) if isinstance(projectors, (list, tuple)) else [projectors]
    if mode == "raycast":
        return render_mono_view(plist[0], camera, **kwargs)
    if mode == "fast":
        return render_fast_view(plist[0], camera, **kwargs)
    if mode == "stereo":
        if len(plist) < 2:
            raise ValueError("stereo mode needs two projectors")
        return render_stereo_view(plist[0], plist[1], camera, **kwargs)
    if mode == "mesh":
        from ..ops import splat as _splat

        return _splat.render_mesh_view(plist[0], camera, **kwargs)
    raise ValueError(f"unknown render mode: {mode}")
