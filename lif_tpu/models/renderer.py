"""Renderer: render-mode dispatch from (projectors, camera) to images.

The TPU-native replacement for the reference's orchestration layer
(reference: src/HoloRenderer.ts:139-332 mode dispatch + uniform marshaling,
src/RaycastPlane.ts:455-731 uniform derivation): instead of scene-graph
hooks and camera-child planes, a pure function computes the camera-local
relative pose and calls the jitted kernels directly.
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.pose import relative_view_pose
from ..ops import raycast as _raycast
from ..ops import stereo as _stereo
from ..ops import sweep_fast as _sweep_fast
from ..ops import sweep_march as _sweep_march
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


def _hybrid_planes(disp_host, izmin_f, izmax_f, num_planes):
    """Scene-adaptive inverse-depth plane table, near -> far (descending):
    75% disparity quantiles (planes where surfaces are — vital when the
    invz range spans orders of magnitude) + 25% uniform coverage (edges
    cross in the gaps between disparity modes). Measured on the SFMoMA
    900:1 range: hybrid placement gains ~1-3 dB over pure quantiles."""
    kq = num_planes - num_planes // 4
    qs = np.quantile(disp_host, np.linspace(0.002, 0.998, kq)).astype(
        np.float32
    )
    vals = np.concatenate(
        [
            izmax_f + (izmin_f - izmax_f) * qs,
            izmax_f
            + (izmin_f - izmax_f)
            * np.linspace(0.001, 0.999, num_planes - kq).astype(np.float32),
        ]
    )
    vals = np.sort(vals)[::-1].copy()
    # keep planes strictly descending (dedupe flat regions)
    eps = (izmin_f - izmax_f) * 1e-6
    return vals - np.arange(num_planes, dtype=np.float32) * eps


def _prepared_fast(projector, num_planes):
    """Per-projector constants for the fast path, computed once and cached:
    device-resident per-layer texture slices, hybrid plane tables, skew
    validity, baseline-normalized ranges. Per-frame work must not touch the
    host or dispatch eager device ops (each costs ~28 ms through the axon
    tunnel)."""
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
        plane_invz = _hybrid_planes(disp_host, izmin_f, izmax_f, num_planes)
        layers.append(
            dict(
                rgb=jnp.asarray(projector.rgb[i, :h_i, :w_i]),
                disp=jnp.asarray(projector.disp[i, :h_i, :w_i]),
                mask=jnp.asarray(projector.mask[i, :h_i, :w_i]),
                focal=jnp.float32(float(np.asarray(projector.focal[i]))),
                focal_host=float(np.asarray(projector.focal[i])),
                izmin=jnp.float32(izmin_f),
                izmax=jnp.float32(izmax_f),
                izmin_host=izmin_f,
                w=w_i,
                h=h_i,
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
    num_planes: int | None = None,
    chunk: int = 2,
    exact_color: bool = False,
    method: str = "auto",
    mask_mode: str | None = None,
):
    """Fast gather-free render — the production path.

    method:
      * 'march' — the Pallas first-crossing plane march (ops/sweep_march +
        ops/pallas/sweep_march): march-exact semantics (first crossing,
        secant-refined root, bilinear-equivalent color), measured 44+ dB
        vs the CONVERGED ray march on the SFMoMA scene at ~100 fps/chip.
        Requires a lateral view (no rotation/skew, translation along x,
        matched focal, output dims == layer dims).
      * 'sweep' — the soft-occupancy MXU plane sweep (ops/sweep_fast);
        handles any translation, and rotation via the two-phase path.
      * 'auto' (default) — 'march' when the pose qualifies, else 'sweep'.

    exact_color=True (aligned 'sweep' case) adds the one-gather exact color
    fetch. LDI layers composite front-to-back.

    mask_mode: None -> reference default (multiply for LDI projectors,
    taper-only for single-layer), or 'multiply' / 'none' explicitly.
    """
    pos_np, rot_np = relative_view_pose(
        np.asarray(projector.position, np.float64),
        np.asarray(projector.rotation, np.float64),
        np.asarray(camera.position, np.float64),
        np.asarray(camera.rotation, np.float64),
    )
    rotated = not np.allclose(rot_np, np.eye(3), atol=1e-5)
    c1 = jnp.asarray(pos_np, jnp.float32)
    rot1 = jnp.asarray(rot_np, jnp.float32)
    if mask_mode is None:
        mask_mode = "multiply" if projector.num_layers > 1 else "none"

    if num_planes is None:
        # the march path amortizes dense planes (VMEM-resident loop with
        # data-dependent skipping); the matmul sweep pays per plane
        lateral_pose = (
            not rotated and abs(pos_np[1]) < 1e-9 and abs(pos_np[2]) < 1e-9
        )
        num_planes = 256 if (method != "sweep" and lateral_pose) else 40
    prepared = _prepared_fast(projector, num_planes)
    if not prepared["skew_ok"] or float(np.abs(np.asarray(camera.skew)).sum()) > 1e-9:
        raise ValueError("render_fast_view does not support skewed frustums")

    f2_host = float(camera.focal_px)

    def _lateral_ok(lay):
        """The Pallas march handles the lateral reduction: translation
        along +x, matched focal, output dims == layer dims."""
        return (
            not rotated
            and abs(pos_np[1]) < 1e-9
            and abs(pos_np[2]) < 1e-9
            and abs(lay["focal_host"] - f2_host) < 1e-6 * f2_host
            and lay["w"] == camera.width
            and lay["h"] == camera.height
        )

    use_march = []
    plans = []
    for lay in prepared["layers"]:
        m = method in ("march", "auto") and _lateral_ok(lay)
        if method == "march" and not m:
            raise ValueError(
                "method='march' needs a lateral view (no rotation/skew, "
                "x-only translation, matched focal, output dims == layer "
                "dims); use method='auto' to fall back automatically"
            )
        if m:
            # cap the pad plan: a shift beyond src+out width puts every
            # plane fully outside the source (alpha 0 via the inside/taper
            # gate), so larger pads only waste VMEM on extreme poses
            max_shift = min(
                lay["focal_host"] * abs(float(pos_np[0])) * lay["izmin_host"],
                float(lay["w"] + camera.width),
            )
            plans.append(
                _sweep_march.translation_plan(
                    lay["w"], lay["h"], camera.width, camera.height,
                    max_shift, 0.0,
                )
            )
        else:
            plans.append(None)
        use_march.append(m)

    core = _fast_core_jit(
        plans=tuple(plans),
        use_march=tuple(use_march),
        rotated=rotated,
        num_planes=num_planes,
        chunk=chunk,
        feathering=float(feathering),
        mask_mode=mask_mode,
        exact_color=exact_color,
        to_srgb=to_srgb,
        out_w=camera.width,
        out_h=camera.height,
    )
    layer_args = tuple(
        dict(
            rgb=lay["rgb"], disp=lay["disp"], mask=lay["mask"],
            focal=lay["focal"], izmin=lay["izmin"], izmax=lay["izmax"],
            plane_invz=lay["plane_invz"],
        )
        for lay in prepared["layers"]
    )
    return core(
        layer_args, c1, rot1, jnp.float32(f2_host),
        jnp.asarray(background, jnp.float32),
    )


# One compiled executable per static configuration: everything inside —
# per-layer kernels, LDI compositing, background blend, gamma — is ONE
# dispatch per frame. Eager per-layer compositing costs multiple dispatch
# round-trips through the axon tunnel (~ms each), which round 1 paid.
_FAST_CORE_CACHE: dict = {}


def _fast_core_jit(**statics):
    key = tuple(sorted(statics.items()))
    fn = _FAST_CORE_CACHE.get(key)
    if fn is None:
        import functools

        fn = jax.jit(functools.partial(_fast_core, **statics))
        _FAST_CORE_CACHE[key] = fn
    return fn


def _fast_core(
    layers,
    c1,
    rot1,
    f2,
    background,
    *,
    plans,
    use_march,
    rotated,
    num_planes,
    chunk,
    feathering,
    mask_mode,
    exact_color,
    to_srgb,
    out_w,
    out_h,
):
    """The traced body of render_fast_view: per-layer fast kernels +
    front-to-back LDI compositing + background blend + gamma."""
    zero_bg = jnp.zeros(4, jnp.float32)
    result_rgb = None
    result_a = None
    for lay, plan, m in zip(layers, plans, use_march):
        if m:
            layer = _sweep_march.render_translation(
                lay["rgb"], lay["disp"], lay["mask"],
                lay["izmin"], lay["izmax"], c1, lay["focal"],
                lay["plane_invz"], zero_bg,
                plan=plan, num_planes=num_planes,
                feathering=feathering, mask_mode=mask_mode, to_srgb=False,
            )
        else:
            common = dict(
                out_w=out_w,
                out_h=out_h,
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
    bg = background
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
