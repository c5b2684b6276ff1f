"""Ray picking against a projector's depth surface.

The demo implements picking twice on the CPU — a canvas-readback march for
the mouse (reference: index.html:791-942) and a finer variant for VR
controllers (index.html:952-1180) — duplicating the shader's math. Here it
is the SAME jitted kernel evaluated on a 1x1 pixel grid: the march's
refined inverse depth gives the surface point; no separate CPU
implementation to keep in sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.pose import relative_view_pose
from ..core.transforms import mat_from_focal, mm
from ..models.projector import Projector
from ..ops import raycast as _raycast

__all__ = ["PickResult", "pick"]


@dataclass
class PickResult:
    """Matches the reference's ControllerHitInfo fields
    (reference: types/controller.d.ts:7-25, index.html:1163-1174)."""

    hit: bool
    point: np.ndarray | None  # world-space hit point
    uv: np.ndarray | None  # [0,1]^2 source-texture coordinates
    layer: int
    distance: float
    inv_z: float


def pick(
    projector: Projector,
    camera: Camera,
    pixel_x: float,
    pixel_y: float,
    num_steps: int = 100,
) -> PickResult:
    """Cast one ray through output pixel (pixel_x, pixel_y) (top-down pixel
    coordinates, like the demo's mouse events) and intersect the
    projector's depth surface.

    Marches layers front-to-back and returns the first hit, matching the
    renderer's compositing order. The demo uses 100 coarse steps +
    bisection (index.html:871-875); the march's step-halving refinement is
    the same search, so num_steps=100 reproduces that precision.
    """
    pos, rot = relative_view_pose(
        np.asarray(projector.position, np.float64),
        np.asarray(projector.rotation, np.float64),
        np.asarray(camera.position, np.float64),
        np.asarray(camera.rotation, np.float64),
    )
    baseline = float(projector.baseline)

    # s2 for this pixel (convert top-down y to GL-oriented v)
    u = (pixel_x + 0.5) / camera.width - 0.5
    v = (camera.height - 1 - pixel_y + 0.5) / camera.height - 0.5
    s2x = jnp.full((1, 1), u, jnp.float32)
    s2y = jnp.full((1, 1), v, jnp.float32)

    skr1 = _raycast.build_skr1(
        jnp.asarray(projector.skew, jnp.float32), jnp.asarray(rot, jnp.float32)
    )
    fskr2 = _raycast.build_fskr2(
        jnp.asarray(camera.focal_px, jnp.float32),
        float(camera.width),
        float(camera.height),
        jnp.asarray(camera.skew, jnp.float32),
    )

    for layer in range(projector.num_layers):
        res_w = float(projector.layer_res[layer, 0])
        res_h = float(projector.layer_res[layer, 1])
        focal = float(projector.focal[layer])
        izmin = float(projector.invz_min[layer]) / baseline
        izmax = float(projector.invz_max[layer]) / baseline
        fskr1 = mm(
            mat_from_focal(
                jnp.float32(focal / res_w), jnp.float32(focal / res_h)
            ),
            skr1,
        )
        rgba, invz2, _ = _raycast.raycast_layer(
            s2x,
            s2y,
            fskr1,
            jnp.asarray(pos, jnp.float32),
            fskr2,
            jnp.zeros(3, jnp.float32),
            jnp.asarray(projector.rgb[layer]),
            jnp.asarray(projector.disp[layer]),
            jnp.asarray(projector.mask[layer]),
            izmin,
            izmax,
            res_w,
            res_h,
            jnp.zeros(3, jnp.float32),
            0.0,
            num_steps=num_steps,
            mask_mode="multiply" if projector.num_layers > 1 else "none",
        )
        alpha = float(rgba[0, 0, 3])
        iz2 = float(invz2[0, 0])
        if alpha > 0.5 and iz2 > 0.0:
            # camera-local depth (meters): z = baseline / invz2_shader...
            # invz2 is baseline-normalized, so depth = baseline / (invz2*baseline)
            depth = 1.0 / iz2
            # ray direction through the pixel in camera space
            dx = u * camera.width / float(camera.focal_px)
            dy = v * camera.height / float(camera.focal_px)
            p_cam = np.array([dx * depth, dy * depth, -depth])
            world = (
                np.asarray(camera.rotation, np.float64) @ p_cam
                + np.asarray(camera.position, np.float64)
            )
            # source uv of the hit: re-derive s1 from the march's geometry
            # via the projector-space projection of the world point
            local = np.asarray(projector.rotation, np.float64).T @ (
                world - np.asarray(projector.position, np.float64)
            )
            intr = projector.intrinsics
            px = intr["fx"] * (local[0] / -local[2]) + intr["cx"]
            py_td = intr["fy"] * (-local[1] / -local[2]) + intr["cy"]
            uv = np.array([px / projector.width, py_td / projector.height])
            return PickResult(
                hit=True,
                point=world,
                uv=uv,
                layer=layer,
                distance=float(np.linalg.norm(world - np.asarray(camera.position))),
                inv_z=iz2,
            )
    return PickResult(False, None, None, -1, float("inf"), 0.0)
