"""Tests for the forward-splat (mesh-mode) scatter rasterizer."""

import numpy as np

import jax.numpy as jnp

from lif_tpu.core.camera import Camera
from lif_tpu.models.projector import projector_from_arrays
from lif_tpu.ops import splat
from . import reference_renderer as ref
from .scenes import smooth_noise


def _brute_force_splat(rgb, disp, invz_min, invz_max, baseline, fx, fy, cx, cy,
                       rot, pos, f2, out_w, out_h, footprint=2):
    """Independent scalar-loop z-buffer splat in float64."""
    h, w = disp.shape
    zbuf = np.full((out_h, out_w), np.inf)
    img = np.zeros((out_h, out_w, 3))
    hit = np.zeros((out_h, out_w), bool)
    for y in range(h):
        for x in range(w):
            invz = invz_max + (invz_min - invz_max) * disp[y, x]
            depth = 1e6 if abs(invz) < 1e-8 else baseline / invz
            p = np.array([
                (x + 0.5 - cx) * depth / fx,
                (y + 0.5 - cy) * depth / fy,
                -depth,
            ])
            v = rot @ p + pos
            if v[2] >= -0.001:
                continue
            u_px = f2 * (v[0] / -v[2]) + out_w / 2
            v_px = f2 * (v[1] / -v[2]) + out_h / 2
            dist = np.linalg.norm(p)
            su = max((dist / fx) * f2 / -v[2], 1.0)
            sv = max((dist / fy) * f2 / -v[2], 1.0)
            iu = int(np.floor(u_px - 0.5 * (footprint - 1)))
            iv = int(np.floor(v_px - 0.5 * (footprint - 1)))
            for dy in range(footprint):
                for dx in range(footprint):
                    uu, vv = iu + dx, iv + dy
                    if not (0 <= uu < out_w and 0 <= vv < out_h):
                        continue
                    if abs(uu + 0.5 - u_px) > su / 2 or abs(vv + 0.5 - v_px) > sv / 2:
                        continue
                    if -v[2] < zbuf[vv, uu]:
                        zbuf[vv, uu] = -v[2]
                        img[vv, uu] = rgb[y, x]
                        hit[vv, uu] = True
    return img, hit


def test_identity_flat_depth_passthrough(rng):
    """Matched intrinsics + flat depth + identity pose => passthrough."""
    h, w = 24, 32
    rgb = rng.random((h, w, 3)).astype(np.float32)
    disp = np.full((h, w), 0.5, np.float32)
    out = splat.forward_splat(
        jnp.asarray(rgb), jnp.asarray(disp),
        jnp.float32(2.0), jnp.float32(0.2), jnp.float32(1.0),
        jnp.float32(0.78 * w), jnp.float32(0.78 * w),
        jnp.float32(w / 2), jnp.float32(h / 2),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.float32(0.78 * w), out_w=w, out_h=h,
        background=jnp.zeros(4, jnp.float32), footprint=1, to_srgb=False,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[..., :3], rgb, atol=1e-5)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_matches_brute_force(rng):
    h, w = 20, 26
    rgb = rng.random((h, w, 3))
    disp = smooth_noise(rng, h, w)
    fx = fy = 0.78 * w
    cx, cy = w / 2, h / 2
    rot = np.eye(3)
    pos = np.array([0.15, -0.05, 0.1])
    golden, hit = _brute_force_splat(
        rgb, disp, 2.0, 0.2, 1.0, fx, fy, cx, cy, rot, pos, fx, w, h
    )
    out = np.asarray(splat.forward_splat(
        jnp.asarray(rgb, jnp.float32), jnp.asarray(disp, jnp.float32),
        jnp.float32(2.0), jnp.float32(0.2), jnp.float32(1.0),
        jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy),
        jnp.asarray(rot, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.float32(fx), out_w=w, out_h=h,
        background=jnp.zeros(4, jnp.float32), footprint=2, to_srgb=False,
    ))
    assert (out[..., 3] > 0.5).sum() > 0
    agree = (out[..., 3] > 0.5) == hit
    # allow a small fraction of disagreement at z-ties / pixel boundaries
    assert agree.mean() > 0.97, agree.mean()
    both = (out[..., 3] > 0.5) & hit
    err = np.abs(out[..., :3][both] - golden[both])
    # winners may differ at depth ties; the bulk must match exactly
    assert np.quantile(err, 0.95) < 2e-2


def test_behind_camera_discard(rng):
    h, w = 16, 20
    rgb = rng.random((h, w, 3)).astype(np.float32)
    disp = np.full((h, w), 0.5, np.float32)
    # projector pushed +100 along camera Z: every point lands BEHIND the
    # camera (zv = -depth + 100 > 0) -> nothing drawn
    out = np.asarray(splat.forward_splat(
        jnp.asarray(rgb), jnp.asarray(disp),
        jnp.float32(2.0), jnp.float32(0.2), jnp.float32(1.0),
        jnp.float32(0.78 * w), jnp.float32(0.78 * w),
        jnp.float32(w / 2), jnp.float32(h / 2),
        jnp.eye(3, dtype=jnp.float32), jnp.asarray([0, 0, 100.0], jnp.float32),
        jnp.float32(0.78 * w), out_w=w, out_h=h,
        background=jnp.asarray([0.3, 0, 0, 1], jnp.float32), footprint=1,
        to_srgb=False,
    ))
    np.testing.assert_allclose(out[..., 0], 0.3, atol=1e-6)


def test_gradient_cull(rng):
    """A sharp depth edge is culled when the threshold is tight."""
    h, w = 16, 20
    rgb = np.ones((h, w, 3), np.float32)
    disp = np.zeros((h, w), np.float32)
    disp[:, 10:] = 1.0  # huge step at column 10
    common = dict(
        out_w=w, out_h=h, background=jnp.zeros(4, jnp.float32),
        footprint=1, to_srgb=False,
    )
    args = (
        jnp.asarray(rgb), jnp.asarray(disp),
        jnp.float32(2.0), jnp.float32(0.2), jnp.float32(1.0),
        jnp.float32(0.78 * w), jnp.float32(0.78 * w),
        jnp.float32(w / 2), jnp.float32(h / 2),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.float32(0.78 * w),
    )
    out_all = np.asarray(splat.forward_splat(*args, delta_invz_threshold=0.0, **common))
    out_cull = np.asarray(splat.forward_splat(*args, delta_invz_threshold=0.1, **common))
    assert (out_all[..., 3] > 0.5).sum() > (out_cull[..., 3] > 0.5).sum()


def test_render_mesh_view_api(rng):
    h, w = 24, 32
    proj = projector_from_arrays(
        rng.random((h, w, 3)).astype(np.float32),
        np.full((h, w), 0.5, np.float32),
        focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0,
    )
    cam = Camera.create(w, h, focal_px=0.78 * w)
    # footprint=1: no overlapping quads, so identity is an exact passthrough
    # (footprint>1 quads tie at equal depth and resolve by draw order, as a
    # GPU rasterizer would)
    out = np.asarray(splat.render_mesh_view(proj, cam, to_srgb=False, footprint=1))
    assert out.shape == (h, w, 4)
    np.testing.assert_allclose(out[..., :3], np.asarray(proj.rgb[0]), atol=1e-5)
