"""Tests for the offline viewer and picking apps + the soft sweep."""

import numpy as np

import jax.numpy as jnp

from lif_tpu import Camera, projector_from_arrays
from lif_tpu.apps import picking, viewer
from lif_tpu.ops import sweep
from . import reference_renderer as ref
from .scenes import make_layer, layers_to_arrays, smooth_noise


def _proj(rng, h=32, w=48, flat=None):
    disp = (
        np.full((h, w), flat, np.float32)
        if flat is not None
        else smooth_noise(rng, h, w).astype(np.float32)
    )
    return projector_from_arrays(
        rng.random((h, w, 3)).astype(np.float32),
        disp,
        focal_px=0.78 * w,
        invz_min=2.0,
        invz_max=0.2,
        baseline=1.0,
    )


# --- viewer ---------------------------------------------------------------


def test_orbit_trajectory_geometry():
    pos, rot = viewer.orbit_trajectory([0, 0, -2.0], 2.0, 5, sweep_degrees=20)
    assert pos.shape == (5, 3) and rot.shape == (5, 3, 3)
    for p in pos:
        assert abs(np.linalg.norm(p - [0, 0, -2.0]) - 2.0) < 1e-9
    # middle frame is on the +Z side looking straight down -Z
    np.testing.assert_allclose(pos[2], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(rot[2], np.eye(3), atol=1e-9)


def test_linear_trajectory():
    pos, rot = viewer.linear_trajectory([0, 0, 0], [1, 0, 0], 3)
    np.testing.assert_allclose(pos[:, 0], [0, 0.5, 1.0])
    np.testing.assert_allclose(rot[1], np.eye(3))


def test_render_trajectory_dumps_frames(rng, tmp_path):
    proj = _proj(rng)
    cam = Camera.create(48, 32, focal_px=0.78 * 48)
    pos, rot = viewer.orbit_trajectory([0, 0, -1.0], 1.0, 3, sweep_degrees=10)
    frames = viewer.render_trajectory(
        proj, pos, rot, cam, mode="raycast", out_dir=str(tmp_path)
    )
    assert frames.shape == (3, 32, 48, 4)
    assert np.isfinite(frames).all()
    assert len(list(tmp_path.glob("frame_*.png"))) == 3
    # middle frame (camera at origin looking -Z) == identity-ish: parallax
    # between first and last frames must exist
    assert np.abs(frames[0] - frames[-1]).max() > 0.01


# --- picking ---------------------------------------------------------------


def test_pick_flat_depth_center(rng):
    """Flat disparity 0.5 => invZ = 1.1 (1/m), depth = baseline/1.1.
    A center-pixel pick from the projector pose must hit at that depth."""
    proj = _proj(rng, flat=0.5)
    cam = Camera.create(48, 32, focal_px=0.78 * 48)
    res = picking.pick(proj, cam, 24, 16)
    assert res.hit
    expected_depth = 1.0 / (0.2 + (2.0 - 0.2) * 0.5)
    np.testing.assert_allclose(-res.point[2], expected_depth, rtol=0.03)
    np.testing.assert_allclose(res.uv, [0.51, 0.515], atol=0.05)
    assert res.layer == 0


def test_pick_miss(rng):
    proj = _proj(rng, flat=0.5)
    cam = Camera.create(
        48, 32, focal_px=0.78 * 48, position=(50.0, 0, 0)
    )  # far off to the side
    res = picking.pick(proj, cam, 0, 0)
    assert not res.hit


# --- soft sweep ------------------------------------------------------------


def test_sweep_approximates_march(rng):
    """With high sharpness the soft sweep approaches the exact march."""
    h, w = 48, 64
    layer = make_layer(rng, h, w)
    arrs = layers_to_arrays([layer])
    c1 = jnp.asarray([0.2, 0.0, 0.0], jnp.float32)
    rot = jnp.eye(3, dtype=jnp.float32)
    common = dict(out_w=w, out_h=h, num_layers=1, to_srgb=True)
    img_sweep = np.asarray(sweep.render_sweep(
        jnp.asarray(arrs["rgb"]), jnp.asarray(arrs["disp"]), jnp.asarray(arrs["mask"]),
        jnp.asarray(arrs["layer_res"]), jnp.asarray(arrs["invz_min"]),
        jnp.asarray(arrs["invz_max"]), jnp.asarray(arrs["focal"]),
        jnp.zeros(2, jnp.float32), c1, rot, jnp.float32(0.78 * w),
        jnp.zeros(2, jnp.float32), jnp.zeros(4, jnp.float32),
        num_planes=80, sharpness=400.0, **common,
    ))
    golden = ref.render_mono_reference(
        [layer], (0, 0), np.asarray(c1), np.asarray(rot), 0.78 * w, (0, 0),
        w, h, mask_mode="multiply",
    )
    # at high sharpness the soft sweep clears the fidelity gate vs the march
    assert ref.psnr(golden, img_sweep) > 40.0


def test_sweep_differentiable_wrt_disp(rng):
    """Nonzero disparity gradient (the property the hard march lacks)."""
    import jax

    h, w = 16, 24
    layer = make_layer(rng, h, w)
    arrs = layers_to_arrays([layer])

    def loss(disp):
        img = sweep.render_sweep(
            jnp.asarray(arrs["rgb"]), disp, jnp.asarray(arrs["mask"]),
            jnp.asarray(arrs["layer_res"]), jnp.asarray(arrs["invz_min"]),
            jnp.asarray(arrs["invz_max"]), jnp.asarray(arrs["focal"]),
            jnp.zeros(2, jnp.float32), jnp.asarray([0.1, 0, 0], jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.float32(0.78 * w),
            jnp.zeros(2, jnp.float32), jnp.zeros(4, jnp.float32),
            out_w=w, out_h=h, num_layers=1, num_planes=12, to_srgb=False,
        )
        return jnp.sum(img[..., :3] ** 2)

    g = jax.grad(loss)(jnp.asarray(arrs["disp"]))
    assert float(jnp.abs(g).max()) > 0.0
