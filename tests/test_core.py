"""Unit tests for core math: transforms, pose conversion, color, sampling."""

import numpy as np

import jax.numpy as jnp

from lif_tpu.core import color, pose, transforms
from lif_tpu.core.camera import Camera, focal_from_fov, fov_from_focal, frustum_corners
from lif_tpu.ops import sampling


# --- transforms ---------------------------------------------------------

def test_mat_from_skew():
    m = np.asarray(transforms.mat_from_skew(0.2, -0.3))
    expected = np.array([[1, 0, -0.2], [0, 1, 0.3], [0, 0, 1]])
    np.testing.assert_allclose(m, expected, atol=1e-7)


def test_mat_from_focal():
    m = np.asarray(transforms.mat_from_focal(2.0, 3.0))
    np.testing.assert_allclose(m, np.diag([2.0, 3.0, 1.0]), atol=1e-7)


def test_mat_from_slant_matches_reference():
    """matFromSlant is only approximately a rotation (GLSL formula); compare
    against the independent float64 implementation of the same spec."""
    from .reference_renderer import mat_from_slant as ref_slant

    m = np.asarray(transforms.mat_from_slant(0.3, -0.2), dtype=np.float64)
    np.testing.assert_allclose(m, ref_slant([0.3, -0.2]), atol=1e-6)
    # rows are unit length even though the matrix is not exactly orthogonal
    np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-6)
    # slant (0,0) => identity
    m0 = np.asarray(transforms.mat_from_slant(0.0, 0.0))
    np.testing.assert_allclose(m0, np.eye(3), atol=1e-7)


def test_mat_from_roll():
    m = np.asarray(transforms.mat_from_roll(90.0), dtype=np.float64)
    # 90deg roll maps x->y (GLSL column-major mat3(c,s,0,-s,c,0,...))
    np.testing.assert_allclose(m @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-5)


def test_shader_rotation_identity():
    np.testing.assert_allclose(
        np.asarray(transforms.shader_rotation(np.eye(3))), np.eye(3), atol=1e-7
    )


def test_shader_rotation_sandwich():
    rng = np.random.default_rng(1)
    q = pose.quat_from_axis_angle(rng.normal(size=3), 0.7)
    r = pose.quat_to_matrix(q)
    got = np.asarray(transforms.shader_rotation(r), dtype=np.float64)
    flip = np.diag([1.0, 1.0, -1.0])
    np.testing.assert_allclose(got, flip @ r.T @ flip, atol=1e-5)  # f32 cast


# --- pose ----------------------------------------------------------------

def test_lif_rotation_identity():
    """slant (0,0), roll 0 => identity (forward already -Z)."""
    m = pose.lif_rotation_to_matrix([0.0, 0.0, 0.0])
    np.testing.assert_allclose(m, np.eye(3), atol=1e-9)


def test_lif_rotation_forward_direction():
    """The rotated -Z axis must equal normalize(slx, sly, -1)."""
    for slx, sly in [(0.2, 0.0), (0.0, -0.3), (0.5, 0.4)]:
        m = pose.lif_rotation_to_matrix([slx, sly, 0.0])
        fwd = m @ np.array([0.0, 0.0, -1.0])
        expected = np.array([slx, sly, -1.0])
        expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(fwd, expected, atol=1e-9)


def test_lif_rotation_roll_preserves_forward():
    m = pose.lif_rotation_to_matrix([0.1, 0.2, 0.8])
    m0 = pose.lif_rotation_to_matrix([0.1, 0.2, 0.0])
    np.testing.assert_allclose(
        m @ np.array([0, 0, -1.0]), m0 @ np.array([0, 0, -1.0]), atol=1e-9
    )
    # but up vector differs
    assert np.linalg.norm(m @ np.array([0, 1.0, 0]) - m0 @ np.array([0, 1.0, 0])) > 0.1


def test_lif_rotation_dict_form_degrees():
    m_deg = pose.lif_rotation_to_matrix(
        {"rotation_slant": {"x": 0.1, "y": 0.2}, "roll_degrees": 30.0}
    )
    m_rad = pose.lif_rotation_to_matrix([0.1, 0.2, np.deg2rad(30.0)])
    np.testing.assert_allclose(m_deg, m_rad, atol=1e-9)


def test_relative_view_pose_identity_camera():
    p = np.array([1.0, 2.0, 3.0])
    r = pose.quat_to_matrix(pose.quat_from_axis_angle([0, 1, 0], 0.3))
    pos, rot = pose.relative_view_pose(p, r, np.zeros(3), np.eye(3))
    np.testing.assert_allclose(pos, [1.0, 2.0, -3.0], atol=1e-12)  # Z negated
    np.testing.assert_allclose(rot, r, atol=1e-12)


def test_relative_view_pose_round_trip():
    """Projector at the camera pose => origin + identity."""
    p = np.array([0.4, -0.2, 1.0])
    r = pose.quat_to_matrix(pose.quat_from_axis_angle([1, 1, 0], -0.5))
    pos, rot = pose.relative_view_pose(p, r, p, r)
    np.testing.assert_allclose(pos, np.zeros(3), atol=1e-12)
    np.testing.assert_allclose(rot, np.eye(3), atol=1e-12)


def test_orbit_pose_looks_at_center():
    center = np.array([0.0, 0.5, -2.0])
    position, rotation = pose.orbit_pose(center, 3.0, theta=0.7, phi=0.2)
    assert abs(np.linalg.norm(position - center) - 3.0) < 1e-9
    fwd = rotation @ np.array([0, 0, -1.0])
    to_center = center - position
    to_center /= np.linalg.norm(to_center)
    np.testing.assert_allclose(fwd, to_center, atol=1e-9)


# --- color ---------------------------------------------------------------

def test_srgb_round_trip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = color.srgb_to_linear(color.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_srgb_known_values():
    np.testing.assert_allclose(float(color.linear_to_srgb(0.0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(color.linear_to_srgb(1.0)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(color.linear_to_srgb(0.5)), 0.735357, atol=1e-5)


# --- camera --------------------------------------------------------------

def test_focal_fov_round_trip():
    f = focal_from_fov(60.0, 800)
    assert abs(fov_from_focal(f, 800) - 60.0) < 1e-9


def test_camera_create():
    cam = Camera.create(1280, 800, focal_px=998.4)
    assert cam.width == 1280 and cam.height == 800
    np.testing.assert_allclose(cam.rotation, np.eye(3))


def test_frustum_corners_sfmoma():
    """SFMoMA scene constants. reference: index.html:142-168."""
    intr = {"fx": 998.4, "fy": 998.4, "cx": 640.0, "cy": 400.0}
    pts = frustum_corners(intr, 1280, 800, invz_min=0.09, invz_max=0.0001, baseline=0.045)
    assert pts.shape == (8, 3)
    np.testing.assert_allclose(pts[:4, 2], -0.045 / 0.09, atol=1e-9)  # near 0.5m
    np.testing.assert_allclose(pts[4:, 2], -0.045 / 0.0001, atol=1e-6)  # far 450m
    # top-left corner x is negative, scaled by depth/fx
    assert pts[0, 0] < 0 and pts[1, 0] > 0


# --- sampling ------------------------------------------------------------

def test_bilinear_texel_centers(rng):
    tex = jnp.asarray(rng.random((5, 7)), dtype=jnp.float32)
    u = (jnp.arange(7, dtype=jnp.float32) + 0.5) / 7.0
    v = (jnp.arange(5, dtype=jnp.float32) + 0.5) / 5.0
    uu, vv = jnp.meshgrid(u, v)
    out = sampling.bilinear_sample(tex, uu, vv, 7, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-6)


def test_bilinear_midpoint(rng):
    tex = jnp.asarray([[0.0, 1.0]], dtype=jnp.float32)
    out = sampling.bilinear_sample(tex, jnp.float32(0.5), jnp.float32(0.5), 2, 1)
    np.testing.assert_allclose(float(out), 0.5, atol=1e-6)


def test_bilinear_clamp_to_edge(rng):
    tex = jnp.asarray(rng.random((4, 4)), dtype=jnp.float32)
    out_lo = sampling.bilinear_sample(tex, jnp.float32(-1.0), jnp.float32(-1.0), 4, 4)
    out_hi = sampling.bilinear_sample(tex, jnp.float32(2.0), jnp.float32(2.0), 4, 4)
    np.testing.assert_allclose(float(out_lo), float(tex[0, 0]), atol=1e-6)
    np.testing.assert_allclose(float(out_hi), float(tex[3, 3]), atol=1e-6)


def test_nearest_sample(rng):
    tex = jnp.asarray(rng.random((4, 6)), dtype=jnp.float32)
    out = sampling.nearest_sample(tex, jnp.float32(0.26), jnp.float32(0.6), 6, 4)
    np.testing.assert_allclose(float(out), float(tex[2, 1]), atol=1e-7)


def test_read_disp_interior_clamp(rng):
    """uv outside the 2-texel border reads the clamped border value."""
    tex = jnp.asarray(rng.random((16, 16)), dtype=jnp.float32)
    v_at_edge = sampling.read_disp(tex, jnp.float32(0.0), jnp.float32(0.5), 1.0, 0.0, 16, 16)
    v_at_clamp = sampling.read_disp(tex, jnp.float32(2.0 / 16), jnp.float32(0.5), 1.0, 0.0, 16, 16)
    np.testing.assert_allclose(float(v_at_edge), float(v_at_clamp), atol=1e-7)


def test_read_disp_range_mapping():
    tex = jnp.full((8, 8), 0.25, dtype=jnp.float32)
    out = sampling.read_disp(tex, jnp.float32(0.5), jnp.float32(0.5), 2.0, 0.4, 8, 8)
    np.testing.assert_allclose(float(out), 0.25 * (2.0 - 0.4) + 0.4, atol=1e-6)


def test_padded_texture_ignores_pad(rng):
    """Logical res < stored array: pad region must never be read."""
    tex = np.zeros((8, 8), dtype=np.float32)
    tex[:4, :6] = rng.random((4, 6))
    tex[4:, :] = 99.0
    tex[:, 6:] = 99.0
    out = sampling.bilinear_sample(jnp.asarray(tex), jnp.float32(0.999), jnp.float32(0.999), 6, 4)
    assert float(out) <= 1.0
