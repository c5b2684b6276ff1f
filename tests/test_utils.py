"""Tests for config, profiling, and debug utilities."""

import numpy as np

import jax.numpy as jnp

from lif_tpu import Camera, projector_from_arrays
from lif_tpu.config import DEFAULT_CONFIG, RenderConfig
from lif_tpu.utils import debug, profiling
from .scenes import smooth_noise


def test_config_defaults_match_reference():
    c = DEFAULT_CONFIG
    assert c.num_steps == 40  # rayCastMonoLDI.glsl:223
    assert c.max_layers == 4  # RaycastPlane.ts:218
    assert c.default_baseline_m == 0.063  # HoloProjector.ts:106
    assert c.feathering == 0.1
    assert c.mask_dilation == 1.5


def test_config_replace_immutable():
    c2 = DEFAULT_CONFIG.replace(num_steps=16)
    assert c2.num_steps == 16 and DEFAULT_CONFIG.num_steps == 40


def test_fps_counter():
    fps = profiling.FpsCounter(window_seconds=10.0)
    t = 100.0
    for i in range(11):
        val = fps.tick(t + i * 0.1)  # 10 fps
    assert abs(val - 10.0) < 0.5


def test_device_timer_runs():
    f = lambda x: x * 2.0
    sec = profiling.device_timer(f, jnp.ones((8, 8)), iters=3)
    assert sec > 0


def _proj(rng):
    return projector_from_arrays(
        rng.random((16, 24, 3)).astype(np.float32),
        smooth_noise(rng, 16, 24).astype(np.float32),
        focal_px=0.78 * 24, invz_min=2.0, invz_max=0.2, baseline=0.05,
    )


def test_dump_render_inputs(rng):
    proj = _proj(rng)
    cam = Camera.create(24, 16, focal_px=0.78 * 24, position=(0.1, 0, 0))
    d = debug.dump_render_inputs(proj, cam)
    assert d["projector"]["uNumLayers"] == 1
    # Z-negation of the camera-local position
    np.testing.assert_allclose(
        d["projector"]["uViewPosition (camera-local, Z-negated)"], [-0.1, 0, 0],
        atol=1e-7,
    )
    # baseline-normalized invz
    assert abs(d["layers"][0]["invZmin (shader units)"] - 2.0 / 0.05) < 1e-4


def test_texture_montage_and_depth_vis(rng, tmp_path):
    proj = _proj(rng)
    m = debug.texture_montage(proj, str(tmp_path / "m.png"))
    assert m.shape == (16, 72, 3)
    assert (tmp_path / "m.png").exists()
    dv = debug.depth_visualization(proj)
    assert dv.shape == (16, 24, 3)


def test_frustum_wireframe(rng):
    proj = _proj(rng)
    w = debug.frustum_wireframe_points(proj)
    assert w["corners"].shape == (8, 3)
    assert len(w["edges"]) == 12
    # near plane at baseline/invz_min = 0.05/2 = 0.025 down -Z
    np.testing.assert_allclose(w["corners"][:4, 2], -0.025, atol=1e-6)


def test_render_consumes_config(rng):
    """render() resolves unset knobs from a RenderConfig: a non-default
    background and march plane count must change the output/compile path."""
    from lif_tpu import Camera, projector_from_arrays, render

    h, w = 16, 32
    proj = projector_from_arrays(
        rng.random((h, w, 3), dtype=np.float32),
        rng.random((h, w), dtype=np.float32) * 0.2,  # mostly far: misses
        focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0,
    )
    cam = Camera.create(w, h, focal_px=0.78 * w, position=[0.05, 0.0, 0.0])
    cfg = RenderConfig(background=(1.0, 0.0, 0.0, 1.0), march_planes=16)
    a = np.asarray(render(proj, cam, mode="fast", config=cfg))
    b = np.asarray(render(proj, cam, mode="fast"))
    # the configured red background shows through missed rays
    assert (np.abs(a - b) > 1e-3).any()
    assert a[..., 0].max() > 0.9
