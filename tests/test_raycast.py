"""Golden tests: JAX raycast kernel vs the independent float64 reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from lif_tpu.ops import raycast
from . import reference_renderer as ref
from .scenes import make_layer, layers_to_arrays


def _pose(tx=0.0, ty=0.0, tz=0.0, yaw=0.0, pitch=0.0):
    """Projector pose in camera-local shader space (Z already negated)."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return np.array([tx, ty, tz]), ry @ rx


def _run_both(layers, c1, rot1, out_w, out_h, f2=None, skew1=(0, 0), skew2=(0, 0),
              background=(0, 0, 0, 0), mask_mode="multiply", feathering=0.1):
    if f2 is None:
        f2 = 0.78 * out_w
    golden = ref.render_mono_reference(
        layers, skew1, c1, rot1, f2, skew2, out_w, out_h,
        background=background, feathering=feathering, mask_mode=mask_mode,
    )
    arrs = layers_to_arrays(layers)
    got = raycast.render_mono(
        jnp.asarray(arrs["rgb"]),
        jnp.asarray(arrs["disp"]),
        jnp.asarray(arrs["mask"]),
        jnp.asarray(arrs["layer_res"]),
        jnp.asarray(arrs["invz_min"]),
        jnp.asarray(arrs["invz_max"]),
        jnp.asarray(arrs["focal"]),
        jnp.asarray(skew1, dtype=jnp.float32),
        jnp.asarray(c1, dtype=jnp.float32),
        jnp.asarray(rot1, dtype=jnp.float32),
        jnp.float32(f2),
        jnp.asarray(skew2, dtype=jnp.float32),
        jnp.asarray(background, dtype=jnp.float32),
        out_w=out_w,
        out_h=out_h,
        num_layers=len(layers),
        feathering=feathering,
        mask_mode=mask_mode,
    )
    return golden, np.asarray(got)


def test_identity_pose_is_passthrough(rng):
    """Identity pose, matched intrinsics => output == input RGB (sRGB'd)."""
    h, w = 64, 96
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose()
    golden, got = _run_both([layer], c1, rot1, w, h, f2=layer["focal"])
    # interior only: feathering tapers the border
    interior = got[8:-8, 8:-8, :3]
    expected = ref.linear_to_srgb(layer["rgb"])[8:-8, 8:-8]
    assert np.max(np.abs(interior - expected)) < 2e-2
    assert ref.psnr(golden, got) > 40.0


def test_translated_view_matches_reference(rng):
    h, w = 48, 64
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose(tx=0.3, ty=-0.1, tz=0.2)
    golden, got = _run_both([layer], c1, rot1, w, h)
    assert ref.psnr(golden, got) > 40.0


def test_rotated_view_matches_reference(rng):
    h, w = 48, 64
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose(tx=0.15, yaw=0.15, pitch=-0.08)
    golden, got = _run_both([layer], c1, rot1, w, h)
    assert ref.psnr(golden, got) > 40.0


def test_multi_layer_ldi_composite(rng):
    h, w = 48, 64
    layers = [
        make_layer(rng, h, w, invz_min=3.0, invz_max=1.0, with_mask=True),
        make_layer(rng, h, w, invz_min=1.2, invz_max=0.4, with_mask=True),
        make_layer(rng, h, w, invz_min=0.5, invz_max=0.1, with_mask=False),
    ]
    c1, rot1 = _pose(tx=0.1, ty=0.05)
    golden, got = _run_both(layers, c1, rot1, w, h, background=(0.2, 0.3, 0.4, 1.0))
    assert ref.psnr(golden, got) > 40.0


def test_mixed_layer_resolutions(rng):
    """Outpainted LDI layers are larger than the base view."""
    h, w = 48, 64
    layers = [
        make_layer(rng, h, w, invz_min=3.0, invz_max=1.0, with_mask=True),
        make_layer(rng, h + 16, w + 16, invz_min=1.2, invz_max=0.2),
    ]
    c1, rot1 = _pose(tx=0.2, tz=-0.1)
    golden, got = _run_both(layers, c1, rot1, w, h)
    assert ref.psnr(golden, got) > 40.0


def test_non_ldi_mask_mode(rng):
    h, w = 40, 56
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose(tx=-0.2)
    golden, got = _run_both([layer], c1, rot1, w, h, mask_mode="none")
    assert ref.psnr(golden, got) > 40.0


def test_skewed_target_frustum(rng):
    h, w = 48, 64
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose(tx=0.1)
    golden, got = _run_both([layer], c1, rot1, w, h, skew2=(0.05, -0.03))
    assert ref.psnr(golden, got) > 40.0


def test_different_output_resolution(rng):
    h, w = 48, 64
    layer = make_layer(rng, h, w)
    c1, rot1 = _pose(tx=0.1, ty=0.1)
    golden, got = _run_both([layer], c1, rot1, 96, 60)
    assert ref.psnr(golden, got) > 40.0


def test_background_alpha_blend(rng):
    h, w = 40, 48
    layer = make_layer(rng, h, w, with_mask=True)
    c1, rot1 = _pose(tx=0.6)  # big shift => misses => background shows
    golden, got = _run_both([layer], c1, rot1, w, h, background=(0.9, 0.1, 0.2, 0.7))
    assert ref.psnr(golden, got) > 40.0
