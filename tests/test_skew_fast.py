"""Skewed-frustum support on the fast march path (VERDICT round-1 item
8): sk1/sk2 fold into a constant source pre-shift for unrotated views, so
skewed golden renders pass through render_fast_view instead of raising."""

import numpy as np
import pytest

from lif_tpu import Camera, projector_from_arrays
from lif_tpu.models.renderer import render_fast_view, render_mono_view


def _psnr(a, b, sl=np.s_[8:-8, 12:-12]):
    a, b = np.asarray(a), np.asarray(b)
    mse = np.mean((a[sl][..., :3] - b[sl][..., :3]) ** 2)
    return 10 * np.log10(1.0 / max(float(mse), 1e-12))


def _scene(rng, h=96, w=128):
    rgb = rng.random((h, w, 3), dtype=np.float32)
    k = np.ones(5, np.float32) / 5
    for c in range(3):
        rgb[..., c] = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, rgb[..., c]
        )
    disp = (
        0.5
        + 0.3
        * np.sin(np.arange(w) / 17)[None, :]
        * np.cos(np.arange(h) / 13)[:, None]
    ).astype(np.float32)
    return rgb, disp


def test_skewed_projector_and_camera(rng):
    """Both-sided skew: the fast path matches the skew-aware exact march
    (the constant-shift fold is exact under snap planes)."""
    h, w = 96, 128
    rgb, disp = _scene(rng, h, w)
    proj = projector_from_arrays(
        rgb, disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.1,
        baseline=1.0, skew=(0.03, -0.02),
    )
    cam = Camera.create(
        w, h, focal_px=0.78 * w, position=[0.05, 0.0, 0.0],
        skew=(0.01, 0.005),
    )
    ref = render_mono_view(proj, cam, mask_mode="none", num_steps=320)
    fast = render_fast_view(proj, cam)
    p = _psnr(fast, ref)
    assert p > 45.0, f"skewed fast path only {p:.1f} dB vs the march"
    assert float(np.mean(np.abs(
        np.asarray(fast)[..., 3] - np.asarray(ref)[..., 3]
    ))) < 1e-3


def test_camera_skew_only_stereo_display_case(rng):
    """sk2-only (the stereo-display asymmetric-frustum workload,
    RaycastPlane.ts:719-723)."""
    h, w = 96, 128
    rgb, disp = _scene(rng, h, w)
    proj = projector_from_arrays(
        rgb, disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.1,
        baseline=1.0,
    )
    cam = Camera.create(
        w, h, focal_px=0.78 * w, position=[-0.04, 0.0, 0.0],
        skew=(0.025, 0.0),
    )
    ref = render_mono_view(proj, cam, mask_mode="none", num_steps=320)
    fast = render_fast_view(proj, cam)
    p = _psnr(fast, ref)
    assert p > 45.0, f"sk2-only fast path only {p:.1f} dB vs the march"


def test_skew_with_rotation_still_raises(rng):
    """Rotated + skewed has no constant-shift reduction; the fast path
    must refuse rather than silently mis-render."""
    h, w = 64, 96
    rgb, disp = _scene(rng, h, w)
    proj = projector_from_arrays(
        rgb, disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.1,
        baseline=1.0, skew=(0.02, 0.0),
    )
    ry = np.array(
        [[np.cos(0.05), 0, np.sin(0.05)], [0, 1, 0],
         [-np.sin(0.05), 0, np.cos(0.05)]]
    )
    cam = Camera.create(
        w, h, focal_px=0.78 * w, position=[0.02, 0.0, 0.0], rotation=ry
    )
    with pytest.raises(ValueError):
        render_fast_view(proj, cam)


def test_skewed_stereo_fast(rng):
    """Skewed stereo through the fast two-view path (the stereo-display
    workload: per-eye source skew, shared camera skew) vs the exact
    skew-aware stereo kernel."""
    from lif_tpu import projector_from_arrays, render_stereo_fast
    from lif_tpu.models.renderer import render_stereo_view

    h, w = 96, 128
    rgb, disp = _scene(rng, h, w)
    rgb2 = np.roll(rgb, 3, axis=1)

    def proj(r, x, sk):
        return projector_from_arrays(
            r, disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.1,
            baseline=1.0, position=(x, 0.0, 0.0), skew=sk,
        )

    left = proj(rgb, -0.03, (0.015, 0.0))
    right = proj(rgb2, 0.03, (-0.015, 0.0))
    cam = Camera.create(
        w, h, focal_px=0.78 * w, position=[0.01, 0.0, 0.0],
        skew=(0.005, 0.0),
    )
    exact = render_stereo_view(left, right, cam, num_steps=160)
    fast = render_stereo_fast(left, right, cam, num_planes=160)
    p = _psnr(fast, exact)
    assert p > 35.0, f"skewed stereo fast only {p:.1f} dB"


def test_skewed_stereo_fast_scaled_tier(rng):
    """Skewed stereo with a march-INELIGIBLE layer (f1 != f2 zoom): the
    layer routes the scaled tier, which must still apply the per-eye
    frustum fold (dx as a constant warp shift, dy via the kernel's
    dy_user) — a dropped fold misaligns the layer by f1*dsk pixels
    against the exact kernel (review finding, round 3)."""
    from lif_tpu import projector_from_arrays, render_stereo_fast
    from lif_tpu.models.renderer import render_stereo_view

    h, w = 96, 128
    rgb, disp = _scene(rng, h, w)
    rgb2 = np.roll(rgb, 3, axis=1)

    def proj(r, x, sk):
        return projector_from_arrays(
            r, disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.1,
            baseline=1.0, position=(x, 0.0, 0.0), skew=sk,
        )

    left = proj(rgb, -0.03, (0.015, 0.008))
    right = proj(rgb2, 0.03, (-0.015, 0.0))
    # camera focal != projector focal -> _march_eligible is False for
    # every layer; lateral poses + skew exercise the scaled-tier fold
    cam = Camera.create(
        w, h, focal_px=0.9 * w, position=[0.01, 0.0, 0.0],
        skew=(0.005, 0.0),
    )
    exact = render_stereo_view(left, right, cam, num_steps=160)
    fast = render_stereo_fast(left, right, cam, num_planes=160)
    p = _psnr(fast, exact)
    # bound: the 160-step oracle march discretization (same class as
    # test_skewed_stereo_fast) plus the scaled tier's off-snap sampling
    assert p > 33.0, f"skewed scaled-tier stereo only {p:.1f} dB"
