"""Differentiable-rendering fit tests (single device and sharded)."""

import numpy as np

import jax

from lif_tpu import Camera, projector_from_arrays
from lif_tpu.parallel.sharding import make_mesh
from lif_tpu.train import fit, losses
from lif_tpu.ops import sweep
from .scenes import smooth_noise

import jax.numpy as jnp


def test_psnr_metric():
    a = jnp.zeros((4, 4))
    assert float(losses.psnr(a, a)) > 100.0
    b = a + 0.1
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)


def _setup(rng, h=24, w=32, b=4):
    true_disp = smooth_noise(rng, h, w).astype(np.float32)
    rgb = rng.random((h, w, 3)).astype(np.float32)
    proj_true = projector_from_arrays(
        rgb, true_disp, focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0
    )
    cam = Camera.create(w, h, focal_px=0.78 * w)
    positions = np.stack([[0.05 * (i - b / 2), 0.02 * i, 0.0] for i in range(b)])
    rotations = np.stack([np.eye(3)] * b)

    # target images rendered with the TRUE depth
    from lif_tpu.core.pose import relative_view_pose

    rel_p = np.zeros((b, 3), np.float32)
    rel_r = np.zeros((b, 3, 3), np.float32)
    for i in range(b):
        rel_p[i], rel_r[i] = relative_view_pose(
            proj_true.position, proj_true.rotation, positions[i], rotations[i]
        )
    # targets from the same (soft-sweep) forward model the trainer uses
    targets = sweep.render_sweep(
        jnp.asarray(proj_true.rgb),
        jnp.asarray(proj_true.disp),
        jnp.asarray(proj_true.mask),
        jnp.asarray(proj_true.layer_res),
        jnp.asarray(proj_true.invz_min),
        jnp.asarray(proj_true.invz_max),
        jnp.asarray(proj_true.focal),
        jnp.asarray(proj_true.skew),
        jnp.asarray(rel_p),
        jnp.asarray(rel_r),
        jnp.float32(0.78 * w),
        jnp.zeros(2, jnp.float32),
        jnp.zeros(4, jnp.float32),
        out_w=w, out_h=h, num_layers=1, num_planes=12, to_srgb=False,
    )[..., :3]

    # perturbed initial depth
    bad_disp = np.clip(true_disp + rng.normal(0, 0.15, true_disp.shape), 0, 1)
    proj_bad = projector_from_arrays(
        rgb, bad_disp.astype(np.float32),
        focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0,
    )
    return proj_bad, positions, rotations, cam, np.asarray(targets), true_disp


def test_fit_reduces_loss(rng):
    proj_bad, positions, rotations, cam, targets, true_disp = _setup(rng)
    params, history = fit.fit_projector(
        proj_bad, positions, rotations, cam, targets, steps=80,
        learning_rate=3e-3, num_steps=12,
    )
    # photometric loss decreases (part of the initial error is irreducible
    # disocclusion mismatch, so expect improvement, not convergence to 0)
    assert min(history[-5:]) < history[0] * 0.85, history
    # fitted depth closer to truth than the perturbed start
    err0 = np.abs(np.asarray(proj_bad.disp[0]) - true_disp).mean()
    err1 = np.abs(np.clip(np.asarray(params.disp[0]), 0, 1) - true_disp).mean()
    assert err1 < err0


def test_fit_sharded_matches_single(rng):
    """The dp+tile-sharded train step computes the same losses."""
    proj_bad, positions, rotations, cam, targets, _ = _setup(rng, b=8)
    _, hist_single = fit.fit_projector(
        proj_bad, positions, rotations, cam, targets, steps=5, num_steps=12,
    )
    mesh = make_mesh(("data", "tile"), shape=(4, 2))
    _, hist_sharded = fit.fit_projector(
        proj_bad, positions, rotations, cam, targets, steps=5, num_steps=12,
        mesh=mesh,
    )
    np.testing.assert_allclose(hist_single, hist_sharded, rtol=2e-4)
