"""Pose-chunked batch rendering (config.pose_chunk) equals the unchunked
batch bit-for-bit.

Batches larger than RenderConfig.pose_chunk run as a lax.map over
fixed-size pose chunks inside the single jitted dispatch
(models/renderer._fast_batch_core / _stereo_fast_core); per-pose inputs
(c1, rot, snap/scaled/rotated plane tables) are split while textures
stay loop-invariant. The math is per-pose, so chunked and unchunked
programs must agree exactly — any divergence means a per-pose input was
not split (stale pose served to every chunk) or a chunk boundary leaked.
"""

import numpy as np
import pytest

from .scenes import make_layer


@pytest.fixture(scope="module")
def small_proj():
    from lif_tpu import projector_from_arrays

    rng = np.random.default_rng(7)
    h, w = 48, 64
    lay = make_layer(rng, h, w)
    extra = make_layer(rng, h, w, invz_min=1.0, invz_max=0.1,
                       with_mask=True)
    return projector_from_arrays(
        lay["rgb"], lay["disp"], focal_px=lay["focal"],
        invz_min=lay["invz_min"], invz_max=lay["invz_max"],
        baseline=0.045,
        extra_layers=[dict(
            rgb=extra["rgb"], disp=extra["disp"], mask=extra["mask"],
            focal_px=extra["focal"], invz_min=extra["invz_min"],
            invz_max=extra["invz_max"],
        )],
    )


def _cams(proj, poses, rots=None):
    from lif_tpu import Camera

    h, w = np.asarray(proj.disp[0]).shape
    focal = float(proj.focal[0])
    return [
        Camera.create(w, h, focal_px=focal, position=p,
                      rotation=None if rots is None else rots[i])
        for i, p in enumerate(poses)
    ]


def test_lateral_ldi_chunked_equals_unchunked(small_proj):
    from lif_tpu.config import DEFAULT_CONFIG
    from lif_tpu.models.renderer import render_fast_batch

    poses = [[0.01 * (i + 1), 0.0, 0.0] for i in range(7)]
    cams = _cams(small_proj, poses)
    # chunk 3 does not divide 7: exercises the pad-and-slice tail
    a = np.asarray(render_fast_batch(
        small_proj, cams, config=DEFAULT_CONFIG.replace(pose_chunk=100)))
    b = np.asarray(render_fast_batch(
        small_proj, cams, config=DEFAULT_CONFIG.replace(pose_chunk=3)))
    np.testing.assert_array_equal(a, b)


def test_scaled_tier_chunked_equals_unchunked(small_proj):
    from lif_tpu.config import DEFAULT_CONFIG
    from lif_tpu.models.renderer import render_fast_batch

    poses = [[0.008 * i, 0.004 * i, -0.008 * i] for i in range(1, 6)]
    cams = _cams(small_proj, poses)
    a = np.asarray(render_fast_batch(
        small_proj, cams, config=DEFAULT_CONFIG.replace(pose_chunk=100)))
    b = np.asarray(render_fast_batch(
        small_proj, cams, config=DEFAULT_CONFIG.replace(pose_chunk=2)))
    np.testing.assert_array_equal(a, b)


def test_stereo_chunked_equals_unchunked(small_proj):
    from lif_tpu.config import DEFAULT_CONFIG
    from lif_tpu.models.renderer import render_stereo_fast_batch

    left = small_proj
    right = small_proj.replace(
        position=np.asarray([0.045, 0.0, 0.0], np.float32)
    )
    poses = [[0.005 * i, 0.0, 0.0] for i in range(5)]
    cams = _cams(small_proj, poses)
    a = np.asarray(render_stereo_fast_batch(
        left, right, cams, config=DEFAULT_CONFIG.replace(pose_chunk=100)))
    b = np.asarray(render_stereo_fast_batch(
        left, right, cams, config=DEFAULT_CONFIG.replace(pose_chunk=2)))
    np.testing.assert_array_equal(a, b)


def test_fused_chunked_equals_unchunked(small_proj):
    from lif_tpu.config import DEFAULT_CONFIG
    from lif_tpu.models.renderer import render_fused_fast_batch

    p2 = small_proj.replace(
        position=np.asarray([0.02, 0.0, 0.0], np.float32)
    )
    poses = [[0.004 * i, 0.0, 0.0] for i in range(7)]
    cams = _cams(small_proj, poses)
    # snap mode gives per-pose (B, K) plane tables — the per-pose input
    # the chunk split must carry; chunk 3 on 7 poses covers the pad tail
    cfg = DEFAULT_CONFIG.replace(plane_mode="snap")
    a = np.asarray(render_fused_fast_batch(
        [small_proj, p2], cams, config=cfg.replace(pose_chunk=100)))
    b = np.asarray(render_fused_fast_batch(
        [small_proj, p2], cams, config=cfg.replace(pose_chunk=3)))
    np.testing.assert_array_equal(a, b)
