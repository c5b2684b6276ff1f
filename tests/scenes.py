"""Synthetic test scenes shared across the test suite."""

from __future__ import annotations

import numpy as np


def smooth_noise(rng, h, w, octaves=3, lo=0.0, hi=1.0):
    """Band-limited noise in [lo, hi] (bilinear-upsampled random grids)."""
    acc = np.zeros((h, w))
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        gh = max(2, h // (2 ** (octaves - o + 1)))
        gw = max(2, w // (2 ** (octaves - o + 1)))
        grid = rng.random((gh, gw))
        ys = np.linspace(0, gh - 1, h)
        xs = np.linspace(0, gw - 1, w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, gh - 1)
        x1 = np.minimum(x0 + 1, gw - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        up = (
            grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + grid[np.ix_(y0, x1)] * (1 - fy) * fx
            + grid[np.ix_(y1, x0)] * fy * (1 - fx)
            + grid[np.ix_(y1, x1)] * fy * fx
        )
        acc += amp * up
        total += amp
        amp *= 0.5
    acc /= total
    return lo + (hi - lo) * acc


def make_layer(rng, h, w, invz_min=2.0, invz_max=0.2, focal=None, with_mask=False):
    """A synthetic layer dict in the format of tests.reference_renderer."""
    if focal is None:
        focal = 0.78 * w
    rgb = np.stack(
        [smooth_noise(rng, h, w, octaves=4) for _ in range(3)], axis=-1
    )
    disp = smooth_noise(rng, h, w, octaves=3)
    if with_mask:
        mask = (smooth_noise(rng, h, w, octaves=2) > 0.35).astype(np.float64)
    else:
        mask = np.ones((h, w))
    return {
        "rgb": rgb,
        "disp": disp,
        "mask": mask,
        "res": (float(w), float(h)),
        "invz_min": invz_min,
        "invz_max": invz_max,
        "focal": float(focal),
    }


def layers_to_arrays(layers, dtype=np.float32):
    """Stack reference-format layer dicts into the arrays render_mono wants."""
    n = len(layers)
    hmax = max(int(l["res"][1]) for l in layers)
    wmax = max(int(l["res"][0]) for l in layers)
    rgb = np.zeros((n, hmax, wmax, 3), dtype=dtype)
    disp = np.zeros((n, hmax, wmax), dtype=dtype)
    mask = np.zeros((n, hmax, wmax), dtype=dtype)
    layer_res = np.zeros((n, 2), dtype=dtype)
    invz_min = np.zeros((n,), dtype=dtype)
    invz_max = np.zeros((n,), dtype=dtype)
    focal = np.zeros((n,), dtype=dtype)
    for i, l in enumerate(layers):
        w, h = int(l["res"][0]), int(l["res"][1])
        rgb[i, :h, :w] = l["rgb"]
        disp[i, :h, :w] = l["disp"]
        mask[i, :h, :w] = l["mask"]
        layer_res[i] = l["res"]
        invz_min[i] = l["invz_min"]
        invz_max[i] = l["invz_max"]
        focal[i] = l["focal"]
    return dict(
        rgb=rgb,
        disp=disp,
        mask=mask,
        layer_res=layer_res,
        invz_min=invz_min,
        invz_max=invz_max,
        focal=focal,
    )
