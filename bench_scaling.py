"""Virtual-mesh scaling sweep + the config-4 converged-fusion oracle.

Run with JAX_PLATFORMS=cpu and xla_force_host_platform_device_count=8
(bench_configs.py invokes it that way). Prints ONE JSON line:

  {"tile_scaling": {devices: seconds}, "speedup_8dev": S,
   "config4_psnr_vs_converged_dB": Q}

* tile_scaling: wall seconds for ONE 3840x2160 render with the output
  row-tiles sharded over 1/2/4/8 virtual devices (render_view_tiled,
  the SP/CP analog). CPU-mesh numbers demonstrate the sharding axis and
  its scaling shape, not chip hardware — the repo has one physical TPU.
* config4 PSNR: the fast fused compositor's output (written by
  bench_configs.py to /tmp/fastfused.npy at 1280x800) vs the SHARDED
  fused render on the converged (640-step) raycast kernel over a
  4-device view mesh — the same merge spec at oracle quality.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lif_tpu import Camera, load_lif_file
    from lif_tpu.models.projector import resample_projector
    from lif_tpu.parallel import sharding

    from examples.render_sfmoma import build_sfmoma_lif

    out = {}
    result = load_lif_file(build_sfmoma_lif())
    proj = result.projectors[0]
    focal = float(proj.focal[0])

    # ---- tile-sharded 4K scaling ----
    w4, h4 = 3840, 2160
    scale = w4 / 1280
    base4 = resample_projector(proj, scale, out_w=w4, out_h=h4)
    focal4 = float(base4.focal[0])
    cam4 = Camera.create(w4, h4, focal_px=focal4,
                         position=[0.05, 0.0, 0.0])
    times = {}
    for n in (1, 2, 4, 8):
        mesh = sharding.make_mesh(("tile",), shape=(n,),
                                  devices=jax.devices()[:n])
        img = sharding.render_view_tiled(base4, cam4, mesh, num_steps=4)
        _ = float(jnp.sum(img))  # compile + warm
        t0 = time.time()
        img = sharding.render_view_tiled(base4, cam4, mesh, num_steps=4)
        _ = float(jnp.sum(img))
        times[n] = round(time.time() - t0, 3)
    out["tile_scaling_seconds"] = times
    out["speedup_8dev"] = round(times[1] / max(times[8], 1e-9), 2)
    out["note"] = (
        "virtual 8-device CPU mesh (one physical TPU in this rig); "
        "demonstrates the tile-axis sharding shape, not chip hardware"
    )

    # ---- config4 fusion oracle ----
    fast_path = "/tmp/fastfused.npy"
    if os.path.exists(fast_path):
        fast_fused = np.load(fast_path)
        projs = [
            proj.replace(
                position=np.asarray([0.02 * i, 0.0, 0.0], np.float32)
            )
            for i in range(4)
        ]
        cam1k = Camera.create(1280, 800, focal_px=focal,
                              position=[0.05, 0.0, 0.0])
        mesh4 = sharding.make_mesh(("view",), shape=(4,),
                                   devices=jax.devices()[:4])
        conv = np.asarray(sharding.render_fused_projectors(
            projs, cam1k, mesh4, num_steps=640
        ))
        mse = np.mean((fast_fused[..., :3] - conv[..., :3]) ** 2)
        out["config4_psnr_vs_converged_dB"] = round(
            10 * np.log10(1.0 / max(float(mse), 1e-12)), 2
        )

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
