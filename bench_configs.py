"""Full benchmark sweep: the five BASELINE.json configs + quality numbers.

Writes BENCH_DETAILS.json. The driver-facing single metric stays in
bench.py; this script is the complete evidence table:

  0. SFMoMA single projector, one fixed novel view
  1. 120-frame orbit trajectory (rotation -> the two-phase fast path)
  2. stereo pair, batched L/R views
  3. 3-layer LDI with occlusion-aware alpha compositing
  4. multi-projector fusion (single-chip equivalent; the sharded path is
     validated on the virtual CPU mesh in tests/test_parallel.py)

Quality is reported as PSNR of each fast mode against the exact ray-march
renderer on the same pose (the march is golden-tested against a float64
oracle of the reference shader spec).
"""

from __future__ import annotations

import json
import time

import numpy as np

W, H = 1280, 800


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _fps(render_fn, poses, reps=2):
    """Best of `reps` timed batches (the first batch after a compile often
    carries queue noise on the axon runtime)."""
    import jax.numpy as jnp

    out = render_fn(poses[0])
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = [jnp.sum(render_fn(p)) for p in poses]
        _sync(jnp.stack(outs))
        best = min(best, (time.time() - t0) / len(poses))
    return 1.0 / best, best * 1000.0


def main():
    import jax.numpy as jnp

    from lif_tpu import Camera, load_lif_file, render, orbit_pose
    from lif_tpu.io import container
    from lif_tpu.train.losses import psnr as _psnr

    # --- build the SFMoMA LIF in memory ---
    jpeg = open("/root/reference/public/assets/rgb.jpg", "rb").read()
    depth = open("/root/reference/public/assets/depth.png", "rb").read()
    meta = {
        "views": [{
            "image": {"blob_id": -1},
            "inv_z_map": {"blob_id": 20, "min": 0.09, "max": 0.0001},
            "width_px": W, "height_px": H, "focal_px": 0.78 * W,
            "position": [0, 0, 0], "rotation": [0, 0, 0],
        }],
        "baseline_mm": 45.0,
        "stereo_render_data": {"invd": 0.045},
    }
    lif = container.write(jpeg, meta, {20: depth})
    result = load_lif_file(lif)
    proj = result.projectors[0].to_device()
    focal = float(proj.focal[0])
    results = {}

    def cam_at(pos, rot=None):
        return Camera.create(W, H, focal_px=focal, position=pos, rotation=rot)

    # ---- config 0: fixed novel view ----
    fixed_pos = np.array([0.135, 0.0, 0.0])
    img_march = render(proj, cam_at(fixed_pos), mode="raycast", mask_mode="none")
    img_fast = render(proj, cam_at(fixed_pos), mode="fast")
    img_exact = render(proj, cam_at(fixed_pos), mode="fast", exact_color=True)
    q_fast = float(_psnr(img_fast, img_march))
    q_exact = float(_psnr(img_exact, img_march))

    poses0 = [fixed_pos + [0.001 * i, 0, 0] for i in range(20)]
    fps_fast, ms_fast = _fps(lambda p: render(proj, cam_at(p), mode="fast"), poses0)
    fps_exact, ms_exact = _fps(
        lambda p: render(proj, cam_at(p), mode="fast", exact_color=True), poses0
    )
    fps_march, ms_march = _fps(
        lambda p: render(proj, cam_at(p), mode="raycast", mask_mode="none"),
        poses0[:3],
    )
    results["config0_fixed_novel_view"] = {
        "march_exact_fps": round(fps_march, 2),
        "fast_fps": round(fps_fast, 1),
        "fast_psnr_vs_march_dB": round(q_fast, 1),
        "exact_color_fps": round(fps_exact, 1),
        "exact_color_psnr_vs_march_dB": round(q_exact, 1),
    }
    print("config0:", results["config0_fixed_novel_view"], flush=True)

    # ---- config 1: 120-frame orbit (rotation -> rotated fast path) ----
    orbit_poses = [
        orbit_pose(result.orbit_center, 1.0, theta=np.deg2rad(t))
        for t in np.linspace(-15, 15, 120)
    ]
    cams = [cam_at(p, r) for p, r in orbit_poses]
    x = render(proj, cams[0], mode="fast")
    _sync(x)
    t0 = time.time()
    outs = [jnp.sum(render(proj, c, mode="fast")) for c in cams]
    _sync(jnp.stack(outs))
    dt = (time.time() - t0) / len(cams)
    results["config1_orbit_120"] = {
        "frames": 120,
        "fast_rotated_fps": round(1.0 / dt, 1),
        "ms_per_frame": round(dt * 1000, 1),
    }
    print("config1:", results["config1_orbit_120"], flush=True)

    # ---- config 2: stereo pair, batched L/R ----
    eye = 0.032
    cam_l = cam_at(np.array([-eye, 0, 0]))
    cam_r = cam_at(np.array([eye, 0, 0]))
    x = render(proj, cam_l, mode="fast")
    _sync(x)
    t0 = time.time()
    n_pairs = 10
    outs = []
    for i in range(n_pairs):
        dx = 0.001 * i
        outs.append(jnp.sum(render(proj, cam_at([-eye + dx, 0, 0]), mode="fast")))
        outs.append(jnp.sum(render(proj, cam_at([eye + dx, 0, 0]), mode="fast")))
    _sync(jnp.stack(outs))
    dt = (time.time() - t0) / n_pairs
    results["config2_stereo_pair"] = {
        "stereo_pairs_per_sec_fast": round(1.0 / dt, 1),
        "ms_per_pair": round(dt * 1000, 1),
        "note": "two-view blended kernel (ops/stereo) is march-exact but gather-bound",
    }
    print("config2:", results["config2_stereo_pair"], flush=True)

    # ---- config 3: 3-layer LDI compositing ----
    from lif_tpu import projector_from_arrays

    rng = np.random.default_rng(0)
    rgb0 = np.asarray(result.projectors[0].rgb[0])
    disp0 = np.asarray(result.projectors[0].disp[0])
    layers = []
    for i in range(2):
        m = (disp0 > (0.4 + 0.2 * i)).astype(np.float32)
        layers.append(dict(
            rgb=rgb0[::-1 if i else 1].copy(), disp=disp0,
            mask=m, focal_px=focal,
            invz_min=0.09 / (i + 1), invz_max=0.0001,
        ))
    proj3 = projector_from_arrays(
        rgb0, disp0, focal_px=focal, invz_min=0.09, invz_max=0.0001,
        baseline=0.045, extra_layers=layers,
    ).to_device()
    x = render(proj3, cam_at(fixed_pos), mode="fast")
    _sync(x)
    t0 = time.time()
    outs = [jnp.sum(render(proj3, cam_at(p), mode="fast")) for p in poses0[:10]]
    _sync(jnp.stack(outs))
    dt = (time.time() - t0) / 10
    results["config3_ldi_3layer"] = {
        "layers": 3,
        "fast_fps": round(1.0 / dt, 1),
        "ms_per_frame": round(dt * 1000, 1),
    }
    print("config3:", results["config3_ldi_3layer"], flush=True)

    # ---- config 4: multi-projector fusion (single-chip equivalent) ----
    projs4 = [result.projectors[0].to_device() for _ in range(4)]
    x = [render(p, cam_at(fixed_pos + [0.01 * i, 0, 0]), mode="fast")
         for i, p in enumerate(projs4)]
    _sync(jnp.stack([jnp.sum(v) for v in x]))
    t0 = time.time()
    n = 5
    for j in range(n):
        outs = [jnp.sum(render(p, cam_at(fixed_pos + [0.01 * i + 0.001 * j, 0, 0]),
                               mode="fast")) for i, p in enumerate(projs4)]
    _sync(jnp.stack(outs))
    dt = (time.time() - t0) / n
    results["config4_multi_projector"] = {
        "projectors": 4,
        "fused_frames_per_sec_single_chip": round(1.0 / dt, 1),
        "note": (
            "cross-chip sharded fusion (pmax/psum over a view axis) is in "
            "lif_tpu.parallel and validated on the virtual 8-device mesh; "
            "only one physical chip is available here"
        ),
    }
    print("config4:", results["config4_multi_projector"], flush=True)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
