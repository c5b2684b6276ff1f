"""Full benchmark sweep: the five BASELINE.json configs + quality numbers.

Writes BENCH_DETAILS.json. The driver-facing single metric stays in
bench.py; this script is the complete evidence table:

  0. SFMoMA single projector, one fixed novel view (snap-plane march)
  1. 120-frame orbit trajectory (rotation -> batched rotated fast path)
  2. stereo pairs through the REAL two-view blend kernel
     (render_stereo_fast_batch: view weight + occlusion fill + blend)
  3. 3-layer LDI with occlusion-aware alpha compositing
  4. 4-projector fused compositing at 3840x2160 (single-chip
     render_fused_fast; the cross-chip sharded path with the identical
     merge spec is validated on the virtual CPU mesh in
     tests/test_fusion.py)

Quality is reported as PSNR of the benched mode against the CONVERGED
ray-march renderer (640 steps) on the same pose; the reference's own
production 40-step march is measured against the same target for
context. All inputs device-resident; one D2H sync per timed batch.
"""

from __future__ import annotations

import json
import time

import numpy as np

W, H = 1280, 800


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _psnr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    mse = np.mean((a[..., :3] - b[..., :3]) ** 2)
    return 10 * np.log10(1.0 / max(float(mse), 1e-12))


def main():
    import jax.numpy as jnp

    from lif_tpu import Camera, load_lif_file, render, orbit_pose
    from lif_tpu.models.renderer import (
        render_fast_batch,
        render_fast_view,
        render_fused_fast_batch,
        render_stereo_fast_batch,
    )
    from lif_tpu.models.projector import resample_projector

    # --- build the SFMoMA LIF in memory (single source of the scene
    # constants: examples/render_sfmoma.py) ---
    from examples.render_sfmoma import build_sfmoma_lif

    result = load_lif_file(build_sfmoma_lif())
    proj = result.projectors[0].to_device()
    focal = float(proj.focal[0])
    results = {}

    def cam_at(pos, rot=None):
        return Camera.create(W, H, focal_px=focal, position=pos, rotation=rot)

    # ---- config 0: fixed novel view, snap-plane march ----
    fixed_pos = np.array([0.135, 0.0, 0.0])
    img_snap = render_fast_view(proj, cam_at(fixed_pos), method="march")
    conv = render(proj, cam_at(fixed_pos), mode="raycast", mask_mode="none",
                  num_steps=640)
    ref40 = render(proj, cam_at(fixed_pos), mode="raycast", mask_mode="none",
                   num_steps=40)
    q_snap = float(_psnr(img_snap, conv))
    q_ref40 = float(_psnr(ref40, conv))

    import jax

    @jax.jit
    def _reduce(img):
        return jnp.sum(img) * 1e-9

    poses0 = [fixed_pos + [0.001 * i, 0, 0] for i in range(20)]
    _ = _sync(render_fast_view(proj, cam_at(poses0[0]), method="march"))
    fps_seq = 0.0
    for _rep in range(3):
        t0 = time.time()
        outs = [jnp.sum(render_fast_view(proj, cam_at(p), method="march"))
                for p in poses0]
        _sync(jnp.stack(outs))
        fps_seq = max(fps_seq, len(poses0) / (time.time() - t0))
    # batched streaming: in-jit reduction, one sync for all batches
    # (an eager reduction adds a ~30-50 ms dispatch round trip per batch;
    # see docs/TPU_NOTES.md)
    cams0b = [cam_at(fixed_pos + [0.0005 * i, 0, 0]) for i in range(40)]
    _ = float(_reduce(render_fast_batch(proj, cams0b)))
    fps_batch = 0.0
    for _rep in range(3):
        t0 = time.time()
        acc = [_reduce(render_fast_batch(proj, cams0b)) for _ in range(4)]
        _ = float(jnp.sum(jnp.stack(acc)))
        fps_batch = max(fps_batch, 4 * len(cams0b) / (time.time() - t0))
    t0 = time.time()
    _sync(render(proj, cam_at(poses0[0]), mode="raycast", mask_mode="none"))
    fps_march40 = 1.0 / (time.time() - t0)
    results["config0_fixed_novel_view"] = {
        "snap_march_fps_sequential": round(fps_seq, 1),
        "snap_march_fps_batch40_streaming": round(fps_batch, 1),
        "snap_march_psnr_vs_converged_dB": round(q_snap, 2),
        "reference40_psnr_vs_converged_dB": round(q_ref40, 2),
        "reference40_march_fps": round(fps_march40, 2),
    }
    print("config0:", results["config0_fixed_novel_view"], flush=True)

    # ---- config 1: 120-frame orbit, batched rotated fast path ----
    orbit_poses = [
        orbit_pose(result.orbit_center, 1.0, theta=np.deg2rad(t))
        for t in np.linspace(-15, 15, 120)
    ]
    cams = [cam_at(p, r) for p, r in orbit_poses]
    chunk = 24
    def orbit_pass():
        acc = []
        for lo in range(0, len(cams), chunk):
            out = render_fast_batch(proj, cams[lo : lo + chunk])
            acc.append(jnp.sum(out))
        _sync(jnp.stack(acc))
    orbit_pass()  # compile all chunks
    t0 = time.time()
    orbit_pass()
    dt = (time.time() - t0) / len(cams)
    results["config1_orbit_120"] = {
        "frames": 120,
        "batched_rotated_fps": round(1.0 / dt, 1),
        "ms_per_frame": round(dt * 1000, 1),
        "chunk": chunk,
    }
    print("config1:", results["config1_orbit_120"], flush=True)

    # ---- config 2: stereo pairs via the real two-view blend kernel ----
    eye = 0.0225  # half the 45 mm baseline
    left = result.projectors[0].replace(
        position=np.asarray([-eye, 0.0, 0.0], np.float32)
    ).to_device()
    right = result.projectors[0].replace(
        position=np.asarray([eye, 0.0, 0.0], np.float32)
    ).to_device()
    n_pairs = 8
    stereo_cams = []
    for i in range(n_pairs):
        dx = 0.004 * i
        stereo_cams.append(cam_at([-eye + dx, 0, 0]))
        stereo_cams.append(cam_at([eye + dx, 0, 0]))
    _ = _sync(render_stereo_fast_batch(left, right, stereo_cams))
    best = 0.0
    for _rep in range(3):
        t0 = time.time()
        _sync(render_stereo_fast_batch(left, right, stereo_cams))
        best = max(best, n_pairs / (time.time() - t0))
    results["config2_stereo_pair"] = {
        "stereo_pairs_per_sec": round(best, 1),
        "ms_per_pair": round(1000.0 / best, 1),
        "kernel": (
            "two-view blend (view weight + occlusion fill, "
            "rayCastStereoLDI semantics) on the batched snap-plane march"
        ),
    }
    print("config2:", results["config2_stereo_pair"], flush=True)

    # ---- config 3: 3-layer LDI compositing ----
    from lif_tpu import projector_from_arrays

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
    cams3 = [cam_at(p) for p in poses0]
    _ = _sync(render_fast_batch(proj3, cams3))
    best = 0.0
    for _rep in range(3):
        t0 = time.time()
        _sync(render_fast_batch(proj3, cams3))
        best = max(best, len(cams3) / (time.time() - t0))
    results["config3_ldi_3layer"] = {
        "layers": 3,
        "fast_fps_batch20": round(best, 1),
        "ms_per_frame": round(1000.0 / best, 1),
    }
    print("config3:", results["config3_ldi_3layer"], flush=True)

    # ---- config 4: 4-projector fused compositing at 3840x2160 ----
    W4, H4 = 3840, 2160
    scale = W4 / W
    base4 = resample_projector(result.projectors[0], scale, out_w=W4, out_h=H4)
    projs4 = [
        base4.replace(position=np.asarray([0.02 * i, 0.0, 0.0], np.float32))
        .to_device()
        for i in range(4)
    ]
    focal4 = float(projs4[0].focal[0])
    n = 4
    cams4 = [
        Camera.create(W4, H4, focal_px=focal4,
                      position=[0.05 + 0.002 * j, 0.0, 0.0])
        for j in range(n)
    ]
    _ = _sync(render_fused_fast_batch(projs4, cams4))
    best = 0.0
    for _rep in range(2):
        t0 = time.time()
        _sync(render_fused_fast_batch(projs4, cams4))
        best = max(best, n / (time.time() - t0))
    results["config4_multi_projector_4k"] = {
        "projectors": 4,
        "resolution": f"{W4}x{H4}",
        "fused_frames_per_sec_single_chip": round(best, 2),
        "note": (
            "render_fused_fast: full-LDI per-projector march + nearest-"
            "surface merge at 4K on one chip; the cross-chip shard_map "
            "fusion (pmax/psum over the view axis) implements the same "
            "merge spec and is validated on the virtual 8-device mesh "
            "(tests/test_fusion.py) — only one physical chip is here"
        ),
    }
    print("config4:", results["config4_multi_projector_4k"], flush=True)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
