"""Benchmark: novel-view rendering throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Workload: the SFMoMA reference scene (1280x800 RGB + inverse depth, single
projector) rendered at novel poses — BASELINE.json configs[0] — with the
production fast renderer: the Pallas first-crossing plane march on
integer-parallax snap planes (lif_tpu/ops/pallas/sweep_march.py +
ops/sweep_march.snap_plane_table) through the batched production entry
point (render_fast_batch: trajectory/stereo workloads are batch-shaped;
one launch renders the whole pose batch off one resident source read per
tile).

Fidelity is MEASURED IN THIS RUN, not quoted: the printed metric carries
the PSNR of the exact benched mode against the converged ray march (the
reference shader's math at 640 steps) at the bench pose, plus the same
figure for the reference's own production 40-step march for context.
Protocol (docs/TPU_NOTES.md): all inputs device-resident; R batched
dispatches, each reducing its frames to one on-device scalar INSIDE the
jitted step (an eager reduction would add a ~30 ms dispatch round trip
per batch through the axon tunnel); one D2H sync at the end; a warmup
D2H precedes timing. The same kernel measures 1.7 ms/frame of pure
device time in a jax.profiler trace (~600 fps/chip); the wall number
below additionally carries this relay tunnel's ~50 ms non-pipelining
per-dispatch overhead, which directly-attached hardware does not pay.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache (set BEFORE jax import): the warmup pass
# already excludes compile time from every measurement, but the cache
# cuts multi-minute Mosaic recompiles of identical programs across
# processes/rounds, keeping the whole bench run inside the driver budget
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_FPS = 1000.0  # BASELINE.json north star, v5e target
W, H = 1280, 800
# One pose-chunked dispatch carries the whole batch (render_fast_batch
# runs a lax.map over config.pose_chunk-sized chunks inside a single
# compiled program), so the relay's ~50 ms non-pipelining per-dispatch
# overhead amortizes over BATCH frames. BATCH is a MULTIPLE of the
# default pose_chunk (48): the tail chunk pads to a full chunk, so 400
# would render 432 frames and bill 32 of them to nothing (8% waste).
# The (432, 800, 1280, 4) f32 batch (~7 GB) materializes in HBM inside
# the dispatch (per-chunk march intermediates stay bounded by the
# lax.map) — comfortably inside v5e's 16 GB.
BATCH = 432
REPS = 1


def _wait_for_device(budget_s: float = 2400.0, probe_timeout_s: float = 120.0):
    """Block until the TPU answers a tiny op, retrying for up to budget_s.

    The axon relay can go dark for long stretches (docs/TPU_NOTES.md:
    "tunnel outages"); jax.devices() then HANGS in-process rather than
    erroring, which would wedge the driver's end-of-round bench run.
    Probe in a subprocess under a timeout so a dark tunnel yields a
    bounded, clearly-diagnosed failure instead of an indefinite hang.
    """
    import subprocess
    import sys

    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return r.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(json.dumps({
                "error": "TPU tunnel dark: device probe failed for "
                         f"{budget_s:.0f}s over {attempt} attempts; "
                         "no benchmark was run",
            }))
            sys.exit(2)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def main():
    platform = _wait_for_device()
    print(f"device probe ok: platform={platform}", flush=True)

    import jax
    import jax.numpy as jnp

    from lif_tpu import Camera, load_lif_file
    from lif_tpu.models.renderer import render_fast_batch, render_mono_view

    from examples.render_sfmoma import build_sfmoma_lif

    result = load_lif_file(build_sfmoma_lif())
    proj = result.projectors[0].to_device()
    focal = float(proj.focal[0])

    def cam(x):
        return Camera.create(W, H, focal_px=focal, position=[x, 0.0, 0.0])

    def reduce_img(img):
        return jnp.sum(img) * 1e-9

    def make_step(batch):
        # same 0.02 m pose spread as the round-2 40-pose batch (the
        # march plan's resident-window margin is the POSE-BATCH UNION of
        # shifts, so the spread — not the count — sets the per-tile
        # footprint)
        cams = [cam(0.135 + 0.02 * i / batch) for i in range(batch)]

        def step():
            # postprocess= fuses the sync reduction INTO the render
            # dispatch: one relay round trip per step instead of two
            # (~50 ms non-pipelining overhead each, docs/TPU_NOTES.md),
            # and no full image crosses the tunnel
            return render_fast_batch(
                proj, cams, method="march", postprocess=reduce_img
            )

        return step

    # degradation ladder: the big single dispatch first; if the worker
    # rejects it (transient "TPU worker crashed" faults were observed on
    # large fused graphs, docs/TPU_NOTES.md), fall back to the round-2
    # streaming protocol (more, smaller dispatches) rather than failing
    # the whole bench run. Each (batch, reps) pass times reps dispatches.
    fps_med = None
    for batch, reps, label in ((BATCH, REPS, "single-dispatch"),
                               (40, 10, "streaming-fallback")):
        try:
            step = make_step(batch)
            # compile + honest-timing warmup (first D2H switches the
            # runtime into synchronous accounting); the reported figure
            # is the MEDIAN of 5 timed passes — the relay's per-dispatch
            # variance makes a best-of statistic indefensible
            # (docs/TPU_NOTES.md)
            _ = float(step())
            samples = []
            for _rep in range(5):
                t0 = time.time()
                acc = [step() for _ in range(reps)]
                # one sync for all batches
                _ = float(jnp.sum(jnp.stack(acc)))
                samples.append(reps * batch / (time.time() - t0))
        except Exception as e:  # noqa: BLE001 — any device/compile fault
            # transient worker faults can hit a TIMED pass too, not just
            # the warmup; fall to the next protocol either way
            print(f"batch={batch} ({label}) failed: {e!r}", flush=True)
            continue
        fps_med = float(np.median(samples))
        protocol = f"{label}, batch={batch}x{reps}"
        break
    if fps_med is None:
        print(json.dumps({"error": "all bench protocols failed"}))
        raise SystemExit(3)

    # ---- mixed-family composite (round-3 weak-8 / round-4 item 8):
    # the headline above measures the EASIEST pose family (lateral).
    # This second number renders the same total frame count split 1/3
    # lateral + 1/3 orbit (rotated tier) + 1/3 zoom (scaled tier), each
    # through its natural tier in its own pose-chunked dispatch, and
    # reports total frames / total wall time — the honest "a camera
    # that actually moves" rate. Failures degrade to None rather than
    # failing the headline metric.
    composite_fps = None
    try:
        from lif_tpu.core.pose import orbit_pose

        third = BATCH // 3
        lat_cams = [cam(0.135 + 0.02 * i / third) for i in range(third)]
        orb = [
            orbit_pose(result.orbit_center, 1.0, theta=np.deg2rad(t))
            for t in np.linspace(-15, 15, third)
        ]
        orb_cams = [
            Camera.create(W, H, focal_px=focal, position=p, rotation=r)
            for p, r in orb
        ]
        zoom_cams = [
            Camera.create(W, H, focal_px=focal,
                          position=[0.0, 0.0, 0.1 + 0.1 * i / third])
            for i in range(third)
        ]

        def comp_pass():
            acc = [
                render_fast_batch(proj, cs, method="auto",
                                  postprocess=reduce_img)
                for cs in (lat_cams, orb_cams, zoom_cams)
            ]
            return float(jnp.sum(jnp.stack(acc)))

        comp_pass()  # compile + honest-timing warmup
        comp_samples = []
        for _rep in range(3):
            t0 = time.time()
            comp_pass()
            comp_samples.append(3 * third / (time.time() - t0))
        composite_fps = float(np.median(comp_samples))
        print(json.dumps({
            "composite_metric": (
                f"mixed-pose-family frames/sec/chip @{W}x{H}: "
                f"{3 * third} frames as 1/3 lateral + 1/3 orbit "
                "+ 1/3 zoom, each family one pose-chunked dispatch "
                "through its production tier, median of 3 passes"
            ),
            "value": round(composite_fps, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — composite must not kill the
        print(f"composite bench failed: {e!r}", flush=True)  # headline

    # measured fidelity of the EXACT benched mode at the bench pose
    def psnr(a, b):
        mse = np.mean((a[..., :3] - b[..., :3]) ** 2)
        return 10 * np.log10(1.0 / max(float(mse), 1e-12))

    cam0 = cam(0.135)  # the batch's first pose
    bench_img = np.asarray(
        render_fast_batch(proj, [cam0], method="march")[0]
    )
    conv = np.asarray(
        render_mono_view(proj, cam0, mask_mode="none", num_steps=640)
    )
    ref40 = np.asarray(
        render_mono_view(proj, cam0, mask_mode="none", num_steps=40)
    )
    q_bench = psnr(bench_img, conv)
    q_ref40 = psnr(ref40, conv)

    print(
        json.dumps(
            {
                "metric": (
                    f"novel-view frames/sec/chip @{W}x{H}, median of 5 "
                    f"timed passes, {protocol} (SFMoMA, Pallas "
                    "integer-parallax snap-plane march; measured this run: "
                    f"{q_bench:.1f} dB vs the converged 640-step ray march "
                    f"at the bench pose, where the reference's own 40-step "
                    f"production march measures {q_ref40:.1f} dB"
                    + (
                        f"; mixed-family composite 1/3 lateral + 1/3 orbit "
                        f"+ 1/3 zoom: {composite_fps:.1f} fps"
                        if composite_fps is not None else ""
                    )
                    + ")"
                ),
                "value": round(fps_med, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps_med / BASELINE_FPS, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
