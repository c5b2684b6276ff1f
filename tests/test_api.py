"""End-to-end API tests: author a LIF file, load it, render it."""

import io

import numpy as np
import pytest

from PIL import Image

from lif_tpu import (
    Camera,
    LifLoader,
    load_lif_file,
    projector_from_arrays,
    render,
)
from lif_tpu.io import container
from lif_tpu.models.scene import LayerGroup, Scene
from .scenes import smooth_noise


def _img_bytes(arr01, fmt="PNG"):
    buf = io.BytesIO()
    Image.fromarray((np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(buf, format=fmt)
    return buf.getvalue()


def _make_lif(rng, w=32, h=24, layers=0, stereo_data=None, baseline_mm=63.0):
    rgb = rng.random((h, w, 3))
    depth = smooth_noise(rng, h, w)
    jpeg = _img_bytes(rgb, "JPEG")
    blobs = {20: _img_bytes(depth)}
    view = {
        "image": {"blob_id": -1},
        "inv_z_map": {"blob_id": 20, "min": 0.5, "max": 0.01},
        "width_px": w,
        "height_px": h,
        "focal_px": 0.78 * w,
        "position": [0, 0, 0],
        "rotation": [0, 0, 0],
    }
    if layers:
        view["layers_top_to_bottom"] = []
        for i in range(layers):
            img_id, dep_id, mask_id = 30 + 3 * i, 31 + 3 * i, 32 + 3 * i
            blobs[img_id] = _img_bytes(rng.random((h, w, 3)), "JPEG")
            blobs[dep_id] = _img_bytes(smooth_noise(rng, h, w))
            blobs[mask_id] = _img_bytes((smooth_noise(rng, h, w) > 0.3).astype(float))
            view["layers_top_to_bottom"].append(
                {
                    "image": {"blob_id": img_id},
                    "inv_z_map": {"blob_id": dep_id, "min": 0.5 / (i + 1), "max": 0.01},
                    "mask": {"blob_id": mask_id},
                }
            )
    meta = {"views": [view], "baseline_mm": baseline_mm}
    if stereo_data:
        meta["stereo_render_data"] = stereo_data
    return container.write(jpeg, meta, blobs)


def test_load_lif_file_single_view(rng):
    data = _make_lif(rng)
    result = load_lif_file(data)
    assert len(result.projectors) == 1
    p = result.projectors[0]
    assert p.width == 32 and p.height == 24 and p.num_layers == 1
    assert abs(result.baseline_meters - 0.063) < 1e-9
    intr = p.intrinsics
    assert abs(intr["fx"] - 0.78 * 32) < 1e-6
    assert abs(intr["cx"] - 16.0) < 1e-6


def test_load_lif_file_ldi_layers(rng):
    data = _make_lif(rng, layers=2)
    result = load_lif_file(data)
    p = result.projectors[0]
    assert p.num_layers == 2  # layers_top_to_bottom replaces the base layer
    assert float(p.invz_min[0]) == pytest.approx(0.5)
    assert float(p.invz_min[1]) == pytest.approx(0.25)
    # layer 1 has a mask with holes
    assert float(np.asarray(p.mask[1]).min()) < 0.5


def test_load_lif_orbit_center(rng):
    data = _make_lif(rng, stereo_data={"invd": 0.2, "frustum_skew": {"x": 0, "y": 0}})
    result = load_lif_file(data)
    assert result.orbit_center is not None
    # convergence depth = baseline/invd = 0.063/0.2 = 0.315 m down -Z
    np.testing.assert_allclose(result.orbit_center, [0, 0, -0.315], atol=1e-6)


def test_lif_loader_class(rng):
    loader = LifLoader()
    meta = loader.load(_make_lif(rng, stereo_data={"invd": 0.1}))
    assert loader.get_views() is meta["views"]
    assert loader.get_stereo_render_data() == {"invd": 0.1}
    with pytest.raises(RuntimeError):
        LifLoader().get_views()


def test_render_loaded_projector(rng):
    data = _make_lif(rng)
    result = load_lif_file(data)
    p = result.projectors[0]
    cam = Camera.create(p.width, p.height, focal_px=float(p.focal[0]))
    img = np.asarray(render(p, cam, mode="raycast"))
    assert img.shape == (p.height, p.width, 4)
    assert np.isfinite(img).all()
    assert (img[..., 3] > 0.5).mean() > 0.5


def test_render_modes_dispatch(rng):
    h, w = 24, 32
    p = projector_from_arrays(
        rng.random((h, w, 3)).astype(np.float32),
        smooth_noise(rng, h, w).astype(np.float32),
        focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0,
        position=(0.05, 0, 0),
    )
    cam = Camera.create(w, h, focal_px=0.78 * w)
    ray = np.asarray(render(p, cam, mode="raycast"))
    mesh = np.asarray(render(p, cam, mode="mesh"))
    st = np.asarray(render([p, p], cam, mode="stereo"))
    for img in (ray, mesh, st):
        assert img.shape == (h, w, 4) and np.isfinite(img).all()
    with pytest.raises(ValueError):
        render(p, cam, mode="stereo")
    with pytest.raises(ValueError):
        render(p, cam, mode="bogus")


def test_layer_group_and_scene(rng):
    h, w = 24, 32
    p1 = projector_from_arrays(
        rng.random((h, w, 3)).astype(np.float32),
        smooth_noise(rng, h, w).astype(np.float32),
        focal_px=0.78 * w, invz_min=2.0, invz_max=0.2, baseline=1.0,
    )
    group = LayerGroup(p1)
    assert group.render_mode == "mesh"  # 1 layer -> mesh (HoloLayerGroup.ts:42)
    stats = group.get_stats()
    assert stats["layer_count"] == 1 and stats["total_pixels"] == h * w
    group.set_render_mode("raycast")
    cam = Camera.create(w, h, focal_px=0.78 * w)
    img = np.asarray(group.render(cam))
    assert img.shape == (h, w, 4)
    assert group.toggle_depth_visualization() is True

    scene = Scene()
    scene.add(p1)
    img2 = np.asarray(scene.render(cam))
    assert img2.shape == (h, w, 4)
