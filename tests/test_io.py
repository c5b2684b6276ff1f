"""Tests for the LIF container parser, schema normalization, and decode."""

import numpy as np
import pytest

from lif_tpu.io import container, decode, schema


def _jpeg_bytes(rng, w=16, h=12):
    from PIL import Image
    import io

    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _png_bytes(rng, w=16, h=12, gray=True):
    from PIL import Image
    import io

    if gray:
        arr = (rng.random((h, w)) * 255).astype(np.uint8)
    else:
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_container_round_trip(rng):
    jpeg = _jpeg_bytes(rng)
    depth = _png_bytes(rng)
    meta = {"views": [{"image": {"blob_id": -1}}], "baseline_mm": 45}
    data = container.write(jpeg, meta, {20: depth})

    cont = container.parse(data)
    assert cont.json_meta() == meta
    assert cont.blob(20) == depth
    assert cont.blob(-1) == data  # -1 = whole file


def test_container_rejects_garbage():
    with pytest.raises(container.LifParseError):
        container.parse(b"not a lif file at all")
    with pytest.raises(container.LifParseError):
        container.parse(b"\x00" * 100)


def test_replace_keys_legacy_renames():
    obj = {
        "albedo": {"blob_id": 3},
        "disparity": {"min_disparity": 0.1, "max_disparity": 0.9},
        "nested": [{"inv_z_dist": {"inv_z_dist_min": 2.0, "inv_z_dist_max": 0.1}}],
    }
    out = schema.replace_keys(obj)
    assert "image" in out and "inv_z_map" in out
    assert out["inv_z_map"] == {"min": 0.1, "max": 0.9}
    # NOTE the deliberate inversion: inv_z_dist_min -> max, _max -> min
    assert out["nested"][0]["inv_z_map"] == {"max": 2.0, "min": 0.1}


def test_process_views_modern(rng):
    jpeg = _jpeg_bytes(rng, 16, 12)
    depth = _png_bytes(rng, 16, 12)
    meta = {
        "views": [
            {
                "image": {"blob_id": -1},
                "inv_z_map": {"blob_id": 20, "min": 0.5, "max": 0.01},
                "width_px": 16,
                "height_px": 12,
                "focal_px": 12.48,
                "position": [0, 0, 0],
                "rotation": [0, 0, 0],
            }
        ]
    }
    data = container.write(jpeg, meta, {20: depth})
    cont = container.parse(data)
    views = schema.load_meta(cont)["views"]
    assert views[0]["image"]["bytes"] == data
    assert views[0]["inv_z_map"]["bytes"] == depth


def test_process_views_legacy_camera_data(rng):
    """Pre-5.3: dims from image, focal from ratio, invZ rescaled by
    -focal_ratio_to_width. reference: LifLoader.ts:484-497."""
    jpeg = _jpeg_bytes(rng, 16, 12)
    depth = _png_bytes(rng, 16, 12)
    meta = {
        "views": [
            {
                "image": {"blob_id": -1},
                "inv_z_map": {"blob_id": 20, "min": -0.39, "max": -0.0078},
                "camera_data": {
                    "focal_ratio_to_width": 0.78,
                    "position": [0.1, 0.2, 0.3],
                    "rotation": [0, 0, 0],
                    "frustum_skew": [0.0, 0.0],
                },
            }
        ]
    }
    data = container.write(jpeg, meta, {20: depth})
    views = schema.load_meta(container.parse(data))["views"]
    v = views[0]
    assert v["width_px"] == 16 and v["height_px"] == 12
    assert abs(v["focal_px"] - 0.78 * 16) < 1e-9
    assert abs(v["inv_z_map"]["min"] - (-0.39 / -0.78)) < 1e-9
    assert abs(v["inv_z_map"]["max"] - (-0.0078 / -0.78)) < 1e-9
    assert v["position"] == [0.1, 0.2, 0.3]


def test_process_views_legacy_ldi_outpainting(rng):
    """Legacy layered_depth_image_data: layer dims = view + outpaint, invZ
    divided by (1 + outpaint_w/width) then by -focal_ratio.
    reference: LifLoader.ts:499-536."""
    jpeg = _jpeg_bytes(rng, 16, 12)
    depth = _png_bytes(rng, 16, 12)
    layer_img = _jpeg_bytes(rng, 20, 16)
    layer_depth = _png_bytes(rng, 20, 16)
    ratio = 0.78
    meta = {
        "views": [
            {
                "image": {"blob_id": -1},
                "inv_z_map": {"blob_id": 20, "min": 0.5, "max": 0.01},
                "width_px": 16,
                "height_px": 12,
                "focal_px": ratio * 16,
                "camera_data": {"focal_ratio_to_width": ratio},
                "layered_depth_image_data": {
                    "outpainting_added_width_px": 4,
                    "outpainting_added_height_px": 4,
                    "layers_top_to_bottom": [
                        {
                            "image": {"blob_id": 21},
                            "inv_z_map": {"blob_id": 22, "min": -0.39, "max": -0.0078},
                        }
                    ],
                },
            }
        ]
    }
    data = container.write(jpeg, meta, {20: depth, 21: layer_img, 22: layer_depth})
    views = schema.load_meta(container.parse(data))["views"]
    layer = views[0]["layers_top_to_bottom"][0]
    assert layer["width_px"] == 20 and layer["height_px"] == 16
    assert layer["focal_px"] == ratio * 16
    scale = 1 + 4 / 16
    np.testing.assert_allclose(layer["inv_z_map"]["min"], (-0.39 / scale) / -ratio)
    np.testing.assert_allclose(layer["inv_z_map"]["max"], (-0.0078 / scale) / -ratio)
    assert "camera_data" not in layer


def test_decode_rgb_orientation(rng):
    """Row 0 of the decoded array must be the BOTTOM image row (GL)."""
    from PIL import Image
    import io

    arr = np.zeros((4, 4, 3), np.uint8)
    arr[0, :, 0] = 255  # top row red
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out = decode.decode_rgb(buf.getvalue(), linear=False)
    assert out[-1, 0, 0] == 1.0  # top row is now the LAST row
    assert out[0, 0, 0] == 0.0


def test_decode_mask_red_channel(rng):
    from PIL import Image
    import io

    arr = np.zeros((4, 4, 3), np.uint8)
    arr[:, :, 0] = 128  # red channel only
    arr[:, :, 1] = 255
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out = decode.decode_mask(buf.getvalue(), (4, 4))
    np.testing.assert_allclose(out, 128 / 255.0, atol=1e-6)
    # absent mask = opaque
    np.testing.assert_allclose(decode.decode_mask(None, (2, 2)), 1.0)


def test_encode_decode_round_trip(rng):
    rgb = rng.random((8, 10, 3)).astype(np.float32) * 0.8
    png_rt = decode.decode_rgb(decode.encode_png(np.asarray(
        __import__("lif_tpu.core.color", fromlist=["linear_to_srgb"]).linear_to_srgb(rgb)
    )), linear=True)
    assert png_rt.shape == (8, 10, 3)
    np.testing.assert_allclose(png_rt, rgb, atol=2e-2)
