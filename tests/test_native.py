"""Native (C++) LIF codec tests: agreement with the pure-Python codec."""

import numpy as np
import pytest

from lif_tpu import native
from lif_tpu.io import container


@pytest.fixture(scope="module")
def lib_available():
    if native.load_library() is None:
        pytest.skip(f"native codec unavailable: {native.build_error()}")
    return True


def _sample(rng):
    jpeg = b"\xff\xd8\xff" + rng.bytes(500) + b"\xff\xd9"
    meta = {"views": [{"image": {"blob_id": -1}}], "baseline_mm": 45}
    blobs = {20: rng.bytes(300), 21: rng.bytes(5), 55: b""}
    return container.write(jpeg, meta, blobs), jpeg, blobs


def test_native_parse_matches_python(rng, lib_available):
    data, jpeg, blobs = _sample(rng)
    py = container.parse(data, prefer_native=False)
    nat = container.parse(data, prefer_native=True)
    assert [(f.field_type, f.data) for f in py.fields] == [
        (f.field_type, f.data) for f in nat.fields
    ]
    assert nat.json_meta() == py.json_meta()
    assert nat.blob(20) == blobs[20]
    assert nat.blob(55) == b""


def test_native_rejects_garbage(lib_available):
    with pytest.raises(ValueError):
        native.parse_fields(b"garbage data that is not a lif")
    with pytest.raises(container.LifParseError):
        container.parse(b"\x00" * 64, prefer_native=True)


def test_native_write_matches_python(rng, lib_available):
    jpeg = b"\xff\xd8" + rng.bytes(100) + b"\xff\xd9"
    fields = [(8, b'{"views": []}'), (20, rng.bytes(64))]
    nat_bytes = native.write_container(jpeg, fields)
    assert nat_bytes is not None
    # Python parser must read the native writer's output
    cont = container.parse(nat_bytes, prefer_native=False)
    assert [(f.field_type, f.data) for f in cont.fields] == fields
    # and byte-for-byte identical to the python writer for the same input
    py_bytes = container.write(jpeg, {"views": []}, {20: fields[1][1]})
    assert nat_bytes == py_bytes


def test_native_round_trip_large(rng, lib_available):
    """A ~5 MB container parses identically in both codecs."""
    jpeg = rng.bytes(2_000_000) + b"\xff\xd9"
    blobs = {i: rng.bytes(300_000) for i in range(20, 30)}
    data = container.write(jpeg, {"views": []}, blobs)
    py = container.parse(data, prefer_native=False)
    nat = container.parse(data, prefer_native=True)
    assert all(
        a.field_type == b.field_type and a.data == b.data
        for a, b in zip(py.fields, nat.fields)
    )


def test_native_write_rejects_u32_overflow(lib_available):
    """Field sizes and the region offset are u32 on disk; the writer must
    refuse payloads that would silently truncate (>4 GiB), not corrupt."""
    import ctypes

    lib = native.load_library()
    jpeg = b"\xff\xd8\xff\xd9"
    types = (ctypes.c_uint32 * 1)(8)
    payloads = (ctypes.c_char_p * 1)(b"tiny")
    # lie about the size: guard must fire before any memcpy
    sizes = (ctypes.c_uint64 * 1)(1 << 32)
    out = ctypes.create_string_buffer(64)
    out_size = ctypes.c_uint64(0)
    rc = lib.lif_write(
        jpeg, len(jpeg), types, payloads, sizes, 1, out, 64,
        ctypes.byref(out_size),
    )
    assert rc == -7  # LIF_ERR_FIELD_TOO_LARGE
