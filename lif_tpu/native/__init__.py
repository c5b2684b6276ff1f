"""Native (C++) components: fast LIF container codec via ctypes.

The library is built on demand from lif_container.cpp with g++ (cached next
to the source). Everything here degrades gracefully: if no compiler is
available the pure-Python codec in lif_tpu.io.container is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lif_container.cpp")
_SO = os.path.join(_HERE, "liblif_container.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


class LifFieldStruct(ctypes.Structure):
    _fields_ = [
        ("field_type", ctypes.c_uint32),
        ("reserved", ctypes.c_uint32),
        ("offset", ctypes.c_uint64),
        ("size", ctypes.c_uint64),
    ]


def _build() -> str | None:
    """Compile the shared library if needed. Returns an error string or None."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            text=True,
            timeout=120,
        )
        return None
    except FileNotFoundError:
        return "g++ not available"
    except subprocess.CalledProcessError as e:  # pragma: no cover
        return f"compile failed: {e.stderr[:500]}"
    except subprocess.TimeoutExpired:  # pragma: no cover
        return "compile timed out"


def load_library():
    """The ctypes library handle, or None when native support is unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_SO)
        lib.lif_parse.restype = ctypes.c_int
        lib.lif_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(LifFieldStruct),
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.lif_validate.restype = ctypes.c_int
        lib.lif_validate.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.lif_write_size.restype = ctypes.c_uint64
        lib.lif_write_size.argtypes = [
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32,
        ]
        lib.lif_write.restype = ctypes.c_int
        lib.lif_write.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib


def build_error() -> str | None:
    return _build_error


MAX_FIELDS = 4096


def parse_fields(data: bytes) -> list[tuple[int, int, int]] | None:
    """Parse with the native codec: [(field_type, offset, size), ...].
    Returns None when native support is unavailable; raises ValueError on
    malformed input (same classification as the Python parser)."""
    lib = load_library()
    if lib is None:
        return None
    fields = (LifFieldStruct * MAX_FIELDS)()
    count = ctypes.c_uint32(0)
    rc = lib.lif_parse(data, len(data), fields, MAX_FIELDS, ctypes.byref(count))
    if rc != 0:
        raise ValueError(f"native LIF parse failed (code {rc})")
    return [
        (fields[i].field_type, fields[i].offset, fields[i].size)
        for i in range(count.value)
    ]


def write_container(jpeg: bytes, fields: list[tuple[int, bytes]]) -> bytes | None:
    """Author a LIF container natively. Returns None when unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(fields)
    types = (ctypes.c_uint32 * n)(*[t for t, _ in fields])
    payloads = (ctypes.c_char_p * n)(*[p for _, p in fields])
    sizes = (ctypes.c_uint64 * n)(*[len(p) for _, p in fields])
    need = lib.lif_write_size(len(jpeg), sizes, n)
    out = ctypes.create_string_buffer(need)
    out_size = ctypes.c_uint64(0)
    rc = lib.lif_write(
        jpeg, len(jpeg), types, payloads, sizes, n, out, need,
        ctypes.byref(out_size),
    )
    if rc != 0:
        raise ValueError(f"native LIF write failed (code {rc})")
    return out.raw[: out_size.value]
