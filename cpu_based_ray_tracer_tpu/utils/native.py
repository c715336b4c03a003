"""ctypes bindings for the native C++ host runtime (``csrc/native.cpp``).

The reference's BVH builder and OBJ loader are C++ (``BVH.h:106-185``,
vendored ``OBJ_Loader.h``); ours are too — these are host-side
scene-preprocessing stages, not TPU compute.  The shared library is built
with ``make -C csrc`` (attempted lazily on first use); every entry point has
a numpy fallback with an identical contract, and the test suite asserts
bit-equal outputs between the two backends.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcrt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _CSRC, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.crt_build_bvh.restype = ctypes.c_int64
        lib.crt_obj_count.restype = ctypes.c_int64
        lib.crt_obj_load.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(tri_vertices: np.ndarray, leaf_size: int = 4):
    """Native flattened-BVH build; returns ``ops.bvh.FlatBVH`` or None when
    the library is unavailable.  Contract identical to
    ``ops.bvh.build_bvh`` (tests assert exact equality)."""
    lib = _load()
    if lib is None:
        return None
    import jax.numpy as jnp
    from cpu_based_ray_tracer_tpu.ops.bvh import FlatBVH

    verts = np.ascontiguousarray(
        np.asarray(tri_vertices, np.float64).reshape(-1, 9))
    n = len(verts)
    cap = 2 * n
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_skip = np.empty(cap, np.int32)
    leaf_first = np.empty(cap, np.int32)
    leaf_count = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    c = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    m = lib.crt_build_bvh(
        c(verts, ctypes.c_double), ctypes.c_int64(n),
        ctypes.c_int64(leaf_size),
        c(node_min, ctypes.c_float), c(node_max, ctypes.c_float),
        c(node_skip, ctypes.c_int32), c(leaf_first, ctypes.c_int32),
        c(leaf_count, ctypes.c_int32), c(order, ctypes.c_int32))
    if m <= 0:
        return None
    return FlatBVH(node_min=jnp.asarray(node_min[:m]),
                   node_max=jnp.asarray(node_max[:m]),
                   node_skip=jnp.asarray(node_skip[:m]),
                   leaf_first=jnp.asarray(leaf_first[:m]),
                   leaf_count=jnp.asarray(leaf_count[:m]),
                   order=jnp.asarray(order),
                   max_leaf=leaf_size)


def load_obj_native(path: str):
    """Native OBJ parse -> (tris (T,3,3) f64, uv (T,3,2) f64 or None), or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.crt_obj_count(ctypes.c_char_p(str(path).encode()))
    if n < 0:
        raise FileNotFoundError(path)
    tris = np.empty((max(n, 1), 3, 3), np.float64)
    uv = np.empty((max(n, 1), 3, 2), np.float64)
    has_uv = ctypes.c_int32(0)
    got = lib.crt_obj_load(
        ctypes.c_char_p(str(path).encode()),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(has_uv))
    assert got == n
    return tris[:n], (uv[:n] if has_uv.value else None)
