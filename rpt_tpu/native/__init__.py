"""Native (C++) host-side runtime components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; the host-side runtime around it —
BVH construction today — is C++, mirroring the reference where tree building
is compiled Rust (/root/reference/src/kdtree.rs:108-127). The shared library
is compiled on demand with g++ (cached next to the source, keyed on source
mtime) and every entry point has a pure-Python fallback, so the package
works on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "native_available", "build_bvh_sah", "parse_obj"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_DIR, "bvh_builder.cpp"),
    os.path.join(_DIR, "obj_parser.cpp"),
]
_LIB = os.path.join(_DIR, "_librpt.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB + ".tmp", *_SRCS,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded shared library, or None if unavailable (no g++, compile
    failure, unwritable package dir, ...)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            fresh = os.path.exists(_LIB) and all(
                os.path.getmtime(_LIB) >= os.path.getmtime(s) for s in _SRCS
            )
            if not fresh and not _compile():
                return None
            lib = ctypes.CDLL(_LIB)
            fn = lib.rpt_build_bvh_sah
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            po = lib.rpt_parse_obj
            po.restype = ctypes.c_int
            po.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.rpt_obj_free.restype = None
            lib.rpt_obj_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def build_bvh_sah(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int):
    """Binned-SAH skip-link preorder BVH over triangle AABBs.

    Returns (node_min (M,3) f32, node_max, is_leaf (M,) i32, skip i32,
    leaf_start i32, leaf_count i32, perm (P,) i64) where perm is the
    leaf-contiguous, leaf_size-padded triangle permutation — the exact
    contract of the Python median builder in ops/bvh.py. None if the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    T = int(tri_min.shape[0])
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    cap_nodes = 2 * T + 1
    cap_perm = leaf_size * T + leaf_size
    node_min = np.empty((cap_nodes, 3), np.float32)
    node_max = np.empty((cap_nodes, 3), np.float32)
    is_leaf = np.empty(cap_nodes, np.int32)
    skip = np.empty(cap_nodes, np.int32)
    leaf_start = np.empty(cap_nodes, np.int32)
    leaf_count = np.empty(cap_nodes, np.int32)
    perm = np.empty(cap_perm, np.int64)
    out_nodes = np.zeros(1, np.int64)
    out_perm = np.zeros(1, np.int64)
    rc = lib.rpt_build_bvh_sah(
        tri_min.ctypes.data, tri_max.ctypes.data, T, leaf_size,
        node_min.ctypes.data, node_max.ctypes.data, is_leaf.ctypes.data,
        skip.ctypes.data, leaf_start.ctypes.data, leaf_count.ctypes.data,
        perm.ctypes.data, cap_nodes, cap_perm,
        out_nodes.ctypes.data, out_perm.ctypes.data,
    )
    if rc != 0:
        return None
    M, P = int(out_nodes[0]), int(out_perm[0])
    return (
        node_min[:M], node_max[:M], is_leaf[:M], skip[:M],
        leaf_start[:M], leaf_count[:M], perm[:P],
    )


def parse_obj(data: bytes):
    """Parse OBJ text -> (verts (T,3,3) f64, norms (T,3,3) f64,
    run (T,) i32, names list[str]) with the reference's semantics
    (io.rs:27-200): fan triangulation, negative indices, flat-normal fill,
    usemtl runs (run 0 = before any usemtl; names[i] is run i+1's material).
    None if the native library is unavailable; raises ValueError on
    malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    pv = ctypes.c_void_p()
    pn = ctypes.c_void_p()
    pr = ctypes.c_void_p()
    pnm = ctypes.c_void_p()
    n_tris = ctypes.c_int64()
    n_runs = ctypes.c_int64()
    rc = lib.rpt_parse_obj(
        data, len(data), ctypes.byref(pv), ctypes.byref(pn), ctypes.byref(pr),
        ctypes.byref(pnm), ctypes.byref(n_tris), ctypes.byref(n_runs),
    )
    if rc != 0:
        raise ValueError(f"malformed .OBJ (native parser rc={rc})")
    try:
        T = n_tris.value
        verts = np.ctypeslib.as_array(
            ctypes.cast(pv, ctypes.POINTER(ctypes.c_double)), (max(T, 1) * 9,)
        )[: T * 9].reshape(T, 3, 3).copy()
        norms = np.ctypeslib.as_array(
            ctypes.cast(pn, ctypes.POINTER(ctypes.c_double)), (max(T, 1) * 9,)
        )[: T * 9].reshape(T, 3, 3).copy()
        run = np.ctypeslib.as_array(
            ctypes.cast(pr, ctypes.POINTER(ctypes.c_int32)), (max(T, 1),)
        )[:T].copy()
        names_raw = ctypes.cast(pnm, ctypes.c_char_p).value or b""
        names = names_raw.decode("utf-8").split("\n") if names_raw else []
    finally:
        for p in (pv, pn, pr, pnm):
            lib.rpt_obj_free(p)
    assert len(names) == n_runs.value
    return verts, norms, run, names
