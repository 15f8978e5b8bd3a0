"""ctypes bindings for the C++ host components (native/tpurt_native.cpp).

The shared library is compiled on first use with the system g++ and
cached next to the package; every entry point has a pure-Python
fallback, so the framework works without a toolchain. The native paths
accelerate host-side scene preparation only (OBJ parsing, SAH BVH
construction) — BVH shape never affects rendered images, so mixing
native and Python builds is always safe.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native",
                    "tpurt_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_tpurt_native.so")


class TnNode(ctypes.Structure):
    _fields_ = [
        ("bmin", ctypes.c_float * 3),
        ("bmax", ctypes.c_float * 3),
        ("child", ctypes.c_int64),
        ("first", ctypes.c_int64),
        ("ntris", ctypes.c_int64),
    ]


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / compile error: fall back
        print(f"tpurt: native build unavailable ({e})", file=sys.stderr)
        return False


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.tn_build_bvh.restype = ctypes.c_int64
        lib.tn_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(TnNode),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tn_obj_tri_count.restype = ctypes.c_int64
        lib.tn_obj_tri_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tn_obj_parse.restype = ctypes.c_int64
        lib.tn_obj_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def parse_obj(text: str):
    """Native OBJ parse -> (pos (n,3,3) f32, nrm (n,3,3) f32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode()
    n = lib.tn_obj_tri_count(data, len(data))
    pos = np.zeros((n, 9), np.float32)
    nrm = np.zeros((n, 9), np.float32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    wrote = lib.tn_obj_parse(data, len(data), fp(pos), fp(nrm))
    assert wrote == n
    return pos.reshape(n, 3, 3), nrm.reshape(n, 3, 3)


def build_bvh(tri_pos: np.ndarray, tri_nrm: np.ndarray, first: int, n: int,
              max_depth: int, leaf_cap: int, aux: np.ndarray = None):
    """Native SAH build over tri arrays (permuted in place, C-contiguous
    float32 (T,3,3)). Returns (bmin, bmax, child, first, ntris) numpy
    arrays for the subtree, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert tri_pos.flags.c_contiguous and tri_pos.dtype == np.float32
    assert tri_nrm.flags.c_contiguous and tri_nrm.dtype == np.float32
    cap = 2 * max(n, 1) + 1
    out = (TnNode * cap)()
    count = ctypes.c_int64(0)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    aux_p = (
        aux.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if aux is not None
        else ctypes.POINTER(ctypes.c_int64)()
    )
    root = lib.tn_build_bvh(
        fp(tri_pos), fp(tri_nrm), aux_p,
        first, n, max_depth, leaf_cap, out, 0, cap, ctypes.byref(count),
    )
    if root < 0:
        return None
    m = count.value
    raw = np.frombuffer(bytearray(bytes(out))[: m * ctypes.sizeof(TnNode)],
                        dtype=np.dtype([
                            ("bmin", np.float32, 3), ("bmax", np.float32, 3),
                            ("child", np.int64), ("first", np.int64),
                            ("ntris", np.int64),
                        ]))
    return (
        raw["bmin"].copy(), raw["bmax"].copy(),
        raw["child"].copy(), raw["first"].copy(), raw["ntris"].copy(),
    )
