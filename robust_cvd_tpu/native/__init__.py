"""Native (C++) helpers, built on demand and loaded via ctypes."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sampling.cpp")
_SO = os.path.join(_DIR, "_sampling.so")

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.greedy_sample.argtypes = [
            i32p, i32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.stamp_disks.argtypes = list(lib.greedy_sample.argtypes)
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def _as_i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def greedy_sample(xs: np.ndarray, ys: np.ndarray, w: int, h: int, radius: int) -> np.ndarray:
    """Greedy disk-suppression selection over candidates sorted by priority.

    xs/ys: int32 candidate pixel coords in priority order. Returns a bool
    mask of kept candidates. (Reference lib/FlowConstraints.cpp:352-397.)
    """
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    n = xs.shape[0]
    out = np.zeros(n, np.uint8)
    lib = _load()
    if lib is not None:
        lib.greedy_sample(_as_i32p(xs), _as_i32p(ys), n, w, h, radius, _as_u8p(out))
        return out.astype(bool)
    # Pure-python fallback (slow; used only if the toolchain is missing).
    invalid = np.zeros((h, w), bool)
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = (xx * xx + yy * yy) <= radius * radius
    for i in range(n):
        x, y = int(xs[i]), int(ys[i])
        if x < 0 or x >= w or y < 0 or y >= h or invalid[y, x]:
            continue
        out[i] = 1
        x0, x1 = max(0, x - radius), min(w, x + radius + 1)
        y0, y1 = max(0, y - radius), min(h, y + radius + 1)
        invalid[y0:y1, x0:x1] |= disk[
            y0 - (y - radius) : y1 - (y - radius),
            x0 - (x - radius) : x1 - (x - radius),
        ]
    return out.astype(bool)


def stamp_disks(xs: np.ndarray, ys: np.ndarray, w: int, h: int, radius: int) -> np.ndarray:
    """Union of disks of `radius` centered at the given pixels -> bool (h, w).
    (Reference lib/FlowConstraints.cpp:662-709.)"""
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    out = np.zeros((h, w), np.uint8)
    lib = _load()
    if lib is not None:
        lib.stamp_disks(_as_i32p(xs), _as_i32p(ys), xs.shape[0], w, h, radius, _as_u8p(out))
        return out.astype(bool)
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = (xx * xx + yy * yy) <= radius * radius
    for x, y in zip(xs, ys):
        x, y = int(x), int(y)
        x0, x1 = max(0, x - radius), min(w, x + radius + 1)
        y0, y1 = max(0, y - radius), min(h, y + radius + 1)
        out[y0:y1, x0:x1] |= disk[
            y0 - (y - radius) : y1 - (y - radius),
            x0 - (x - radius) : x1 - (x - radius),
        ].astype(np.uint8)
    return out.astype(bool)
