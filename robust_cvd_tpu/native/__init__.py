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
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.build_pair_candidates.argtypes = [
            f32p, f32p, u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, f32p, ctypes.c_int64,
        ]
        lib.build_pair_candidates.restype = ctypes.c_int64
        lib.build_triplet_candidates.argtypes = [
            f32p, f32p, u8p, f32p, u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, f32p, f32p, ctypes.c_int64,
        ]
        lib.build_triplet_candidates.restype = ctypes.c_int64
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


def _as_f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _sample_cap(w: int, h: int, radius: int) -> int:
    """Generous upper bound on how many disk-separated samples fit."""
    r = max(int(radius), 1)
    return 4 * (w // r + 2) * (h // r + 2)


def build_pair_candidates(corner, flow, mask, radius: int):
    """Fused mask/bounds filter + stable corner sort + greedy disk
    suppression for one flow pair (reference lib/FlowConstraints.cpp:401-465)
    in ONE native call. Returns (xy int32 (C, 2), flow-target f32 (C, 2)),
    or None when the native library is unavailable (caller falls back to
    the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    h, w = corner.shape
    corner = np.ascontiguousarray(corner, np.float32)
    flow = np.ascontiguousarray(flow, np.float32)
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    cap = _sample_cap(w, h, radius)
    out_xy = np.empty((cap, 2), np.int32)
    out_f = np.empty((cap, 2), np.float32)
    n = lib.build_pair_candidates(
        _as_f32p(corner), _as_f32p(flow), _as_u8p(mask),
        w, h, radius, _as_i32p(out_xy), _as_f32p(out_f), cap,
    )
    return out_xy[:n], out_f[:n]


def build_triplet_candidates(corner, flow10, mask10, flow12, mask12,
                             radius: int):
    """Triplet variant of build_pair_candidates (reference
    lib/FlowConstraints.cpp:467-550). Returns (xy (C, 2) int32,
    backward targets (C, 2) f32, forward targets (C, 2) f32) or None."""
    lib = _load()
    if lib is None:
        return None
    h, w = corner.shape
    corner = np.ascontiguousarray(corner, np.float32)
    flow10 = np.ascontiguousarray(flow10, np.float32)
    flow12 = np.ascontiguousarray(flow12, np.float32)
    mask10 = np.ascontiguousarray(mask10.astype(np.uint8))
    mask12 = np.ascontiguousarray(mask12.astype(np.uint8))
    cap = _sample_cap(w, h, radius)
    out_xy = np.empty((cap, 2), np.int32)
    out_f0 = np.empty((cap, 2), np.float32)
    out_f2 = np.empty((cap, 2), np.float32)
    n = lib.build_triplet_candidates(
        _as_f32p(corner), _as_f32p(flow10), _as_u8p(mask10),
        _as_f32p(flow12), _as_u8p(mask12),
        w, h, radius, _as_i32p(out_xy), _as_f32p(out_f0), _as_f32p(out_f2),
        cap,
    )
    return out_xy[:n], out_f0[:n], out_f2[:n]


# -- batched raw IO engine (io_engine.cpp) -----------------------------------

_IO_SRC = os.path.join(_DIR, "io_engine.cpp")
_IO_SO = os.path.join(_DIR, "_io_engine.so")
_io_lib = None
_io_build_failed = False


def _load_io():
    global _io_lib, _io_build_failed
    if _io_lib is not None or _io_build_failed:
        return _io_lib
    try:
        if not os.path.exists(_IO_SO) or os.path.getmtime(_IO_SO) < os.path.getmtime(
            _IO_SRC
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                    _IO_SRC, "-o", _IO_SO,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_IO_SO)
        c = ctypes
        lib.read_raw_batch.argtypes = [
            c.POINTER(c.c_char_p), c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_uint8), c.c_int64, c.c_int32, c.POINTER(c.c_int64),
        ]
        lib.read_raw_batch.restype = c.c_int
        lib.write_raw_batch.argtypes = [
            c.POINTER(c.c_char_p), c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, c.POINTER(c.c_uint8), c.c_int64, c.c_int32,
            c.POINTER(c.c_int64),
        ]
        lib.write_raw_batch.restype = c.c_int
        lib.read_raw_header.argtypes = [
            c.c_char_p, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
            c.POINTER(c.c_int32),
        ]
        lib.read_raw_header.restype = c.c_int
        _io_lib = lib
    except Exception:
        _io_build_failed = True
        _io_lib = None
    return _io_lib


def _paths_array(paths):
    enc = [os.fsencode(p) for p in paths]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    return arr, enc  # keep `enc` alive with the array


def read_raw_batch(paths, rows: int, cols: int, channels: int,
                   dtype=np.float32, nthreads: int = 0) -> "np.ndarray | None":
    """Thread-pooled batch read of same-shape `.raw` files into ONE
    contiguous (N, rows, cols[, channels]) array. Returns None when the
    native engine is unavailable (caller falls back to the python loop);
    raises on malformed/mismatched files."""
    lib = _load_io()
    if lib is None or not paths:
        return None
    from ..io import raw as raw_mod

    dtype = np.dtype(dtype)
    cvt = raw_mod.cv_type(dtype, channels)
    shape = (len(paths), rows, cols) if channels == 1 else (
        len(paths), rows, cols, channels
    )
    out = np.empty(shape, dtype)
    frame_bytes = rows * cols * channels * dtype.itemsize
    if nthreads <= 0:
        nthreads = min(16, os.cpu_count() or 1)
    arr, _keep = _paths_array(paths)
    bad = ctypes.c_int64(-1)
    rc = lib.read_raw_batch(
        arr, len(paths), rows, cols, cvt,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame_bytes, nthreads, ctypes.byref(bad),
    )
    if rc != 0:
        idx = int(bad.value)
        name = paths[idx] if 0 <= idx < len(paths) else "?"
        raise IOError(f"native raw batch read failed at {name}")
    return out


def write_raw_batch(paths, data: np.ndarray, nthreads: int = 0) -> bool:
    """Thread-pooled batch write of (N, rows, cols[, channels]) to `.raw`
    files. Returns False when the native engine is unavailable."""
    lib = _load_io()
    if lib is None or not paths:
        return lib is not None
    from ..io import raw as raw_mod

    data = np.ascontiguousarray(data)
    n, rows, cols = data.shape[:3]
    channels = 1 if data.ndim == 3 else data.shape[3]
    assert n == len(paths)
    cvt = raw_mod.cv_type(data.dtype, channels)
    pixel_size = channels * data.dtype.itemsize
    frame_bytes = rows * cols * pixel_size
    if nthreads <= 0:
        nthreads = min(16, os.cpu_count() or 1)
    arr, _keep = _paths_array(paths)
    bad = ctypes.c_int64(-1)
    rc = lib.write_raw_batch(
        arr, n, rows, cols, cvt, pixel_size,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame_bytes, nthreads, ctypes.byref(bad),
    )
    if rc != 0:
        idx = int(bad.value)
        name = paths[idx] if 0 <= idx < len(paths) else "?"
        raise IOError(f"native raw batch write failed at {name}")
    return True


def read_raw_header(path):
    """(rows, cols, cv_type) of one `.raw` file, or None without the
    native engine."""
    lib = _load_io()
    if lib is None:
        return None
    r = ctypes.c_int32()
    c = ctypes.c_int32()
    t = ctypes.c_int32()
    if lib.read_raw_header(os.fsencode(path), ctypes.byref(r),
                           ctypes.byref(c), ctypes.byref(t)) != 0:
        raise IOError(f"cannot read raw header of {path}")
    return int(r.value), int(c.value), int(t.value)
