"""Scan-log recording/replay — the engine's bag-file equivalent.

The reference runs live against ROS topics and keeps nothing (SLAM.m:73-74,
SURVEY.md §5); this module persists (odometry, scan) streams so sessions are
replayable and sharable.  The codec is the native C++ backend
(native/scanlog.cc, compiled on demand with g++ and bound via ctypes); a
pure-NumPy fallback covers environments without a toolchain — both produce
byte-identical files.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_MAGIC = 0x4C534B45  # "EKSL"
_VERSION = 1

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "scanlog.cc")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libscanlog.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the C++ codec; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            os.makedirs(_LIB_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.scanlog_write.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                      ctypes.c_uint32, f32p, f32p]
        lib.scanlog_write.restype = ctypes.c_int
        lib.scanlog_info.argtypes = [ctypes.c_char_p, u32p, u32p]
        lib.scanlog_info.restype = ctypes.c_int
        lib.scanlog_read.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                     ctypes.c_uint32, f32p, f32p]
        lib.scanlog_read.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write(path: str, odom: np.ndarray, ranges: np.ndarray,
          native: Optional[bool] = None) -> None:
    """Write a log: odom [T,3], ranges [T,B] (NaN = no return)."""
    odom = np.ascontiguousarray(np.asarray(odom, np.float32))
    ranges = np.ascontiguousarray(np.asarray(ranges, np.float32))
    T, B = ranges.shape
    assert odom.shape == (T, 3), (odom.shape, ranges.shape)
    lib = _load_native() if native in (None, True) else None
    if lib is not None:
        rc = lib.scanlog_write(path.encode(), T, B, _f32p(odom),
                               _f32p(ranges))
        if rc != 0:
            raise IOError(f"scanlog_write failed: rc={rc}")
        return
    if native is True:
        raise RuntimeError("native codec unavailable")
    with open(path, "wb") as f:
        f.write(np.array([_MAGIC, _VERSION, T, B],
                         np.uint32).tobytes())
        rec = np.concatenate([odom, ranges], axis=1)  # [T, 3+B]
        f.write(rec.astype(np.float32).tobytes())


def info(path: str, native: Optional[bool] = None) -> Tuple[int, int]:
    """(n_ticks, n_beams) from the header."""
    lib = _load_native() if native in (None, True) else None
    if lib is not None:
        t = ctypes.c_uint32()
        b = ctypes.c_uint32()
        rc = lib.scanlog_info(path.encode(), ctypes.byref(t),
                              ctypes.byref(b))
        if rc != 0:
            raise IOError(f"scanlog_info failed: rc={rc}")
        return t.value, b.value
    if native is True:
        raise RuntimeError("native codec unavailable")
    hdr = np.fromfile(path, np.uint32, 4)
    if hdr[0] != _MAGIC or hdr[1] != _VERSION:
        raise IOError("bad scanlog header")
    return int(hdr[2]), int(hdr[3])


def read(path: str, native: Optional[bool] = None
         ) -> Tuple[np.ndarray, np.ndarray]:
    """(odom [T,3], ranges [T,B]) from a log."""
    T, B = info(path, native=native)
    lib = _load_native() if native in (None, True) else None
    if lib is not None:
        odom = np.empty((T, 3), np.float32)
        ranges = np.empty((T, B), np.float32)
        rc = lib.scanlog_read(path.encode(), T, B, _f32p(odom),
                              _f32p(ranges))
        if rc != 0:
            raise IOError(f"scanlog_read failed: rc={rc}")
        return odom, ranges
    if native is True:
        raise RuntimeError("native codec unavailable")
    raw = np.fromfile(path, np.float32, offset=16).reshape(T, 3 + B)
    return raw[:, :3].copy(), raw[:, 3:].copy()
