"""ctypes bindings for the native scan-log runtime (native/scanlog.cpp).

Binary "RSLG" logs are written from any ScanLog (``write_rslg``) and read
back either by random access or through the native prefetch/decode worker
(``NativeScanStream``), which performs the reference's polar→cartesian +
range-gating ingest (BuildRangeDataContainer, roborts_slam_node.cpp:290-311)
off the engine thread. Falls back to pure NumPy when no C++ toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

from ..models.scan import LaserModel
from .scan_log import ScanLog

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "scanlog.cpp")
_SO = os.path.join(_REPO, "native", "libscanlog.so")

_HEADER = struct.Struct("<4sIQIB3x5d")
MAGIC = b"RSLG"


def write_rslg(log: ScanLog, path: str) -> None:
    """Serialize a ScanLog to the fixed-stride binary format."""
    laser = log.laser
    has_gt = log.gt_poses is not None
    with open(path, "wb") as f:
        f.write(_HEADER.pack(
            MAGIC, 1, len(log), laser.num_beams, int(has_gt),
            laser.angle_min, laser.angle_max, laser.range_min,
            laser.range_max, laser.range_threshold_scale))
        for i in range(len(log)):
            f.write(struct.pack("<d", float(log.times[i])))
            f.write(np.asarray(log.odom[i], "<f8").tobytes())
            if has_gt:
                f.write(np.asarray(log.gt_poses[i], "<f8").tobytes())
            f.write(np.asarray(log.ranges[i], "<f4").tobytes())


def _build_native() -> str | None:
    if not os.path.exists(_SRC):
        # pip-installed package without the repo's native/ tree: the NumPy
        # ingest path (ScanLog/.npz) still works; .rslg streaming does not
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) > os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                        "-pthread", "-o", _SO, _SRC], check=True,
                       capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build_native()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.rslg_open.restype = ctypes.c_void_p
    lib.rslg_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.rslg_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                              ctypes.POINTER(ctypes.c_uint32),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_double)]
    lib.rslg_decode.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_double)]
    lib.rslg_next.restype = ctypes.c_long
    lib.rslg_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                              ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.POINTER(ctypes.c_double)]
    lib.rslg_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeScanStream:
    """Streaming reader: pops (index, points, mask, n_valid, time, odom)
    decoded ahead of time by the native worker thread."""

    def __init__(self, path: str, max_points: int, ring_slots: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native scanlog runtime unavailable (no g++)")
        self._lib = lib
        self._h = lib.rslg_open(path.encode(), max_points, ring_slots)
        if not self._h:
            raise IOError(f"cannot open RSLG log: {path}")
        self.max_points = max_points
        n_scans = ctypes.c_uint64()
        n_beams = ctypes.c_uint32()
        has_gt = ctypes.c_int()
        laser5 = (ctypes.c_double * 5)()
        lib.rslg_meta(self._h, ctypes.byref(n_scans), ctypes.byref(n_beams),
                      ctypes.byref(has_gt), laser5)
        self.n_scans = int(n_scans.value)
        self.laser = LaserModel(
            angle_min=laser5[0], angle_max=laser5[1], range_min=laser5[2],
            range_max=laser5[3], num_beams=int(n_beams.value),
            range_threshold_scale=laser5[4])

    def __iter__(self):
        lib = self._lib
        MP = self.max_points
        while True:
            pts = np.empty((MP, 2), np.float32)
            msk = np.empty(MP, np.uint8)
            nv = ctypes.c_int()
            t = ctypes.c_double()
            odom = (ctypes.c_double * 3)()
            idx = lib.rslg_next(
                self._h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(nv), ctypes.byref(t), odom)
            if idx < 0:
                return
            yield (int(idx), pts, msk.astype(bool), int(nv.value),
                   float(t.value), np.array(odom))

    def close(self):
        if self._h:
            self._lib.rslg_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_scan(path: str, index: int, max_points: int):
    """Random-access decode of one scan (native; no worker thread)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native scanlog runtime unavailable")
    h = lib.rslg_open(path.encode(), max_points, 0)
    if not h:
        raise IOError(path)
    try:
        pts = np.empty((max_points, 2), np.float32)
        msk = np.empty(max_points, np.uint8)
        nv = ctypes.c_int()
        t = ctypes.c_double()
        odom = (ctypes.c_double * 3)()
        gt = (ctypes.c_double * 3)()
        rc = lib.rslg_decode(
            h, index, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(nv), ctypes.byref(t), odom, gt)
        if rc != 0:
            raise IndexError(index)
        return pts, msk.astype(bool), int(nv.value), float(t.value), np.array(odom)
    finally:
        lib.rslg_close(h)
