"""ctypes bindings to the native host runtime (native/mmrt.cpp).

The library is built on demand with the repo Makefile (g++, no external
deps) and cached under native/build/.  All functions take/return float64
numpy arrays and are parity-tested against the JAX model functions in
tests/test_native.py.  ``available()`` reports whether the toolchain/build
is usable so callers can fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libmmrt.so"
_lib = None
_build_error = None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.CalledProcessError) as e:  # no toolchain
        _build_error = e
        return None

    D = ctypes.POINTER(ctypes.c_double)
    I = ctypes.POINTER(ctypes.c_int)
    lib.mm_arm_fk.argtypes = [D, D, D, D]
    lib.mm_wholebody_fk.argtypes = [D, D, D, D]
    lib.mm_wholebody_step.argtypes = [D, D, ctypes.c_double, D]
    lib.mm_plant_step.argtypes = [D, D, ctypes.c_double, D]
    lib.mm_plant_observation.argtypes = [D, D, D, D]
    lib.mm_nearest_index.argtypes = [D, ctypes.c_int, ctypes.c_int, D, I,
                                     ctypes.c_int]
    lib.mm_nearest_index.restype = ctypes.c_int
    lib.mm_local_ref_window.argtypes = [D, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, D]
    lib.mm_integrate_command.argtypes = [D, D, ctypes.c_double]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _f64(a, n=None):
    out = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    if n is not None:
        assert out.size == n, (out.shape, n)
    return out


def arm_fk(q):
    lib = _load()
    q = _f64(q, 3)
    ee, j2, j3 = (np.empty(3) for _ in range(3))
    lib.mm_arm_fk(_ptr(q), _ptr(ee), _ptr(j2), _ptr(j3))
    return ee, j2, j3


def wholebody_fk(x):
    lib = _load()
    x = _f64(x, 9)
    pose = np.empty(4)
    j2, j3 = np.empty(3), np.empty(3)
    lib.mm_wholebody_fk(_ptr(x), _ptr(pose), _ptr(j2), _ptr(j3))
    return pose, j2, j3


def wholebody_step(x, u, dt):
    lib = _load()
    x, u = _f64(x, 9), _f64(u, 5)
    out = np.empty(9)
    lib.mm_wholebody_step(_ptr(x), _ptr(u), float(dt), _ptr(out))
    return out


def plant_step(s, a, dt):
    lib = _load()
    s, a = _f64(s, 12), _f64(a, 11)
    out = np.empty(12)
    lib.mm_plant_step(_ptr(s), _ptr(a), float(dt), _ptr(out))
    return out


def plant_observation(s, a):
    lib = _load()
    s, a = _f64(s, 12), _f64(a, 11)
    pos, vel = np.empty(12), np.empty(12)
    lib.mm_plant_observation(_ptr(s), _ptr(a), _ptr(pos), _ptr(vel))
    return pos, vel


def nearest_index(traj, point, distance_index):
    lib = _load()
    traj = _f64(traj)
    point = _f64(point)
    idx = np.ascontiguousarray(np.asarray(distance_index, dtype=np.int32))
    return int(lib.mm_nearest_index(
        _ptr(traj), traj.shape[0], traj.shape[1], _ptr(point), _iptr(idx),
        idx.size))


def local_ref_window(traj, min_idx, count):
    lib = _load()
    traj = _f64(traj)
    out = np.empty((count, traj.shape[1]))
    lib.mm_local_ref_window(_ptr(traj), traj.shape[0], traj.shape[1],
                            int(min_idx), int(count), _ptr(out))
    return out


def integrate_command(vel_cmd, cmd, sim_dt):
    lib = _load()
    vel_cmd = _f64(vel_cmd, 2).copy()
    cmd = _f64(cmd, 2)
    lib.mm_integrate_command(_ptr(vel_cmd), _ptr(cmd), float(sim_dt))
    return vel_cmd
