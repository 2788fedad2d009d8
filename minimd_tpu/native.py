"""ctypes bindings for the native host runtime (native/minimd_native.cpp).

Builds the shared library on first use (g++ -O2); every entry point has a
pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "minimd_native.cpp"
_LIB = _SRC.parent / "libminimd_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.mmd_rand_types.argtypes = [
            ctypes.c_uint, ctypes.c_int64, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32)]
        lib.mmd_create_atoms.restype = ctypes.c_int64
        lib.mmd_create_atoms.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64)]
        lib.mmd_read_lammps_data.restype = ctypes.c_int64
        lib.mmd_read_lammps_data.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def rand_types(seed: int, n: int, ntypes: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, np.int32)
    lib.mmd_rand_types(seed, n, ntypes, out)
    return out


def create_atoms(nx, ny, nz, rho, bounds) -> tuple[np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    cap = 4 * nx * ny * nz + 8
    x = np.empty((cap, 3), np.float64)
    v = np.empty((cap, 3), np.float64)
    n = lib.mmd_create_atoms(nx, ny, nz, rho,
                             np.asarray(bounds, np.float64), cap, x, v)
    if n < 0:
        return None
    return x[:n].copy(), v[:n].copy()


def read_lammps_data(path):
    lib = _load()
    if lib is None:
        return None
    box = np.zeros(3, np.float64)
    mass = ctypes.c_double(1.0)
    n = lib.mmd_read_lammps_data(str(path).encode(), box, ctypes.byref(mass),
                                 None, None)
    if n < 0:
        raise FileNotFoundError(path)
    x = np.zeros((n, 3), np.float64)
    v = np.zeros((n, 3), np.float64)
    n2 = lib.mmd_read_lammps_data(
        str(path).encode(), box, ctypes.byref(mass),
        x.ctypes.data_as(ctypes.c_void_p), v.ctypes.data_as(ctypes.c_void_p))
    assert n2 == n
    return box, x, v, mass.value
