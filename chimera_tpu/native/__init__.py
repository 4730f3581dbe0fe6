"""ctypes loader for the host-side native library (C++ HEALPix + KDE).

The library is built lazily with the bundled Makefile on first use (g++ is
part of the toolchain); if no compiler is available everything degrades
gracefully — ``available()`` returns False and callers fall back to the
pure-JAX paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from chimera_tpu.config import logger

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libchimera_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, text=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logger.warning("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        logger.warning("native load failed: %s", e)
        return None
    lib.chimera_ang2pix.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int]
    lib.chimera_pix2ang.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int]
    lib.chimera_gkde_whitened.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.chimera_kde1d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def ang2pix(nside: int, theta: np.ndarray, phi: np.ndarray,
            nest: bool = False) -> np.ndarray:
    lib = _load()
    theta = np.ascontiguousarray(theta, dtype=np.float64).ravel()
    phi = np.ascontiguousarray(phi, dtype=np.float64).ravel()
    out = np.empty(theta.size, dtype=np.int64)
    lib.chimera_ang2pix(nside, _dptr(theta), _dptr(phi), _iptr(out),
                        theta.size, int(nest))
    return out


def pix2ang(nside: int, pix: np.ndarray, nest: bool = False):
    lib = _load()
    pix = np.ascontiguousarray(pix, dtype=np.int64).ravel()
    theta = np.empty(pix.size, dtype=np.float64)
    phi = np.empty(pix.size, dtype=np.float64)
    lib.chimera_pix2ang(nside, _iptr(pix), _dptr(theta), _dptr(phi),
                        pix.size, int(nest))
    return theta, phi


def gkde_whitened(points_w: np.ndarray, data_w: np.ndarray,
                  weights: np.ndarray, log_norm: float,
                  in_log: bool = False) -> np.ndarray:
    lib = _load()
    points_w = np.ascontiguousarray(points_w, dtype=np.float64)
    data_w = np.ascontiguousarray(data_w, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    n_p, d = points_w.shape
    n_s = data_w.shape[0]
    out = np.empty(n_p, dtype=np.float64)
    lib.chimera_gkde_whitened(_dptr(points_w), _dptr(data_w), _dptr(weights),
                              float(log_norm), n_p, n_s, d, int(in_log),
                              _dptr(out))
    return out


def kde1d(data: np.ndarray, weights: np.ndarray, bandwidth: float,
          grid: np.ndarray, kernel: str = "epan") -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    grid = np.ascontiguousarray(grid, dtype=np.float64)
    out = np.empty(grid.size, dtype=np.float64)
    lib.chimera_kde1d(_dptr(data), _dptr(weights), float(bandwidth),
                      _dptr(grid), data.size, grid.size,
                      0 if kernel == "epan" else 1, _dptr(out))
    return out
