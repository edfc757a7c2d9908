"""ctypes bindings for the native data-loader core (loader_core.cpp).

Auto-builds the shared library with g++ on first import (cached next to the
source); every entry point has a numpy fallback so the package works without
a toolchain. ctypes calls release the GIL, which is what gives the threaded
PrefetchLoader real host parallelism — the role of torch DataLoader's C++
workers in the reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader_core.cpp")
_LIB = os.path.join(_DIR, "libloader_core.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.morton_argsort.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.compute_votes.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64)]
            lib.gather_rows.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.estimate_normals.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def morton_argsort(points: np.ndarray) -> np.ndarray:
    """(N, >=3) float points -> Morton-order permutation (native or numpy)."""
    lib = get_lib()
    if lib is None:
        from ..data.spatial import spatial_sort
        return spatial_sort(points)
    pts = np.ascontiguousarray(points[:, :3], dtype=np.float32)
    out = np.empty(len(pts), dtype=np.int64)
    lib.morton_argsort(_fptr(pts), len(pts), 3, _iptr(out))
    return out


def compute_votes(pc: np.ndarray, instance: np.ndarray,
                  sem_in_care: np.ndarray, gt_centers: np.ndarray):
    """Native vote computation; returns (votes (N,3), mask (N,),
    point_instance (N,)). Falls back to numpy when the lib is unavailable."""
    lib = get_lib()
    n = len(pc)
    if lib is None:
        votes = np.zeros((n, 3), np.float32)
        mask = np.zeros(n, np.float32)
        pinst = np.zeros(n, np.int64) - 1
        for g in np.unique(instance):
            if g < 0:
                continue
            idx = np.where(instance == g)[0]
            if not sem_in_care[idx[0]]:
                continue
            x = pc[idx]
            center = 0.5 * (x.min(0) + x.max(0))
            ilabel = np.argmin(((center - gt_centers) ** 2).sum(-1))
            votes[idx] = center - x
            mask[idx] = 1.0
            pinst[idx] = ilabel
        return votes, mask, pinst
    pcf = np.ascontiguousarray(pc[:, :3], dtype=np.float32)
    inst = np.ascontiguousarray(instance, dtype=np.int64)
    care = np.ascontiguousarray(sem_in_care, dtype=np.uint8)
    gtc = np.ascontiguousarray(gt_centers, dtype=np.float32)
    votes = np.empty((n, 3), np.float32)
    mask = np.empty(n, np.float32)
    pinst = np.empty(n, np.int64)
    lib.compute_votes(_fptr(pcf), _iptr(inst),
                      care.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
                      _fptr(gtc), len(gtc), _fptr(votes), _fptr(mask),
                      _iptr(pinst))
    return votes, mask, pinst


def estimate_normals_native(points: np.ndarray, k: int,
                            viewpoint: np.ndarray):
    """Exact k-NN PCA normals (grid-hash + 3x3 Jacobi in C++), flipped so
    dot(p - viewpoint, n) >= 0 — the native replacement for the O(n^2)
    numpy path in data/preprocess.estimate_normals (the reference does this
    offline step in pymeshlab, also native). Returns None when the native
    lib is unavailable so the caller can fall back."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], dtype=np.float32)
    vp = np.ascontiguousarray(viewpoint, dtype=np.float32)
    out = np.empty((len(pts), 3), np.float32)
    lib.estimate_normals(_fptr(pts), len(pts), int(k), _fptr(vp), _fptr(out))
    return out


def gather_rows(src: np.ndarray, choices: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return src[choices]
    s = np.ascontiguousarray(src, dtype=np.float32)
    ch = np.ascontiguousarray(choices, dtype=np.int64)
    out = np.empty((len(ch), s.shape[1]), np.float32)
    lib.gather_rows(_fptr(s), s.shape[0], s.shape[1], _iptr(ch), len(ch),
                    _fptr(out))
    return out
