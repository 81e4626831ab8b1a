"""ctypes binding for the native C++ integral engine.

Builds ``libovqe_native.so`` on demand (g++; see Makefile) and exposes
``one_electron`` / ``eri`` with the same numpy signatures as the pure-python
engine in ``chem.integrals``.  ``available()`` gates usage; the numpy path
is the always-correct fallback and the cross-check in tests.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = pathlib.Path(__file__).parent
_LIB_PATH = _DIR / "libovqe_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                        "-march=native", "-funroll-loops",
                        "-o", str(_LIB_PATH), str(_DIR / "eri.cpp")],
                       check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("OPENVQE_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int32)
    lib.ovqe_one_electron.argtypes = [
        ctypes.c_int, iptr, dptr, iptr, iptr, dptr, dptr,
        ctypes.c_int, dptr, dptr, ctypes.c_int, dptr, dptr, dptr]
    lib.ovqe_eri.argtypes = [
        ctypes.c_int, iptr, dptr, iptr, iptr, dptr, dptr,
        ctypes.c_int, dptr]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _pack(shells):
    ls = np.array([sh.l for sh in shells], dtype=np.int32)
    centers = np.concatenate([sh.center for sh in shells]).astype(np.float64)
    nprim = np.array([len(sh.exps) for sh in shells], dtype=np.int32)
    prim_off = np.zeros(len(shells), dtype=np.int32)
    off = 0
    exps, coefs = [], []
    for i, sh in enumerate(shells):
        prim_off[i] = off
        off += len(sh.exps)
        exps.append(sh.exps)
        coefs.append(sh.coefs)
    return (ls, centers, nprim, prim_off,
            np.concatenate(exps).astype(np.float64),
            np.concatenate(coefs).astype(np.float64))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def one_electron(shells, charges, coords) -> Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray]:
    lib = _load()
    assert lib is not None
    from ..chem.basis import nbasis
    nbf = nbasis(shells)
    ls, centers, nprim, prim_off, exps, coefs = _pack(shells)
    S = np.zeros((nbf, nbf))
    T = np.zeros((nbf, nbf))
    V = np.zeros((nbf, nbf))
    charges_f = np.asarray(charges, dtype=np.float64)
    coords_f = np.ascontiguousarray(coords, dtype=np.float64)
    lib.ovqe_one_electron(len(shells), _ip(ls), _dp(centers), _ip(nprim),
                          _ip(prim_off), _dp(exps), _dp(coefs),
                          len(charges_f), _dp(coords_f), _dp(charges_f),
                          nbf, _dp(S), _dp(T), _dp(V))
    return S, T, V


def eri(shells) -> np.ndarray:
    lib = _load()
    assert lib is not None
    from ..chem.basis import nbasis
    nbf = nbasis(shells)
    ls, centers, nprim, prim_off, exps, coefs = _pack(shells)
    out = np.zeros((nbf, nbf, nbf, nbf))
    lib.ovqe_eri(len(shells), _ip(ls), _dp(centers), _ip(nprim),
                 _ip(prim_off), _dp(exps), _dp(coefs), nbf, _dp(out))
    return out
