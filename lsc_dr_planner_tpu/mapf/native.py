"""ctypes loader for the native C++ MAPF backend (native/mapf.cpp).

Builds the shared library on demand with g++ (cached next to the
source), exposes `solve_pibt` with the same signature and bit-identical
results as the Python implementation (shared LCG shuffle), and falls
back to Python when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from lsc_dr_planner_tpu.mapf import pibt as pypibt

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "mapf.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libmapf.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.pibt_solve.restype = ctypes.c_int
        lib.pibt_solve.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # occ
            ctypes.c_int, ctypes.c_int,  # X, Y
            ctypes.POINTER(ctypes.c_int),  # starts
            ctypes.POINTER(ctypes.c_int),  # currents
            ctypes.POINTER(ctypes.c_int),  # goals
            ctypes.POINTER(ctypes.c_int),  # init_elapsed
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n, seed, max_t
            ctypes.POINTER(ctypes.c_int),  # out_paths
            ctypes.c_int,  # max_len
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def solve_pibt(
    occ2d: np.ndarray,
    starts: Sequence[Tuple[int, int]],
    currents: Sequence[Tuple[int, int]],
    goals: Sequence[Tuple[int, int]],
    seed: int = 0,
    max_timestep: int = pypibt.MAX_TIMESTEP,
    init_elapsed: Optional[Sequence[int]] = None,
) -> Optional[List[List[Tuple[int, int]]]]:
    """Native PIBT; falls back to the Python implementation."""
    lib = _load()
    if lib is None:
        return pypibt.solve_pibt(
            occ2d, starts, currents, goals, seed=seed,
            max_timestep=max_timestep, init_elapsed=init_elapsed,
        )
    occ = np.ascontiguousarray(np.asarray(occ2d, dtype=np.uint8))
    X, Y = occ.shape
    n = len(currents)
    st = np.ascontiguousarray(np.asarray(starts, dtype=np.int32).reshape(-1))
    cu = np.ascontiguousarray(np.asarray(currents, dtype=np.int32).reshape(-1))
    go = np.ascontiguousarray(np.asarray(goals, dtype=np.int32).reshape(-1))
    el = np.ascontiguousarray(
        np.asarray(
            init_elapsed if init_elapsed is not None else np.zeros(n),
            dtype=np.int32,
        )
    )
    max_len = max_timestep + 2
    out = np.zeros((n, max_len, 2), dtype=np.int32)

    def ptr(a, typ=ctypes.c_int):
        return a.ctypes.data_as(ctypes.POINTER(typ))

    L = lib.pibt_solve(
        ptr(occ, ctypes.c_uint8), X, Y, ptr(st), ptr(cu), ptr(go), ptr(el),
        n, seed, max_timestep, ptr(out), max_len,
    )
    if L < 0:
        return None
    return [
        [tuple(int(v) for v in out[i, t]) for t in range(L)] for i in range(n)
    ]
