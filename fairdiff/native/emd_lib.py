"""ctypes loader for the native EMD solver (emd.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfairdiff_emd.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # temp + atomic rename: concurrent first runs must not CDLL a
    # half-written .so (see imageloader_lib._build)
    tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.tmp")
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                str(_DIR / "emd.cpp"), "-o", str(tmp),
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _SO)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        tmp.unlink(missing_ok=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _SO.exists() and not _build():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.emd_assignment.restype = ctypes.c_int
        lib.emd_assignment.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        lib.emd_batch.restype = ctypes.c_int
        lib.emd_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
    except (OSError, AttributeError):
        # corrupt / stale / wrong-arch .so: callers fall back to scipy
        _build_failed = True
        return None
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _validate(bs: np.ndarray, cost: np.ndarray) -> None:
    """Reject inputs the C solver would corrupt memory on (the scipy path
    raises cleanly for all of these): non-finite costs, column-count
    mismatch, negative masses."""
    if not np.isfinite(cost).all():
        raise ValueError("non-finite entries in EMD cost matrix")
    if bs.shape[-1] != cost.shape[1]:
        raise ValueError(
            f"b has {bs.shape[-1]} columns but cost has {cost.shape[1]}"
        )
    if (bs < 0).any():
        raise ValueError("negative mass in b")


def emd_assignment_native(b: np.ndarray, cost: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    b = np.ascontiguousarray(b, np.int64)
    n, c = cost.shape
    _validate(b.reshape(1, -1), cost)
    plan = np.zeros((n, c), np.float64)
    rc = lib.emd_assignment(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n, c,
        plan.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc == 2:
        raise ValueError("non-finite EMD cost matrix")
    if rc != 0:
        raise ValueError(f"mass mismatch: sum(b)={int(b.sum())} != N={n}")
    return plan


def emd_batch_native(bs: np.ndarray, cost: np.ndarray) -> Optional[np.ndarray]:
    """Solve D EMDs sharing one cost matrix: bs [D, C] -> plans [D, N, C]."""
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    bs = np.ascontiguousarray(bs, np.int64)
    d, c = bs.shape
    n = cost.shape[0]
    _validate(bs, cost)
    plans = np.zeros((d, n, c), np.float64)
    rc = lib.emd_batch(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        d, n, c,
        plans.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc == 2:
        raise ValueError("non-finite EMD cost matrix")
    if rc != 0:
        raise ValueError("mass mismatch in batch")
    return plans
