"""ctypes loader for the native threaded image pipeline (imageloader.cpp).

`load_batch` is the host-side input path for the facerec datasets: decode
(libjpeg/libpng) + bilinear affine warp / resize + [-1,1] normalize +
horizontal flip, fused, on a thread pool. Falls back to None when the
toolchain or libraries are unavailable — callers keep the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfairdiff_imageloader.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # compile to a process-unique temp name and os.replace() into place:
    # concurrent first-run processes must never CDLL a half-written .so
    # (each builds its own temp; the atomic rename makes last-writer-wins
    # safe since the contents are identical)
    tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.tmp")
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                str(_DIR / "imageloader.cpp"), "-o", str(tmp),
                "-ljpeg", "-lpng", "-lpthread",
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
    except OSError:
        _build_failed = True
        return None
    lib.fd_load_batch.restype = ctypes.c_int
    lib.fd_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def load_batch(
    paths: Sequence[str],
    out_hw: tuple[int, int],
    *,
    mats: Optional[np.ndarray] = None,  # [N, 2, 3] or [N, 6] forward affines
    flips: Optional[np.ndarray] = None,  # [N] bool
    n_threads: int = 8,
) -> Optional[np.ndarray]:
    """-> [N, H, W, 3] f32 in [-1, 1], or None if the native lib is absent.

    Raises OSError naming the first unreadable path (parity with the cv2
    path's error contract, opensphere/dataset/utils.py:16-18).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    h, w = out_hw
    out = np.empty((n, h, w, 3), np.float32)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    m_ptr = None
    if mats is not None:
        mats = np.ascontiguousarray(np.asarray(mats, np.float32).reshape(n, 6))
        m_ptr = mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    f_ptr = None
    if flips is not None:
        flips = np.ascontiguousarray(np.asarray(flips, np.uint8))
        f_ptr = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    failures = lib.fd_load_batch(
        c_paths, n, m_ptr, f_ptr, h, w, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if failures:
        bad = int(np.flatnonzero(statuses)[0])
        if statuses[bad] == 2:  # caller-side bug, not a file problem
            raise ValueError(
                f"singular affine matrix for {paths[bad]} "
                "(degenerate landmarks?)"
            )
        raise OSError(f"{paths[bad]} is not found or not decodable")
    return out
