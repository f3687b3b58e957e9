"""ctypes bindings for the native C++ COO engine (native/coo_engine.cpp).

Builds the shared library on first use (g++ via make) and caches it; every
entry point has a pure-numpy fallback in its caller, so the framework works
without a toolchain — the native path is ~an order of magnitude faster for
the host-side hot loops (kernel-map construction, CSR batch slicing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "_coo_engine.so")

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        # always invoke make (dependency-checked: a no-op when the .so is
        # current, a rebuild when coo_engine.cpp changed — never a stale
        # binary silently diverging from the committed source).  An
        # exclusive file lock serializes concurrent loaders (e.g. the two
        # multi-host test workers): without it, one process can dlopen a
        # half-written .so while another rebuilds it.  The dlopen happens
        # under the same lock so no rebuild can overlap it.
        import fcntl

        with open(_LIB_PATH + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            lib = ctypes.CDLL(_LIB_PATH)

        lib.tcvn_build_conv_maps.restype = ctypes.c_int64
        lib.tcvn_build_conv_maps.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tcvn_gather_ranges.restype = ctypes.c_int64
        lib.tcvn_gather_ranges.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception as e:
        # degrade to the numpy fallbacks, but say why ONCE — a broken
        # toolchain silently costs ~30x on the host hot loops otherwise
        import warnings

        detail = getattr(e, "stderr", b"")
        detail = detail.decode(errors="replace")[-500:] if detail else str(e)
        warnings.warn(
            f"native COO engine unavailable (numpy fallback in use): {detail}",
            stacklevel=2,
        )
        _lib_failed = True
        _lib = None
    return _lib


def _ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def native_available() -> bool:
    return _load_library() is not None


def native_build_conv_maps(
    coords: np.ndarray, kernel: int, stride: int, height: int, width: int,
    pad_to: int = 0,
) -> Optional[Tuple[np.ndarray, int, np.ndarray, np.ndarray]]:
    """Returns (out_coords, num_out, in_maps, out_maps) or None if the
    native engine is unavailable."""
    lib = _load_library()
    if lib is None:
        return None

    coords = np.ascontiguousarray(coords, np.int64)
    n = len(coords)
    volume = kernel * kernel
    out_coords = np.empty((max(n * volume, 1), 3), np.int64)
    pair_in = np.empty(max(n * volume, 1), np.int32)
    pair_out = np.empty(max(n * volume, 1), np.int32)
    pair_counts = np.zeros(volume, np.int64)

    num_out = lib.tcvn_build_conv_maps(
        _ptr(coords, ctypes.c_int64), n, kernel, stride, height, width,
        _ptr(out_coords, ctypes.c_int64), _ptr(pair_in, ctypes.c_int32),
        _ptr(pair_out, ctypes.c_int32), _ptr(pair_counts, ctypes.c_int64),
    )
    if num_out < 0:
        return None

    # min 1 like the numpy fallback (coo_conv.py): the two engines must
    # hand jit the SAME static shape even when zero pairs survive
    L = max(int(pair_counts.max()), 1) if n else 1
    if pad_to:
        L = max(L, pad_to)
    in_maps = np.full((volume, L), n, np.int32)
    # pad entries OOB for both num_out- and pad_to-row output allocations
    out_maps = np.full((volume, L), max(int(num_out), pad_to), np.int32)
    cursor = 0
    for j in range(volume):
        count = int(pair_counts[j])
        in_maps[j, :count] = pair_in[cursor:cursor + count]
        out_maps[j, :count] = pair_out[cursor:cursor + count]
        cursor += count

    return out_coords[:num_out].copy(), int(num_out), in_maps, out_maps


def native_gather_ranges(
    ranges: np.ndarray, coords: np.ndarray, values: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Batched CSR slicing of a COO bank; returns (coords, values, owner)
    or None if unavailable.  ``coords``/``values`` must be contiguous
    in-memory arrays (RAM-loaded banks)."""
    lib = _load_library()
    if lib is None:
        return None
    if not (isinstance(coords, np.ndarray) and isinstance(values, np.ndarray)):
        return None

    ranges = np.ascontiguousarray(ranges, np.int64)
    coords = np.ascontiguousarray(coords, np.int64)
    values = np.ascontiguousarray(values, np.float32)
    total = int((ranges[:, 1] - ranges[:, 0]).sum())
    c = values.shape[1]

    coords_out = np.empty((max(total, 1), 3), np.int64)
    values_out = np.empty((max(total, 1), c), np.float32)
    owner_out = np.empty(max(total, 1), np.int64)

    copied = lib.tcvn_gather_ranges(
        _ptr(ranges, ctypes.c_int64), len(ranges),
        _ptr(coords, ctypes.c_int64), _ptr(values, ctypes.c_float), c,
        _ptr(coords_out, ctypes.c_int64), _ptr(values_out, ctypes.c_float),
        _ptr(owner_out, ctypes.c_int64),
    )
    if copied != total:
        return None
    return coords_out[:total], values_out[:total], owner_out[:total]
