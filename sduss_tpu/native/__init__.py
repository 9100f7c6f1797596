"""Native (C++) runtime components, loaded via ctypes.

The reference's native layer is a CUDA extension JIT-built at import
(reference modules/groupnorm.py:12-27).  Here the device-side kernel moved to
Pallas (ops/gn_halo.py); the HOST-side hot path — index-structure
construction for mixed-resolution batching — is C++ (meta_builder.cpp),
compiled on first use with the system toolchain and cached next to the
source.  Everything has a pure-Python fallback: the native layer is a
strictly optional accelerator, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, "meta_builder.cpp")
    # ".so.lib" suffix keeps Python's import machinery from treating the
    # ctypes library as a broken extension module (pkgutil walk).
    so = os.path.join(_HERE, "_sduss_native.so.lib")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.build_patch_meta.restype = None
        lib.build_patch_meta.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,  # grids, n_images
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # p_pad,i_pad,max_pp
            ctypes.c_int32,                                  # n_patches
            ctypes.POINTER(ctypes.c_int32),                  # image_id
            ctypes.POINTER(ctypes.c_int32),                  # neighbors
            ctypes.POINTER(ctypes.c_int32),                  # group_gather
            ctypes.POINTER(ctypes.c_int32),                  # patch_pos
            ctypes.POINTER(ctypes.c_uint8),                  # kv_mask
        ]
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("SDUSS_DISABLE_NATIVE") == "1":
                _LIB = None
            else:
                _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def build_patch_meta_native(grids, p_pad: int, i_pad: int, max_pp: int):
    """C++ index-structure construction; returns None if native unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    grids = np.ascontiguousarray(grids, np.int32)
    n_images = len(grids)
    n_patches = int((grids.astype(np.int64) ** 2).sum())
    # validate BEFORE the ctypes call: the C++ writer trusts these bounds,
    # so a violated invariant would be a heap overflow, not an IndexError
    if n_patches > p_pad or n_images > i_pad:
        raise ValueError(f"meta bounds violated: {n_patches} patches > "
                         f"p_pad {p_pad} or {n_images} images > i_pad {i_pad}")
    if n_images and int(grids.max()) ** 2 > max_pp:
        raise ValueError(f"grid {int(grids.max())}^2 exceeds max_pp {max_pp}")
    image_id = np.empty((p_pad,), np.int32)
    neighbors = np.empty((p_pad, 8), np.int32)
    group_gather = np.empty((i_pad * max_pp,), np.int32)
    patch_pos = np.empty((p_pad,), np.int32)
    kv_mask = np.empty((i_pad, max_pp), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.build_patch_meta(
        grids.ctypes.data_as(i32p), n_images, p_pad, i_pad, max_pp, n_patches,
        image_id.ctypes.data_as(i32p), neighbors.ctypes.data_as(i32p),
        group_gather.ctypes.data_as(i32p), patch_pos.ctypes.data_as(i32p),
        kv_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return image_id, neighbors, group_gather, patch_pos, kv_mask.astype(bool)
