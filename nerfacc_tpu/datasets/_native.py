"""ctypes bindings for the native input pipeline (native/rayforge.cpp).

Loads ``librayforge.so`` if built (``make -C native``); all call sites fall
back to the numpy path when it is absent, so the native library is an
optional accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False
_COPY_WARNED = False


def _find_lib():
    here = os.path.dirname(os.path.abspath(__file__))
    cands = [
        os.path.join(here, "..", "..", "native", "librayforge.so"),
        os.path.join(here, "librayforge.so"),
    ]
    for c in cands:
        if os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rayforge_sample_rays.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, f32p, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int,
        f32p, f32p, f32p,
    ]
    lib.rayforge_image_rays.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int,
        f32p, f32p,
    ]
    lib.rayforge_num_threads.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def sample_rays(
    images: np.ndarray,  # (n, h, w, c) uint8
    c2w: np.ndarray,  # (n, 3, 4) float32
    K: np.ndarray,  # (3, 3) float32
    bkgd: np.ndarray,  # (3,) float32
    seed: int,
    n_rays: int,
    opengl: bool,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native batch sampling; returns (origins, viewdirs, pixels) or None."""
    lib = get_lib()
    if lib is None:
        return None
    images2 = np.ascontiguousarray(images)
    global _COPY_WARNED
    if images2 is not images and not _COPY_WARNED:
        # A per-call copy of the whole image stack (~92 MB at 36x800x800)
        # silently costs ~160 ms/fetch — surface it once so the caller
        # can materialize a contiguous host array up front.
        _COPY_WARNED = True
        import sys

        print(
            f"[rayforge] per-call image copy: type={type(images).__name__}"
            f" dtype={getattr(images, 'dtype', None)}",
            file=sys.stderr, flush=True,
        )
    images = images2
    c2w34 = np.ascontiguousarray(c2w[:, :3, :4], np.float32).reshape(-1, 12)
    Kf = np.ascontiguousarray(K, np.float32).reshape(9)
    bk = np.ascontiguousarray(bkgd, np.float32)
    n, h, w, c = images.shape
    out_o = np.empty((n_rays, 3), np.float32)
    out_d = np.empty((n_rays, 3), np.float32)
    out_p = np.empty((n_rays, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rayforge_sample_rays(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        c2w34.ctypes.data_as(f32p),
        Kf.ctypes.data_as(f32p),
        bk.ctypes.data_as(f32p),
        ctypes.c_uint64(seed & (2**64 - 1)),
        n_rays,
        int(opengl),
        out_o.ctypes.data_as(f32p),
        out_d.ctypes.data_as(f32p),
        out_p.ctypes.data_as(f32p),
    )
    return out_o, out_d, out_p
