"""ctypes bindings for the native batch-assembly core (native/sampler.cpp).

The C++ library does the per-step host work — dilated pixel sampling, GT
gather, ray-direction generation — off the GIL, with an optional worker-pool
prefetch ring.  Falls back transparently to the numpy implementations in
data/sampling.py when the shared library hasn't been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libsampler.so")
_lib = None


def _try_build() -> bool:
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(build_if_missing: bool = True):
    """Load (building on demand) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        if not _try_build():
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sample_dilated.argtypes = [ctypes.c_int] * 7 + [ctypes.c_uint64, f32p]
    lib.sample_random.argtypes = [ctypes.c_int] * 4 + [ctypes.c_uint64, f32p]
    lib.gather_pixels.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                  ctypes.c_int, f32p]
    lib.compute_raydirs.argtypes = [f32p, ctypes.c_int, f32p, f32p,
                                    ctypes.c_int, f32p]
    lib.assemble_batch.argtypes = ([f32p] + [ctypes.c_int] * 7
                                   + [f32p, f32p, ctypes.c_uint64,
                                      f32p, f32p, f32p])
    lib.pipeline_create.restype = ctypes.c_void_p
    lib.pipeline_create.argtypes = [ctypes.c_int]
    lib.pipeline_submit.restype = ctypes.c_uint64
    lib.pipeline_submit.argtypes = [ctypes.c_void_p, f32p] + \
        [ctypes.c_int] * 7 + [f32p, f32p, ctypes.c_uint64]
    lib.pipeline_pop.restype = ctypes.c_uint64
    lib.pipeline_pop.argtypes = [ctypes.c_void_p, f32p, f32p, f32p]
    lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def assemble_batch(image: np.ndarray, margin: int, patch_num: int,
                   patch_size: int, dil_min: int, dil_max: int,
                   intrinsic: np.ndarray, camrot: np.ndarray, seed: int
                   ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """One-call batch assembly.  image: [H, W, 3] float32 contiguous.
    Returns (pixel_xy [S,S,2], gt_rgb [S*S,3], raydirs [S*S,3]) or None when
    the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    H, W, _ = image.shape
    side = patch_num * patch_size
    image = np.ascontiguousarray(image, np.float32)
    intr = np.ascontiguousarray(intrinsic, np.float32)
    rot = np.ascontiguousarray(camrot, np.float32)
    xy = np.empty((side * side, 2), np.float32)
    rgb = np.empty((side * side, 3), np.float32)
    dirs = np.empty((side * side, 3), np.float32)
    lib.assemble_batch(_fp(image), H, W, margin, patch_num, patch_size,
                       dil_min, dil_max, _fp(intr), _fp(rot),
                       ctypes.c_uint64(seed), _fp(xy), _fp(rgb), _fp(dirs))
    return xy.reshape(side, side, 2), rgb, dirs


class PrefetchPipeline:
    """Background-thread batch assembly with a bounded ring of ready batches.

    Images submitted must stay alive (pinned) until their batch is popped —
    the scene loaders' pin-in-memory caches guarantee this."""

    def __init__(self, num_workers: int = 2):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native sampler library unavailable")
        self._handle = ctypes.c_void_p(
            self._lib.pipeline_create(num_workers))
        self._pinned = {}

    def submit(self, image: np.ndarray, margin: int, patch_num: int,
               patch_size: int, dil_min: int, dil_max: int,
               intrinsic: np.ndarray, camrot: np.ndarray, seed: int) -> int:
        image = np.ascontiguousarray(image, np.float32)
        intr = np.ascontiguousarray(intrinsic, np.float32)
        rot = np.ascontiguousarray(camrot, np.float32)
        H, W, _ = image.shape
        ticket = self._lib.pipeline_submit(
            self._handle, _fp(image), H, W, margin, patch_num, patch_size,
            dil_min, dil_max, _fp(intr), _fp(rot), ctypes.c_uint64(seed))
        self._pinned[ticket] = (image, intr, rot)
        self._side = patch_num * patch_size
        return ticket

    def pop(self) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray]:
        n = self._side * self._side
        xy = np.empty((n, 2), np.float32)
        rgb = np.empty((n, 3), np.float32)
        dirs = np.empty((n, 3), np.float32)
        ticket = self._lib.pipeline_pop(self._handle, _fp(xy), _fp(rgb),
                                        _fp(dirs))
        self._pinned.pop(ticket, None)
        return ticket, xy, rgb, dirs

    def close(self):
        if self._handle:
            self._lib.pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
