"""ctypes bindings to the C++ host kernels (native/host_ops.cpp).

Builds the shared library on first use if the toolchain is present; numpy
fallbacks in ``box_np`` keep everything working without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')


def _warn_fallback(why: str):
    import logging

    logging.getLogger('epnet_tpu').warning(
        'native host kernels unavailable (%s); falling back to the much '
        'slower numpy paths in data/box_np.py — run `make -C native` to see '
        'the build error', why)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, 'libhost_ops.so'))
    if not os.path.exists(so):
        try:
            subprocess.run(['make', '-C', os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception as e:
            _warn_fallback(f'build failed: {e}')
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        _warn_fallback(f'dlopen failed: {e}')
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.pts_in_boxes3d_cpu.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, u8p]
    lib.roipool3d_cpu.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_int64,
                                  f32p, ctypes.c_int64, ctypes.c_int64, f32p, i32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def points_in_boxes3d(pts: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    out = np.empty((boxes.shape[0], pts.shape[0]), np.uint8)
    lib.pts_in_boxes3d_cpu(pts, pts.shape[0], boxes, boxes.shape[0], out)
    return out.astype(bool)


def roipool3d_cpu(pts: np.ndarray, feats: np.ndarray, boxes: np.ndarray,
                  sampled_pt_num: int):
    """Returns (pooled (M, S, 3+C), empty_flag (M,))."""
    lib = _load()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    feats = np.ascontiguousarray(feats, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    m, c = boxes.shape[0], feats.shape[1]
    out = np.empty((m, sampled_pt_num, 3 + c), np.float32)
    empty = np.empty((m,), np.int32)
    lib.roipool3d_cpu(pts, feats, pts.shape[0], c, boxes, m, sampled_pt_num,
                      out, empty)
    return out, empty
