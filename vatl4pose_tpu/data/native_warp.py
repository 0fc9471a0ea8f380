"""ctypes binding for the native batched warp engine (native/warp).

Bit-exact cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT 0) person cropping on
the host — the parity preprocessing path (the device path in ops/warp.py
uses float bilinear, which differs from cv2's 5-bit fixed point by up to
~4/255).  Auto-builds the .so with make on first use if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "warp")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libwarp_affine.so"))
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)], check=True)
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.warp_affine_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    _lib.warp_affine_batch.restype = None
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def warp_affine_batch(frames: np.ndarray, frame_idx: np.ndarray,
                      fwd_mats: np.ndarray, out_size,
                      num_threads: int = 0, mode: int = 1) -> np.ndarray:
    """frames (F,H,W,C) uint8; frame_idx (N,); fwd_mats (N,2,3) forward
    (src->dst) affines — the cv2.warpAffine convention.  Returns
    (N, out_h, out_w, C) uint8."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    fi = np.ascontiguousarray(frame_idx, np.int32)
    mats = np.ascontiguousarray(fwd_mats, np.float64).reshape(len(fi), 6)
    out_h, out_w = int(out_size[0]), int(out_size[1])
    n = len(fi)
    out = np.empty((n, out_h, out_w, frames.shape[3]), np.uint8)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.warp_affine_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.shape[0], frames.shape[1], frames.shape[2], frames.shape[3],
        fi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
        num_threads, mode)
    return out
