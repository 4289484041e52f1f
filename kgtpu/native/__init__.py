"""Native host-ops loader: compile-on-first-import with NumPy fallback.

`get_lib()` returns a ctypes handle to the compiled host_ops library, or
None when no toolchain is available — callers (kgtpu.data.transforms,
kgtpu.evaluate) must fall back to their NumPy paths in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "host_ops.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_SO = os.path.join(_BUILD_DIR, "libkgtpu_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes CDLL with argtypes set, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.boxes_from_label_map.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p]
        lib.boxes_from_label_map.restype = ctypes.c_int
        lib.renumber_label_map.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, i32p]
        lib.renumber_label_map.restype = None
        lib.label_map_iou.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f32p]
        lib.label_map_iou.restype = None
        _lib = lib
        return _lib


def _as_i32(a):
    import numpy as np
    return np.ascontiguousarray(a, dtype=np.int32)


def boxes_from_label_map(label, max_instances: int, min_pixels: int = 4):
    """Native single-pass version of transforms.boxes_from_label_map.
    Returns (boxes [N,4] f32, valid [N] f32, remap [N] i32) or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    label = _as_i32(label)
    h, w = label.shape
    boxes = np.zeros((max_instances, 4), np.float32)
    valid = np.zeros((max_instances,), np.float32)
    remap = np.zeros((max_instances,), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.boxes_from_label_map(
        label.ctypes.data_as(i32p), h, w, max_instances, min_pixels,
        boxes.ctypes.data_as(f32p), valid.ctypes.data_as(f32p),
        remap.ctypes.data_as(i32p))
    return boxes, valid, remap


def renumber_label_map(label, remap):
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    label = _as_i32(label)
    remap = _as_i32(remap)
    out = np.zeros_like(label)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.renumber_label_map(
        label.ctypes.data_as(i32p), label.shape[0], label.shape[1],
        remap.ctypes.data_as(i32p), len(remap), out.ctypes.data_as(i32p))
    return out


def label_map_iou(pred, gt):
    """[P, G] IoU matrix between instances of two label maps (ids dense
    from 1).  Returns None when native lib unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    pred = _as_i32(pred)
    gt = _as_i32(gt)
    np_ = int(pred.max())
    ng = int(gt.max())
    iou = np.zeros((max(np_, 0), max(ng, 0)), np.float32)
    if np_ == 0 or ng == 0:
        return iou
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.label_map_iou(
        pred.ctypes.data_as(i32p), gt.ctypes.data_as(i32p),
        pred.shape[0], pred.shape[1], np_, ng,
        iou.ctypes.data_as(f32p))
    return iou
