"""ctypes binding + lazy build of the C++ COCO matching core.

Parity: detectron2/evaluation/fast_eval_api.py (COCOeval_opt) — same idea:
keep the protocol in Python, push the hot greedy matching loop to C++.
Falls back to a pure-python implementation of the identical algorithm when
no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src_dir = os.path.join(os.path.dirname(__file__), "cocoeval_cpp")
    src = os.path.join(src_dir, "cocoeval.cc")
    lib_path = os.path.join(src_dir, "libcocoeval.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", lib_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.coco_match.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def coco_match(ious: np.ndarray, gt_ignore: np.ndarray, thrs: np.ndarray,
               det_ignore_mask: np.ndarray):
    """Greedy COCO matching. ious: (n_det, n_gt) with dets score-sorted and
    gts ignored-last. Returns (det_match (T, n_det) int64,
    det_ignore (T, n_det) uint8)."""
    n_det, n_gt = ious.shape
    T = len(thrs)
    det_match = np.empty((T, n_det), np.int64)
    det_ignore = np.empty((T, n_det), np.uint8)
    lib = _build_and_load()
    if lib is not None and n_det and n_gt:
        ious_c = np.ascontiguousarray(ious, np.float32)
        gt_ig = np.ascontiguousarray(gt_ignore, np.uint8)
        thrs_c = np.ascontiguousarray(thrs, np.float32)
        dim = np.ascontiguousarray(det_ignore_mask, np.uint8)
        lib.coco_match(
            ious_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_det, n_gt,
            gt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            thrs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T,
            dim.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            det_match.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            det_ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return det_match, det_ignore
    # python fallback (identical algorithm)
    for t, thr in enumerate(thrs):
        taken = np.zeros(n_gt, bool)
        for d in range(n_det):
            best, best_iou = -1, max(thr, 1e-10)
            for g in range(n_gt):
                if taken[g]:
                    continue
                if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best, best_iou = g, ious[d, g]
            if best >= 0:
                taken[best] = True
                det_match[t, d] = best
                det_ignore[t, d] = gt_ignore[best]
            else:
                det_match[t, d] = -1
                det_ignore[t, d] = det_ignore_mask[d]
    return det_match, det_ignore
