"""Native host-ops wrappers (numpy-fronted, ctypes-backed, numpy fallback)."""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from .build import build_host_ops, get_host_ops, FileBaton

__all__ = ["build_host_ops", "get_host_ops", "FileBaton", "nms_native",
           "extract_image_boxes_native", "resize_bilinear_u8_native",
           "u8_to_chw_norm_native", "native_available"]


def native_available() -> bool:
    return get_host_ops() is not None


def nms_native(boxes: np.ndarray, overlap_threshold: float = 0.5,
               mode: str = "union") -> Optional[List[int]]:
    lib = get_host_ops()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes[:, :5], np.float32)
    n = boxes.shape[0]
    keep = np.zeros(n, np.int32)
    k = lib.nms(boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int(n), ctypes.c_float(overlap_threshold),
                ctypes.c_int(1 if mode == "min" else 0),
                keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep[:k].tolist()


def extract_image_boxes_native(img_u8: np.ndarray, boxes: np.ndarray,
                               size: int) -> Optional[np.ndarray]:
    lib = get_host_ops()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    assert img.ndim == 3 and img.shape[2] == 3
    b = np.ascontiguousarray(boxes, np.float32)
    n = b.shape[0]
    out = np.zeros((n, 3, size, size), np.float32)
    lib.extract_image_boxes(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(img.shape[0]), ctypes.c_int(img.shape[1]),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), ctypes.c_int(b.shape[1]), ctypes.c_int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def resize_bilinear_u8_native(img_u8: np.ndarray, dh: int, dw: int
                              ) -> Optional[np.ndarray]:
    lib = get_host_ops()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    out = np.zeros((dh, dw, img.shape[2]), np.uint8)
    lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(img.shape[0]), ctypes.c_int(img.shape[1]),
        ctypes.c_int(img.shape[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(dh), ctypes.c_int(dw))
    return out


def u8_to_chw_norm_native(img_u8: np.ndarray) -> Optional[np.ndarray]:
    lib = get_host_ops()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img.shape
    out = np.zeros((3, h, w), np.float32)
    lib.u8_to_chw_norm(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
