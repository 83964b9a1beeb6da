"""ctypes bindings for the native image pipeline (native/imageio.cpp).

The reference's input pipeline is tf.data graph ops (/root/reference/lib/
data/dataloader.py:148-278 decodes JPEG in-graph); here the host side is
numpy, so decode+resize run in C++ — one fused pass from JPEG bytes to the
padded float32 bucket tensor. All entry points release the GIL (plain C
calls), so the loader's reader pool scales across cores.

Falls back cleanly: ``available()`` is False when no compiler / libjpeg is
present and callers keep their cv2 path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int)


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "..", "native", "imageio.cpp")
    src = os.path.abspath(src)
    cache = os.path.join(tempfile.gettempdir(), f"d2tpu_imageio_{os.getuid()}.so")
    try:
        if (not os.path.isfile(cache)
                or os.path.getmtime(cache) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", cache, "-ljpeg"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(cache)
        lib.imgio_jpeg_info.restype = ctypes.c_int
        lib.imgio_jpeg_info.argtypes = [_u8p, ctypes.c_long, _i32p, _i32p]
        lib.imgio_decode_jpeg.restype = ctypes.c_int
        lib.imgio_decode_jpeg.argtypes = [_u8p, ctypes.c_long, _u8p, ctypes.c_long]
        lib.imgio_resize_bilinear.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.imgio_decode_resize_pad.restype = ctypes.c_int
        lib.imgio_decode_resize_pad.argtypes = [
            _u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int, _i32p, _i32p,
        ]
        _longp = ctypes.POINTER(ctypes.c_long)
        lib.imgio_decode_resize_pad_batch.restype = ctypes.c_int
        lib.imgio_decode_resize_pad_batch.argtypes = [
            _u8p, _longp, _longp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int, _i32p, _i32p, ctypes.c_int,
        ]
        lib.imgio_train_image_batch.restype = ctypes.c_int
        lib.imgio_train_image_batch.argtypes = [
            _u8p, _longp, _longp, ctypes.c_int, _i32p, ctypes.c_int, _u8p,
            _f32p, ctypes.c_int, ctypes.c_int, _i32p, _i32p, ctypes.c_int,
        ]
        lib.imgio_mini_masks.restype = ctypes.c_int
        lib.imgio_mini_masks.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, _f32p, _f32p, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.imgio_crc32c.restype = ctypes.c_uint32
        lib.imgio_crc32c.argtypes = [_u8p, ctypes.c_long]
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fall back to cv2
        logger.warning("native imageio unavailable (%s); using cv2", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _as_u8(data: bytes) -> "ctypes.Array":
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


def jpeg_info(data: bytes) -> Tuple[int, int]:
    """(height, width) from the JPEG header only."""
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.imgio_jpeg_info(_as_u8(data), len(data), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError("invalid JPEG")
    return h.value, w.value


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> [H, W, 3] uint8 RGB."""
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    h, w = jpeg_info(data)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.imgio_decode_jpeg(
        _as_u8(data), len(data), out.ctypes.data_as(_u8p), out.size
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed ({rc})")
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 RGB [H, W, 3] -> float32 [dh, dw, 3], half-pixel bilinear."""
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((dh, dw, 3), np.float32)
    lib.imgio_resize_bilinear(
        img.ctypes.data_as(_u8p), img.shape[0], img.shape[1],
        out.ctypes.data_as(_f32p), dh, dw,
    )
    return out


def decode_resize_pad(
    data: bytes, min_size: int, max_size: int, bucket: Tuple[int, int]
) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]:
    """Fused JPEG -> resized, zero-padded [bh, bw, 3] float32 RGB.

    Returns (padded image, (resized_h, resized_w), (orig_h, orig_w)).
    Resize rule matches data/transforms.resize_shortest_edge.
    """
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    bh, bw = bucket
    oh, ow = jpeg_info(data)
    out = np.zeros((bh, bw, 3), np.float32)
    nh = ctypes.c_int()
    nw = ctypes.c_int()
    rc = lib.imgio_decode_resize_pad(
        _as_u8(data), len(data), min_size, max_size,
        out.ctypes.data_as(_f32p), bh, bw, ctypes.byref(nh), ctypes.byref(nw),
    )
    if rc == -2:
        raise ValueError(f"resized image exceeds bucket {bucket}")
    if rc != 0:
        raise ValueError(f"JPEG decode failed ({rc})")
    return out, (nh.value, nw.value), (oh, ow)


def decode_resize_pad_batch(
    datas, min_size: int, max_size: int, bucket: Tuple[int, int],
    threads: int = 0,
):
    """Decode + resize + pad a list of JPEG byte strings in parallel (C++
    thread pool, GIL released for the whole batch).

    Returns (batch [N, bh, bw, 3] float32, sizes [N, 2] int32 resized (h, w)).
    Raises on any corrupt member or bucket overflow.
    """
    import os as _os

    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    n = len(datas)
    bh, bw = bucket
    blob = b"".join(datas)
    offsets = (ctypes.c_long * n)()
    lens = (ctypes.c_long * n)()
    off = 0
    for i, d in enumerate(datas):
        offsets[i] = off
        lens[i] = len(d)
        off += len(d)
    out = np.zeros((n, bh, bw, 3), np.float32)
    hw = np.zeros((n, 2), np.int32)
    rcs = np.zeros((n,), np.int32)
    if threads <= 0:
        threads = min(n, _os.cpu_count() or 1)
    rc = lib.imgio_decode_resize_pad_batch(
        _as_u8(blob), offsets, lens, n, min_size, max_size,
        out.ctypes.data_as(_f32p), bh, bw,
        hw.ctypes.data_as(_i32p), rcs.ctypes.data_as(_i32p), threads,
    )
    if rc == -2:
        raise ValueError(f"a resized image exceeds bucket {bucket}")
    if rc != 0:
        raise ValueError(f"JPEG decode failed in batch (rcs={rcs.tolist()})")
    return out, hw


def train_image_batch(
    datas, min_sizes, max_size: int, flips, bucket: Tuple[int, int],
    threads: int = 0,
):
    """Training image batch: decode + PER-IMAGE shortest-edge resize +
    optional horizontal flip + pad, one GIL-free call (C++ thread pool).

    ``min_sizes``/``flips`` are per-image (the train pipeline draws a random
    MIN_SIZE_TRAIN choice and a flip coin per sample). Returns
    (batch [N, bh, bw, 3] float32, sizes [N, 2] int32 resized (h, w)).
    """
    import os as _os

    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    n = len(datas)
    bh, bw = bucket
    blob = b"".join(datas)
    offsets = (ctypes.c_long * n)()
    lens = (ctypes.c_long * n)()
    off = 0
    for i, d in enumerate(datas):
        offsets[i] = off
        lens[i] = len(d)
        off += len(d)
    ms = np.ascontiguousarray(min_sizes, np.int32)
    fl = np.ascontiguousarray(flips, np.uint8)
    out = np.zeros((n, bh, bw, 3), np.float32)
    hw = np.zeros((n, 2), np.int32)
    rcs = np.zeros((n,), np.int32)
    if threads <= 0:
        threads = min(n, _os.cpu_count() or 1)
    rc = lib.imgio_train_image_batch(
        _as_u8(blob), offsets, lens, n, ms.ctypes.data_as(_i32p), max_size,
        fl.ctypes.data_as(_u8p), out.ctypes.data_as(_f32p), bh, bw,
        hw.ctypes.data_as(_i32p), rcs.ctypes.data_as(_i32p), threads,
    )
    if rc == -2:
        raise ValueError(f"a resized image exceeds bucket {bucket}")
    if rc != 0:
        raise ValueError(f"JPEG decode failed in batch (rcs={rcs.tolist()})")
    return out, hw


def mini_masks(
    masks: np.ndarray,
    resized_hw: Tuple[int, int],
    flip: bool,
    boxes: np.ndarray,
    mini: int,
    threads: int = 1,
) -> np.ndarray:
    """Fused mini-mask targets (see native/imageio.cpp imgio_mini_masks).

    ``masks``: [N, H, W] uint8 full-resolution instance masks;
    ``resized_hw``: the sample's post-resize (nh, nw); ``boxes``: [N, 4]
    xyxy in the (flipped) resized frame. Returns [N, mini, mini] float32 —
    the same values as resize-all-masks + crop + resize
    (transforms.resize_shortest_edge + make_mini_masks) without ever
    materializing the resized masks.
    """
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    masks = np.ascontiguousarray(masks, np.uint8)
    n, h, w = masks.shape
    nh, nw = resized_hw
    boxes = np.ascontiguousarray(boxes, np.float32)
    out = np.zeros((n, mini, mini), np.float32)
    if n == 0:
        return out
    rc = lib.imgio_mini_masks(
        masks.ctypes.data_as(_u8p), n, h, w, int(nh), int(nw), int(flip),
        boxes.ctypes.data_as(_f32p), out.ctypes.data_as(_f32p), mini,
        threads,
    )
    if rc != 0:
        raise ValueError(f"imgio_mini_masks failed ({rc})")
    return out


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32 via the native table loop (TFRecord framing)."""
    lib = _build_and_load()
    assert lib is not None, "native imageio not available"
    return int(lib.imgio_crc32c(_as_u8(data), len(data)))
