"""COCO run-length encoding: encode / decode / area / IoU.

The reference leans on pycocotools' C maskApi (vendored panopticapi +
coco_tools); neither is available here. This module provides the same
capability with a NATIVE C++ core (native/rle.cpp, compiled once with g++
and loaded through ctypes — pybind11 is not in this image) and a pure-numpy
fallback when no compiler is available.

RLE dicts follow the COCO interchange format exactly:
    {"size": [h, w], "counts": bytes}
with column-major alternating runs starting at 0, counts compressed to the
5-bit-group delta string — so exported result files are consumable by
pycocotools and the COCO evaluation server.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    """Compile native/rle.cpp once (cached .so beside the source)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "..", "native", "rle.cpp")
    src = os.path.abspath(src)
    cache = os.path.join(
        tempfile.gettempdir(), f"d2tpu_rle_{os.getuid()}.so"
    )
    try:
        if (not os.path.isfile(cache)
                or os.path.getmtime(cache) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", cache],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(cache)
        lib.rle_encode_counts.restype = ctypes.c_longlong
        lib.rle_compress.restype = ctypes.c_longlong
        lib.rle_decompress.restype = ctypes.c_longlong
        lib.rle_area.restype = ctypes.c_longlong
        lib.rle_iou.restype = ctypes.c_double
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fall back to numpy
        logger.warning("native RLE unavailable (%s); using numpy fallback", e)
        _LIB = None
    return _LIB


def _i64(a):
    return np.ascontiguousarray(a, np.int64)


# -- counts <-> mask ----------------------------------------------------------

def _encode_counts_np(mask: np.ndarray) -> np.ndarray:
    flat = np.asarray(mask, np.uint8).T.reshape(-1)  # column-major
    if flat.size == 0:
        return np.zeros(0, np.int64)
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds)
    if flat[0] == 1:  # runs must start with a (possibly empty) zero run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _decode_counts_np(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + int(c)] = 1
        pos += int(c)
        val ^= 1
    return flat.reshape(w, h).T


def encode_counts(mask: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        return _encode_counts_np(mask)
    h, w = mask.shape
    cap = h * w + 2
    out = np.empty(cap, np.int64)
    n = lib.rle_encode_counts(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), cap,
    )
    assert n >= 0
    return out[:n].copy()


def decode_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _build_and_load()
    counts = _i64(counts)
    if lib is None:
        return _decode_counts_np(counts, h, w)
    mask = np.zeros((h, w), np.uint8)
    lib.rle_decode_counts(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        len(counts), h, w,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask


# -- counts <-> compressed string --------------------------------------------

def _compress_np(counts: np.ndarray) -> bytes:
    out = bytearray()
    counts = [int(c) for c in counts]
    for i, c in enumerate(counts):
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            piece = x & 0x1F
            x >>= 5
            more = (x != -1) if (piece & 0x10) else (x != 0)
            if more:
                piece |= 0x20
            out.append(piece + 48)
    return bytes(out)


def _decompress_np(data: bytes) -> np.ndarray:
    counts: List[int] = []
    p = 0
    while p < len(data):
        x = 0
        k = 0
        more = True
        while more:
            c = data[p] - 48
            p += 1
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def compress(counts: np.ndarray) -> bytes:
    lib = _build_and_load()
    counts = _i64(counts)
    if lib is None:
        return _compress_np(counts)
    cap = 16 * max(len(counts), 1) + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.rle_compress(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        len(counts), out, cap,
    )
    assert n >= 0
    return out.raw[:n]


def decompress(data: bytes) -> np.ndarray:
    lib = _build_and_load()
    if lib is None:
        return _decompress_np(data)
    cap = 2 * max(len(data), 1) + 4
    out = np.empty(cap, np.int64)
    n = lib.rle_decompress(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), cap,
    )
    assert n >= 0
    return out[:n].copy()


# -- public COCO-dict API -----------------------------------------------------

def encode(mask: np.ndarray) -> Dict:
    """Binary [H, W] mask -> COCO compressed RLE dict."""
    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": compress(encode_counts(mask))}


def decode(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        data = counts.encode() if isinstance(counts, str) else counts
        counts = decompress(data)
    return decode_counts(np.asarray(counts, np.int64), h, w)


def area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        data = counts.encode() if isinstance(counts, str) else counts
        counts = decompress(data)
    counts = _i64(counts)
    lib = _build_and_load()
    if lib is None:
        return int(counts[1::2].sum())
    return int(lib.rle_area(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(counts)
    ))


def iou(dt: Sequence[Dict], gt: Sequence[Dict],
        iscrowd: Optional[Sequence[bool]] = None) -> np.ndarray:
    """[D, G] mask IoU straight from RLE runs (no decode) — the pycocotools
    maskUtils.iou contract, crowd GT using intersection / det-area."""
    iscrowd = (
        np.zeros(len(gt), bool) if iscrowd is None else np.asarray(iscrowd, bool)
    )
    d_counts = [
        decompress(r["counts"]) if isinstance(r["counts"], (bytes, str))
        else _i64(r["counts"]) for r in dt
    ]
    g_counts = [
        decompress(r["counts"]) if isinstance(r["counts"], (bytes, str))
        else _i64(r["counts"]) for r in gt
    ]
    out = np.zeros((len(dt), len(gt)), np.float64)
    lib = _build_and_load()
    for i, dc in enumerate(d_counts):
        for j, gc in enumerate(g_counts):
            if lib is None:
                h, w = dt[i]["size"]
                dm = decode_counts(dc, h, w).astype(bool)
                gm = decode_counts(gc, h, w).astype(bool)
                inter = float(np.logical_and(dm, gm).sum())
                uni = float(dm.sum()) if iscrowd[j] else float(
                    np.logical_or(dm, gm).sum()
                )
                out[i, j] = inter / uni if uni > 0 else 0.0
            else:
                out[i, j] = lib.rle_iou(
                    dc.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                    len(dc),
                    gc.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                    len(gc),
                    int(iscrowd[j]),
                )
    return out
