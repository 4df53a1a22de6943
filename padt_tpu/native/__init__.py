"""ctypes bindings for the native maskops library, with build-on-first-use.

`maskops.available()` is False (and callers fall back to numpy) when the
shared library can't be built (no compiler) — tests cover both paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libmaskops.so")
_SRC = os.path.join(_HERE, "maskops.cc")


class _MaskOps:
    def __init__(self):
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def _load(self) -> Optional[ctypes.CDLL]:
        if self._tried:
            return self._lib
        self._tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.rle_encode.restype = ctypes.c_int
            lib.rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.rle_decode.restype = ctypes.c_int
            lib.rle_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.rle_area.restype = ctypes.c_double
            lib.rle_area.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.rle_iou.restype = ctypes.c_double
            lib.rle_iou.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
            ]
            self._lib = lib
        except Exception:
            self._lib = None
        return self._lib

    def available(self) -> bool:
        return self._load() is not None

    def encode(self, mask: np.ndarray) -> str:
        lib = self._load()
        h, w = mask.shape
        cap = 2 * h * w + 64
        buf = ctypes.create_string_buffer(cap)
        mask = np.ascontiguousarray(mask, np.uint8)
        n = lib.rle_encode(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, cap
        )
        if n < 0:
            raise RuntimeError("rle_encode buffer overflow")
        return buf.raw[:n].decode("ascii")

    def decode(self, counts: str, h: int, w: int) -> np.ndarray:
        lib = self._load()
        out = np.zeros((h, w), np.uint8)
        s = counts.encode("ascii")
        rc = lib.rle_decode(
            s, len(s), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise ValueError("malformed RLE string")
        return out

    def area(self, counts: str) -> float:
        lib = self._load()
        s = counts.encode("ascii")
        return lib.rle_area(s, len(s))

    def iou(self, counts_a: str, counts_b: str, iscrowd: bool = False) -> float:
        lib = self._load()
        a = counts_a.encode("ascii")
        b = counts_b.encode("ascii")
        r = lib.rle_iou(a, len(a), b, len(b), 1 if iscrowd else 0)
        if r < 0:
            raise ValueError("malformed RLE")
        return r


maskops = _MaskOps()
