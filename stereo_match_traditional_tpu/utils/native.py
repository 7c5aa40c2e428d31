"""ctypes binding for the native host runtime (native/stereo_host).

C++ covers the host side of the pipeline — image codecs, colorspace
conversion, padding, display normalization, and a multi-threaded pipelined
pair loader — mirroring the reference's native L0 layer (OpenCV calls in
every driver, `SAD/SADmain.cpp:27-48`).  Every function has a NumPy
fallback in `utils.io`, so the framework degrades gracefully when no C++
toolchain is present; `available()` reports which path is active.

The library is built on first use (`g++ -O3 -shared`), cached next to its
source.  No pybind11 in this image — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "stereo_host",
)
_SO = os.path.join(_DIR, "libstereo_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "stereo_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libstereo_host.so"],
            check=True, capture_output=True, timeout=180,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        # A prebuilt .so may predate newly added symbols (mtime comparisons
        # are unreliable across checkouts, so probe the symbol instead).
        # `make` replaces the file with a new inode, so re-dlopening the
        # path maps the fresh build even while the old handle is alive.
        if not hasattr(lib, "smt_read_pfm") and _build():
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.smt_rgb_to_gray_u8.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.smt_rgb_to_lab_u8.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.smt_replicate_pad_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
        lib.smt_normalize_u8.argtypes = [f32p, ctypes.c_int64, u8p]
        lib.smt_median3_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
        lib.smt_read_pnm.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.smt_read_pnm.restype = ctypes.c_int
        lib.smt_write_pnm.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        lib.smt_write_pnm.restype = ctypes.c_int
        if hasattr(lib, "smt_read_pfm"):
            # absent only on an old prebuilt .so that could not be rebuilt
            # (no toolchain); the rest of the native surface still works.
            lib.smt_read_pfm.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.smt_read_pfm.restype = ctypes.c_int
            lib.smt_write_pfm.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int
            ]
            lib.smt_write_pfm.restype = ctypes.c_int
        lib.smt_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        lib.smt_loader_create.restype = ctypes.c_void_p
        lib.smt_loader_next.argtypes = [
            ctypes.c_void_p, u8p, u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.smt_loader_next.restype = ctypes.c_int
        lib.smt_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rgb_to_gray_u8(img: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or img.ndim != 3:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape[:2], np.uint8)
    lib.smt_rgb_to_gray_u8(_u8p(img), img.shape[0] * img.shape[1], _u8p(out))
    return out


def rgb_to_lab_u8(img: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or img.ndim != 3 or img.shape[-1] != 3:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty_like(img)
    lib.smt_rgb_to_lab_u8(_u8p(img), img.shape[0] * img.shape[1], _u8p(out))
    return out


def replicate_pad_u8(img: np.ndarray, pad: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    out = np.empty((h + 2 * pad, w + 2 * pad), np.uint8)
    lib.smt_replicate_pad_u8(_u8p(img), h, w, pad, _u8p(out))
    return out


def normalize_u8(x: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.smt_normalize_u8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, _u8p(out)
    )
    return out


def median3_u8(img: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty_like(img)
    lib.smt_median3_u8(_u8p(img), img.shape[0], img.shape[1], _u8p(out))
    return out


def read_pnm(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.smt_read_pnm(path.encode(), None, 0, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch), 1)
    if rc != 0:
        raise IOError(f"read_pnm({path}): header error {rc}")
    buf = np.empty(h.value * w.value * ch.value, np.uint8)
    rc = lib.smt_read_pnm(
        path.encode(), _u8p(buf), buf.size, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch), 0
    )
    if rc != 0:
        raise IOError(f"read_pnm({path}): read error {rc}")
    img = buf.reshape(h.value, w.value, ch.value)
    return img[..., 0] if ch.value == 1 else img


def read_pfm(path: str) -> Optional[np.ndarray]:
    """Native PFM read: float32 [H, W] or [H, W, 3], rows top-to-bottom."""
    lib = _load()
    if lib is None or not hasattr(lib, "smt_read_pfm"):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.smt_read_pfm(
        path.encode(), None, 0, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch), 1
    )
    if rc != 0:
        raise IOError(f"read_pfm({path}): header error {rc}")
    # Bound the allocation by the file size before trusting the header
    # (a corrupt '1000000 1000000' header would otherwise trigger a
    # multi-TB np.empty; mirrors io.read_pfm's truncation check).
    need = h.value * w.value * ch.value
    if need * 4 > os.path.getsize(path):
        raise IOError(
            f"read_pfm({path}): header claims {h.value}x{w.value}x{ch.value}"
            " but the file is too small to hold that raster"
        )
    buf = np.empty(need, np.float32)
    rc = lib.smt_read_pfm(
        path.encode(), _f32p(buf), buf.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch), 0,
    )
    if rc != 0:
        raise IOError(f"read_pfm({path}): read error {rc}")
    img = buf.reshape(h.value, w.value, ch.value)
    return img[..., 0] if ch.value == 1 else img


def write_pfm(path: str, data: np.ndarray) -> None:
    lib = _load()
    if lib is None or not hasattr(lib, "smt_write_pfm"):
        raise RuntimeError("native library (or its PFM codec) unavailable")
    data = np.ascontiguousarray(data, np.float32)
    ch = 1 if data.ndim == 2 else data.shape[2]
    rc = lib.smt_write_pfm(path.encode(), _f32p(data), data.shape[0], data.shape[1], ch)
    if rc != 0:
        raise IOError(f"write_pfm({path}): error {rc}")


def write_pnm(path: str, img: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    ch = 1 if img.ndim == 2 else img.shape[2]
    rc = lib.smt_write_pnm(path.encode(), _u8p(img), img.shape[0], img.shape[1], ch)
    if rc != 0:
        raise IOError(f"write_pnm({path}): error {rc}")


class PairLoader:
    """Threaded, pipelined stereo-pair loader over the C++ worker pool.

    Decodes PGM/PPM pairs and gray-converts on native threads while the
    device is busy with the previous pair; iteration yields
    ``(left, right)`` uint8 arrays in submission order.
    """

    def __init__(
        self,
        pairs: List[Tuple[str, str]],
        threads: int = 4,
        depth: int = 4,
        max_bytes: int = 64 * 1024 * 1024,
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._n = len(pairs)
        lefts = (ctypes.c_char_p * self._n)(*[p[0].encode() for p in pairs])
        rights = (ctypes.c_char_p * self._n)(*[p[1].encode() for p in pairs])
        self._handle = lib.smt_loader_create(lefts, rights, self._n, threads, depth)
        self._buf_l = np.empty(max_bytes, np.uint8)
        self._buf_r = np.empty(max_bytes, np.uint8)

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None:
            raise StopIteration
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.smt_loader_next(
            self._handle, _u8p(self._buf_l), _u8p(self._buf_r),
            self._buf_l.size, ctypes.byref(h), ctypes.byref(w),
        )
        if rc == -3:
            # oversized pair: it stays queued on the C side and *h/*w carry
            # the required geometry — grow the buffers and retry once
            need = h.value * w.value
            self._buf_l = np.empty(need, np.uint8)
            self._buf_r = np.empty(need, np.uint8)
            rc = self._lib.smt_loader_next(
                self._handle, _u8p(self._buf_l), _u8p(self._buf_r),
                self._buf_l.size, ctypes.byref(h), ctypes.byref(w),
            )
        if rc == 1:
            self.close()
            raise StopIteration
        if rc != 0:
            raise IOError(f"loader error {rc}")
        n = h.value * w.value
        left = self._buf_l[:n].reshape(h.value, w.value).copy()
        right = self._buf_r[:n].reshape(h.value, w.value).copy()
        return left, right

    def close(self) -> None:
        if self._handle is not None:
            self._lib.smt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
