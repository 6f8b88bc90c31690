"""ctypes bindings for the native depth-IO library.

Builds `src/depthio.cpp` with g++ on first use (cached under `_build/`);
`available()` reports whether the shared library could be produced so
callers can fall back to the pure-Python codec (utils/pngio.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "depthio.cpp")
_SO = os.path.join(_DIR, "_build", "libdepthio.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO, "-lz",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:  # g++ missing, timeout, ...
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.dio_read_png16.restype = ctypes.c_int
        lib.dio_read_png16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dio_png_dims.restype = ctypes.c_int
        lib.dio_png_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dio_loader_create.restype = ctypes.c_void_p
        lib.dio_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.dio_loader_next.restype = ctypes.c_int
        lib.dio_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dio_loader_destroy.restype = None
        lib.dio_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def read_png16(path: str) -> np.ndarray:
    """Decode a grayscale PNG to uint16 [H,W] via the native library."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native depthio unavailable: {_build_error}")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.dio_png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"dio_png_dims({path}) -> {rc}")
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.dio_read_png16(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.size, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"dio_read_png16({path}) -> {rc}")
    return out


class PrefetchLoader:
    """In-order frame stream decoded ahead by a C++ thread pool."""

    def __init__(self, paths: list[str], n_threads: int = 4, ahead: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native depthio unavailable: {_build_error}")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.dio_loader_create(
            arr, len(self._paths), n_threads, ahead
        )
        if not self._handle:
            raise RuntimeError("dio_loader_create failed")
        # probe max dims for the output buffer
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        cap = 0
        for p in self._paths:
            if lib.dio_png_dims(p, ctypes.byref(h), ctypes.byref(w)) == 0:
                cap = max(cap, h.value * w.value)
        self._cap = max(cap, 1)

    def __iter__(self):
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        buf = np.empty(self._cap, np.uint16)
        while True:
            rc = self._lib.dio_loader_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                buf.size, ctypes.byref(h), ctypes.byref(w),
            )
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"dio_loader_next -> {rc}")
            yield buf[: h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.dio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_frames(depth_files: list[str], load_side, depth_scale: float):
    """Iterator of RecordedFrame-compatible tuples for datasets.sequence."""
    from ..datasets.sequence import RecordedFrame

    loader = PrefetchLoader(depth_files)
    try:
        for i, raw in enumerate(loader):
            pose_gt, hand_base, hand_q, rgb = load_side(i)
            yield RecordedFrame(
                depth=raw.astype(np.float32) * depth_scale,
                pose_gt=pose_gt, hand_base=hand_base, hand_q=hand_q, index=i,
                rgb=rgb,
            )
    finally:
        loader.close()
