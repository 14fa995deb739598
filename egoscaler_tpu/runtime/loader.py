"""Python binding for the native prefetch loader (ctypes).

Builds runtime/native/prefetch_loader.cc with g++ on first use (cached
.so next to the source); falls back to a sequential Python reader when
no compiler is available so the package stays importable everywhere.
"""
from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libprefetch_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "prefetch_loader.cc")

_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
        ):
            try:
                subprocess.run(
                    [
                        "g++", "-O2", "-shared", "-fPIC", "-pthread",
                        "-std=c++17", _SRC_PATH, "-o", _SO_PATH,
                    ],
                    check=True, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.pfl_create.restype = ctypes.c_void_p
        lib.pfl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pfl_next.restype = ctypes.c_long
        lib.pfl_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ]
        lib.pfl_release.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char)]
        lib.pfl_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class PrefetchLoader:
    """Iterate (index, bytes) over files with native readahead."""

    def __init__(self, paths: Sequence[str], threads: int = 4,
                 depth: int = 16):
        self.paths = list(paths)
        self._lib = _build()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.pfl_create(
                arr, len(self.paths), threads, depth
            )

    def __iter__(self) -> Iterator[Tuple[int, bytes]]:
        if self._handle is None:  # python fallback
            for i, p in enumerate(self.paths):
                with open(p, "rb") as f:
                    yield i, f.read()
            return
        idx = ctypes.c_int()
        data = ctypes.POINTER(ctypes.c_char)()
        while True:
            size = self._lib.pfl_next(
                self._handle, ctypes.byref(idx), ctypes.byref(data)
            )
            if size < 0:
                break
            try:
                yield idx.value, ctypes.string_at(data, size)
            finally:
                self._lib.pfl_release(self._handle, data)

    def close(self):
        if self._handle is not None:
            self._lib.pfl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_npy_bytes(raw: bytes) -> np.ndarray:
    return np.load(io.BytesIO(raw), allow_pickle=False)


def prefetch_npy(paths: Sequence[str], threads: int = 4) -> List[np.ndarray]:
    """Ordered npy loading through the native pool."""
    out: List[Optional[np.ndarray]] = [None] * len(paths)
    loader = PrefetchLoader(paths, threads=threads)
    try:
        for i, raw in loader:
            out[i] = load_npy_bytes(raw)
    finally:
        loader.close()
    return out  # type: ignore[return-value]
