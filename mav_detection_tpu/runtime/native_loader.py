"""ctypes bindings for the native loader (.flo codec + prefetcher).

Falls back transparently when the shared library can't be built — all
consumers (``core.flo.read_flow_batch``, the pipeline's staging loop) treat
this module as an optional fast path.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    from mav_detection_tpu.runtime.build import build

    path = build()
    lib = ctypes.CDLL(path)
    lib.flo_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.flo_probe.restype = ctypes.c_int
    lib.flo_read.argtypes = [ctypes.c_char_p,
                             np.ctypeslib.ndpointer(np.float32),
                             ctypes.c_int, ctypes.c_int]
    lib.flo_read.restype = ctypes.c_int
    lib.flo_write.argtypes = [ctypes.c_char_p,
                              np.ctypeslib.ndpointer(np.float32),
                              ctypes.c_int, ctypes.c_int]
    lib.flo_write.restype = ctypes.c_int
    lib.flo_read_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                   ctypes.c_int,
                                   np.ctypeslib.ndpointer(np.float32),
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.flo_read_batch.restype = ctypes.c_int
    lib.prefetcher_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
    lib.prefetcher_create.restype = ctypes.c_void_p
    lib.prefetcher_next.argtypes = [ctypes.c_void_p,
                                    np.ctypeslib.ndpointer(np.float32)]
    lib.prefetcher_next.restype = ctypes.c_int
    lib.prefetcher_inflight.argtypes = [ctypes.c_void_p]
    lib.prefetcher_inflight.restype = ctypes.c_int
    lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.prefetcher_destroy.restype = None
    _LIB = lib
    return lib


def _c_paths(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def probe(path: str):
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.flo_probe(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"flo_probe failed ({rc}) for {path}")
    return w.value, h.value


def read_flow(path: str) -> np.ndarray:
    lib = _load()
    w, h = probe(path)
    out = np.empty((h, w, 2), np.float32)
    rc = lib.flo_read(path.encode(), out.reshape(-1), w, h)
    if rc != 0:
        raise IOError(f"flo_read failed ({rc}) for {path}")
    return out


def write_flow(path: str, flow: np.ndarray) -> None:
    lib = _load()
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    rc = lib.flo_write(path.encode(), flow.reshape(-1), w, h)
    if rc != 0:
        raise IOError(f"flo_write failed ({rc}) for {path}")


def read_flow_batch(paths: List[str], n_threads: int = 4) -> np.ndarray:
    if not paths:
        return np.zeros((0, 0, 0, 2), np.float32)
    lib = _load()
    w, h = probe(paths[0])
    out = np.empty((len(paths), h, w, 2), np.float32)
    ok = lib.flo_read_batch(_c_paths(paths), len(paths), out.reshape(-1),
                            w, h, n_threads)
    if ok != len(paths):
        raise IOError(f"flo_read_batch: {len(paths) - ok} files failed")
    return out


class FloPrefetcher:
    """Background-threaded in-order .flo reader (double buffering+)."""

    def __init__(self, paths: Sequence[str], depth: int = 4,
                 n_threads: int = 2) -> None:
        self._lib = _load()
        if not paths:
            raise ValueError("no paths")
        self._w, self._h = probe(paths[0])
        self._n = len(paths)
        self._keepalive = _c_paths(paths)
        self._handle = self._lib.prefetcher_create(
            self._keepalive, self._n, self._w, self._h, depth, n_threads)
        self._delivered = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._delivered >= self._n:
            raise StopIteration
        out = np.empty((self._h, self._w, 2), np.float32)
        idx = self._lib.prefetcher_next(self._handle, out.reshape(-1))
        if idx == -1:
            raise StopIteration
        if idx < -1:  # (-2 - index): that file failed to read
            bad = -2 - idx
            raise IOError(
                f"prefetcher: failed to read .flo file #{bad} "
                f"(missing/corrupt/truncated/mismatched dimensions)")
        self._delivered += 1
        return out

    def inflight(self) -> int:
        """Claimed-but-unconsumed count; bounded by the ``depth`` argument."""
        return int(self._lib.prefetcher_inflight(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
