"""ctypes front for the native async npy loader (csrc/npy_loader.cpp), plus a
generic background-prefetch iterator.

The native pool replaces the reference's torch DataLoader worker processes
(datasets/__init__.py:70-106) for raw-file IO: submit a batch of paths,
overlap decode with device compute, and collect zero-copy numpy views.
Falls back to synchronous numpy when the shared library is missing (run
csrc/build.sh).
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading

import numpy as np

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int32, 3: np.int64, 4: np.uint8}
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "lib", "libnpy_loader.so")


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.npy_pool_create.restype = ctypes.c_void_p
    lib.npy_pool_create.argtypes = [ctypes.c_int]
    lib.npy_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.npy_submit.restype = ctypes.c_int64
    lib.npy_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.npy_wait.restype = ctypes.c_int32
    lib.npy_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.npy_error.restype = ctypes.c_char_p
    lib.npy_error.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.npy_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    return lib


class AsyncNpyPool:
    """Submit npy paths, collect decoded arrays; decode happens on C++
    threads concurrently with Python/device work."""

    def __init__(self, workers=4):
        self._lib = _load_lib()
        self._pool = self._lib.npy_pool_create(workers) if self._lib else None

    @property
    def native(self):
        return self._pool is not None

    def submit(self, path):
        if not self.native:
            return ("sync", str(path))
        return self._lib.npy_submit(self._pool, str(path).encode())

    def get(self, ticket):
        if not self.native:
            return np.load(ticket[1])
        data = ctypes.c_void_p()
        shape = (ctypes.c_int64 * 4)()
        ndim = ctypes.c_int32()
        dtype = ctypes.c_int32()
        status = self._lib.npy_wait(
            self._pool, ticket, ctypes.byref(data), shape, ctypes.byref(ndim), ctypes.byref(dtype)
        )
        if status != 1:
            raise IOError(self._lib.npy_error(self._pool, ticket).decode())
        shp = tuple(shape[i] for i in range(ndim.value))
        dt = _DTYPES[dtype.value]
        n = int(np.prod(shp)) if shp else 1
        buf = ctypes.cast(data, ctypes.POINTER(ctypes.c_char * (n * dt().itemsize)))
        arr = np.frombuffer(buf.contents, dtype=dt).reshape(shp).copy()
        self._lib.npy_release(self._pool, ticket)
        return arr

    def load(self, path):
        return self.get(self.submit(path))

    def load_many(self, paths):
        tickets = [self.submit(p) for p in paths]
        return [self.get(t) for t in tickets]

    def __del__(self):
        if getattr(self, "_pool", None) and self._lib:
            self._lib.npy_pool_destroy(self._pool)
            self._pool = None


class PrefetchIterator:
    """Wrap any iterable with a background-thread prefetch queue — overlaps
    the host input pipeline with device steps."""

    def __init__(self, iterable, depth=2):
        self.iterable = iterable
        self.depth = depth

    def __len__(self):
        return len(self.iterable)

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
