"""ctypes binding for the native prefetching event loader (native/hgnn_io).

Replaces the reference's 16-process torch DataLoader (reference
``edge_classifier_base.py:41``) with a C++ thread-pool loader over a compact
binary event format: worker threads parse events into a bounded ring buffer
while the train loop consumes numpy arrays zero-copy-adjacent.  Falls back
to the pure-Python reader when the shared library isn't built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DTYPES = {0: np.float32, 1: np.int32, 2: np.int64, 3: np.uint8, 4: np.float64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1,
                np.dtype(np.int64): 2, np.dtype(np.uint8): 3,
                np.dtype(np.bool_): 3, np.dtype(np.float64): 4}

_LIB_PATHS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libhgnn_io.so"),
    "libhgnn_io.so",
)


def _load_lib():
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
            break
        except OSError:
            continue
    else:
        return None
    lib.hgnn_loader_open.restype = ctypes.c_void_p
    lib.hgnn_loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.hgnn_loader_next.restype = ctypes.c_void_p
    lib.hgnn_loader_next.argtypes = [ctypes.c_void_p]
    lib.hgnn_loader_close.argtypes = [ctypes.c_void_p]
    lib.hgnn_event_num_arrays.argtypes = [ctypes.c_void_p]
    lib.hgnn_event_name.restype = ctypes.c_char_p
    lib.hgnn_event_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hgnn_event_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hgnn_event_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hgnn_event_dims.restype = ctypes.POINTER(ctypes.c_int64)
    lib.hgnn_event_dims.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hgnn_event_data.restype = ctypes.c_void_p
    lib.hgnn_event_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hgnn_event_free.argtypes = [ctypes.c_void_p]
    lib.hgnn_write_event.restype = ctypes.c_int
    lib.hgnn_write_event.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_void_p)]
    return lib


_lib = _load_lib()


def available() -> bool:
    return _lib is not None


def write_event(path: str, event: dict):
    """Serialize an event dict to the native binary format."""
    if _lib is None:
        raise RuntimeError("libhgnn_io.so not built (run `make -C native`)")
    arrays = []
    for k, v in event.items():
        a = np.ascontiguousarray(v)
        if a.dtype == np.bool_:
            a = a.astype(np.uint8)
        if a.dtype not in _DTYPE_CODES:
            a = a.astype(np.float32)
        arrays.append((k, a))
    n = len(arrays)
    names = (ctypes.c_char_p * n)(*[k.encode() for k, _ in arrays])
    dtypes = (ctypes.c_int * n)(*[_DTYPE_CODES[a.dtype] for _, a in arrays])
    ndims = (ctypes.c_int * n)(*[a.ndim for _, a in arrays])
    dims_flat = []
    for _, a in arrays:
        dims_flat.extend(a.shape)
    dims = (ctypes.c_int64 * len(dims_flat))(*dims_flat)
    datas = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p) for _, a in arrays])
    rc = _lib.hgnn_write_event(path.encode(), n, names, dtypes, ndims,
                               dims, datas)
    if rc != 0:
        raise IOError(f"failed to write {path}")


def _event_to_dict(ev_ptr) -> dict:
    n = _lib.hgnn_event_num_arrays(ev_ptr)
    out = {}
    for i in range(n):
        name = _lib.hgnn_event_name(ev_ptr, i).decode()
        dtype = _DTYPES[_lib.hgnn_event_dtype(ev_ptr, i)]
        ndim = _lib.hgnn_event_ndim(ev_ptr, i)
        dims = [_lib.hgnn_event_dims(ev_ptr, i)[d] for d in range(ndim)]
        count = int(np.prod(dims)) if dims else 1
        buf = ctypes.cast(
            _lib.hgnn_event_data(ev_ptr, i),
            ctypes.POINTER(ctypes.c_uint8 * (count * np.dtype(dtype).itemsize)))
        arr = np.frombuffer(buf.contents, dtype=dtype).reshape(dims).copy()
        out[name] = arr
    return out


class NativeEventLoader:
    """Iterator over events with background prefetch threads.

    loop=False: one pass in (seeded-)shuffled order, then StopIteration.
    loop=True: endless stream, reshuffled each epoch with seed+epoch.
    """

    def __init__(self, paths, queue_capacity=8, n_threads=4,
                 shuffle_seed=-1, loop=False):
        if _lib is None:
            raise RuntimeError("libhgnn_io.so not built (run `make -C native`)")
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = _lib.hgnn_loader_open(
            arr, len(self._paths), queue_capacity, n_threads,
            shuffle_seed, int(loop))

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        ev = _lib.hgnn_loader_next(self._handle)
        if not ev:
            raise StopIteration
        try:
            return _event_to_dict(ev)
        finally:
            _lib.hgnn_event_free(ev)

    def close(self):
        if self._handle:
            _lib.hgnn_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
