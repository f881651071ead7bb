"""Native async array writer (C++ thread pool behind a ctypes ABI).

The runtime analog of the reference's AMReX `VisMF` C++ parallel writer:
checkpoint/plotfile arrays are handed to a native thread pool and written
in the background while the device keeps computing. Falls back to
synchronous numpy writes when the extension is unavailable (it is built
on first import with the system g++; no packaging step required).

File format: 64-byte header (magic, dtype code, ndim, shape[5]) + raw
little-endian array bytes + trailing length field for truncation checks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_qkwriter.so")
_SRC = os.path.join(_HERE, "writer.cpp")

_DTYPES = {
    np.dtype("float64"): 0,
    np.dtype("float32"): 1,
    np.dtype("int64"): 2,
    np.dtype("int32"): 3,
    np.dtype("bool"): 4,
}
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.qk_writer_init.argtypes = [ctypes.c_int]
    lib.qk_write_async.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.qk_write_async.restype = ctypes.c_long
    lib.qk_writer_drain.restype = ctypes.c_int
    lib.qk_writer_init(int(os.environ.get("QUOKKA_IO_THREADS", "4")))

    import atexit

    def _shutdown():
        try:
            lib.qk_writer_drain()
            lib.qk_writer_shutdown()
        except Exception:
            pass

    atexit.register(_shutdown)
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def write_array_async(path: str, arr) -> bool:
    """Queue `arr` for background writing; returns False if the native
    writer is unavailable (caller should fall back to numpy)."""
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(arr)
    if a.dtype not in _DTYPES:
        return False
    if a.ndim > 5:
        return False
    shape = (ctypes.c_uint64 * 5)(*(list(a.shape) + [0] * (5 - a.ndim)))
    rc = lib.qk_write_async(
        path.encode(), a.ctypes.data_as(ctypes.c_void_p), a.nbytes,
        _DTYPES[a.dtype], a.ndim, shape,
    )
    return rc > 0


def drain() -> int:
    """Block until all queued writes finish; returns the error count."""
    lib = _load()
    if lib is None:
        return 0
    return int(lib.qk_writer_drain())


def read_array(path: str):
    """Read a native-format array file."""
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.uint64, count=8)
        if header[0] != 0x514B41525241591A:
            raise ValueError(f"{path}: not a quokka native array file")
        dtype = _DTYPES_INV[int(header[1])]
        ndim = int(header[2])
        shape = tuple(int(x) for x in header[3:3 + ndim])
        arr = np.fromfile(f, dtype=dtype, count=int(np.prod(shape)))
        tail = np.fromfile(f, dtype=np.uint64, count=1)
    if tail.size != 1 or int(tail[0]) != arr.nbytes:
        raise ValueError(f"{path}: truncated native array file")
    return arr.reshape(shape)
