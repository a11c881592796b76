"""ctypes bridge to the native bigfile I/O library (native/bigfile_io.cpp).

When the shared library is present (built via `make -C native`), bulk
block reads/writes use pread/pwrite with a thread pool; otherwise the
pure-Python path in bigfile.py is used.  Formats are identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libbigfile_io.so")
    if not os.path.exists(path):
        # attempt a build (toolchain is available in the image)
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bf_write_block.restype = ctypes.c_int
    lib.bf_write_block.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_void_p]
    lib.bf_read_block.restype = ctypes.c_int
    lib.bf_read_block.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p]
    lib.bf_block_size.restype = ctypes.c_longlong
    lib.bf_block_size.argtypes = [ctypes.c_char_p]
    lib.bf_sysv_checksum.restype = ctypes.c_uint
    lib.bf_sysv_checksum.argtypes = [ctypes.c_void_p,
                                     ctypes.c_longlong]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def write_block(path: str, dtype: str, data: np.ndarray,
                nfile: int = 1) -> bool:
    """Write a full block natively. Returns False if unavailable."""
    lib = _find_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    if data.ndim == 1:
        data = data.reshape(-1, 1)
    nmemb = data.shape[1]
    data = data.astype(dtype, copy=False)
    rc = lib.bf_write_block(path.encode(), dtype.encode(), nmemb,
                            len(data), nfile,
                            data.ctypes.data_as(ctypes.c_void_p))
    return rc == 0


def read_block(path: str, dtype: str, nmemb: int, start: int = 0,
               count: int = -1) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None:
        return None
    if count < 0:
        count = int(lib.bf_block_size(path.encode())) - start
    out = np.empty((count, nmemb), dtype=dtype)
    rc = lib.bf_read_block(path.encode(), dtype.encode(), nmemb,
                           start, count,
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out[:, 0] if nmemb == 1 else out
