"""ctypes binding for the native (C++) batched stamp decoder.

Loads ``cpp/libbtsbot_native.so`` (build with ``make -C cpp``; auto-built on
first use when a toolchain is available) and exposes
``decode_stamps(blobs) -> (stamps, status)``.  Falls back to the pure-Python
decoder (data.alerts.decode_stamp + pad_stamp) when the library cannot be
built/loaded, so the package works without a compiler.

The native path exists because serving ingest is host-bound: the per-image
Python gzip+FITS path of the reference (alert_utils.py:141-145) tops out
around 10³ cutouts/s/core while one chip scores >10⁵ alerts/s; the batched
multithreaded C++ decoder removes that gap (see tests/test_native_decoder.py
for the parity + throughput harness).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CPP_DIR = os.path.join(_REPO_ROOT, "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libbtsbot_native.so")

_lib = None
_load_attempted = False

STAMP_SIZE = 63
PAD_VALUE = 1e-9


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _CPP_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library():
    """The loaded CDLL, or None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.btsbot_decode_stamps.restype = ctypes.c_int
    lib.btsbot_decode_stamps.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def decode_stamps(
    blobs: list[bytes],
    out_size: int = STAMP_SIZE,
    pad_value: float = PAD_VALUE,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of gzip+FITS stamp blobs.

    Returns (stamps (N, out_size, out_size) float32 — undersized stamps
    padded bottom/right with pad_value, status (N,) int32 — 0 = ok).
    Uses the native decoder when available, the Python fallback otherwise.
    """
    n = len(blobs)
    # zeros, not empty: a failed decode returns early without writing its
    # output plane, which must stay deterministic (not uninitialized memory)
    out = np.zeros((n, out_size, out_size), dtype=np.float32)
    status = np.zeros(n, dtype=np.int32)

    lib = load_library()
    if lib is not None:
        blob_array = (ctypes.c_char_p * n)(*blobs)
        sizes = np.asarray([len(b) for b in blobs], dtype=np.int64)
        lib.btsbot_decode_stamps(
            blob_array,
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out_size, pad_value,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads,
        )
        return out, status

    # Pure-Python fallback
    from .data.alerts import decode_stamp

    for i, blob in enumerate(blobs):
        try:
            stamp = decode_stamp(blob)
            h, w = stamp.shape
            if h > out_size or w > out_size:
                status[i] = 3
                continue
            out[i] = pad_value
            out[i, :h, :w] = stamp
        except Exception:
            status[i] = 2
    return out, status
