"""Native (C++) host-side kernels with automatic build + numpy fallback.

``lib()`` returns a ctypes handle to ``libdeepcam_host.so``, compiling it
with g++ -O3 -fopenmp on first use.  All callers must degrade gracefully to
numpy when no compiler is available (see data/dataset.py usage).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _so_path() -> str:
    """Cache path keyed by the SOURCE HASH, not mtime: git checkouts don't
    preserve mtimes, and the binary is -march=native so it must never be
    committed or shared across machines (it could SIGILL elsewhere)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "DEEPCAM_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), f"deepcam_native_{os.getuid()}"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"libdeepcam_host_{digest}.so")


def _build(so: str) -> bool:
    tmp = so + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race safely
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _sanity_check(cdll: ctypes.CDLL) -> bool:
    """Tiny end-to-end call compared against numpy before trusting the lib."""
    import numpy as np

    data = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    shift = np.asarray([1.0, 2.0, 3.0], np.float32)
    scale = np.asarray([2.0, 0.5, 1.0], np.float32)
    out = np.empty_like(data)
    f32p = ctypes.POINTER(ctypes.c_float)
    cdll.normalize_hwc_f32(
        out.ctypes.data_as(f32p), data.ctypes.data_as(f32p),
        shift.ctypes.data_as(f32p), scale.ctypes.data_as(f32p),
        ctypes.c_int64(4), ctypes.c_int64(3),
    )
    want = scale.reshape(1, 1, -1) * (data - shift.reshape(1, 1, -1))
    return bool(np.allclose(out, want))


def lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable (numpy fallback)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        so = _so_path()
        if not os.path.exists(so) and not _build(so):
            _failed = True
            return None
        try:
            cdll = ctypes.CDLL(so)
        except OSError:
            _failed = True
            return None
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        cdll.normalize_hwc_f32.argtypes = [
            c_f32p, c_f32p, c_f32p, c_f32p, ctypes.c_int64, ctypes.c_int64,
        ]
        cdll.select_normalize_hwc_f32.argtypes = [
            c_f32p, c_f32p, c_i32p, c_f32p, c_f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        cdll.narrow_labels_i64_i32.argtypes = [c_i32p, c_i64p, ctypes.c_int64]
        c_u16p = ctypes.POINTER(ctypes.c_uint16)
        cdll.normalize_hwc_f32_to_bf16.argtypes = [
            c_u16p, c_f32p, c_f32p, c_f32p, ctypes.c_int64, ctypes.c_int64,
        ]
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        cdll.assemble_batch.argtypes = [
            c_u8p, ctypes.POINTER(c_u8p), ctypes.c_int64, ctypes.c_int64,
        ]
        if not _sanity_check(cdll):
            _failed = True
            return None
        _lib = cdll
        return _lib


def normalize_hwc(data, shift, scale, out=None):
    """``scale * (data - shift)`` over an (H, W, C) fp32 array, native when
    possible.  ``shift``/``scale`` are (C,) fp32.  Returns the result."""
    import numpy as np

    cdll = lib()
    data = np.ascontiguousarray(data, dtype=np.float32)
    if cdll is None:
        return scale.reshape(1, 1, -1) * (data - shift.reshape(1, 1, -1))
    h, w, c = data.shape
    if out is None:
        out = np.empty_like(data)
    shift = np.ascontiguousarray(shift.reshape(-1), dtype=np.float32)
    scale = np.ascontiguousarray(scale.reshape(-1), dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    cdll.normalize_hwc_f32(
        out.ctypes.data_as(f32p), data.ctypes.data_as(f32p),
        shift.ctypes.data_as(f32p), scale.ctypes.data_as(f32p),
        h * w, c,
    )
    return out


def normalize_hwc_bf16(data, shift, scale):
    """``bf16(scale * (data - shift))`` over an (H, W, C) fp32 array in ONE
    native pass — bit-identical to ``normalize_hwc`` followed by an
    fp32→bf16 round-to-nearest-even cast (the O1 host input cast), without
    the fp32 intermediate.  Falls back to the two-step numpy form."""
    import ml_dtypes
    import numpy as np

    cdll = lib()
    data = np.ascontiguousarray(data, dtype=np.float32)
    if cdll is None:
        out32 = scale.reshape(1, 1, -1) * (data - shift.reshape(1, 1, -1))
        return out32.astype(ml_dtypes.bfloat16)
    h, w, c = data.shape
    out = np.empty((h, w, c), dtype=ml_dtypes.bfloat16)
    shift = np.ascontiguousarray(shift.reshape(-1), dtype=np.float32)
    scale = np.ascontiguousarray(scale.reshape(-1), dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    cdll.normalize_hwc_f32_to_bf16(
        out.ctypes.data_as(u16p), data.ctypes.data_as(f32p),
        shift.ctypes.data_as(f32p), scale.ctypes.data_as(f32p),
        h * w, c,
    )
    return out


def stack_samples(samples):
    """``np.stack(samples)`` with an OpenMP-parallel memcpy fan-in when the
    native lib is available (np.stack copies serially; host batches are
    hundreds of MB).  Samples must be same-shape contiguous arrays."""
    import numpy as np

    cdll = lib()
    if cdll is None or len(samples) < 2:
        return np.stack(samples)
    s0 = samples[0]
    if any(s.shape != s0.shape or s.dtype != s0.dtype
           or not s.flags.c_contiguous for s in samples):
        return np.stack(samples)
    out = np.empty((len(samples),) + s0.shape, dtype=s0.dtype)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * len(samples))(
        *[s.ctypes.data_as(u8p) for s in samples])
    cdll.assemble_batch(
        out.ctypes.data_as(u8p), ptrs, len(samples), s0.nbytes,
    )
    return out
