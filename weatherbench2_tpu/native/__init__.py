"""Native (C++) host kernels, bound via ctypes.

Builds lazily with g++ on first use; all callers fall back to the numpy
implementations when no compiler/toolchain is available, so the native
tier is a pure acceleration layer.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "weighted_quantile.cc")
_LIB_PATH = os.path.join(_HERE, "_wb2_native.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
  """Compile to a process-unique temp name, then publish atomically.

  Concurrent processes (pytest -n, several CLIs on one checkout) may
  race the build; os.replace makes the .so appear whole or not at all,
  so no reader ever dlopens a torn file.  The library is never shipped
  prebuilt (it is compiled with -march=native and would SIGILL on a
  CPU missing the build host's ISA) — it is gitignored and always
  built on the machine that runs it.
  """
  tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
  try:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-pthread", _SRC, "-o", tmp,
        ],
        check=True,
        capture_output=True,
        timeout=120,
    )
    os.replace(tmp, _LIB_PATH)
    return True
  except Exception:
    try:
      os.unlink(tmp)
    except OSError:
      pass
    return False


def get_lib():
  """Load (building if needed) the native library, or None."""
  global _LIB, _TRIED
  with _LOCK:
    if _LIB is not None or _TRIED:
      return _LIB
    _TRIED = True
    if os.environ.get("WB2_NO_NATIVE") == "1":
      return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
      if not _build():
        return None
    try:
      lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
      return None
    lib.wb2_weighted_quantile.restype = ctypes.c_int
    lib.wb2_weighted_quantile.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def weighted_quantile_native(
    values: np.ndarray,
    q,
    weights: np.ndarray,
    n_threads: int = 0,
):
  """Native weighted quantiles over the last axis, or None if unavailable.

  Args:
    values: (..., n_pool) float array.
    q: scalar or 1-d quantiles.
    weights: (n_pool,) shared weights or values.shape per-pencil weights.
    n_threads: 0 = hardware concurrency.

  Returns:
    (n_q, ...) array or None when the native library can't be used.
  """
  lib = get_lib()
  if lib is None:
    return None
  values = np.ascontiguousarray(values, dtype=np.float64)
  qs = np.ascontiguousarray(np.atleast_1d(q), dtype=np.float64)
  n_pool = values.shape[-1]
  pencil_shape = values.shape[:-1]
  n_pencils = int(np.prod(pencil_shape)) if pencil_shape else 1
  flat = values.reshape(n_pencils, n_pool)

  weights = np.ascontiguousarray(weights, dtype=np.float64)
  if weights.shape == (n_pool,):
    shared = 1
  elif weights.shape == values.shape:
    weights = weights.reshape(n_pencils, n_pool)
    shared = 0
  else:
    return None

  out = np.empty((n_pencils, len(qs)), dtype=np.float64)
  ret = lib.wb2_weighted_quantile(
      flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
      weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
      shared,
      qs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
      n_pencils,
      n_pool,
      len(qs),
      n_threads,
  )
  if ret != 0:
    return None
  return np.moveaxis(out.reshape(pencil_shape + (len(qs),)), -1, 0)
