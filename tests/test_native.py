"""Native (C++) weighted-quantile kernel vs the numpy implementation."""
import numpy as np
import pytest

from weatherbench2_tpu import native, utils


def _numpy_reference(values, q, weights):
  """Force the pure-numpy path by calling with axis != last trick."""
  import os

  os.environ["WB2_NO_NATIVE"] = "1"
  try:
    native._TRIED = False
    native._LIB = None
    return utils.weighted_quantile(values, q, weights, axis=-1)
  finally:
    del os.environ["WB2_NO_NATIVE"]
    native._TRIED = False
    native._LIB = None


def test_native_builds_and_matches_numpy():
  lib = native.get_lib()
  if lib is None:
    pytest.skip("no C++ toolchain available")
  rs = np.random.RandomState(0)
  values = rs.randn(7, 40)
  weights = rs.rand(40) + 0.05
  weights[::7] = 0.0  # zero-weight entries must be dropped
  q = [0.1, 0.5, 2 / 3, 0.95]
  got = native.weighted_quantile_native(values, q, weights)
  want = _numpy_reference(values, q, weights)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_with_nans_and_per_pencil_weights():
  lib = native.get_lib()
  if lib is None:
    pytest.skip("no C++ toolchain available")
  rs = np.random.RandomState(1)
  values = rs.randn(5, 30)
  values[rs.rand(5, 30) < 0.1] = np.nan
  weights = rs.rand(5, 30) + 0.01
  got = native.weighted_quantile_native(values, [0.25, 0.75], weights)
  want = _numpy_reference(values, [0.25, 0.75], weights)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_utils_dispatches_to_native():
  rs = np.random.RandomState(2)
  values = rs.randn(64, 500)
  weights = rs.rand(500)
  got = utils.weighted_quantile(values, [0.5], weights)
  want = _numpy_reference(values, [0.5], weights)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_speedup_on_large_pools():
  lib = native.get_lib()
  if lib is None:
    pytest.skip("no C++ toolchain available")
  import time

  rs = np.random.RandomState(3)
  values = rs.randn(2000, 2 * 366)
  weights = rs.rand(2 * 366)
  # best-of-3 each: a single timing pair flakes under external CPU
  # contention (observed in-round: a concurrent tunnel sweep on the
  # one-core box inverted a single-shot comparison)
  native_t = min(
      _timed(time, native.weighted_quantile_native, values, [0.5, 0.9],
             weights)
      for _ in range(3))
  numpy_t = min(
      _timed(time, _numpy_reference, values, [0.5, 0.9], weights)
      for _ in range(3))
  # multithreaded C++ should beat the per-pencil Python interp loop
  assert native_t < numpy_t, (native_t, numpy_t)


def _timed(time, fn, *args):
  t0 = time.perf_counter()
  fn(*args)
  return time.perf_counter() - t0
