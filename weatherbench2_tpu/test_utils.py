"""Test helpers: monotonicity asserts and NaN injection.

Parity with /root/reference/weatherbench2/test_utils.py.
"""
import numpy as np

from weatherbench2_tpu import xds


def _values(x):
  if isinstance(x, xds.DataArray):
    return x.values
  return np.asarray(x)


def assert_strictly_increasing(x, axis=-1, err_msg=""):
  values = _values(x)
  if not (np.diff(values, axis=axis) > 0).all():
    raise AssertionError(f"array not strictly increasing: {err_msg}")


def assert_strictly_decreasing(x, axis=-1, err_msg=""):
  values = _values(x)
  if not (np.diff(values, axis=axis) < 0).all():
    raise AssertionError(f"array not strictly decreasing: {err_msg}")


def assert_positive(x, err_msg=""):
  if not (_values(x) > 0).all():
    raise AssertionError(f"array not positive: {err_msg}")


def assert_negative(x, err_msg=""):
  if not (_values(x) < 0).all():
    raise AssertionError(f"array not negative: {err_msg}")


def insert_nan(
    dataset: xds.Dataset, frac_nan: float = 0.1, seed: int = 0
) -> xds.Dataset:
  """Replace a random fraction of each variable's values with NaN."""
  rs = np.random.RandomState(seed)
  new_data = {}
  for k, v in dataset.variables_dict().items():
    values = np.asarray(xds.core._to_numpy(v.data), dtype=np.float64).copy()
    mask = rs.rand(*values.shape) < frac_nan
    values[mask] = np.nan
    new_data[k] = values
  return dataset.copy(data=new_data)
