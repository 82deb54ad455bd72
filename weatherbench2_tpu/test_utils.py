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
    dataset: xds.Dataset, frac_nan: float = 0.1, seed: int = 802701
) -> xds.Dataset:
  """Replace a random fraction of each variable's values with NaN.

  Preserves the input dtype (a float64 upcast would silently mask
  float32-specific precision bugs in the NaN fuzz suite) and uses the
  reference's default seed (reference test_utils.py:52-63) so fixtures
  cross-check.
  """
  rs = np.random.RandomState(seed)
  new_data = {}
  for k, v in dataset.variables_dict().items():
    values = np.asarray(xds.core._to_numpy(v.data))
    mask = rs.rand(*values.shape) < frac_nan
    new_data[k] = np.where(mask, np.nan, values)
  return dataset.copy(data=new_data)
