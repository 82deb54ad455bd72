r"""CLI to resample or rolling-aggregate a dataset in time.

Flag-compatible with the reference scripts/resample_in_time.py: per-variable
statistic lists (mean/min/max/sum, "ALL" sentinel), resample vs rolling
methods, left/right labels; implemented as dense binned/windowed reductions
(weatherbench2_tpu.utils.resample_in_time / rolling_in_time).
"""
from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

_ALL = "ALL"

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
RUNNER = flag_utils.DEFINE_string("runner", None, help="(ignored)")
METHOD = flag_utils.DEFINE_string(
    "method", "resample", help='"resample" or "rolling".')
PERIOD = flag_utils.DEFINE_string(
    "period", "1d", help='pandas.Timedelta string, e.g. "1d" or "1w".')
MEAN_VARS = flag_utils.DEFINE_list(
    "mean_vars", [], help='Variables to mean ("ALL" for all).')
MIN_VARS = flag_utils.DEFINE_list(
    "min_vars", [], help='Variables to min ("ALL" for all).')
MAX_VARS = flag_utils.DEFINE_list(
    "max_vars", [], help='Variables to max ("ALL" for all).')
SUM_VARS = flag_utils.DEFINE_list(
    "sum_vars", [], help='Variables to sum ("ALL" for all).')
ADD_MEAN_SUFFIX = flag_utils.DEFINE_bool(
    "add_mean_suffix", False, 'Add "_mean" suffix to mean variables.')
LABEL_SIDE = flag_utils.DEFINE_string(
    "label_side", "left",
    help='"left": window [T, T+period) labelled T; "right": (T-period, T].')
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", None, help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", None, help="Inclusive stop timestamp")
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs in statistics.")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "", help="(accepted for compatibility; unused)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")


def _expand_all(list_of_vars, ds):
  if list_of_vars == [_ALL]:
    return [
        str(k)
        for k, v in ds.variables_dict().items()
        if TIME_DIM.value in v.dims
    ]
  if _ALL in list_of_vars:
    raise ValueError(
        f"Cannot specify both {_ALL} and other variables: {list_of_vars}"
    )
  return list(list_of_vars)


def resample_in_time_core(ds, method, period, statistic, skipna):
  """Resample or rolling-window one statistic (reference semantics)."""
  if method == "rolling":
    times = np.asarray(ds.coords_dict()[TIME_DIM.value].data)
    delta_t = pd.to_timedelta(np.diff(times[:2])[0])
    if period % delta_t:
      raise ValueError(
          f"{delta_t=} between times did not evenly divide {period=}"
      )
    return utils.rolling_in_time(
        ds, period // delta_t, statistic, skipna=skipna,
        time_dim=TIME_DIM.value,
    )
  elif method == "resample":
    return utils.resample_in_time(
        ds, period, statistic, label=LABEL_SIDE.value, skipna=skipna,
        time_dim=TIME_DIM.value,
    )
  raise ValueError(f"Unhandled {method=}")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
  period = pd.to_timedelta(utils.normalize_timedelta_str(PERIOD.value))
  if TIME_START.value is not None or TIME_STOP.value is not None:
    ds = ds.sel({TIME_DIM.value: slice(TIME_START.value, TIME_STOP.value)})

  mean_vars = _expand_all(MEAN_VARS.value, ds)
  min_vars = _expand_all(MIN_VARS.value, ds)
  max_vars = _expand_all(MAX_VARS.value, ds)
  sum_vars = _expand_all(SUM_VARS.value, ds)

  keep = sorted(set(mean_vars) | set(min_vars) | set(max_vars) |
                set(sum_vars))
  ds = ds[[v for v in keep if v in ds]]

  pieces = []
  for stat, var_list, suffix in [
      ("mean", mean_vars, "_mean" if ADD_MEAN_SUFFIX.value else ""),
      ("min", min_vars, "_min"),
      ("max", max_vars, "_max"),
      ("sum", sum_vars, "_sum"),
  ]:
    present = [v for v in var_list if v in ds]
    if not present:
      continue
    res = resample_in_time_core(
        ds[present], METHOD.value, period, stat, SKIPNA.value
    )
    if suffix:
      res = res.rename({v: f"{v}{suffix}" for v in present})
    pieces.append(res)

  out = xds.merge(pieces)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
