r"""CLI for daily/weekly resampling (older variant of resample_in_time).

Flag-compatible with the reference scripts/resample_daily.py, including the
special handling for accumulative precipitation: a -1h shift before the
daily sum so each day covers the accumulation of its own 24 hours.
"""
from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

DAILY_ACCUMULATIVE_VARS = ("total_precipitation_24hr",)

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
BEAM_RUNNER = flag_utils.DEFINE_string("beam_runner", None, help="(ignored)")
METHOD = flag_utils.DEFINE_string(
    "method", "resample", help='"resample" or "roll".')
PERIOD = flag_utils.DEFINE_string("period", "1d", help="int + d or w")
STATISTICS = flag_utils.DEFINE_list(
    "statistics", ["mean"], help='From "mean", "min", "max".')
ADD_STATISTIC_SUFFIX = flag_utils.DEFINE_bool(
    "add_statistic_suffix", False,
    "Add statistic suffix to variable names (required for >1 statistic).")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
START_YEAR = flag_utils.DEFINE_integer(
    "start_year", None, help="Start year (inclusive).")
END_YEAR = flag_utils.DEFINE_integer(
    "end_year", None, help="End year (inclusive).")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "", help="(accepted for compatibility; unused)")


def _shift_time(ds: xds.Dataset, delta) -> xds.Dataset:
  times = np.asarray(ds.coords_dict()["time"].data)
  return ds.assign_coords(time=times + delta)


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
  if START_YEAR.value is not None and END_YEAR.value is not None:
    ds = ds.sel(time=slice(str(START_YEAR.value), str(END_YEAR.value)))

  if len(STATISTICS.value) > 1 and not ADD_STATISTIC_SUFFIX.value:
    raise ValueError(
        "add_statistic_suffix is required for multiple statistics."
    )

  period = PERIOD.value
  pieces = []
  for statistic in STATISTICS.value:
    if METHOD.value == "roll":
      rolling_window = 7 * int(period[:-1])
      res = utils.rolling_in_time(ds, rolling_window, statistic)
      res = _shift_time(res, -np.timedelta64(rolling_window - 1, "D"))
    else:
      accum = [v for v in ds.keys() if v in DAILY_ACCUMULATIVE_VARS]
      normal = [v for v in ds.keys() if v not in DAILY_ACCUMULATIVE_VARS]
      parts = []
      if normal:
        parts.append(
            utils.resample_in_time(
                ds[normal], pd.to_timedelta(utils.normalize_timedelta_str(period)), statistic
            )
        )
      if accum:
        shifted = _shift_time(ds[accum], -np.timedelta64(1, "h"))
        summed = utils.resample_in_time(
            shifted, pd.to_timedelta(utils.normalize_timedelta_str(period)), "sum"
        )
        parts.append(summed)
      res = xds.merge(parts)
    if ADD_STATISTIC_SUFFIX.value and statistic in ("min", "max"):
      res = res.rename({v: f"{v}_{statistic}" for v in res.keys()})
    pieces.append(res)

  xds.to_zarr(xds.merge(pieces), OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
