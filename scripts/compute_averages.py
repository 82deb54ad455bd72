r"""CLI to compute (area-weighted) averages over arbitrary dimensions.

Flag-compatible with the reference scripts/compute_averages.py: when
"latitude" is among --averaging_dims, values are multiplied by normalized
latitude cell-area weights before the mean (reference semantics: weights
have mean 1 over latitude, so mean(w*x) equals the weighted mean).
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import metrics
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
AVERAGING_DIMS = flag_utils.DEFINE_list(
    "averaging_dims", None,
    help="Dims to average over; latitude triggers area weighting. Required.")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension to slice on.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive stop timestamp")
LEVELS = flag_utils.DEFINE_list(
    "levels", None, help="Pressure levels to select (default: all).")
VARIABLES = flag_utils.DEFINE_list(
    "variables", None, help="Variables to include (default: all).")
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs in the mean.")
FANOUT = flag_utils.DEFINE_integer("fanout", None, help="(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")


def _impose_data_selection(ds: xds.Dataset) -> xds.Dataset:
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  sel = {}
  if TIME_DIM.value in ds.sizes:
    sel[TIME_DIM.value] = slice(TIME_START.value, TIME_STOP.value)
  if LEVELS.value and "level" in ds.sizes:
    sel["level"] = [float(l) for l in LEVELS.value]
  return ds.sel(sel) if sel else ds


def main(argv):
  ds = _impose_data_selection(xds.open_zarr(INPUT_PATH.value))
  dims = list(AVERAGING_DIMS.value)
  if "latitude" in dims:
    weights = metrics.get_lat_weights(ds)
    ds = ds.map(lambda da: da * weights if "latitude" in da.dims else da)
  out = ds.mean(dims, skipna=SKIPNA.value)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
