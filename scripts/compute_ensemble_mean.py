r"""CLI to compute the ensemble mean over the realization dimension.

Flag-compatible with the reference scripts/compute_ensemble_mean.py.
"""
from absl import app
from absl import flags

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

REALIZATION = "realization"

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
REALIZATION_NAME = flag_utils.DEFINE_string(
    "realization_name", REALIZATION,
    "Name of realization/member/number dimension.")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension to slice on.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive stop timestamp")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
VARIABLES = flag_utils.DEFINE_list(
    "variables", None, help="Variables to select (default: all).")
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs in the mean.")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  if TIME_DIM.value in ds.sizes:
    ds = ds.sel({TIME_DIM.value: slice(TIME_START.value, TIME_STOP.value)})
  out = ds.mean(REALIZATION_NAME.value, skipna=SKIPNA.value)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
