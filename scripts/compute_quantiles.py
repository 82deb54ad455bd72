r"""CLI to compute quantiles over arbitrary dimensions.

Flag-compatible with the reference scripts/compute_quantiles.py: adds a
``quantile`` dimension; with ``--name_suffix=_quantile`` the output is
usable as climatology input for thresholded metrics.  Quantiles run as
device sorts per pencil when payloads are jax; host numpy otherwise.
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Path to input zarr")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Path to output zarr")
QUANTILES = flag_utils.DEFINE_list(
    "quantiles", None, help="Quantiles in [0, 1].")
DIM = flag_utils.DEFINE_list(
    "dim", [], help="Dimensions to reduce over.")
NAME_SUFFIX = flag_utils.DEFINE_string(
    "name_suffix", "", help='Suffix for variable names (e.g. "_quantile").')
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs when computing quantiles.")
LEVELS = flag_utils.DEFINE_list(
    "levels", None, help="Pressure levels to select (default: all).")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Time dimension name for slicing.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive stop timestamp")
VARIABLES = flag_utils.DEFINE_list(
    "variables", None, help="Variables to include (default: all).")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "", help="(accepted for compatibility; unused)")
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunking of the output store.")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  sel = {}
  if TIME_DIM.value in ds.sizes:
    sel[TIME_DIM.value] = slice(TIME_START.value, TIME_STOP.value)
  if LEVELS.value and "level" in ds.sizes:
    sel["level"] = [float(l) for l in LEVELS.value]
  if sel:
    ds = ds.sel(sel)

  quantiles = [float(q) for q in QUANTILES.value]
  out = ds.quantile(quantiles, dim=list(DIM.value), skipna=SKIPNA.value)
  if NAME_SUFFIX.value:
    out = out.rename(
        {v: f"{v}{NAME_SUFFIX.value}" for v in out.keys()}
    )
  xds.to_zarr(out, OUTPUT_PATH.value, chunks=dict(OUTPUT_CHUNKS.value))


if __name__ == "__main__":
  app.run(main)
