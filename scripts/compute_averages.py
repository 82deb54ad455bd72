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
  ds = _impose_data_selection(xds.open_zarr(INPUT_PATH.value, lazy=True))
  dims = list(AVERAGING_DIMS.value)
  weights = metrics.get_lat_weights(ds) if "latitude" in dims else None

  def reduce(block):
    if weights is not None:
      block = block.map(
          lambda da: da * weights if "latitude" in da.dims else da
      )
    return block.mean(dims, skipna=SKIPNA.value)

  time_dim = TIME_DIM.value
  if time_dim not in ds.sizes:
    xds.to_zarr(reduce(ds), OUTPUT_PATH.value)
    return

  if time_dim in dims:
    # reducing over time itself: stream time blocks through running
    # (sum, count) accumulators — the xbeam.Mean-with-fanout analogue
    # (/root/reference/scripts/compute_averages.py:155-166)
    # Variables without the time dim must NOT ride the block loop: a
    # block sum leaves them unchanged, so the accumulator would add them
    # once per block. Reduce them once up front instead.
    static_vars = [k for k in ds.keys() if time_dim not in ds[k].dims]
    static_out = None
    if static_vars:
      static_out = reduce(ds.drop_vars(
          [k for k in ds.keys() if time_dim in ds[k].dims]
      ))
      ds = ds.drop_vars(static_vars)
    block_size = xds.stream.default_block(ds, time_dim)
    n = ds.sizes[time_dim]
    total = None
    count = None
    for start in range(0, n, block_size):
      block = ds.isel({time_dim: slice(start, start + block_size)})
      if weights is not None:
        block = block.map(
            lambda da: da * weights if "latitude" in da.dims else da
        )
      s = block.sum(dims, skipna=SKIPNA.value)
      total = s if total is None else total + s
      if SKIPNA.value:
        c = block.notnull().astype(np.float64).sum(dims)
        count = c if count is None else count + c
    if SKIPNA.value:
      out = total / count
    else:
      out = total.copy()
      for name in total.keys():
        denom = float(np.prod(
            [ds.sizes[d] for d in dims if d in ds[name].dims]
        ))
        out[name] = total[name] / denom
    if static_out is not None:
      for name in static_out.keys():
        out[name] = static_out[name]
    xds.to_zarr(out, OUTPUT_PATH.value)
    return

  stream_chunks = {time_dim: xds.stream.default_block(ds, time_dim)}
  probe = reduce(ds.isel({time_dim: slice(0, 1)}))
  coords = {
      k: v for k, v in ds.coords_dict().items()
      if time_dim in v.dims and not (set(v.dims) & set(dims))
  }
  template = xds.template_dataset(
      probe, {time_dim: ds.sizes[time_dim]}, coords=coords
  )
  writer = xds.RegionWriter(OUTPUT_PATH.value, template,
                            stream_chunks=stream_chunks)
  for window in xds.iter_windows(template.sizes, stream_chunks):
    writer.write(reduce(ds.isel(window)), window)
  writer.finish()


if __name__ == "__main__":
  app.run(main)
