r"""CLI to materialize a climatology as a time-indexed forecast-like dataset.

Flag-compatible with the reference scripts/expand_climatology.py: for each
requested time, gather the climatology at (dayofyear[, hour]) — one
vectorized device/host gather instead of a Beam Create→FlatMap pipeline.
"""
from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string(
    "input_path", None, help="path to hourly or daily climatology dataset")
OUTPUT_PATH = flag_utils.DEFINE_string(
    "output_path", None, help="path to save outputs in Zarr format")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2017-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2017-12-31", help="Inclusive stop timestamp")
TIME_CHUNK_SIZE = flag_utils.DEFINE_integer(
    "time_chunk_size", None, help="Output time chunk size.")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def _expand_block(climatology, times: np.ndarray) -> xds.Dataset:
  """Gather the climatology at each time's (dayofyear[, hour])."""
  times_da = xds.DataArray(times, dims=("time",), coords={"time": times})
  sel = dict(dayofyear=times_da.dt.dayofyear)
  if "hour" in climatology.coords_dict():
    sel["hour"] = times_da.dt.hour
  expanded = climatology.sel(sel)
  # dayofyear/hour become non-index coords over time; drop them
  return xds.Dataset(
      dict(expanded.variables_dict()),
      coords={
          k: v
          for k, v in expanded.coords_dict().items()
          if k not in ("dayofyear", "hour")
      },
      attrs=expanded.attrs,
  )


def main(argv):
  climatology = xds.open_zarr(INPUT_PATH.value)

  if "hour" not in climatology.coords_dict():
    hour_delta = 24
  else:
    hours = np.asarray(climatology.coords_dict()["hour"].data)
    hour_delta = int(hours[1] - hours[0]) if len(hours) > 1 else 24

  times = pd.date_range(
      TIME_START.value, TIME_STOP.value,
      freq=hour_delta * pd.Timedelta("1h"),
  ).values

  # the climatology itself is small (366[x hours] steps); the OUTPUT is a
  # full time-indexed dataset, so it streams out block-wise — the
  # Create->FlatMap->Zarr pipeline of the reference
  # (/root/reference/scripts/expand_climatology.py:148-162)
  probe = _expand_block(climatology, times[:1])
  template = xds.template_dataset(
      probe, {"time": len(times)},
      coords={"time": xds.Variable(("time",), times)},
  )
  block = TIME_CHUNK_SIZE.value or xds.stream.default_block(
      template, "time"
  )
  out_chunks = (
      {"time": TIME_CHUNK_SIZE.value} if TIME_CHUNK_SIZE.value else None
  )
  writer = xds.RegionWriter(OUTPUT_PATH.value, template, chunks=out_chunks,
                            stream_chunks={"time": block})
  for window in xds.iter_windows({"time": len(times)}, {"time": block}):
    sl = window.get("time", slice(0, len(times)))
    writer.write(_expand_block(climatology, times[sl]), window)
  writer.finish()


if __name__ == "__main__":
  app.run(main)
