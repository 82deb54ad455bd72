r"""CLI to compute the ensemble mean over the realization dimension.

Flag-compatible with the reference scripts/compute_ensemble_mean.py
(xbeam.Mean over REALIZATION, /root/reference/scripts/compute_ensemble_mean.py:125-141);
time blocks stream through the reduction into a zarr template with
region writes, so 50-member TB-scale ensembles process with bounded
host memory.
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
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  if TIME_DIM.value in ds.sizes:
    ds = ds.sel({TIME_DIM.value: slice(TIME_START.value, TIME_STOP.value)})

  realization = REALIZATION_NAME.value
  time_dim = TIME_DIM.value
  reduce = lambda block: block.mean(realization, skipna=SKIPNA.value)

  if time_dim not in ds.sizes:
    xds.to_zarr(reduce(ds), OUTPUT_PATH.value)
    return

  stream_chunks = {time_dim: xds.stream.default_block(ds, time_dim)}
  probe = reduce(ds.isel({time_dim: slice(0, 1)}))
  coords = {
      k: v for k, v in ds.coords_dict().items()
      if time_dim in v.dims and realization not in v.dims
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
