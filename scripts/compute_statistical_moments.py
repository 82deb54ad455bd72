r"""CLI to compute raw statistical moments (dataset validation).

Flag-compatible with the reference scripts/compute_statistical_moments.py:
zeroth (non-NaN fraction), first, and second raw moments over space, then
averaged over time, emitted as ``{var}_{order}`` variables with a singleton
``moment`` dimension.
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
START_YEAR = flag_utils.DEFINE_integer(
    "start_year", None, help="Inclusive start year")
END_YEAR = flag_utils.DEFINE_integer(
    "end_year", None, help="Inclusive end year")
RECHUNK_ITEMSIZE = flag_utils.DEFINE_integer(
    "rechunk_itemsize", 4, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")

ORDERS = ("zeroth", "first", "second")


def moment_reduce(da: xds.DataArray, order: str,
                  reduce_dims) -> xds.DataArray:
  """Raw statistical moment over reduce_dims (zeroth = non-NaN fraction)."""
  vals = np.asarray(da.values, dtype=np.float64)
  axes = tuple(da.dims.index(d) for d in reduce_dims if d in da.dims)
  if order == "zeroth":
    red = (~np.isnan(vals)).mean(axis=axes)
  elif order == "first":
    red = vals.mean(axis=axes)
  elif order == "second":
    red = np.square(vals).mean(axis=axes)
  else:
    raise NotImplementedError(f"Order {order} not implemented.")
  dims = tuple(d for d in da.dims if d not in reduce_dims)
  return xds.DataArray(red, dims=dims)


def main(argv):
  obs = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if START_YEAR.value is not None and END_YEAR.value is not None:
    obs = obs.sel(time=slice(str(START_YEAR.value), str(END_YEAR.value)))

  # stream time blocks; the spatially-reduced moments accumulate into a
  # tiny (per-var, per-level) running time-sum — the replacement for the
  # reference's per-order Beam branches
  # (/root/reference/scripts/compute_statistical_moments.py:149-186)
  n = obs.sizes.get("time", 0)
  block_size = xds.stream.default_block(obs, "time") if n else 0
  acc: dict = {}
  for start in range(0, n, block_size):
    block = obs.isel(time=slice(start, start + block_size))
    for order in ORDERS:
      for name in block.keys():
        spatial = moment_reduce(block[name], order,
                                ("longitude", "latitude"))
        summed = moment_reduce(spatial, "first", ("time",))
        w = spatial.sizes.get("time", 1)
        key = (name, order)
        prev = acc.get(key)
        contrib = (np.asarray(summed.values, dtype=np.float64) * w,
                   w, summed.dims)
        if prev is None:
          acc[key] = list(contrib)
        else:
          prev[0] = prev[0] + contrib[0]
          prev[1] = prev[1] + w

  out = xds.Dataset({}, coords={
      k: v for k, v in obs.coords_dict().items()
      if not (set(v.dims) & {"time", "longitude", "latitude"})
  })
  for order in ORDERS:
    for name in obs.keys():
      total, count, dims = acc[(name, order)]
      temporal = xds.DataArray(total / count, dims=dims)
      out[f"{name}_{order}"] = temporal.expand_dims(moment=1)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
