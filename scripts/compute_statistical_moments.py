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
  """Raw statistical moment over reduce_dims (zeroth = non-NaN fraction).

  First/second moments skip NaN (the zeroth moment exists precisely to
  quantify NaN coverage, so NaN input is expected; the reference's
  xarray means skip them too)."""
  import warnings

  vals = np.asarray(da.values, dtype=np.float64)
  axes = tuple(da.dims.index(d) for d in reduce_dims if d in da.dims)
  with warnings.catch_warnings():
    warnings.simplefilter("ignore", category=RuntimeWarning)
    if order == "zeroth":
      red = (~np.isnan(vals)).mean(axis=axes)
    elif order == "first":
      red = np.nanmean(vals, axis=axes)
    elif order == "second":
      red = np.nanmean(np.square(vals), axis=axes)
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
  has_time = "time" in obs.sizes
  n = obs.sizes["time"] if has_time else 1
  block_size = xds.stream.default_block(obs, "time") if has_time else 1
  acc: dict = {}
  for start in range(0, n, block_size):
    block = (
        obs.isel(time=slice(start, start + block_size))
        if has_time else obs
    )
    for order in ORDERS:
      for name in block.keys():
        spatial = moment_reduce(block[name], order,
                                ("longitude", "latitude"))
        sv = np.asarray(spatial.values, dtype=np.float64)
        if "time" in spatial.dims:
          tax = spatial.dims.index("time")
          valid = ~np.isnan(sv)
          s = np.where(valid, sv, 0.0).sum(axis=tax)
          c = valid.sum(axis=tax).astype(np.float64)
        else:
          s, c = sv, np.ones_like(sv)
        dims = tuple(d for d in spatial.dims if d != "time")
        key = (name, order)
        prev = acc.get(key)
        if prev is None:
          acc[key] = [s, c, dims]
        else:
          prev[0] = prev[0] + s
          prev[1] = prev[1] + c

  out = xds.Dataset({}, coords={
      k: v for k, v in obs.coords_dict().items()
      if not (set(v.dims) & {"time", "longitude", "latitude"})
  })
  for order in ORDERS:
    for name in obs.keys():
      total, count, dims = acc[(name, order)]
      with np.errstate(invalid="ignore", divide="ignore"):
        temporal = xds.DataArray(total / count, dims=dims)
      out[f"{name}_{order}"] = temporal.expand_dims(moment=1)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
