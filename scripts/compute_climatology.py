r"""CLI to compute and save a climatology (day-of-year [x hour-of-day]).

Flag-compatible with the reference scripts/compute_climatology.py
(statistics mean/std/quantile/seeps, explicit vs fast method, triangular
rolling window), re-implemented without Beam: spatial tiles stream through
dense windowed reductions (utils.compute_hourly_stat/compute_daily_stat)
and are written region-wise into a NaN-filled zarr template — the same
idempotent template+chunk-write output model as the reference pipelines.

Example:
  python scripts/compute_climatology.py \
    --input_path=/data/era5_64x32.zarr \
    --output_path=/data/climatology.zarr \
    --frequency=hourly --hour_interval=6 \
    --statistics=mean,std
"""
import ast

from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

DEFAULT_SEEPS_THRESHOLD_MM = (
    "{'total_precipitation_24hr':0.25, 'total_precipitation_6hr':0.1}"
)

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
FREQUENCY = flag_utils.DEFINE_string(
    "frequency", "hourly",
    '"hourly": per day-of-year and hour-of-day; "daily": per day-of-year.',
)
HOUR_INTERVAL = flag_utils.DEFINE_integer(
    "hour_interval", 1, help="Hour-of-day interval for hourly climatology.")
WINDOW_SIZE = flag_utils.DEFINE_integer(
    "window_size", 61, help="Window size in days to average over.")
START_YEAR = flag_utils.DEFINE_integer(
    "start_year", 1990, help="Inclusive start year of climatology")
END_YEAR = flag_utils.DEFINE_integer(
    "end_year", 2020, help="Inclusive end year of climatology")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "",
    help='Spatial tile sizes for streaming, e.g. "longitude=32,latitude=32".',
)
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunk sizes for the output store.")
RECHUNK_ITEMSIZE = flag_utils.DEFINE_integer(
    "rechunk_itemsize", 4, help="(accepted for compatibility; unused)")
STATISTICS = flag_utils.DEFINE_list(
    "statistics", ["mean"],
    help='Statistics from "mean", "std", "seeps", "quantile".')
QUANTILES = flag_utils.DEFINE_list("quantiles", [], "Quantiles to compute.")
METHOD = flag_utils.DEFINE_string(
    "method", "explicit",
    '"explicit" (windowed weighted stat over stacked years) or "fast" '
    "(stat per day-of-year, then weighted smoothing).",
)
SEEPS_DRY_THRESHOLD_MM = flag_utils.DEFINE_string(
    "seeps_dry_threshold_mm", DEFAULT_SEEPS_THRESHOLD_MM,
    help="Dict of per-variable dry thresholds (mm) for SEEPS.")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
USE_DEVICE = flag_utils.DEFINE_bool(
    "use_device", False,
    "Compute mean/std/quantile statistics on the accelerator (circulant "
    "matmul windows + device sorts) instead of host numpy.")


class Quantile:
  """Weighted interpolated quantiles over the stacked (window, year) dims."""

  def __init__(self, quantiles):
    self.quantiles = [float(q) for q in quantiles]

  def compute(self, ds: xds.Dataset, dim, weights=None):
    out = xds.Dataset({}, coords={
        k: v for k, v in ds.coords_dict().items()
        if not (set(v.dims) & set(dim))
    })
    w = np.asarray(weights.values) if weights is not None else None
    for name in ds.keys():
      da = ds[name]
      axes = tuple(da.dims.index(d) for d in dim if d in da.dims)
      vals = np.asarray(da.values, dtype=np.float64)
      # flatten the reduced dims into one axis at the end
      keep = [i for i in range(vals.ndim) if i not in axes]
      vals2 = np.transpose(vals, keep + list(axes))
      flat = vals2.reshape(vals2.shape[: len(keep)] + (-1,))
      if w is not None:
        # weights apply along 'window'; broadcast over remaining dims
        wshape = [da.shape[ax] for ax in axes]
        widx = [d for d in dim if d in da.dims].index("window")
        wfull = np.ones(wshape)
        expand = [1] * len(wshape)
        expand[widx] = len(w)
        wfull = wfull * w.reshape(expand)
        wflat = wfull.reshape(-1)
      else:
        wflat = np.ones(flat.shape[-1])
      qvals = utils.weighted_quantile(flat, self.quantiles, wflat, axis=-1)
      dims = ("quantile",) + tuple(
          d for d in da.dims if d not in dim
      )
      out[name] = xds.DataArray(qvals, dims=dims)
    out = out.assign_coords(quantile=np.asarray(self.quantiles))
    return out


class SEEPSThreshold:
  """SEEPS wet threshold (weighted q=2/3 of non-dry) and dry fraction."""

  def __init__(self, dry_threshold_mm: float, var: str):
    self.dry_threshold_m = dry_threshold_mm / 1000.0
    self.var = var

  def compute(self, ds: xds.Dataset, dim, weights=None):
    da = ds[self.var]
    vals = np.asarray(da.values, dtype=np.float64)
    axes = tuple(da.dims.index(d) for d in dim if d in da.dims)
    is_dry = vals < self.dry_threshold_m
    dry_fraction = is_dry.mean(axis=axes)
    not_dry = np.where(is_dry, np.nan, vals)

    keep = [i for i in range(vals.ndim) if i not in axes]
    nd2 = np.transpose(not_dry, keep + list(axes))
    flat = nd2.reshape(nd2.shape[: len(keep)] + (-1,))
    if weights is not None:
      w = np.asarray(weights.values)
      wshape = [da.shape[ax] for ax in axes]
      widx = [d for d in dim if d in da.dims].index("window")
      expand = [1] * len(wshape)
      expand[widx] = len(w)
      wflat = (np.ones(wshape) * w.reshape(expand)).reshape(-1)
    else:
      wflat = np.ones(flat.shape[-1])
    wet_threshold = utils.weighted_quantile(flat, 2 / 3, wflat, axis=-1)[0]

    dims = tuple(d for d in da.dims if d not in dim)
    coords = {
        k: v for k, v in ds.coords_dict().items()
        if set(v.dims) <= set(dims)
    }
    return xds.Dataset(
        {
            f"{self.var}_seeps_threshold": xds.Variable(dims, wet_threshold),
            f"{self.var}_seeps_dry_fraction": xds.Variable(
                dims, dry_fraction
            ),
        },
        coords=coords,
    )


def _stack_years(obs: xds.Dataset, name: str) -> np.ndarray:
  """(year, 366, *pixels) array with day 366 filled from day 365."""
  years = np.unique(obs["time"].dt.year.values)
  all_doys = np.arange(1, 367)
  per_year = [
      utils.reindex_with_nan(
          utils.replace_time_with_doy(obs.sel(time=str(y))),
          "dayofyear",
          all_doys,
      )[name].values
      for y in years
  ]
  stacked = np.stack(per_year).astype(np.float32)
  gap = np.isnan(stacked[:, 365])
  stacked[:, 365] = np.where(gap, stacked[:, 364], stacked[:, 365])
  return stacked


def _compute_stat_device(obs_tile: xds.Dataset, statistic, quantiles):
  """Device (TPU) path for mean/std/quantile, mirroring the host output."""
  from weatherbench2_tpu.ops import climatology as dev_clim

  clim_years = slice(str(START_YEAR.value), str(END_YEAR.value))
  window_weights = utils.create_window_weights(WINDOW_SIZE.value)

  if FREQUENCY.value == "hourly":
    hours = np.arange(0, 24, HOUR_INTERVAL.value)
    subsets = [
        utils.select_hour(obs_tile.sel(time=clim_years), int(h))
        for h in hours
    ]
  else:
    hours = None
    subsets = [utils.resample_daily_mean(obs_tile.sel(time=clim_years))]

  out = xds.Dataset({}, coords={
      k: v
      for k, v in obs_tile.coords_dict().items()
      if "time" not in v.dims
  })
  for name in obs_tile.keys():
    per_hour = []
    for sub in subsets:
      stacked = _stack_years(sub, name)
      if statistic == "quantile":
        res = dev_clim.device_window_quantile(
            stacked, WINDOW_SIZE.value, quantiles,
            window_weights=window_weights.values,
        )
      else:
        res = dev_clim.device_rolling_clim(
            stacked, window_weights.values, statistic
        )
      per_hour.append(np.asarray(res))
    rest_dims = tuple(
        d for d in obs_tile[name].dims if d != "time"
    )
    if statistic == "quantile":
      if hours is not None:
        data = np.stack(per_hour, axis=1)  # (Q, hour, doy, ...)
        dims = ("quantile", "hour", "dayofyear") + rest_dims
      else:
        data = per_hour[0]
        dims = ("quantile", "dayofyear") + rest_dims
    else:
      if hours is not None:
        data = np.stack(per_hour, axis=0)  # (hour, doy, ...)
        dims = ("hour", "dayofyear") + rest_dims
      else:
        data = per_hour[0]
        dims = ("dayofyear",) + rest_dims
    out[name] = xds.Variable(dims, data)
  out = out.assign_coords(dayofyear=np.arange(1, 367))
  if hours is not None:
    out = out.assign_coords(hour=hours)
  if statistic == "quantile":
    out = out.assign_coords(quantile=np.asarray(quantiles, dtype=float))
  return out


def _compute_stat(obs_tile: xds.Dataset, statistic, quantiles):
  """Dispatch one statistic on one spatial tile."""
  if USE_DEVICE.value and statistic in ("mean", "std", "quantile"):
    if METHOD.value != "explicit":
      raise NotImplementedError("--use_device requires --method=explicit")
    return _compute_stat_device(obs_tile, statistic, quantiles)
  clim_years = slice(str(START_YEAR.value), str(END_YEAR.value))
  kwargs = dict(
      obs=obs_tile,
      window_size=WINDOW_SIZE.value,
      clim_years=clim_years,
  )
  stat_fn = statistic
  if statistic == "quantile":
    stat_fn = Quantile(quantiles).compute
  if FREQUENCY.value == "hourly":
    if METHOD.value == "explicit" or callable(stat_fn):
      return utils.compute_hourly_stat(
          **kwargs, hour_interval=HOUR_INTERVAL.value, stat_fn=stat_fn
      )
    return utils.compute_hourly_stat_fast(
        **kwargs, hour_interval=HOUR_INTERVAL.value, stat_fn=stat_fn
    )
  elif FREQUENCY.value == "daily":
    if METHOD.value == "explicit" or callable(stat_fn):
      return utils.compute_daily_stat(**kwargs, stat_fn=stat_fn)
    return utils.compute_daily_stat_fast(**kwargs, stat_fn=stat_fn)
  raise NotImplementedError(f"frequency {FREQUENCY.value} not implemented.")


def _compute_seeps(obs_tile: xds.Dataset, var: str, threshold_mm: float):
  clim_years = slice(str(START_YEAR.value), str(END_YEAR.value))
  stat_fn = SEEPSThreshold(threshold_mm, var=var).compute
  if METHOD.value != "explicit":
    raise NotImplementedError("SEEPS only tested for explicit.")
  if FREQUENCY.value == "hourly":
    return utils.compute_hourly_stat(
        obs=obs_tile,
        window_size=WINDOW_SIZE.value,
        clim_years=clim_years,
        hour_interval=HOUR_INTERVAL.value,
        stat_fn=stat_fn,
    )
  return utils.compute_daily_stat(
      obs=obs_tile,
      window_size=WINDOW_SIZE.value,
      clim_years=clim_years,
      stat_fn=stat_fn,
  )


def _tile_slices(sizes, tile_spec):
  """Cartesian product of slices over the tiled dims."""
  dims = [d for d in tile_spec if d in sizes and tile_spec[d] not in (-1,)]
  if not dims:
    yield {}
    return

  def rec(i):
    if i == len(dims):
      yield {}
      return
    d = dims[i]
    size = tile_spec[d]
    for start in range(0, sizes[d], size):
      sl = slice(start, min(start + size, sizes[d]))
      for rest in rec(i + 1):
        yield {d: sl, **rest}

  yield from rec(0)


def main(argv) -> None:
  obs = xds.open_zarr(INPUT_PATH.value, lazy=True)
  # drop static variables (no time dimension)
  static = [
      k for k, v in obs.variables_dict().items() if "time" not in v.dims
  ]
  if static:
    obs = obs.drop_vars(static)

  quantiles = [float(q) for q in QUANTILES.value]
  seeps_dry_threshold_mm = ast.literal_eval(SEEPS_DRY_THRESHOLD_MM.value)
  raw_vars = list(obs.keys())

  # Run one tiny tile to determine the output template structure.
  tile_spec = dict(WORKING_CHUNKS.value)
  if "time" in tile_spec:
    # a time tile would compute a partial-period climatology and
    # overwrite the full output region per tile (the reference raises
    # the same way, reference compute_climatology.py:295-296)
    raise ValueError("cannot include 'time' in --working_chunks")
  sizes = obs.sizes
  probe = obs.isel(
      longitude=slice(0, 1), latitude=slice(0, 1)
  )
  pieces = []
  for stat in STATISTICS.value:
    if stat == "seeps":
      for var, thr in seeps_dry_threshold_mm.items():
        if var in obs:
          pieces.append(_compute_seeps(probe, var, thr))
    else:
      res = _compute_stat(probe, stat, quantiles)
      if stat != "mean":
        res = res.rename({v: f"{v}_{stat}" for v in res.keys()})
      pieces.append(res)
  probe_out = xds.merge(pieces)

  # Template over the full spatial domain (shape stubs — no allocation)
  template_vars = {}
  for name, v in probe_out.variables_dict().items():
    tsizes = {
        d: sizes[d] if d in ("longitude", "latitude") else v.sizes[d]
        for d in v.dims
    }
    template_vars[name] = xds.stub_variable(v.dims, tsizes, np.float32)
  coords = {
      k: v
      for k, v in probe_out.coords_dict().items()
      if k not in ("longitude", "latitude")
  }
  coords["longitude"] = obs.coords_dict()["longitude"]
  coords["latitude"] = obs.coords_dict()["latitude"]
  template = xds.Dataset(template_vars, coords=coords)
  out_chunks = dict(OUTPUT_CHUNKS.value)
  xds.create_zarr_template(template, OUTPUT_PATH.value, chunks=out_chunks)

  # Stream spatial tiles
  futures = []
  for tile in _tile_slices(sizes, tile_spec or
                           {"longitude": sizes["longitude"]}):
    obs_tile = obs.isel(tile) if tile else obs
    for stat in STATISTICS.value:
      if stat == "seeps":
        results = [
            _compute_seeps(obs_tile, var, thr)
            for var, thr in seeps_dry_threshold_mm.items()
            if var in obs
        ]
      else:
        res = _compute_stat(obs_tile, stat, quantiles)
        if stat != "mean":
          res = res.rename({v: f"{v}_{stat}" for v in res.keys()})
        results = [res]
      for res in results:
        for name in res.keys():
          da = res[name]
          tvar = template.variables_dict()[name]
          da = da.transpose(*tvar.dims) if da.dims != tvar.dims else da
          key = tuple(
              tile.get(d, slice(None)) for d in tvar.dims
          )
          futures.append(
              xds.write_zarr_region(
                  OUTPUT_PATH.value, name, key,
                  np.asarray(da.values, dtype=np.float32),
              )
          )
  for f in futures:
    f.result()


if __name__ == "__main__":
  app.run(main)
