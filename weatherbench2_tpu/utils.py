"""Climatology statistics and helpers.

API parity with the reference's weatherbench2/utils.py
(/root/reference/weatherbench2/utils.py:31-350): rolling-window
day-of-year/hour-of-day climatologies (mean/std/custom), probabilistic
climatology (years as ensemble members), seeded random data, and a
dataset-keyed LRU cache.

TPU-first implementation notes: instead of xarray's stack-years →
pad(wrap) → rolling().construct() chain, the rolling statistics here are
computed as dense windowed reductions over a (year, dayofyear, ...) array —
a form that maps directly onto an XLA reduce-window / weighted matmul and is
equally valid on numpy for host-side tests.
"""
import functools
from typing import Callable, Union
import warnings

import numpy as np
import pandas as pd

from weatherbench2_tpu import xds


def open_nc(filename: str) -> xds.Dataset:
  """Open a NetCDF file from the filesystem."""
  return xds.open_netcdf(filename)


def replace_time_with_doy(ds: xds.Dataset) -> xds.Dataset:
  """Replace time coordinate with days of year."""
  doy = ds["time"].dt.dayofyear.values
  ds = ds.assign_coords(time=doy)
  return ds.rename({"time": "dayofyear"})


def select_hour(ds: xds.Dataset, hour: int) -> xds.Dataset:
  """Select a given hour of day from a Dataset."""
  hours = ds["time"].dt.hour.values
  ds = ds.isel(time=np.nonzero(hours == hour)[0])
  time = ds.coords_dict()["time"].data
  return ds.assign_coords(time=time.astype("datetime64[D]").astype(
      "datetime64[ns]"
  ))


def reindex_with_nan(ds: xds.Dataset, dim: str,
                     new_labels: np.ndarray) -> xds.Dataset:
  """Reindex `dim` onto new_labels, filling missing labels with NaN."""
  new_labels = np.asarray(new_labels)
  old = np.asarray(ds.coords_dict()[dim].data)
  pos = {v: i for i, v in enumerate(old.tolist())}
  idx = np.array([pos.get(v, -1) for v in new_labels.tolist()])
  sel = ds.isel({dim: np.where(idx >= 0, idx, 0)})
  if (idx >= 0).all():
    return sel.assign_coords({dim: new_labels})
  bad = idx < 0
  filled = {}
  for name in sel.keys():
    da = sel[name]
    if dim not in da.dims:
      continue
    ax = da.dims.index(dim)
    vals = np.asarray(da.values, dtype=np.float64).copy()
    key = [slice(None)] * vals.ndim
    key[ax] = bad
    vals[tuple(key)] = np.nan
    filled[name] = vals
  sel = sel.copy(data=filled)
  return sel.assign_coords({dim: new_labels})


def make_probabilistic_climatology(
    ds: xds.Dataset, start_year: int, end_year: int, hour_interval: int
) -> xds.Dataset:
  """Stack years as an ensemble. Day 366 only has data for leap years."""
  hours = np.arange(0, 24, hour_interval)
  years = np.arange(start_year, end_year + 1)
  out = []
  for hour in hours:
    datasets = []
    for year in years:
      tmp = select_hour(ds, int(hour)).sel(time=str(year))
      doy = tmp["time"].dt.dayofyear.values
      tmp = tmp.assign_coords(dayofyear=xds.Variable(("time",), doy))
      tmp = tmp.swap_dims({"time": "dayofyear"})
      tmp = tmp.drop_vars(
          [n for n in ("time",) if n in tmp.coords_dict()], errors="ignore"
      )
      datasets.append(tmp)
    # pad all years to a common dayofyear axis (leap years have day 366)
    all_doys = np.array(sorted(
        set(np.concatenate([
            d.coords_dict()["dayofyear"].data for d in datasets
        ]).tolist())
    ))
    padded = [reindex_with_nan(d, "dayofyear", all_doys) for d in datasets]
    ds_per_hour = xds.concat(
        [p.expand_dims(number=[i]) for i, p in enumerate(padded)], "number"
    )
    out.append(ds_per_hour)
  out = xds.concat([o.expand_dims(hour=[h]) for o, h in zip(out, hours)],
                   "hour")
  return out


def create_window_weights(window_size: int) -> xds.DataArray:
  """Create linearly decaying (triangular) window weights."""
  assert window_size % 2 == 1, "Window size must be odd."
  half_window_size = window_size // 2
  window_weights = np.concatenate(
      [
          np.linspace(0, 1, half_window_size + 1),
          np.linspace(1, 0, half_window_size + 1)[1:],
      ]
  )
  window_weights = window_weights / window_weights.mean()
  return xds.DataArray(window_weights, dims=("window",))


def _windowed_stack(values: np.ndarray, axis: int, window: int) -> np.ndarray:
  """Stack circular rolling windows; the window axis is appended LAST."""
  half = window // 2
  n = values.shape[axis]
  idx = (np.arange(n)[:, None] + np.arange(-half, half + 1)[None, :]) % n
  out = np.take(values, idx, axis=axis)  # window axis lands at axis+1
  return np.moveaxis(out, axis + 1, -1)


def weighted_quantile(
    values: np.ndarray,
    q,
    weights: np.ndarray,
    axis: int = -1,
    skipna: bool = True,
) -> np.ndarray:
  """Interpolated weighted quantile along one axis.

  Uses the standard weighted-percentile estimator: sort values, form the
  normalized cumulative-weight positions p_k = (cumw_k - w_k/2) / W, and
  linearly interpolate the quantile q over (p_k, v_k).  Reduces to a
  midpoint-interpolated quantile for equal weights; NaNs carry zero weight
  when skipna.  Dispatches to the multithreaded native kernel
  (weatherbench2_tpu.native) when available.
  """
  if skipna and axis in (-1, np.ndim(values) - 1):
    from weatherbench2_tpu import native

    fast = native.weighted_quantile_native(values, q, weights)
    if fast is not None:
      return fast
  q = np.atleast_1d(np.asarray(q, dtype=np.float64))
  values_arr = np.asarray(values, dtype=np.float64)
  weights_arr = np.asarray(weights, dtype=np.float64)
  if weights_arr.ndim == values_arr.ndim:
    # full-shape weights must follow the same axis move as the values
    # (broadcasting a transposed weight array can silently misalign)
    weights_arr = np.moveaxis(weights_arr, axis, -1)
  values = np.moveaxis(values_arr, axis, -1)
  w = np.broadcast_to(weights_arr, values.shape).copy()
  if skipna:
    nan = np.isnan(values)
    w = np.where(nan, 0.0, w)
    values = np.where(nan, np.inf, values)  # sort NaNs to the end
  order = np.argsort(values, axis=-1)
  v_sorted = np.take_along_axis(values, order, axis=-1)
  w_sorted = np.take_along_axis(w, order, axis=-1)
  cumw = np.cumsum(w_sorted, axis=-1)
  total = cumw[..., -1:]
  with np.errstate(invalid="ignore", divide="ignore"):
    positions = (cumw - 0.5 * w_sorted) / total
  # vectorized 1-d interp per pencil
  flat_v = v_sorted.reshape(-1, v_sorted.shape[-1])
  flat_p = positions.reshape(-1, positions.shape[-1])
  flat_w = w_sorted.reshape(-1, w_sorted.shape[-1])
  out = np.empty((flat_v.shape[0], len(q)))
  for i in range(flat_v.shape[0]):
    valid = flat_w[i] > 0
    if not valid.any():
      out[i] = np.nan
      continue
    out[i] = np.interp(q, flat_p[i][valid], flat_v[i][valid])
  out = out.reshape(v_sorted.shape[:-1] + (len(q),))
  return np.moveaxis(out, -1, 0)  # quantile axis first


def build_stacked_windows(
    ds: xds.Dataset, window_weights: xds.DataArray
) -> xds.Dataset:
  """Stack (year, wrapped dayofyear window) for each variable.

  Returns a Dataset whose variables have dims
  ``(year,) + original_dims_with_dayofyear + ('window',)``.
  """
  window_size = len(window_weights.values)
  years = np.unique(ds["time"].dt.year.values)
  per_year = [replace_time_with_doy(ds.sel(time=str(y))) for y in years]
  all_doys = np.array(sorted(
      set(np.concatenate([
          d.coords_dict()["dayofyear"].data for d in per_year
      ]).tolist())
  ))
  stacked = xds.concat(
      [
          reindex_with_nan(d, "dayofyear", all_doys).expand_dims(year=[y])
          for d, y in zip(per_year, years)
      ],
      "year",
  )
  doys = stacked.coords_dict()["dayofyear"].data
  if 366 in doys and 365 in doys:
    stacked = stacked.fillna(stacked.sel(dayofyear=365))
  out = xds.Dataset({}, coords={
      k: v for k, v in stacked.coords_dict().items()
  })
  for name in stacked.keys():
    da = stacked[name]
    ax = da.dims.index("dayofyear")
    vals = np.asarray(da.values, dtype=np.float64)
    windows = _windowed_stack(vals, ax, window_size)
    out[name] = xds.DataArray(windows, dims=da.dims + ("window",))
  return out


def compute_rolling_stat(
    ds: xds.Dataset,
    window_weights: xds.DataArray,
    stat_fn: Union[str, Callable] = "mean",
) -> xds.Dataset:
  """Rolling climatology over a wrapped dayofyear axis.

  Matches the reference semantics (utils.py:88-124): stack years, fill the
  leap-day gap (366) with day 365, apply a periodic weighted rolling window
  over dayofyear, and reduce over (window, year).  A callable ``stat_fn``
  receives the full stacked-window Dataset:
  ``stat_fn(stacked_ds, weights=window_weights, dim=('window', 'year'))``.
  """
  if callable(stat_fn):
    stacked = build_stacked_windows(ds, window_weights)
    return stat_fn(stacked, weights=window_weights, dim=("window", "year"))
  # string stats ride the same stacked-window builder as the callable
  # path, so the year-stacking/leap-fill semantics cannot diverge
  window_size = len(window_weights.values)
  stacked_win = build_stacked_windows(ds, window_weights)

  w = window_weights.values

  out = xds.Dataset({}, coords={
      k: v for k, v in stacked_win.coords_dict().items()
      if k not in ("year", "window")
  })
  for name in stacked_win.keys():
    da = stacked_win[name]
    yax = da.dims.index("year")
    windows = np.asarray(da.values, dtype=np.float64)  # window axis last
    shape = [1] * windows.ndim
    shape[-1] = window_size
    wb = w.reshape(shape)
    valid = ~np.isnan(windows)
    wmask = np.where(valid, wb, 0.0)
    red_axes = (yax, windows.ndim - 1)
    sum_w = wmask.sum(axis=red_axes)
    x0 = np.where(valid, windows, 0.0)
    mean = (x0 * wmask).sum(axis=red_axes) / sum_w
    if stat_fn == "mean":
      result = mean
    elif stat_fn == "std":
      mexp = np.expand_dims(np.expand_dims(mean, yax), -1)
      dev = np.where(valid, (windows - mexp) ** 2, 0.0)
      result = np.sqrt((dev * wmask).sum(axis=red_axes) / sum_w)
    else:
      raise NotImplementedError(f"stat {stat_fn!r} not implemented")
    dims = tuple(d for d in da.dims if d not in ("year", "window"))
    result_da = xds.DataArray(
        result, dims=dims,
        coords={
            k: v for k, v in stacked_win.coords_dict().items()
            if v.dims and set(v.dims) <= set(dims)
        },
    )
    out[name] = result_da
  return out


def resample_daily_mean(ds: xds.Dataset) -> xds.Dataset:
  """Resample time to daily means (like obs.resample(time='D').mean())."""
  days = ds["time"].dt.floor("D").values
  unique_days, inverse = np.unique(days, return_inverse=True)
  out = xds.Dataset({}, coords={
      k: v for k, v in ds.coords_dict().items() if "time" not in v.dims
  })
  for name in ds.keys():
    da = ds[name]
    ax = da.dims.index("time")
    vals = np.asarray(da.values, dtype=np.float64)
    moved = np.moveaxis(vals, ax, 0)
    # NaN-aware per-cell accumulation (xarray's resample().mean() skips
    # NaN by default; a plain sum would blank the whole day)
    valid = ~np.isnan(moved)
    sums = np.zeros((len(unique_days),) + moved.shape[1:])
    counts = np.zeros_like(sums)
    np.add.at(sums, inverse, np.where(valid, moved, 0.0))
    np.add.at(counts, inverse, valid.astype(np.float64))
    with np.errstate(invalid="ignore", divide="ignore"):
      mean = sums / counts
    mean[counts == 0] = np.nan
    mean = np.moveaxis(mean, 0, ax)
    out[name] = xds.DataArray(mean, dims=da.dims)
  out = out.assign_coords(time=unique_days)
  return out


def compute_daily_stat(
    obs: xds.Dataset,
    window_size: int,
    clim_years: slice,
    stat_fn: Union[str, Callable] = "mean",
) -> xds.Dataset:
  """Compute daily average climatology with running window."""
  obs_daily = resample_daily_mean(obs.sel(time=clim_years))
  window_weights = create_window_weights(window_size)
  return compute_rolling_stat(obs_daily, window_weights, stat_fn)


def compute_hourly_stat(
    obs: xds.Dataset,
    window_size: int,
    clim_years: slice,
    hour_interval: int,
    stat_fn: Union[str, Callable] = "mean",
) -> xds.Dataset:
  """Compute climatology by day of year and hour of day."""
  hours = np.arange(0, 24, hour_interval)
  window_weights = create_window_weights(window_size)
  per_hour = [
      compute_rolling_stat(
          select_hour(obs.sel(time=clim_years), int(hour)),
          window_weights,
          stat_fn,
      ).expand_dims(hour=[hour])
      for hour in hours
  ]
  return xds.concat(per_hour, "hour")


def smooth_dayofyear_variable_with_rolling_window(
    obs_dayofyear: xds.Dataset, window_size: int
) -> xds.Dataset:
  """Smooth day-of-year values with a circular weighted rolling window."""
  assert "dayofyear" in obs_dayofyear.sizes, "dayofyear must be a dimension."
  window_weights = create_window_weights(window_size)
  half_window = window_size // 2
  w = window_weights.values
  out = xds.Dataset({}, coords=dict(obs_dayofyear.coords_dict()))
  for name in obs_dayofyear.keys():
    da = obs_dayofyear[name]
    ax = da.dims.index("dayofyear")
    vals = np.asarray(da.values, dtype=np.float64)
    acc = np.zeros_like(vals)
    count = np.zeros_like(vals)
    for i in range(-half_window, window_size - half_window):
      rolled = np.roll(vals, i, axis=ax)
      valid = ~np.isnan(rolled)
      acc += np.where(valid, rolled, 0.0) * w[i + half_window]
      count += valid
    # NaN-aware exactly like the reference's stacked .mean('stack')
    # (xarray skipna: sum of remaining weighted terms / VALID count,
    # reference utils.py:169-197)
    with np.errstate(invalid="ignore", divide="ignore"):
      mean = acc / count
    mean[count == 0] = np.nan
    out[name] = xds.DataArray(mean, dims=da.dims)
  return out


def _groupby_dayofyear(ds: xds.Dataset, stat: str) -> xds.Dataset:
  """groupby('time.dayofyear').mean()/std() equivalent."""
  doy = ds["time"].dt.dayofyear.values
  unique_doy, inverse = np.unique(doy, return_inverse=True)
  out = xds.Dataset({}, coords={
      k: v for k, v in ds.coords_dict().items() if "time" not in v.dims
  })
  for name in ds.keys():
    da = ds[name]
    ax = da.dims.index("time")
    vals = np.moveaxis(np.asarray(da.values, dtype=np.float64), ax, 0)
    groups = [vals[inverse == i] for i in range(len(unique_doy))]
    # NaN-aware like xarray's groupby reductions (skipna=True default)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
      warnings.simplefilter("ignore", category=RuntimeWarning)
      if stat == "mean":
        red = np.stack([np.nanmean(g, axis=0) for g in groups])
      elif stat == "std":
        red = np.stack([np.nanstd(g, axis=0, ddof=0) for g in groups])
      else:
        raise NotImplementedError(stat)
    red = np.moveaxis(red, 0, ax)
    dims = tuple("dayofyear" if d == "time" else d for d in da.dims)
    out[name] = xds.DataArray(red, dims=dims)
  out = out.assign_coords(dayofyear=unique_doy)
  return out


def compute_daily_climatology_std(
    obs: xds.Dataset, window_size: int, clim_years: slice
) -> xds.Dataset:
  """Daily climatological std with rolling window ('fast' method)."""
  obs_daily = resample_daily_mean(obs.sel(time=clim_years))
  std_daily = _groupby_dayofyear(obs_daily, "std")
  return smooth_dayofyear_variable_with_rolling_window(std_daily, window_size)


def compute_daily_climatology_mean(
    obs: xds.Dataset, window_size: int, clim_years: slice
) -> xds.Dataset:
  """Daily climatological mean with rolling window ('fast' method)."""
  obs_daily = _groupby_dayofyear(obs.sel(time=clim_years), "mean")
  return smooth_dayofyear_variable_with_rolling_window(obs_daily, window_size)


def compute_hourly_climatology_mean_fast(
    obs: xds.Dataset, window_size: int, clim_years: slice,
    hour_interval: int = 1,
) -> xds.Dataset:
  """Climatology mean by day of year and hour of day ('fast' method)."""
  obs = obs.sel(time=clim_years)
  hours = np.arange(0, 24, hour_interval)
  return xds.concat(
      [
          smooth_dayofyear_variable_with_rolling_window(
              _groupby_dayofyear(select_hour(obs, int(hour)), "mean"),
              window_size,
          ).expand_dims(hour=[hour])
          for hour in hours
      ],
      "hour",
  )


def compute_hourly_climatology_std_fast(
    obs: xds.Dataset, window_size: int, clim_years: slice,
    hour_interval: int = 1,
) -> xds.Dataset:
  """Climatology std by day of year and hour of day ('fast' method)."""
  obs = obs.sel(time=clim_years)
  hours = np.arange(0, 24, hour_interval)
  return xds.concat(
      [
          smooth_dayofyear_variable_with_rolling_window(
              _groupby_dayofyear(select_hour(obs, int(hour)), "std"),
              window_size,
          ).expand_dims(hour=[hour])
          for hour in hours
      ],
      "hour",
  )


def compute_hourly_stat_fast(
    obs: xds.Dataset,
    window_size: int,
    clim_years: slice,
    hour_interval: int,
    stat_fn: str = "mean",
) -> xds.Dataset:
  """Climatology mean or std by day of year and hour of day."""
  if stat_fn == "mean":
    return compute_hourly_climatology_mean_fast(
        obs, window_size, clim_years, hour_interval
    )
  elif stat_fn == "std":
    return compute_hourly_climatology_std_fast(
        obs, window_size, clim_years, hour_interval
    )
  raise NotImplementedError(f"stat {stat_fn} not implemented.")


def compute_daily_stat_fast(
    obs: xds.Dataset,
    window_size: int,
    clim_years: slice,
    stat_fn: str = "mean",
) -> xds.Dataset:
  """Climatology mean or std by day of year."""
  if stat_fn == "mean":
    return compute_daily_climatology_mean(obs, window_size, clim_years)
  elif stat_fn == "std":
    return compute_daily_climatology_std(obs, window_size, clim_years)
  raise NotImplementedError(f"stat {stat_fn} not implemented.")


_STAT_FNS = {
    "mean": (np.mean, np.nanmean),
    "min": (np.min, np.nanmin),
    "max": (np.max, np.nanmax),
    "sum": (np.sum, np.nansum),
}


def normalize_timedelta_str(s):
  """Uppercase day/week units in pandas timedelta strings.

  The reference's CLIs use strings like ``"1d"``/``"1w"``; pandas
  deprecated lowercase 'd'/'w' unit codes, so normalize before parsing
  while still accepting the reference's grammar.
  """
  if not isinstance(s, str):
    return s
  import re

  return re.sub(
      r"(\d\s*)([dw])\b", lambda m: m.group(1) + m.group(2).upper(), s
  )


def resample_time_plan(times, period, label: str = "left",
                       origin: str = "start_day"):
  """Host-side binning plan for resampling a sorted time axis.

  Returns ``(label_times, starts, ends)``: output bin labels plus, per
  bin, the half-open input position range [starts[i], ends[i]) feeding
  it.  Shared by the eager reduction and the streaming CLI so both take
  identical bin boundaries (reference alignment semantics:
  /root/reference/scripts/resample_in_time.py:270-309).
  """
  import pandas as pd

  period = pd.to_timedelta(normalize_timedelta_str(period))
  times = pd.DatetimeIndex(np.asarray(times))
  if origin == "start_day":
    origin_ts = times[0].floor("D")
  else:
    origin_ts = times[0]
  period64 = np.timedelta64(period)
  offs = times.values - np.datetime64(origin_ts)
  # the contiguous-range plan below assumes nondecreasing bins; an
  # unsorted axis would be silently misbinned
  if len(times) > 1 and not (
      np.diff(times.values) >= np.timedelta64(0)
  ).all():
    raise ValueError(
        "resampling requires a monotonically increasing time axis; "
        "sort the input (e.g. via slice_dataset) first"
    )
  if label == "left":
    bins = offs // period64
  elif label == "right":
    bins = -((-offs) // period64)  # ceil: (T-period, T] -> bin index
  else:
    raise ValueError(f"Unhandled {label=}")
  # times sorted ascending => bins nondecreasing => contiguous ranges.
  # Emit EVERY bin in [min, max], including empty ones (reduced to NaN
  # rows downstream) — pandas/xarray resample keeps a regular output
  # axis across input gaps.
  occupied, occ_starts = np.unique(bins, return_index=True)
  occ_ends = np.append(occ_starts[1:], len(times))
  lo, hi = int(occupied[0]), int(occupied[-1])
  labels_idx = np.arange(lo, hi + 1)
  starts = np.zeros(len(labels_idx), dtype=np.int64)
  ends = np.zeros(len(labels_idx), dtype=np.int64)
  pos = {int(b): i for i, b in enumerate(occupied)}
  cursor = 0
  for i, b in enumerate(labels_idx):
    j = pos.get(int(b))
    if j is None:
      starts[i] = ends[i] = cursor  # empty bin
    else:
      starts[i], ends[i] = occ_starts[j], occ_ends[j]
      cursor = occ_ends[j]
  label_times = np.datetime64(origin_ts) + labels_idx * period64
  if label == "right":
    # first (incomplete-from-the-left) bin is dropped
    label_times, starts, ends = label_times[1:], starts[1:], ends[1:]
  return label_times, starts.astype(np.int64), ends.astype(np.int64)


def reduce_time_bins(ds: xds.Dataset, starts, ends, label_times,
                     statistic: str, skipna: bool = False,
                     time_dim: str = "time") -> xds.Dataset:
  """Reduce each [starts[i], ends[i]) time range of ``ds`` to one step."""
  plain_fn, nan_fn = _STAT_FNS[statistic]
  fn = nan_fn if skipna else plain_fn
  # accumulate in float64 without copying the whole block to float64 —
  # mean/sum take a dtype argument, min/max are exact in any dtype
  kw = {"dtype": np.float64} if statistic in ("mean", "sum") else {}
  out = xds.Dataset({}, coords={
      k: v for k, v in ds.coords_dict().items() if time_dim not in v.dims
  })
  for name in ds.keys():
    da = ds[name]
    if time_dim not in da.dims:
      out[name] = da
      continue
    ax = da.dims.index(time_dim)
    vals = np.moveaxis(np.asarray(da.values), ax, 0)
    nanrow = np.full(vals.shape[1:], np.nan)
    red = np.stack([
        fn(vals[s:e], axis=0, **kw) if e > s else nanrow
        for s, e in zip(starts, ends)
    ]).astype(np.float64)
    out[name] = xds.DataArray(np.moveaxis(red, 0, ax), dims=da.dims)
  return out.assign_coords({time_dim: np.asarray(label_times)})


def resample_in_time(
    ds: xds.Dataset,
    period,
    statistic: str = "mean",
    label: str = "left",
    skipna: bool = False,
    time_dim: str = "time",
    origin: str = "start_day",
) -> xds.Dataset:
  """Resample along time into period bins with the given statistic.

  label='left': bins [T, T+period) labelled T (pandas origin='start_day').
  label='right': bins (T-period, T] labelled T, first (incomplete from the
  left) bin dropped — matching the reference resample_in_time semantics.
  """
  label_times, starts, ends = resample_time_plan(
      ds.coords_dict()[time_dim].data, period, label, origin
  )
  return reduce_time_bins(
      ds, starts, ends, label_times, statistic, skipna, time_dim
  )


def rolling_in_time(
    ds: xds.Dataset,
    window: int,
    statistic: str = "mean",
    skipna: bool = False,
    time_dim: str = "time",
) -> xds.Dataset:
  """Trailing rolling-window statistic; first window-1 entries are NaN."""
  plain_fn, nan_fn = _STAT_FNS[statistic]
  fn = nan_fn if skipna else plain_fn
  out = xds.Dataset({}, coords=dict(ds.coords_dict()))
  for name in ds.keys():
    da = ds[name]
    if time_dim not in da.dims:
      out[name] = da
      continue
    ax = da.dims.index(time_dim)
    vals = np.moveaxis(np.asarray(da.values, dtype=np.float64), ax, 0)
    n = vals.shape[0]
    res = np.full_like(vals, np.nan)
    for t in range(window - 1, n):
      res[t] = fn(vals[t - window + 1 : t + 1], axis=0)
    out[name] = xds.DataArray(np.moveaxis(res, 0, ax), dims=da.dims)
  return out


def random_like(dataset: xds.Dataset, seed: int = 0) -> xds.Dataset:
  """Random normal dataset configured like `dataset`."""
  rs = np.random.RandomState(seed)
  return dataset.copy(
      data={k: rs.normal(size=v.shape) for k, v in
            dataset.variables_dict().items()}
  )


class _WrappedDataset:
  """Hashable wrapper for xds.Datasets (for lru caching)."""

  def __init__(self, value):
    if not isinstance(value, xds.Dataset):
      raise ValueError(f"_WrappedDataset cannot wrap type {type(value)}")
    self.value = value

  def __eq__(self, other):
    if not isinstance(other, _WrappedDataset):
      return False
    return self.value.equals(other.value)

  def __hash__(self):
    return hash(
        tuple(
            (k, v.dims, v.shape)
            for k, v in self.value.variables_dict().items()
        )
    )


def dataset_safe_lru_cache(maxsize=128):
  """An xds.Dataset compatible version of functools.lru_cache."""

  def decorator(func):
    @functools.lru_cache(maxsize)
    def cached_func(*args, **kwargs):
      args = tuple(
          a.value if isinstance(a, _WrappedDataset) else a for a in args
      )
      kwargs = {
          k: v.value if isinstance(v, _WrappedDataset) else v
          for k, v in kwargs.items()
      }
      return func(*args, **kwargs)

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
      args = tuple(
          _WrappedDataset(a) if isinstance(a, xds.Dataset) else a
          for a in args
      )
      kwargs = {
          k: _WrappedDataset(v) if isinstance(v, xds.Dataset) else v
          for k, v in kwargs.items()
      }
      return cached_func(*args, **kwargs)

    return wrapper

  return decorator
