"""Verification metric classes (deterministic + probabilistic).

Class-for-class parity with the reference's weatherbench2/metrics.py
(/root/reference/weatherbench2/metrics.py): every metric exposes
``compute_chunk`` (per-time) and ``compute`` (time-averaged).  The math is
written against the xds labeled-array layer, which dispatches to jax.numpy
whenever the payloads are jax Arrays — so a whole metric×region loop traces
into a single XLA program under jit, with elementwise ops fused into the
weighted-reduction epilogues by the compiler (plus Pallas kernels in
weatherbench2_tpu.ops for the hottest fused reductions).

Numerical semantics intentionally preserved from the reference:
  * latitude/area weights from cell-area integrals, normalized by their mean
    (metrics.py:40-60 in the reference);
  * region guard ``where(weights > 0, 0)`` before weighted averaging
    (reference metrics.py:160);
  * skipna handling of NaNs in both numerator and sum-of-weights;
  * ddof=1 ensemble variances; PWM/rank-based O(M log M) CRPS spread
    estimator (Zamo & Naveau) (reference metrics.py:781-846);
  * debiased ensemble-mean MSE via sample-variance correction
    (reference metrics.py:532-565).
"""
from collections.abc import Sequence
import dataclasses
import functools
import os
import typing as t

import numpy as np

from weatherbench2_tpu import thresholds as thresholds_lib
from weatherbench2_tpu import xds
from weatherbench2_tpu.regions import Region
from weatherbench2_tpu.xds.core import _is_jax, _xp

REALIZATION = "realization"


def _assert_increasing(x: np.ndarray):
  if not (np.diff(x) > 0).all():
    raise ValueError(f"array is not increasing: {x}")


def _latitude_cell_bounds(x: np.ndarray) -> np.ndarray:
  pi_over_2 = np.array([np.pi / 2], dtype=x.dtype)
  return np.concatenate([-pi_over_2, (x[:-1] + x[1:]) / 2, pi_over_2])


def _cell_area_from_latitude(points: np.ndarray) -> np.ndarray:
  """Normalized area overlap as a function of latitude."""
  bounds = _latitude_cell_bounds(points)
  _assert_increasing(bounds)
  upper = bounds[1:]
  lower = bounds[:-1]
  # normalized cell area: integral from lower to upper of cos(latitude)
  return np.sin(upper) - np.sin(lower)


def get_lat_weights(ds) -> xds.DataArray:
  """Latitude/area weights from the latitude coordinate of a dataset."""
  lat = np.asarray(
      ds.coords_dict()["latitude"].data
      if isinstance(ds, xds.Dataset)
      else ds.coords["latitude"].data
  )
  weights = _cell_area_from_latitude(np.deg2rad(lat))
  weights /= np.mean(weights)
  return xds.DataArray(weights, dims=("latitude",),
                       coords={"latitude": lat}, name="latitude")


def select_climatology_variables(
    climatology: xds.Dataset, names
) -> xds.Dataset:
  """Select `names` from a climatology, accepting '<name>_mean' forms.

  The single resolver for every climatology consumer (ACC preparation,
  baseline substitution in both engines) — per-name, so bare and
  '_mean'-suffixed variables may be mixed in one store.  Raises KeyError
  when a name exists in neither form.
  """
  names = list(names)
  src = []
  rename = {}
  missing = []
  for n in names:
    if n in climatology:
      src.append(n)
    elif f"{n}_mean" in climatology:
      src.append(f"{n}_mean")
      rename[f"{n}_mean"] = n
    else:
      missing.append(n)
  if missing:
    raise KeyError(
        f"climatology is missing variables {missing} (neither bare "
        "names nor their '_mean'-suffixed forms are present)"
    )
  out = climatology[src]
  return out.rename(rename) if rename else out


def _get_climatology_chunk(
    climatology: xds.Dataset, truth: xds.Dataset
) -> xds.Dataset:
  """The climatological mean of the observed true variables."""
  return select_climatology_variables(climatology, truth.keys())


@dataclasses.dataclass
class Metric:
  """Base class for metrics.

  TPU-engine protocol: ``prepare_chunk`` performs all coordinate-dependent
  work (climatology/threshold gathers keyed by time coords) host-side;
  ``compute_chunk_prepared`` is pure array math safe to trace under jit with
  a single cached trace across chunks.  ``compute_chunk`` composes the two
  and is the reference-parity entry point.
  """

  #: whether compute_chunk_prepared is jax-traceable (False for metrics
  #: that require host-side RNG or numpy-only ops).
  supports_jit: t.ClassVar[bool] = True

  #: pointwise-fused protocol (see parallel/streaming.py): metrics whose
  #: chunk value is an area-weighted regional mean of per-cell fields
  #: (optionally post-processed by ``finalize_fused``) set this True and
  #: implement ``pointwise_chunk``; the streaming engine then reduces
  #: every such metric x region in ONE pass over the chunk through the
  #: fused region-matmul kernel (ops.fused_region_sums) instead of one
  #: weighted reduction per metric x region.  Metrics whose fields can
  #: be +/-Inf (ignorance/log scores) must NOT ship raw Inf rows — a
  #: zero region weight times Inf is NaN inside the kernel's dot
  #: product; wrap the fields with ``_inf_safe_fields`` (sanitized rows
  #: + indicator rows) and finalize with ``_inf_safe_finalize``, as the
  #: ignorance scores do.
  supports_pointwise_fused: t.ClassVar[bool] = False

  #: NaN handling for the fused regional mean: "global" follows the
  #: evaluation's skipna flag; "skip" always drops NaN cells from the
  #: weighted mean (SEEPS p1-mask semantics).
  fused_nan_mode: t.ClassVar[str] = "global"

  def prepare_chunk(
      self, forecast: xds.Dataset, truth: xds.Dataset
  ) -> t.Any:
    """Host-side, coordinate-dependent preparation for a chunk."""
    return None

  def compute_chunk_prepared(
      self,
      forecast: xds.Dataset,
      truth: xds.Dataset,
      prepared: t.Any,
      region: t.Optional[Region] = None,
      skipna: bool = False,
  ) -> xds.Dataset:
    """Jit-safe chunk evaluation given `prepare_chunk` output."""
    del prepared
    return self.compute_chunk(forecast, truth, region=region, skipna=skipna)

  def pointwise_chunk(
      self,
      forecast: xds.Dataset,
      truth: xds.Dataset,
      prepared: t.Any,
      skipna: bool,
  ) -> t.Optional[xds.Dataset]:
    """Per-cell fields whose weighted regional mean feeds finalize_fused.

    Returns None to decline at trace time (e.g. required variables or
    ensemble members are missing); the engine then falls back to the
    per-region ``compute_chunk_prepared`` loop for this metric.
    """
    del forecast, truth, prepared, skipna
    return None

  def finalize_fused(
      self, means: xds.Dataset, skipna: bool = False
  ) -> xds.Dataset:
    """Regional means of ``pointwise_chunk`` fields -> metric result."""
    del skipna
    return means

  def compute_chunk(
      self,
      forecast: xds.Dataset,
      truth: xds.Dataset,
      region: t.Optional[Region] = None,
      skipna: bool = False,
  ) -> xds.Dataset:
    """Evaluate this metric on a temporal chunk of data."""
    raise NotImplementedError

  def compute(
      self,
      forecast: xds.Dataset,
      truth: xds.Dataset,
      region: t.Optional[Region] = None,
      skipna: bool = False,
  ) -> xds.Dataset:
    """Evaluate on datasets with full temporal coverage (mean over time)."""
    if "time" in forecast.sizes:
      avg_dim = "time"
    elif "init_time" in forecast.sizes:
      avg_dim = "init_time"
    else:
      raise ValueError(
          "Forecast has neither time nor init_time dimension"
      )
    return self.compute_chunk(
        forecast, truth, region=region, skipna=skipna
    ).mean(avg_dim, skipna=skipna)


def _spatial_average(
    dataset: xds.Dataset,
    region: t.Optional[Region],
    skipna: bool,
):
  """Area-weighted spatial mean after applying the region mask."""
  weights = get_lat_weights(dataset)
  if region is not None:
    dataset, weights = region.apply(dataset, weights)
    # ignore NaN/Inf values in regions with zero weight
    dataset = dataset.where(weights > 0, 0)
  return dataset.weighted(weights).mean(
      ["latitude", "longitude"], skipna=skipna
  )


def _sqrt(obj):
  if isinstance(obj, xds.Dataset):
    return obj.map(_sqrt)
  xp = _xp(obj.data)
  return obj.copy(data=xp.sqrt(obj.data))


def _log(obj):
  if isinstance(obj, xds.Dataset):
    return obj.map(_log)
  xp = _xp(obj.data)
  return obj.copy(data=xp.log(obj.data))


def _norm_cdf(obj):
  if isinstance(obj, xds.Dataset):
    return obj.map(_norm_cdf)
  if _is_jax(obj.data):
    from jax.scipy.special import erf
  else:
    from scipy.special import erf
  xp = _xp(obj.data)
  return obj.copy(data=0.5 * (1.0 + erf(obj.data / xp.sqrt(2.0))))


def _norm_pdf(obj):
  if isinstance(obj, xds.Dataset):
    return obj.map(_norm_pdf)
  xp = _xp(obj.data)
  return obj.copy(
      data=xp.exp(-0.5 * obj.data**2) / np.sqrt(2.0 * np.pi)
  )


def _spatial_average_l2_norm(dataset, region, skipna):
  """sqrt(spatial_average(ds**2))."""
  return _sqrt(_spatial_average(dataset**2, region=region, skipna=skipna))


@dataclasses.dataclass
class WindVectorMSE(Metric):
  """Wind vector mean squared error (see WB2 paper)."""

  u_name: str
  v_name: str
  vector_name: str

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    diff = forecast - truth
    return _spatial_average(
        diff[self.u_name] ** 2 + diff[self.v_name] ** 2,
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class WindVectorRMSESqrtBeforeTimeAvg(Metric):
  """Wind vector RMSE with sqrt taken before time averaging."""

  u_name: str
  v_name: str
  vector_name: str

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    mse = WindVectorMSE(
        u_name=self.u_name, v_name=self.v_name, vector_name=self.vector_name
    ).compute_chunk(forecast, truth, region=region, skipna=skipna)
    return _sqrt(mse)


def _squared_error_fields(
    forecast: xds.Dataset, truth: xds.Dataset, wind_vectors
) -> t.Optional[xds.Dataset]:
  """(f-t)^2 per variable, plus du^2+dv^2 for each wind-vector pair."""
  diff = forecast - truth
  fields = diff * diff
  for wv in wind_vectors or ():
    if wv.u_name not in fields.keys() or wv.v_name not in fields.keys():
      return None
    fields[wv.vector_name] = fields[wv.u_name] + fields[wv.v_name]
  return fields


@dataclasses.dataclass
class RMSESqrtBeforeTimeAvg(Metric):
  """RMSE with the square root taken before time averaging."""

  wind_vector_rmse: t.Optional[list] = None

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    results = _spatial_average_l2_norm(
        forecast - truth, region=region, skipna=skipna
    )
    if self.wind_vector_rmse is not None:
      for wv in self.wind_vector_rmse:
        results[wv.vector_name] = wv.compute_chunk(
            forecast, truth, region=region, skipna=skipna
        )
    return results

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    return _squared_error_fields(forecast, truth, self.wind_vector_rmse)

  def finalize_fused(self, means, skipna=False):
    del skipna
    return _sqrt(means)


@dataclasses.dataclass
class MSE(Metric):
  """Mean squared error."""

  wind_vector_mse: t.Optional[list] = None

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    results = _spatial_average(
        (forecast - truth) ** 2, region=region, skipna=skipna
    )
    if self.wind_vector_mse is not None:
      for wv in self.wind_vector_mse:
        results[wv.vector_name] = wv.compute_chunk(
            forecast, truth, region=region, skipna=skipna
        )
    return results

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    return _squared_error_fields(forecast, truth, self.wind_vector_mse)


@dataclasses.dataclass
class SpatialMSE(Metric):
  """MSE without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del skipna
    return (forecast - truth) ** 2


@dataclasses.dataclass
class MAE(Metric):
  """Mean absolute error."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _spatial_average(abs(forecast - truth), region=region,
                            skipna=skipna)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    return abs(forecast - truth)


@dataclasses.dataclass
class SpatialMAE(Metric):
  """MAE without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del skipna
    return abs(forecast - truth)


@dataclasses.dataclass
class Bias(Metric):
  """Mean error."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _spatial_average(forecast - truth, region=region, skipna=skipna)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    return forecast - truth


@dataclasses.dataclass
class SpatialBias(Metric):
  """Bias without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del skipna
    return forecast - truth


def _align_climatology_to_forecast(
    climatology: xds.Dataset, forecast: xds.Dataset, truth: xds.Dataset
) -> xds.Dataset:
  """Select a climatology at the forecast's (dayofyear[, hour]) times."""
  if "init_time" in forecast.sizes:
    time_dim = "valid_time"
  else:
    time_dim = "time"
  climatology_chunk = _get_climatology_chunk(climatology, truth)
  if "level" in forecast.sizes and "level" in climatology_chunk.sizes:
    climatology_chunk = climatology_chunk.sel(
        level=forecast["level"].values
    )
  time_selection = dict(dayofyear=forecast[time_dim].dt.dayofyear)
  if "hour" in climatology_chunk.coords_dict():
    time_selection["hour"] = forecast[time_dim].dt.hour
  return climatology_chunk.sel(time_selection)


@dataclasses.dataclass
class ACC(Metric):
  """Anomaly correlation coefficient.

  Attributes:
    climatology: Climatology dataset for computing anomalies.
  """

  climatology: xds.Dataset

  @staticmethod
  def _validated_positions(coord_vals, wanted, what):
    """Exact positions of `wanted` in sorted `coord_vals`, or raise.

    Raw searchsorted would silently select the NEXT row for labels not in
    the climatology (and clamp out-of-range gathers under jit) — the
    reference's `.sel` raises KeyError instead (reference
    metrics.py:398-404)."""
    wanted = np.asarray(wanted)
    pos = np.searchsorted(coord_vals, wanted)
    clipped = np.minimum(pos, len(coord_vals) - 1)
    bad = coord_vals[clipped] != wanted
    if np.any(bad):
      raise KeyError(
          f"forecast {what} values {np.unique(wanted[bad])!r} not found "
          f"in the climatology {what} coordinate"
      )
    return clipped.astype(np.int32)

  def _gather_indices(self, forecast, hour_vals):
    """(dayofyear[, hour]) gather indices for a chunk's valid times."""
    time_dim = "valid_time" if "init_time" in forecast.sizes else "time"
    doy_vals = np.asarray(
        self.climatology.coords_dict()["dayofyear"].data
    )
    dims = forecast[time_dim].dims
    indices = {"doy": xds.DataArray(
        self._validated_positions(
            doy_vals, forecast[time_dim].dt.dayofyear.values, "dayofyear"
        ),
        dims=dims,
    )}
    if hour_vals is not None:
      indices["hour"] = xds.DataArray(
          self._validated_positions(
              hour_vals, forecast[time_dim].dt.hour.values, "hour"
          ),
          dims=dims,
      )
    return indices

  def prepare_chunk(self, forecast, truth):
    """Index-based preparation: the climatology stays resident on device;
    only small (dayofyear, hour) gather indices are built per chunk.

    This avoids materializing a chunk-shaped climatology on host and
    re-shipping it to HBM every chunk (the gather runs on device inside
    the fused program).  Climatologies too large for HBM residency
    (e.g. hourly 0.25° — WB2_CLIM_DEVICE_BYTES, default 2 GB) fall back
    to a per-chunk host-side gather: only the chunk-shaped selection
    ships to the device, like the reference's xarray `.sel`.
    """
    cache_key = (
        tuple(sorted(truth.keys())),
        tuple(np.asarray(forecast["level"].values).tolist())
        if "level" in forecast.sizes
        else None,
    )
    cached = getattr(self, "_clim_device_cache", None)
    if cached is not None and cached[0] == cache_key:
      clim, hour_vals = cached[1], cached[2]
      indices = self._gather_indices(forecast, hour_vals)
      if clim is None:  # host-gather mode
        return self._host_gather(forecast, indices)
      return {"clim": clim, "indices": indices}

    clim = _get_climatology_chunk(self.climatology, truth)
    if "level" in forecast.sizes and "level" in clim.sizes:
      lev_index = xds.Index(
          np.asarray(clim.coords_dict()["level"].data)
      )
      lev_pos = lev_index.positions_for_labels(
          np.asarray(forecast["level"].values)
      )
      clim = clim.isel(level=lev_pos)
    # strip the gathered-dim coords: under jit the gather indices are
    # traced, and host-side coord arrays cannot be indexed by tracers
    hour_coord = clim.coords_dict().get("hour")
    clim = xds.Dataset(
        dict(clim.variables_dict()),
        coords={
            k: v
            for k, v in clim.coords_dict().items()
            if not (set(v.dims) & {"dayofyear", "hour"})
        },
    )
    hour_vals = (
        np.asarray(hour_coord.data) if hour_coord is not None else None
    )
    budget = float(os.environ.get("WB2_CLIM_DEVICE_BYTES", 2e9))
    nbytes = sum(
        4 * v.size for v in clim.variables_dict().values()
    )
    if nbytes > budget:
      self._clim_host = clim
      self._clim_device_cache = (cache_key, None, hour_vals)
      indices = self._gather_indices(forecast, hour_vals)
      return self._host_gather(forecast, indices)
    # move the climatology to device once and reuse it for all chunks
    try:
      clim = clim.to_jax()
    except Exception:  # pragma: no cover - jax unavailable
      pass
    self._clim_device_cache = (cache_key, clim, hour_vals)
    return {
        "clim": clim,
        "indices": self._gather_indices(forecast, hour_vals),
    }

  def _host_gather(self, forecast, indices):
    """Unique-(dayofyear, hour) climatology rows + device expansion map.

    Within an init-chunked streaming chunk, the (dayofyear, hour) pairs
    of its valid times repeat heavily across leads (e.g. a 12-hourly
    climatology sees each pair ~once per day spanned, but the chunk has
    init×lead entries).  Shipping a chunk-shaped selection therefore
    moves ~5-6x more climatology bytes over host→HBM than needed.
    Instead: gather the unique pairs ONCE per chunk (a bounded lazy
    read), ship that small `__clim_upair`-stacked block, and expand it
    on device with an integer take (`uinv`).  The reference's xarray
    `.sel` (reference metrics.py:398-404) has no such dedup because its
    chunks stay host-side."""
    doy_da = indices["doy"]
    doy = np.asarray(doy_da.data)
    dims = doy_da.dims
    if "hour" in indices:
      hour = np.asarray(indices["hour"].data)
      pairs = np.stack([doy.ravel(), hour.ravel()], axis=1)
      uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    else:
      uniq, inv = np.unique(doy.ravel(), return_inverse=True)
      uniq = uniq[:, None]
    # pad the unique axis to a bucket so interior/edge chunks share one
    # jit program shape (varying unique counts would recompile per chunk)
    n_u = uniq.shape[0]
    n_pad = -(-n_u // 32) * 32
    if n_pad > n_u:
      uniq = np.concatenate(
          [uniq, np.repeat(uniq[-1:], n_pad - n_u, axis=0)], axis=0
      )
    sel = {
        "dayofyear": xds.DataArray(
            uniq[:, 0].astype(np.int32), dims=("__clim_upair",)
        ),
    }
    if "hour" in indices:
      sel["hour"] = xds.DataArray(
          uniq[:, 1].astype(np.int32), dims=("__clim_upair",)
      )
    chunk = self._clim_host.isel(sel)
    # materialize now so the engine ships plain arrays to the device
    clim_u = chunk.copy(
        data={
            k: np.asarray(v.data)
            for k, v in chunk.variables_dict().items()
        }
    )
    uinv = xds.DataArray(
        inv.reshape(doy.shape).astype(np.int32), dims=dims
    )
    return {"clim_u": clim_u, "uinv": uinv}

  @staticmethod
  def _prepared_clim_chunk(prepared):
    """Chunk-shaped climatology from any prepared form (device-resident
    indexed gather, deduped host-gather, or a pre-gathered chunk)."""
    if "clim_u" in prepared:
      return prepared["clim_u"].isel({"__clim_upair": prepared["uinv"]})
    if "clim_chunk" in prepared:
      return prepared["clim_chunk"]
    clim = prepared["clim"]
    indices = prepared["indices"]
    sel = {"dayofyear": indices["doy"]}
    if "hour" in indices:
      sel["hour"] = indices["hour"]
    return clim.isel(sel)

  def compute_chunk_prepared(self, forecast, truth, prepared, region=None,
                             skipna=False):
    climatology_chunk = self._prepared_clim_chunk(prepared)
    forecast_anom = forecast - climatology_chunk
    truth_anom = truth - climatology_chunk
    return _spatial_average(
        forecast_anom * truth_anom, region=region, skipna=skipna
    ) / _sqrt(
        _spatial_average(forecast_anom**2, region=region, skipna=skipna)
        * _spatial_average(truth_anom**2, region=region, skipna=skipna)
    )

  supports_pointwise_fused: t.ClassVar[bool] = True

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    """Three stacked anomaly products: fa*ta, fa^2, ta^2 (dim __fstat).

    The products can differ in dims (e.g. the truth anomaly has no
    lead_time under the by-valid convention), so each variable's three
    fields are broadcast to their union dims before stacking — the
    regional mean of a broadcast field equals the broadcast of the mean,
    matching the reference's three independent `_spatial_average` calls.
    """
    del skipna
    climatology_chunk = self._prepared_clim_chunk(prepared)
    fa = forecast - climatology_chunk
    ta = truth - climatology_chunk
    num = fa * ta
    fsq = fa * fa
    tsq = ta * ta
    out = xds.Dataset({}, coords={
        k: v for k, v in num.coords_dict().items()
    })
    for name in num.keys():
      vs = [
          num.variables_dict()[name],
          fsq.variables_dict()[name],
          tsq.variables_dict()[name],
      ]
      dims = xds.broadcast_dims_order(*(v.dims for v in vs))
      sizes: dict = {}
      for v in vs:
        sizes.update(v.sizes)
      xp = _xp(*(v.data for v in vs))
      arrs = [v.broadcast_to_dims(dims, sizes, xp=xp).data for v in vs]
      out[name] = xds.Variable(("__fstat",) + dims, xp.stack(arrs))
    return out

  def finalize_fused(self, means, skipna=False):
    del skipna
    num = means.isel(__fstat=0, drop=True)
    fvar = means.isel(__fstat=1, drop=True)
    tvar = means.isel(__fstat=2, drop=True)
    return num / _sqrt(fvar * tvar)

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self.compute_chunk_prepared(
        forecast, truth, self.prepare_chunk(forecast, truth),
        region=region, skipna=skipna,
    )


@dataclasses.dataclass
class SpatialSEEPS(Metric):
  """Stable Equitable Error in Probability Space (Rodwell et al. 2010).

  Scores 3-category precipitation (dry / light / heavy) against per-location
  climatological wet thresholds and dry fractions (reference
  metrics.py:418-508).

  Attributes:
    climatology: dataset containing ``{precip_name}_seeps_threshold`` [m]
      and ``{precip_name}_seeps_dry_fraction`` [0-1].
    dry_threshold_mm: dry threshold in mm.
    precip_name: name of the precipitation variable.
    min_p1 / max_p1: mask out locations with climatological dry fraction
      outside (min_p1, max_p1).
  """

  climatology: xds.Dataset
  dry_threshold_mm: float = 0.25
  precip_name: str = "total_precipitation_24hr"
  min_p1: float = 0.1
  max_p1: float = 0.85

  @functools.cached_property
  def p1(self) -> xds.DataArray:
    dry_fraction = self.climatology[
        f"{self.precip_name}_seeps_dry_fraction"
    ]
    return dry_fraction.mean(["hour", "dayofyear"])

  def _category_indicators(self, ds: xds.Dataset, wet: xds.DataArray):
    """(dry, light, heavy) float indicators with NaN propagation."""
    dry_threshold = self.dry_threshold_mm / 1000.0
    da = ds[self.precip_name]
    nan_mask = da.notnull()
    dry = (da < dry_threshold).astype(float).where(nan_mask)
    light = ((da > dry_threshold) & (da < wet)).astype(float).where(nan_mask)
    heavy = (da >= wet).astype(float).where(nan_mask)
    return dry, light, heavy

  def prepare_chunk(self, forecast, truth):
    wet_threshold = self.climatology[f"{self.precip_name}_seeps_threshold"]
    if "time" in truth.sizes and "time" not in forecast.sizes:
      # compact-truth streaming chunk (truth h2d dedup): truth's 1-D
      # time axis IS the chunk's unique valid times, so gathering the
      # wet threshold there ships one row per unique time and expands
      # on device with the truth — instead of a chunk-shaped
      # (init, lead, space) companion
      tt = truth["time"]
      wet = wet_threshold.sel(
          dayofyear=tt.dt.dayofyear, hour=tt.dt.hour
      )
      return {"wet": wet, "p1": self.p1}
    valid_time = forecast["valid_time"]
    wet = wet_threshold.sel(
        dayofyear=valid_time.dt.dayofyear, hour=valid_time.dt.hour
    )
    return {"wet": wet, "p1": self.p1}

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self.compute_chunk_prepared(
        forecast, truth, self.prepare_chunk(forecast, truth),
        region=region, skipna=skipna,
    )

  def compute_chunk_prepared(self, forecast, truth, prepared, region=None,
                             skipna=False):
    del skipna  # Ignored; effectively True because of the p1 mask.
    wet = prepared["wet"]
    f_dry, f_light, f_heavy = self._category_indicators(forecast, wet)
    t_dry, t_light, t_heavy = self._category_indicators(truth, wet)
    p1 = prepared["p1"]
    # Scoring matrix (row: forecast cat, col: truth cat), times 0.5:
    #   [[0,            1/(1-p1),   4/(1-p1)],
    #    [1/p1,         0,          3/(1-p1)],
    #    [1/p1+3/(2+p1), 3/(2+p1),  0       ]]
    one = 1.0
    result = 0.5 * (
        f_dry * t_light * (one / (1 - p1))
        + f_dry * t_heavy * (4.0 / (1 - p1))
        + f_light * t_dry * (one / p1)
        + f_light * t_heavy * (3.0 / (1 - p1))
        + f_heavy * t_dry * (one / p1 + 3.0 / (2 + p1))
        + f_heavy * t_light * (3.0 / (2 + p1))
    )
    result = result.where(p1 < self.max_p1, np.nan)
    result = result.where(p1 > self.min_p1, np.nan)
    return xds.Dataset(
        {f"{self.precip_name}": result.variable},
        coords={**result.coords},
    )


@dataclasses.dataclass
class SEEPS(SpatialSEEPS):
  """Spatially averaged SEEPS."""

  supports_pointwise_fused: t.ClassVar[bool] = True
  #: the p1 mask NaNs out climatologically degenerate cells; the spatial
  #: mean always excludes them (skipna=True semantics)
  fused_nan_mode: t.ClassVar[str] = "skip"

  def compute_chunk_prepared(self, forecast, truth, prepared, region=None,
                             skipna=False):
    del skipna  # Ignored; effectively True because of the p1 mask.
    result = SpatialSEEPS.compute_chunk_prepared(
        self, forecast, truth, prepared, region
    )
    return _spatial_average(result, region=region, skipna=True)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del skipna
    if self.precip_name not in truth.keys():
      return None
    return SpatialSEEPS.compute_chunk_prepared(
        self, forecast, truth, prepared, region=None
    )


################################################################################
# Probabilistic metrics.
################################################################################


def _get_n_ensemble(
    ds: xds.Dataset, ensemble_dim: str, expect_n_ensemble_at_least: int = 1
) -> int:
  if ensemble_dim not in ds.sizes:
    raise ValueError(f"ensemble_dim={ensemble_dim!r} not found in {ds.sizes}")
  n_ensemble = ds.sizes[ensemble_dim]
  if n_ensemble < expect_n_ensemble_at_least:
    raise ValueError(
        f"{n_ensemble=} is less than expected size of "
        f"{expect_n_ensemble_at_least}"
    )
  return n_ensemble


def _debiased_ensemble_mean_mse(
    forecast: xds.Dataset,
    truth: xds.Dataset,
    ensemble_dim: str,
    skipna: bool,
) -> xds.Dataset:
  """Unbiased estimate of E(forecast.mean() - truth)²."""
  forecast_mean = forecast.mean(ensemble_dim, skipna=skipna)
  forecast_var = forecast.var(ensemble_dim, skipna=skipna, ddof=1)
  biased_mse = (truth - forecast_mean) ** 2
  return biased_mse - forecast_var / _get_n_ensemble(forecast, ensemble_dim)


@dataclasses.dataclass
class EnsembleMetric(Metric):
  """Ensemble metric base class."""

  ensemble_dim: str = REALIZATION

  def _ensemble_slice(self, ds: xds.Dataset, slice_obj: slice) -> xds.Dataset:
    ds = ds.isel({self.ensemble_dim: slice_obj})
    return ds.assign_coords(
        {self.ensemble_dim: np.arange(ds.sizes[self.ensemble_dim])}
    )

  def compute(self, forecast, truth, region=None, skipna=False):
    result = super().compute(forecast, truth, region=region, skipna=skipna)
    return result.assign_attrs(
        ensemble_size=forecast.sizes[self.ensemble_dim]
    )


def _rankdata(x, axis: int):
  """Ordinal rank along axis, 1-based (ties broken by order)."""
  xp = _xp(x)
  j = xp.argsort(x, axis=axis)
  ranks = xp.argsort(j, axis=axis) + 1
  return ranks


def _pointwise_crps_spread(
    forecast: xds.Dataset, ensemble_dim: str, skipna: bool
) -> xds.Dataset:
  """CRPS spread E|X - X'| via the sorted/rank PWM estimator (Zamo eqn 3).

  λ₂ = 1/(M(M-1)) Σᵢ (2i - M - 1) X₍ᵢ₎ computed via ranks: O(M log M)
  compute instead of the O(M²) pairwise double sum.
  """
  n_ensemble = _get_n_ensemble(forecast, ensemble_dim)
  if n_ensemble < 2:
    return xds.zeros_like(forecast.isel({ensemble_dim: 0}))

  def per_var(da: xds.DataArray) -> xds.DataArray:
    ax = da.dims.index(ensemble_dim)
    if _is_jax(da.data) and not skipna:
      # Equivalent sorted form: Σᵢ (2·rank(xᵢ) - M - 1)·xᵢ =
      # Σᵢ (2i - M - 1)·x₍ᵢ₎ — ONE sort instead of a double argsort
      # (TPU sort networks dominate compile and run time at M≈50).
      import jax.numpy as jnp

      xs = jnp.sort(da.data, axis=ax)
      coef_shape = [1] * da.ndim
      coef_shape[ax] = n_ensemble
      coef = (2 * jnp.arange(1, n_ensemble + 1) - n_ensemble - 1).reshape(
          coef_shape
      )
      spread = 2 * (coef * xs).mean(axis=ax) / (n_ensemble - 1)
      dims = tuple(d for d in da.dims if d != ensemble_dim)
      coords = {
          k: v for k, v in da.coords.items()
          if ensemble_dim not in v.dims
      }
      return xds.DataArray(
          xds.Variable(dims, spread), coords=coords, name=da.name
      )
    rank = da.copy(data=_rankdata(da.data, ax))
    return (
        2
        * (((2 * rank - n_ensemble - 1) * da).mean(
            ensemble_dim, skipna=skipna
        ))
        / (n_ensemble - 1)
    )

  return forecast.map(per_var)


_CRPS_SPREAD_CACHE: dict = {}


def _pointwise_crps_spread_cached(
    forecast: xds.Dataset, ensemble_dim: str, skipna: bool
) -> xds.Dataset:
  """Single-slot cache over `_pointwise_crps_spread` for the host path.

  The in-memory metric×region loop evaluates CRPS, CRPSSpread and
  CRPSSkill against the SAME forecast for every region; without a cache
  the O(M log M) member sort reruns per metric × region (the reference
  caches it with dataset_safe_lru_cache(maxsize=1), reference
  metrics.py:775-780).  Keyed by payload identity, holding a reference to
  the forecast so ids stay valid; jax-traced payloads bypass the cache
  (the streaming engine's jit program already CSEs the sort).
  """
  cacheable = all(
      isinstance(v.data, np.ndarray)
      for v in forecast.variables_dict().values()
  )
  if not cacheable:
    return _pointwise_crps_spread(forecast, ensemble_dim, skipna)
  key = (
      tuple((n, id(v.data)) for n, v in forecast.variables_dict().items()),
      ensemble_dim,
      bool(skipna),
  )
  if _CRPS_SPREAD_CACHE.get("key") == key:
    return _CRPS_SPREAD_CACHE["result"]
  result = _pointwise_crps_spread(forecast, ensemble_dim, skipna)
  _CRPS_SPREAD_CACHE.clear()
  _CRPS_SPREAD_CACHE.update(
      {"key": key, "forecast": forecast, "result": result}
  )
  return result


def _pointwise_crps_skill(
    forecast: xds.Dataset, truth: xds.Dataset, ensemble_dim: str, skipna: bool
) -> xds.Dataset:
  """CRPS skill E|X - Y| at each point."""
  _get_n_ensemble(forecast, ensemble_dim)
  return abs(truth - forecast).mean(ensemble_dim, skipna=skipna)


@dataclasses.dataclass
class CRPS(EnsembleMetric):
  """Continuous Ranked Probability Score: E|X-Y| - 0.5 E|X-X'|.

  Uses the PWM rank estimator from [Zamo & Naveau 2018]; unbiased for
  ensembles of 2+ members.
  """

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return CRPSSkill(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    ) - 0.5 * CRPSSpread(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    )


@dataclasses.dataclass
class CRPSSpread(EnsembleMetric):
  """The spread measure associated with CRPS, E|X - X'|."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _spatial_average(
        _pointwise_crps_spread_cached(
            forecast, self.ensemble_dim, skipna=skipna
        ),
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class CRPSSkill(EnsembleMetric):
  """The skill measure associated with CRPS, E|X - Y|."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _spatial_average(
        _pointwise_crps_skill(forecast, truth, self.ensemble_dim,
                              skipna=skipna),
        region=region,
        skipna=skipna,
    )


# Spatial* metrics and RankHistogram intentionally stay OUTSIDE the
# fused tiers (parallel/streaming._partition_fused): spatial variants
# emit per-cell maps, so there is no region reduction to fuse — the
# per-cell field IS the result and XLA fuses its elementwise math inside
# the single chunk program, where CSE also shares the member sort with
# the CRPS family.  RankHistogram reduces to per-bin counts: its
# scatter-add/bincount form is one pass over the small rank field, while
# routing it through the region matmul would require a dense (bins x
# cells) one-hot — tens of times the chunk bytes in HBM.  Measured at
# the official geometry by tools/measure_pointwise.py spatial_hist_240.


@dataclasses.dataclass
class SpatialCRPS(EnsembleMetric):
  """CRPS without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return SpatialCRPSSkill(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    ) - 0.5 * SpatialCRPSSpread(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    )


@dataclasses.dataclass
class SpatialCRPSSpread(EnsembleMetric):
  """CRPSSpread without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _pointwise_crps_spread_cached(
        forecast, self.ensemble_dim, skipna=skipna
    )


@dataclasses.dataclass
class SpatialCRPSSkill(EnsembleMetric):
  """CRPSSkill without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _pointwise_crps_skill(
        forecast, truth, self.ensemble_dim, skipna=skipna
    )


def _gaussian_var_pairs(forecast: xds.Dataset) -> list[str]:
  return [
      str(var)
      for var in forecast.keys()
      if f"{var}_std" in forecast.keys()
  ]


def _pointwise_gaussian_crps(
    forecast: xds.Dataset, truth: xds.Dataset
) -> xds.Dataset:
  """Closed-form CRPS of a Gaussian forecast (Gneiting et al. 2005)."""
  dataset = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  for var_name in _gaussian_var_pairs(forecast):
    std = forecast[f"{var_name}_std"]
    norm_diff = (forecast[var_name] - truth[var_name]) / std
    value = std * (
        norm_diff * (2 * _norm_cdf(norm_diff) - 1)
        + 2 * _norm_pdf(norm_diff)
        - 1 / np.sqrt(np.pi)
    )
    dataset[var_name] = value
  return dataset


@dataclasses.dataclass
class GaussianCRPS(Metric):
  """The analytical formulation of CRPS for a Gaussian."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return _spatial_average(
        _pointwise_gaussian_crps(forecast, truth),
        region=region,
        skipna=skipna,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    if not _gaussian_var_pairs(forecast):
      return None
    return _pointwise_gaussian_crps(forecast, truth)


@dataclasses.dataclass
class GaussianVariance(Metric):
  """The variance of a Gaussian forecast."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del truth
    dataset = xds.Dataset({}, coords=dict(forecast.coords_dict()))
    for var_name in _gaussian_var_pairs(forecast):
      std = forecast[f"{var_name}_std"]
      dataset[var_name] = std * std
    return _spatial_average(dataset, region=region, skipna=skipna)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del truth, prepared, skipna
    if not _gaussian_var_pairs(forecast):
      return None
    dataset = xds.Dataset({}, coords=dict(forecast.coords_dict()))
    for var_name in _gaussian_var_pairs(forecast):
      std = forecast[f"{var_name}_std"]
      dataset[var_name] = std * std
    return dataset


@dataclasses.dataclass
class ThresholdMetric(Metric):
  """Base class for metrics based on climatological thresholds."""

  thresholds: Sequence[thresholds_lib.Threshold] = ()

  def prepare_chunk(self, forecast, truth):
    """Precompute the (coordinate-dependent) threshold datasets."""
    return [threshold.compute(truth) for threshold in self.thresholds]

  def compute_chunk_prepared(self, forecast, truth, prepared, region=None,
                             skipna=False):
    self._prepared_thresholds = prepared
    try:
      return self.compute_chunk(forecast, truth, region=region,
                                skipna=skipna)
    finally:
      self._prepared_thresholds = None

  def _map_over_thresholds(
      self,
      calculate_score,
      forecast,
      truth,
      region,
      skipna,
      spatial_agg,
  ) -> xds.Dataset:
    prepared = getattr(self, "_prepared_thresholds", None)
    scores = []
    for i, threshold in enumerate(self.thresholds):
      threshold_ds = (
          prepared[i] if prepared is not None else threshold.compute(truth)
      )
      score = calculate_score(forecast, truth, threshold_ds)
      if spatial_agg:
        score = _spatial_average(score, region=region, skipna=skipna)
      scores.append(
          score.expand_dims({"quantile": [threshold.quantile]})
      )
    threshold_method = type(self.thresholds[0]).__name__
    return xds.concat(scores, dim="quantile").assign_attrs(
        threshold_method=threshold_method
    )

  def _pointwise_threshold_fields(
      self, calculate_score, forecast, truth, prepared
  ) -> t.Optional[xds.Dataset]:
    """Pointwise per-threshold scores stacked along a `quantile` dim."""
    if not self.thresholds:
      return None
    scores = []
    for i, threshold in enumerate(self.thresholds):
      threshold_ds = (
          prepared[i] if prepared is not None else threshold.compute(truth)
      )
      scores.append(
          calculate_score(forecast, truth, threshold_ds).expand_dims(
              {"quantile": [threshold.quantile]}
          )
      )
    threshold_method = type(self.thresholds[0]).__name__
    return xds.concat(scores, dim="quantile").assign_attrs(
        threshold_method=threshold_method
    )


def _binarize_gt(ds: xds.Dataset, threshold: xds.Dataset) -> xds.Dataset:
  return (ds > threshold).astype(np.float64)


_PINF_SUFFIX = "__pinf"


def _inf_safe_fields(fields: xds.Dataset) -> xds.Dataset:
  """Replace ±inf cells with 0 and record them in companion indicator rows.

  Ignorance scores are -log(probability) and hit +inf wherever the
  forecast assigns probability zero to the observed category.  Inf cells
  cannot enter the fused region kernel: a zero region weight times inf is
  NaN inside the dot product, poisoning regions that exclude the cell.
  The indicator row rides the same kernel pass; ``_inf_safe_finalize``
  restores +inf for any region that actually contains an inf cell —
  matching the reference's xarray region mean (reference
  metrics.py:941-1060, where a zero-probability cell makes the regional
  ignorance infinite).  NaN cells pass through untouched (isinf(nan) is
  false), so the tier's NaN accounting is unaffected.
  """
  out = xds.Dataset({}, coords=dict(fields.coords_dict()))
  for name in fields.keys():
    v = fields[name]
    is_inf = (abs(v) == np.inf).astype(np.float64)
    out[name] = xds.where(is_inf, 0.0, v)
    out[name + _PINF_SUFFIX] = is_inf
  return out.assign_attrs(**fields.attrs)


def _inf_safe_finalize(means: xds.Dataset) -> xds.Dataset:
  out = xds.Dataset({}, coords=dict(means.coords_dict()))
  for name in means.keys():
    if name.endswith(_PINF_SUFFIX):
      continue
    base = means[name]
    # a NaN regional mean (skipna=False with a NaN cell in the region)
    # must stay NaN even when an inf cell is also present — the generic
    # non-skipna mean of {NaN, inf, ...} is NaN
    restored = xds.where(
        (means[name + _PINF_SUFFIX] > 0) & base.notnull(), np.inf, base
    )
    out[name] = restored
  return out.assign_attrs(**means.attrs)


def _compute_gaussian_brier_score(forecast, truth, threshold):
  """Brier score for a Gaussian forecast distribution."""
  truth_probability = _binarize_gt(truth, threshold)
  exceedance = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  for var_name in _gaussian_var_pairs(forecast):
    std = forecast[f"{var_name}_std"]
    norm_threshold = (threshold[var_name] - forecast[var_name]) / std
    exceedance[var_name] = 1 - _norm_cdf(norm_threshold)
  return (exceedance - truth_probability) ** 2


@dataclasses.dataclass
class GaussianBrierScore(ThresholdMetric):
  """Brier score of a Gaussian forecast at climatological thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        _compute_gaussian_brier_score,
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del skipna
    if not _gaussian_var_pairs(forecast):
      return None
    return self._pointwise_threshold_fields(
        _compute_gaussian_brier_score, forecast, truth, prepared
    )


def _compute_gaussian_ignorance_score(forecast, truth, threshold):
  """Ignorance (log) score for a Gaussian forecast distribution."""
  truth_probability = _binarize_gt(truth, threshold)
  out = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  for var_name in _gaussian_var_pairs(forecast):
    std = forecast[f"{var_name}_std"]
    norm_threshold = (threshold[var_name] - forecast[var_name]) / std
    cdf_value = _norm_cdf(norm_threshold)
    out[var_name] = -xds.where(
        truth_probability[var_name],
        _log(1 - cdf_value),
        _log(cdf_value),
    )
  return out


@dataclasses.dataclass
class GaussianIgnoranceScore(ThresholdMetric):
  """Ignorance score of a Gaussian forecast at climatological thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        _compute_gaussian_ignorance_score,
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del skipna
    if not _gaussian_var_pairs(forecast):
      return None
    fields = self._pointwise_threshold_fields(
        _compute_gaussian_ignorance_score, forecast, truth, prepared
    )
    return None if fields is None else _inf_safe_fields(fields)

  def finalize_fused(self, means, skipna=False):
    del skipna
    return _inf_safe_finalize(means)


def _compute_gaussian_rps_part(forecast, truth, threshold):
  """One threshold's contribution to Gaussian RPS."""
  truth_ecdf = (truth < threshold).astype(np.float64)
  cdf_values = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  for var_name in _gaussian_var_pairs(forecast):
    std = forecast[f"{var_name}_std"]
    norm_threshold = (threshold[var_name] - forecast[var_name]) / std
    cdf_values[var_name] = _norm_cdf(norm_threshold)
  return (cdf_values - truth_ecdf) ** 2


@dataclasses.dataclass
class GaussianRPS(ThresholdMetric):
  """Ranked probability score of a Gaussian forecast over thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        _compute_gaussian_rps_part,
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    ).sum("quantile")

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del skipna
    if not _gaussian_var_pairs(forecast):
      return None
    return self._pointwise_threshold_fields(
        _compute_gaussian_rps_part, forecast, truth, prepared
    )

  def finalize_fused(self, means, skipna=False):
    del skipna
    return means.sum("quantile")


@dataclasses.dataclass
class EnsembleStddevSqrtBeforeTimeAvg(EnsembleMetric):
  """Area-averaged L2 norm of the ensemble standard deviation."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del truth
    n_ensemble = _get_n_ensemble(forecast, self.ensemble_dim)
    if n_ensemble == 1:
      return xds.zeros_like(
          _spatial_average(forecast, region=region, skipna=skipna).mean(
              self.ensemble_dim, skipna=skipna
          )
      )
    return _spatial_average_l2_norm(
        forecast.std(self.ensemble_dim, ddof=1, skipna=skipna),
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class EnsembleVariance(EnsembleMetric):
  """The variance of an ensemble of forecasts."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del truth
    n_ensemble = _get_n_ensemble(forecast, self.ensemble_dim)
    if n_ensemble == 1:
      return xds.zeros_like(
          _spatial_average(forecast, region=region, skipna=skipna).mean(
              self.ensemble_dim, skipna=skipna
          )
      )
    return _spatial_average(
        forecast.var(self.ensemble_dim, ddof=1, skipna=skipna),
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class SpatialEnsembleVariance(EnsembleMetric):
  """Ensemble variance without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    del truth
    n_ensemble = _get_n_ensemble(forecast, self.ensemble_dim)
    if n_ensemble == 1:
      return xds.zeros_like(forecast).mean(self.ensemble_dim, skipna=skipna)
    return forecast.var(self.ensemble_dim, ddof=1, skipna=skipna)


@dataclasses.dataclass
class EnsembleMeanRMSESqrtBeforeTimeAvg(EnsembleMetric):
  """RMSE between the ensemble mean and ground truth (sqrt before t-avg)."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return _spatial_average_l2_norm(
        truth - forecast.mean(self.ensemble_dim, skipna=skipna),
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class EnsembleMeanMSE(EnsembleMetric):
  """MSE between the ensemble mean and ground truth (bias σ²/n)."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return _spatial_average(
        (truth - forecast.mean(self.ensemble_dim, skipna=skipna)) ** 2,
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class DebiasedEnsembleMeanMSE(EnsembleMetric):
  """Unbiased MSE between ensemble mean and truth (requires n > 1)."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return _spatial_average(
        _debiased_ensemble_mean_mse(
            forecast, truth, self.ensemble_dim, skipna=skipna
        ),
        region=region,
        skipna=skipna,
    )


@dataclasses.dataclass
class SpatialEnsembleMeanMSE(EnsembleMetric):
  """EnsembleMeanMSE without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return (truth - forecast.mean(self.ensemble_dim, skipna=skipna)) ** 2


@dataclasses.dataclass
class DebiasedSpatialEnsembleMeanMSE(EnsembleMetric):
  """DebiasedEnsembleMeanMSE without spatial averaging."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return _debiased_ensemble_mean_mse(
        forecast, truth, self.ensemble_dim, skipna=skipna
    )


@dataclasses.dataclass
class EnergyScore(EnsembleMetric):
  """Energy score E‖X-Y‖ - 0.5 E‖X-X'‖ with adjacent-difference spread."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return EnergyScoreSkill(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    ) - 0.5 * EnergyScoreSpread(self.ensemble_dim).compute_chunk(
        forecast, truth, region=region, skipna=skipna
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    """Squared skill/spread difference fields; the L2 norm's sqrt and the
    member means happen after the regional reduction (finalize_fused).
    Spread pair differences get their own `{ensemble_dim}_pairs` dim (one
    fewer entry than the member dim)."""
    del prepared, skipna
    if forecast.sizes.get(self.ensemble_dim, 0) < 2:
      return None
    skill = forecast - truth
    skill = skill * skill
    spread = self._ensemble_slice(
        forecast, slice(None, -1)
    ) - self._ensemble_slice(forecast, slice(1, None))
    spread = (spread * spread).rename(
        {self.ensemble_dim: f"{self.ensemble_dim}_pairs"}
    )
    out = xds.Dataset({}, coords={
        k: v
        for k, v in skill.coords_dict().items()
        if self.ensemble_dim not in v.dims
    })
    for name in truth.keys():
      out[f"__es_skill__{name}"] = skill[name].variable
      out[f"__es_spread__{name}"] = spread[name].variable
    return out

  def finalize_fused(self, means, skipna=False):
    out = xds.Dataset({}, coords={
        k: v
        for k, v in means.coords_dict().items()
        if not (
            {self.ensemble_dim, f"{self.ensemble_dim}_pairs"} & set(v.dims)
        )
    })
    pair_dim = f"{self.ensemble_dim}_pairs"
    for name in means.keys():
      if not str(name).startswith("__es_skill__"):
        continue
      base = str(name)[len("__es_skill__"):]
      skill = _sqrt(means[name]).mean(self.ensemble_dim, skipna=skipna)
      spread = _sqrt(means[f"__es_spread__{base}"]).mean(
          pair_dim, skipna=skipna
      )
      out[base] = (skill - 0.5 * spread).variable
    return out


@dataclasses.dataclass
class EnergyScoreSpread(EnsembleMetric):
  """Energy score spread, E‖X - X'‖, via N-1 adjacent differences."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    n_ensemble = _get_n_ensemble(forecast, self.ensemble_dim)
    if n_ensemble == 1:
      return xds.zeros_like(
          _spatial_average(forecast, region=region, skipna=skipna).mean(
              self.ensemble_dim, skipna=skipna
          )
      )
    return _spatial_average_l2_norm(
        self._ensemble_slice(forecast, slice(None, -1))
        - self._ensemble_slice(forecast, slice(1, None)),
        region=region,
        skipna=skipna,
    ).mean(self.ensemble_dim, skipna=skipna)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del truth, prepared, skipna
    if forecast.sizes.get(self.ensemble_dim, 0) < 2:
      return None
    diff = self._ensemble_slice(
        forecast, slice(None, -1)
    ) - self._ensemble_slice(forecast, slice(1, None))
    return diff * diff

  def finalize_fused(self, means, skipna=False):
    return _sqrt(means).mean(self.ensemble_dim, skipna=skipna)


@dataclasses.dataclass
class EnergyScoreSkill(EnsembleMetric):
  """Energy score skill, E‖X - Y‖."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    _get_n_ensemble(forecast, self.ensemble_dim)
    return _spatial_average_l2_norm(
        forecast - truth, region=region, skipna=skipna
    ).mean(self.ensemble_dim, skipna=skipna)

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    del prepared, skipna
    if self.ensemble_dim not in forecast.sizes:
      return None
    diff = forecast - truth
    return diff * diff

  def finalize_fused(self, means, skipna=False):
    return _sqrt(means).mean(self.ensemble_dim, skipna=skipna)


def _compute_brier_score(
    forecast, truth, threshold, ensemble_dim, debias, skipna
):
  """Brier score of an ensemble forecast for one threshold."""
  truth_probability = xds.where(
      truth.isnull(), np.nan, _binarize_gt(truth, threshold)
  )
  forecast_probability = xds.where(
      forecast.isnull(), np.nan, _binarize_gt(forecast, threshold)
  )
  if debias:
    return _debiased_ensemble_mean_mse(
        forecast_probability, truth_probability, ensemble_dim, skipna=skipna
    )
  return (
      forecast_probability.mean(ensemble_dim, skipna=skipna)
      - truth_probability
  ) ** 2


@dataclasses.dataclass
class EnsembleBrierScore(EnsembleMetric, ThresholdMetric):
  """Brier score of an ensemble forecast at climatological thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=False,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    if self.ensemble_dim not in forecast.sizes:
      return None
    return self._pointwise_threshold_fields(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=False,
            skipna=skipna,
        ),
        forecast, truth, prepared,
    )


@dataclasses.dataclass
class SpatialEnsembleBrierScore(EnsembleMetric, ThresholdMetric):
  """Spatial map of ensemble Brier score."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=False,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=False,
    )


@dataclasses.dataclass
class DebiasedEnsembleBrierScore(EnsembleMetric, ThresholdMetric):
  """Debiased ensemble Brier score (requires n > 1)."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=True,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    if forecast.sizes.get(self.ensemble_dim, 0) < 2:
      return None
    return self._pointwise_threshold_fields(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=True,
            skipna=skipna,
        ),
        forecast, truth, prepared,
    )


@dataclasses.dataclass
class SpatialDebiasedEnsembleBrierScore(EnsembleMetric, ThresholdMetric):
  """Spatial map of debiased ensemble Brier score."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_brier_score,
            ensemble_dim=self.ensemble_dim,
            debias=True,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=False,
    )


def _compute_ignorance_score(forecast, truth, threshold, ensemble_dim,
                             skipna):
  """Ignorance score of an ensemble forecast for one threshold."""
  truth_probability = _binarize_gt(truth, threshold)
  forecast_probability = _binarize_gt(forecast, threshold)
  ensemble_forecast_probability = forecast_probability.mean(
      ensemble_dim, skipna=skipna
  )
  return -xds.where(
      truth_probability,
      _log(ensemble_forecast_probability),
      _log(1 - ensemble_forecast_probability),
  )


@dataclasses.dataclass
class EnsembleIgnoranceScore(EnsembleMetric, ThresholdMetric):
  """Ignorance score of an ensemble forecast at climatological thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_ignorance_score,
            ensemble_dim=self.ensemble_dim,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    )

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    if self.ensemble_dim not in forecast.sizes:
      return None
    fields = self._pointwise_threshold_fields(
        functools.partial(
            _compute_ignorance_score,
            ensemble_dim=self.ensemble_dim,
            skipna=skipna,
        ),
        forecast, truth, prepared,
    )
    return None if fields is None else _inf_safe_fields(fields)

  def finalize_fused(self, means, skipna=False):
    del skipna
    return _inf_safe_finalize(means)


@dataclasses.dataclass
class SpatialEnsembleIgnoranceScore(EnsembleMetric, ThresholdMetric):
  """Spatial map of ensemble ignorance score."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_ignorance_score,
            ensemble_dim=self.ensemble_dim,
            skipna=skipna,
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=False,
    )


def _compute_rps_part(forecast, truth, threshold, ensemble_dim, skipna):
  """One threshold's contribution to ensemble RPS."""
  truth_ecdf = (truth < threshold).astype(np.float64)
  forecast_ecdf = (forecast < threshold).astype(np.float64)
  ensemble_forecast_ecdf = forecast_ecdf.mean(ensemble_dim, skipna=skipna)
  return (ensemble_forecast_ecdf - truth_ecdf) ** 2


@dataclasses.dataclass
class EnsembleRPS(EnsembleMetric, ThresholdMetric):
  """Ranked probability score of an ensemble forecast over thresholds."""

  supports_pointwise_fused: t.ClassVar[bool] = True

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_rps_part, ensemble_dim=self.ensemble_dim, skipna=skipna
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=True,
    ).sum("quantile")

  def pointwise_chunk(self, forecast, truth, prepared, skipna):
    if self.ensemble_dim not in forecast.sizes:
      return None
    return self._pointwise_threshold_fields(
        functools.partial(
            _compute_rps_part, ensemble_dim=self.ensemble_dim, skipna=skipna
        ),
        forecast, truth, prepared,
    )

  def finalize_fused(self, means, skipna=False):
    del skipna
    return means.sum("quantile")


@dataclasses.dataclass
class SpatialEnsembleRPS(EnsembleMetric, ThresholdMetric):
  """Spatial map of ensemble RPS."""

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self._map_over_thresholds(
        functools.partial(
            _compute_rps_part, ensemble_dim=self.ensemble_dim, skipna=skipna
        ),
        forecast, truth, region=region, skipna=skipna, spatial_agg=False,
    ).sum("quantile")


class RankHistogram(EnsembleMetric):
  """Histogram of truth's rank with respect to forecast ensemble members.

  One-hot encoding over K+1 bins (optionally aggregated into num_bins that
  evenly divide K+1), with random tie breaking (reference
  metrics.py:1895-2042).  NaNs are treated as larger than any value.

  Computed in counting form: rank = (#members < truth) + floor(u·(#ties+1))
  with host-drawn u ~ U[0,1) for the random tie break.  The reference
  instead perturbs all values by under half the minimum nonzero gap and
  argsorts (metrics.py:1963-1990); among k exact ties that places truth
  uniformly over the k slots — exactly what the counting form computes —
  and can never reorder distinct values, so on NaN-free data the two forms
  agree bit-for-bit (asserted in tests).  The counting form is O(M) instead
  of O(M log M), needs no float64 (TPUs lack it), and is jit-safe with the
  tie-break draws supplied by ``prepare_chunk``.  Known deviation: when a
  point's ensemble contains NaN members, the reference's minimum-gap
  computation returns NaN and it silently falls back to perturbation size
  1, which CAN reorder distinct values ~0.5 apart; the counting form ranks
  those points exactly.
  """

  def __init__(
      self,
      ensemble_dim: str = REALIZATION,
      num_bins: t.Optional[int] = None,
      break_ties_randomly: bool = True,
      seed: t.Optional[int] = None,
  ):
    super().__init__(ensemble_dim=ensemble_dim)
    self.num_bins = num_bins
    self._break_ties_randomly = break_ties_randomly
    self._seed = seed

  def _num_bins_actual(self, ensemble_size: int) -> int:
    default_n_bins = ensemble_size + 1
    if self.num_bins is None:
      return default_n_bins
    if default_n_bins % self.num_bins:
      raise ValueError(
          f"Cannot bin data with {ensemble_size=} into {self.num_bins} bins"
      )
    return self.num_bins

  def prepare_chunk(self, forecast, truth):
    """Host-side tie-breaking draws: one uniform per non-ensemble point."""
    if not self._break_ties_randomly:
      return {}
    rng = np.random.default_rng(self._seed)
    out = {}
    for name in truth.keys():
      fda = forecast[name]
      dims = tuple(d for d in fda.dims if d != self.ensemble_dim)
      shape = tuple(fda.sizes[d] for d in dims)
      out[name] = xds.DataArray(
          rng.uniform(size=shape).astype(np.float32), dims=dims
      )
    return out

  def compute_chunk_prepared(
      self, forecast, truth, prepared, region=None, skipna=False
  ):
    del region, skipna  # rank histograms are unweighted and NaN-ranking
    ensemble_size = forecast.sizes[self.ensemble_dim]
    num_bins = self._num_bins_actual(ensemble_size)
    reduction_factor = (ensemble_size + 1) // num_bins

    out = xds.Dataset({}, coords={
        k: v
        for k, v in forecast.coords_dict().items()
        if self.ensemble_dim not in v.dims
    })
    bins_da = xds.DataArray(
        np.arange(num_bins, dtype=np.int32), dims=("bins",),
        coords={"bins": np.arange(num_bins)},
    )
    for name in truth.keys():
      fda = forecast[name]
      tda = truth[name]
      f_ok = fda.notnull()
      t_nan = tda.isnull()
      # NaN ranks above any value: a member is below a NaN truth iff it is
      # itself non-NaN.  NaN-vs-NaN ties are NOT broken randomly (the
      # reference's perturbation is inert on NaNs and its sort emits the
      # truth, concatenated first, ahead of NaN members), so `eq` counts
      # only real-value ties.
      lt = (fda < tda) | (t_nan & f_ok)
      eq = fda == tda
      count_less = lt.astype(np.float32).sum(self.ensemble_dim)
      if self._break_ties_randomly:
        count_eq = eq.astype(np.float32).sum(self.ensemble_dim)
        count_less = count_less + (
            prepared[name] * (count_eq + 1.0)
        ).astype(np.int32).astype(np.float32)
      rank = count_less.astype(np.int32) // np.int32(reduction_factor)
      out[name] = (rank == bins_da).astype(np.float32)
    out = out.assign_coords(bins=np.arange(num_bins))
    return out

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    return self.compute_chunk_prepared(
        forecast, truth, self.prepare_chunk(forecast, truth),
        region=region, skipna=skipna,
    )


def central_reliability(hist: xds.Dataset) -> xds.Dataset:
  """Reliability diagram for central rank-histogram probabilities."""
  n_bins = hist.sizes["bins"]
  if n_bins < 3:
    raise ValueError(f"Too few bins. {n_bins=} but should be >= 3")

  left = hist.isel(bins=np.arange(n_bins // 2)[::-1])  # reversed: inside-out
  right = hist.isel(bins=np.arange(n_bins // 2 + n_bins % 2, n_bins))
  linear_bins = np.arange(n_bins // 2)
  left = left.assign_coords(bins=linear_bins)
  right = right.assign_coords(bins=linear_bins)
  probs = (left + right).cumsum("bins").rename({"bins": "prob_index"})

  desired_prob_unnormalized = np.ones((n_bins // 2,))

  if n_bins % 2:
    probs = probs.assign_coords(prob_index=linear_bins + 1)
    center_prob = hist.isel(bins=n_bins // 2, drop=True)
    probs = xds.concat(
        [center_prob.expand_dims(prob_index=[0]), center_prob + probs],
        dim="prob_index",
    )
    desired_prob_unnormalized = np.concatenate(
        ([0.5], desired_prob_unnormalized)
    )
  else:
    probs = probs.assign_coords(prob_index=np.arange(n_bins // 2))

  desired_prob_unnormalized = np.cumsum(desired_prob_unnormalized)
  desired = desired_prob_unnormalized / desired_prob_unnormalized[-1]
  probs = probs.assign_coords(
      desired_prob=xds.Variable(("prob_index",), desired)
  )
  return probs.swap_dims({"prob_index": "desired_prob"})


# Aliases used by the reference's api.md / older papers (the reference code
# renamed these classes — see /root/reference/weatherbench2/metrics.py:237,
# :1162, :1270 — but its docs still use the short names).  Provided so users
# following the published docs find the classes they expect.
RMSE = RMSESqrtBeforeTimeAvg
EnsembleStddev = EnsembleStddevSqrtBeforeTimeAvg
EnsembleMeanRMSE = EnsembleMeanRMSESqrtBeforeTimeAvg
