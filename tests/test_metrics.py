"""Oracle tests for metrics: analytic values, brute-force comparisons,
statistical convergence, NaN handling — mirroring the reference test
strategy (reference metrics_test.py)."""
import numpy as np
import pytest
import scipy.stats

from weatherbench2_tpu import metrics, schema, utils, test_utils, xds
from weatherbench2_tpu.regions import (
    CombinedRegion,
    ExtraTropicalRegion,
    LandRegion,
    SliceRegion,
)


def get_random_truth_and_forecast(
    variables=("geopotential",),
    ensemble_size=None,
    seed=802701,
    **data_kwargs,
):
  """Random truth and forecast following the reference helper."""
  kwargs = dict(
      variables_3d=variables,
      variables_2d=[],
      time_start="2019-12-01",
      time_stop="2019-12-10",
      spatial_resolution_in_degrees=30.0,
  )
  kwargs.update(data_kwargs)
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=seed)
  forecast = utils.random_like(
      schema.mock_forecast_data(ensemble_size=ensemble_size, **kwargs),
      seed=seed + 1,
  )
  forecast = schema.apply_time_conventions(forecast, by_init=False)
  return truth, forecast


def lead_level_vals(ds, var="geopotential"):
  """Values transposed to canonical (lead_time, level) order."""
  da = ds[var]
  order = [d for d in ("lead_time", "level") if d in da.dims]
  rest = [d for d in da.dims if d not in order]
  return da.transpose(*(order + rest)).values


def manual_weighted_mean(values, lat, axes):
  """Brute-force latitude-weighted spatial mean (oracle)."""
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  # values dims: (..., longitude, latitude)
  wfull = np.broadcast_to(w, values.shape)
  return (values * wfull).sum(axes) / wfull.sum(axes)


def test_lat_weights_analytic():
  # At 30-degree spacing, cell areas integrate cos(lat); check against the
  # closed-form integrals sin(upper)-sin(lower).
  ds = schema.mock_truth_data(spatial_resolution_in_degrees=30.0)
  w = metrics.get_lat_weights(ds)
  lat = np.deg2rad(np.linspace(-90, 90, 7))
  bounds = np.concatenate([[-np.pi / 2], (lat[:-1] + lat[1:]) / 2,
                           [np.pi / 2]])
  expected = np.sin(bounds[1:]) - np.sin(bounds[:-1])
  expected /= expected.mean()
  np.testing.assert_allclose(w.values, expected, rtol=1e-12)
  # weighted mean of ones is one
  np.testing.assert_allclose(w.values.mean(), 1.0, rtol=1e-12)


def test_mse_oracle():
  truth, forecast = get_random_truth_and_forecast()
  result = metrics.MSE().compute(forecast, truth)
  err = forecast["geopotential"].values - truth["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean((err**2), lat, (-2, -1)).mean(1)  # time axis
  np.testing.assert_allclose(
      result["geopotential"].values, want, rtol=1e-6
  )


def test_rmse_sqrt_before_time_avg():
  truth, forecast = get_random_truth_and_forecast()
  result = metrics.RMSESqrtBeforeTimeAvg().compute(forecast, truth)
  err = forecast["geopotential"].values - truth["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  want = np.sqrt(manual_weighted_mean(err**2, lat, (-2, -1))).mean(1)
  np.testing.assert_allclose(result["geopotential"].values, want, rtol=1e-6)


def test_bias_and_mae():
  truth, forecast = get_random_truth_and_forecast()
  lat = np.linspace(-90, 90, 7)
  err = forecast["geopotential"].values - truth["geopotential"].values
  bias = metrics.Bias().compute(forecast, truth)
  np.testing.assert_allclose(
      bias["geopotential"].values,
      manual_weighted_mean(err, lat, (-2, -1)).mean(1),
      rtol=1e-6,
  )
  mae = metrics.MAE().compute(forecast, truth)
  np.testing.assert_allclose(
      mae["geopotential"].values,
      manual_weighted_mean(np.abs(err), lat, (-2, -1)).mean(1),
      rtol=1e-6,
  )


def test_wind_vector_mse():
  truth, forecast = get_random_truth_and_forecast(
      variables=("u_component_of_wind", "v_component_of_wind")
  )
  wv = metrics.WindVectorMSE(
      u_name="u_component_of_wind",
      v_name="v_component_of_wind",
      vector_name="wind_vector",
  )
  got = wv.compute(forecast, truth)
  u_err = (
      forecast["u_component_of_wind"].values
      - truth["u_component_of_wind"].values
  )
  v_err = (
      forecast["v_component_of_wind"].values
      - truth["v_component_of_wind"].values
  )
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean(u_err**2 + v_err**2, lat, (-2, -1)).mean(1)
  np.testing.assert_allclose(got.values, want, rtol=1e-6)
  # And attached inside MSE:
  mse = metrics.MSE(wind_vector_mse=[wv]).compute(forecast, truth)
  assert "wind_vector" in mse
  np.testing.assert_allclose(
      mse["wind_vector"].values, want, rtol=1e-6
  )


def test_spatial_metrics_no_averaging():
  truth, forecast = get_random_truth_and_forecast()
  got = metrics.SpatialMSE().compute(forecast, truth)
  err = forecast["geopotential"].values - truth["geopotential"].values
  np.testing.assert_allclose(
      got["geopotential"].values, (err**2).mean(1), rtol=1e-6
  )


def test_regions_slice_and_extratropical():
  truth, forecast = get_random_truth_and_forecast()
  lat = np.linspace(-90, 90, 7)
  err2 = (
      forecast["geopotential"].values - truth["geopotential"].values
  ) ** 2

  region = SliceRegion(lat_slice=slice(-30, 30))
  got = metrics.MSE().compute(forecast, truth, region=region)
  keep = (lat >= -30) & (lat <= 30)
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  wk = w[keep]
  sub = err2[..., keep]
  want = (
      (sub * wk).sum((-2, -1)) / (wk.sum() * sub.shape[-2])
  ).mean(1)
  np.testing.assert_allclose(got["geopotential"].values, want, rtol=1e-6)

  region = ExtraTropicalRegion()
  got = metrics.MSE().compute(forecast, truth, region=region)
  mask = np.abs(lat) >= 20
  wm = w * mask
  want = ((err2 * wm).sum((-2, -1)) / (wm.sum() * err2.shape[-2])).mean(1)
  np.testing.assert_allclose(got["geopotential"].values, want, rtol=1e-6)


def test_land_region_and_combined():
  truth, forecast = get_random_truth_and_forecast()
  lat = np.linspace(-90, 90, 7)
  lon = np.linspace(0, 360, 12, endpoint=False)
  rs = np.random.RandomState(0)
  lsm_values = rs.rand(7, 12)
  lsm = xds.DataArray(
      lsm_values, dims=("latitude", "longitude"),
      coords={"latitude": lat, "longitude": lon},
  )
  region = LandRegion(land_sea_mask=lsm, threshold=0.5)
  got = metrics.MSE().compute(forecast, truth, region=region)
  err2 = (
      forecast["geopotential"].values - truth["geopotential"].values
  ) ** 2
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  wm = w[None, :] * (lsm_values > 0.5).T  # -> (longitude, latitude)
  want = ((err2 * wm).sum((-2, -1)) / wm.sum()).mean(1)
  np.testing.assert_allclose(got["geopotential"].values, want, rtol=1e-6)

  combined = CombinedRegion(
      regions=[SliceRegion(lat_slice=slice(-30, 30)), region]
  )
  got2 = metrics.MSE().compute(forecast, truth, region=combined)
  assert np.isfinite(got2["geopotential"].values).all()


def test_acc_oracle():
  truth, forecast = get_random_truth_and_forecast()
  climatology = schema.mock_hourly_climatology_data(
      variables_3d=["geopotential"],
      variables_2d=[],
      spatial_resolution_in_degrees=30.0,
  )
  climatology = utils.random_like(climatology, seed=3)
  acc = metrics.ACC(climatology=climatology).compute(forecast, truth)

  # oracle: by-valid convention -> climatology gathered at forecast 'time'
  lat = np.linspace(-90, 90, 7)
  time = forecast.coords_dict()["time"].data
  import pandas as pd

  tidx = pd.DatetimeIndex(time)
  doy = np.asarray(tidx.dayofyear) - 1
  hour = np.asarray(tidx.hour)
  clim_vals = climatology["geopotential"].values  # (doy, hour, lev, lon, lat)
  clim_sel = clim_vals[doy, hour]  # (time, lev, lon, lat)
  # forecast dims: (lead_time, time, level, longitude, latitude)
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values  # (time, level, lon, lat)
  f_anom = f - clim_sel[None]
  t_anom = (tr - clim_sel)[None]
  num = manual_weighted_mean(f_anom * t_anom, lat, (-2, -1))
  den = np.sqrt(
      manual_weighted_mean(f_anom**2, lat, (-2, -1))
      * manual_weighted_mean(t_anom**2, lat, (-2, -1))
  )
  want = (num / den).mean(1)
  np.testing.assert_allclose(
      acc["geopotential"].values, want, rtol=1e-5
  )


def test_rankdata_vs_scipy():
  rs = np.random.RandomState(0)
  x = rs.randn(4, 9, 5)
  got = metrics._rankdata(x, axis=1)
  want = scipy.stats.rankdata(x, axis=1, method="ordinal")
  np.testing.assert_array_equal(got, want)


def _crps_brute_force(forecast, truth, lat, skipna=False):
  """O(M^2) CRPS oracle: skill - 0.5*spread with |xi-xj| double sum."""
  # forecast: (realization, lead, time, level, lon, lat)
  m = forecast.shape[0]
  mean = np.nanmean if skipna else np.mean
  skill = mean(np.abs(forecast - truth[None]), axis=0)
  spread = mean(
      np.abs(forecast[None, :] - forecast[:, None]), axis=(0, 1)
  )
  pointwise = skill - 0.5 * spread * m / (m - 1)  # fair correction
  return manual_weighted_mean(pointwise, lat, (-2, -1))


def test_crps_vs_brute_force():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=7)
  got = metrics.CRPS().compute(forecast, truth)
  lat = np.linspace(-90, 90, 7)
  f = forecast["geopotential"].values  # (real, lead, time, lev, lon, lat)
  tr = truth["geopotential"].values
  want = _crps_brute_force(f, tr, lat).mean(1)
  np.testing.assert_allclose(
      got["geopotential"].transpose("lead_time", "level").values,
      want,
      rtol=1e-6,
  )


def test_crps_one_member_equals_mae():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=1)
  got = metrics.CRPS().compute(forecast, truth)
  mae = metrics.MAE().compute(
      forecast.isel(realization=0), truth
  )
  np.testing.assert_allclose(
      got["geopotential"].transpose("lead_time", "level").values,
      mae["geopotential"].transpose("lead_time", "level").values,
      rtol=1e-6,
  )


def test_crps_spread_skill():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=5)
  spread = metrics.CRPSSpread().compute(forecast, truth)
  skill = metrics.CRPSSkill().compute(forecast, truth)
  crps = metrics.CRPS().compute(forecast, truth)
  want = skill["geopotential"] - 0.5 * spread["geopotential"]
  np.testing.assert_allclose(
      crps["geopotential"].transpose("lead_time", "level").values,
      want.transpose("lead_time", "level").values,
      rtol=1e-6,
  )


def test_ensemble_mean_mse_and_debiased():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=9)
  got = metrics.EnsembleMeanMSE().compute(forecast, truth)
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  biased = manual_weighted_mean(
      (tr[None] - f.mean(0)) ** 2, lat, (-2, -1)
  ).mean(1)
  np.testing.assert_allclose(lead_level_vals(got), biased, rtol=1e-6)

  got_db = metrics.DebiasedEnsembleMeanMSE().compute(forecast, truth)
  var = f.var(0, ddof=1)
  debiased = manual_weighted_mean(
      (tr[None] - f.mean(0)) ** 2 - var / 9, lat, (-2, -1)
  ).mean(1)
  np.testing.assert_allclose(lead_level_vals(got_db), debiased, rtol=1e-6)


def test_debiased_ensemble_mean_mse_convergence():
  """Debiased estimator with small ensemble ~ biased with large ensemble."""
  truth, forecast = get_random_truth_and_forecast(
      ensemble_size=100, time_stop="2019-12-03"
  )
  small = forecast.isel(realization=np.arange(5))
  debiased_small = metrics.DebiasedEnsembleMeanMSE().compute(small, truth)
  biased_large = metrics.EnsembleMeanMSE().compute(forecast, truth)
  np.testing.assert_allclose(
      debiased_small["geopotential"].values.mean(),
      biased_large["geopotential"].values.mean(),
      rtol=0.06,
  )


def test_ensemble_variance_and_stddev():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=6)
  var = metrics.EnsembleVariance().compute(forecast, truth)
  f = forecast["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean(f.var(0, ddof=1), lat, (-2, -1)).mean(1)
  np.testing.assert_allclose(var["geopotential"].values, want, rtol=1e-6)

  std = metrics.EnsembleStddevSqrtBeforeTimeAvg().compute(forecast, truth)
  want_std = np.sqrt(
      manual_weighted_mean(f.std(0, ddof=1) ** 2, lat, (-2, -1))
  ).mean(1)
  np.testing.assert_allclose(std["geopotential"].values, want_std, rtol=1e-6)


def test_ensemble_size_one_gives_zero_spread():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=1)
  var = metrics.EnsembleVariance().compute(forecast, truth)
  np.testing.assert_array_equal(var["geopotential"].values, 0.0)
  es = metrics.EnergyScoreSpread().compute(forecast, truth)
  np.testing.assert_array_equal(es["geopotential"].values, 0.0)


def test_energy_score():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=5)
  score = metrics.EnergyScore().compute(forecast, truth)
  skill = metrics.EnergyScoreSkill().compute(forecast, truth)
  spread = metrics.EnergyScoreSpread().compute(forecast, truth)
  want_score = skill["geopotential"] - 0.5 * spread["geopotential"]
  np.testing.assert_allclose(
      lead_level_vals(score),
      lead_level_vals(xds.Dataset({"geopotential": want_score.variable},
                                  coords=want_score.coords)),
      rtol=1e-6,
  )
  # oracle for skill
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  want_skill = np.sqrt(
      manual_weighted_mean((f - tr[None]) ** 2, lat, (-2, -1))
  ).mean(0).mean(1)
  np.testing.assert_allclose(
      lead_level_vals(skill), want_skill, rtol=1e-6
  )


def test_gaussian_crps_monte_carlo():
  """Analytic Gaussian CRPS ~ ensemble CRPS of samples from the Gaussian."""
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2019-12-01",
      time_stop="2019-12-02",
      spatial_resolution_in_degrees=60.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  forecast = schema.mock_forecast_data(**kwargs)
  forecast = schema.apply_time_conventions(forecast, by_init=False)
  # mean 0.3, std 1.2
  mean_, std_ = 0.3, 1.2
  fc = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  fc["geopotential"] = forecast["geopotential"] * 0 + mean_
  fc["geopotential_std"] = forecast["geopotential"] * 0 + std_
  got = metrics.GaussianCRPS().compute(fc, truth)

  # Monte-Carlo oracle
  rs = np.random.RandomState(0)
  m = 4000
  base = forecast["geopotential"].values
  samples = rs.normal(
      mean_, std_, size=(m,) + base.shape
  )
  ens = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  ens_dims = ("realization",) + forecast["geopotential"].dims
  ens["geopotential"] = xds.DataArray(samples, dims=ens_dims)
  ens = ens.assign_coords(realization=np.arange(m))
  want = metrics.CRPS().compute(ens, truth)
  np.testing.assert_allclose(
      lead_level_vals(got),
      lead_level_vals(want),
      rtol=0.05,
  )


def test_seeps_expected_values():
  """SEEPS with hand-built categories."""
  kwargs = dict(
      variables_3d=[],
      variables_2d=["total_precipitation_24hr"],
      time_start="2020-01-01",
      time_stop="2020-01-03",
      spatial_resolution_in_degrees=60.0,
  )
  truth = schema.mock_truth_data(
      **{**kwargs, "time_stop": "2020-01-05"}
  )
  forecast = schema.mock_forecast_data(lead_stop="1 day", **kwargs)
  forecast = schema.apply_time_conventions(forecast, by_init=True)

  clim = schema.mock_hourly_climatology_data(
      variables_3d=[],
      variables_2d=[
          "total_precipitation_24hr_seeps_threshold",
          "total_precipitation_24hr_seeps_dry_fraction",
      ],
      spatial_resolution_in_degrees=60.0,
  )
  p1 = 0.5
  wet_threshold = 3e-3  # 3 mm
  clim_data = {
      "total_precipitation_24hr_seeps_threshold": np.full(
          clim["total_precipitation_24hr_seeps_threshold"].shape,
          wet_threshold,
      ),
      "total_precipitation_24hr_seeps_dry_fraction": np.full(
          clim["total_precipitation_24hr_seeps_dry_fraction"].shape, p1
      ),
  }
  clim = clim.copy(data=clim_data)

  # forecast dry (0), truth heavy (5mm): score = 0.5 * 4/(1-p1) = 4.0
  fvals = np.zeros(forecast["total_precipitation_24hr"].shape)
  tvals = np.full(truth["total_precipitation_24hr"].shape, 5e-3)
  forecast = forecast.copy(data={"total_precipitation_24hr": fvals})
  truth = truth.copy(data={"total_precipitation_24hr": tvals})
  truth_sel = truth.sel(time=forecast["valid_time"])

  seeps = metrics.SEEPS(climatology=clim).compute_chunk(
      forecast, truth_sel
  )
  np.testing.assert_allclose(
      seeps["total_precipitation_24hr"].values,
      0.5 * 4 / (1 - p1),
      rtol=1e-6,
  )
  # forecast light (1mm), truth dry: score = 0.5 * 1/p1 = 1.0
  fvals2 = np.full_like(fvals, 1e-3)
  tvals2 = np.zeros_like(tvals)
  forecast2 = forecast.copy(data={"total_precipitation_24hr": fvals2})
  truth2 = truth.copy(data={"total_precipitation_24hr": tvals2})
  truth2_sel = truth2.sel(time=forecast2["valid_time"])
  seeps2 = metrics.SEEPS(climatology=clim).compute_chunk(
      forecast2, truth2_sel
  )
  np.testing.assert_allclose(
      seeps2["total_precipitation_24hr"].values, 0.5 / p1, rtol=1e-6
  )
  # perfect dry forecast scores 0
  forecast3 = forecast.copy(data={"total_precipitation_24hr": fvals * 0})
  seeps3 = metrics.SEEPS(climatology=clim).compute_chunk(
      forecast3, truth2_sel
  )
  np.testing.assert_allclose(
      seeps3["total_precipitation_24hr"].values, 0.0, atol=1e-12
  )


def test_seeps_p1_masking():
  kwargs = dict(
      variables_3d=[],
      variables_2d=["total_precipitation_24hr"],
      time_start="2020-01-01",
      time_stop="2020-01-03",
      spatial_resolution_in_degrees=60.0,
  )
  truth = schema.mock_truth_data(
      **{**kwargs, "time_stop": "2020-01-05"}
  )
  forecast = schema.mock_forecast_data(lead_stop="1 day", **kwargs)
  forecast = schema.apply_time_conventions(forecast, by_init=True)
  clim = schema.mock_hourly_climatology_data(
      variables_3d=[],
      variables_2d=[
          "total_precipitation_24hr_seeps_threshold",
          "total_precipitation_24hr_seeps_dry_fraction",
      ],
      spatial_resolution_in_degrees=60.0,
  )
  # p1 = 0.95 > max_p1=0.85 -> all NaN
  clim = clim.copy(data={
      "total_precipitation_24hr_seeps_threshold": np.full(
          clim["total_precipitation_24hr_seeps_threshold"].shape, 3e-3
      ),
      "total_precipitation_24hr_seeps_dry_fraction": np.full(
          clim["total_precipitation_24hr_seeps_dry_fraction"].shape, 0.95
      ),
  })
  truth_sel = truth.sel(time=forecast["valid_time"])
  spatial = metrics.SpatialSEEPS(climatology=clim).compute_chunk(
      forecast, truth_sel
  )
  assert np.isnan(spatial["total_precipitation_24hr"].values).all()


def test_nan_propagation_skipna():
  truth, forecast = get_random_truth_and_forecast()
  truth_nan = test_utils.insert_nan(truth, frac_nan=0.05)
  got = metrics.MSE().compute(forecast, truth_nan, skipna=False)
  assert np.isnan(got["geopotential"].values).any()
  got_skip = metrics.MSE().compute(forecast, truth_nan, skipna=True)
  assert not np.isnan(got_skip["geopotential"].values).any()
  # oracle for skipna=True
  lat = np.linspace(-90, 90, 7)
  err2 = (
      forecast["geopotential"].values - truth_nan["geopotential"].values
  ) ** 2
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  wfull = np.broadcast_to(w, err2.shape)
  valid = ~np.isnan(err2)
  want = (
      np.where(valid, err2 * wfull, 0).sum((-2, -1))
      / (wfull * valid).sum((-2, -1))
  ).mean(1)
  np.testing.assert_allclose(
      got_skip["geopotential"].values, want, rtol=1e-6
  )


class _FixedThreshold:
  """Test threshold with a constant value."""

  def __init__(self, value, quantile):
    self.value = value
    self.quantile = quantile

  def compute(self, truth):
    out = xds.Dataset({}, coords=dict(truth.coords_dict()))
    for k in truth.keys():
      da = truth[k]
      out[k] = da.copy(data=np.full(da.shape, self.value))
    return out


def test_ensemble_brier_score_oracle():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=4)
  thr = _FixedThreshold(0.0, 0.5)
  got = metrics.EnsembleBrierScore(thresholds=[thr]).compute(
      forecast, truth
  )
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  fprob = (f > 0).mean(0)
  tprob = (tr > 0).astype(float)
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean((fprob - tprob[None]) ** 2, lat,
                              (-2, -1)).mean(1)
  got_vals = np.squeeze(lead_level_vals(got))
  np.testing.assert_allclose(got_vals, want, rtol=1e-6)
  assert got.attrs.get("threshold_method") == "_FixedThreshold"


def test_debiased_brier_matches_formula():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=4)
  thr = _FixedThreshold(0.0, 0.5)
  got = metrics.DebiasedEnsembleBrierScore(thresholds=[thr]).compute(
      forecast, truth
  )
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  find = (f > 0).astype(float)
  tind = (tr > 0).astype(float)
  n = 4
  biased = (find.mean(0) - tind[None]) ** 2
  corr = find.var(0, ddof=1) / n
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean(biased - corr, lat, (-2, -1)).mean(1)
  np.testing.assert_allclose(
      np.squeeze(lead_level_vals(got)), want, rtol=1e-6
  )


def test_ensemble_rps_two_thresholds():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=4)
  thrs = [_FixedThreshold(-0.4, 0.33), _FixedThreshold(0.4, 0.67)]
  got = metrics.EnsembleRPS(thresholds=thrs).compute(forecast, truth)
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  lat = np.linspace(-90, 90, 7)
  total = 0
  for v in (-0.4, 0.4):
    fcdf = (f < v).mean(0)
    tcdf = (tr < v).astype(float)
    total += manual_weighted_mean((fcdf - tcdf[None]) ** 2, lat, (-2, -1))
  want = total.mean(1)
  np.testing.assert_allclose(
      np.squeeze(lead_level_vals(got)), want, rtol=1e-6
  )


def test_ensemble_ignorance_score():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=8)
  thr = _FixedThreshold(0.0, 0.5)
  got = metrics.EnsembleIgnoranceScore(thresholds=[thr]).compute(
      forecast, truth
  )
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  p = (f > 0).mean(0)
  t = (tr > 0).astype(float)[None]
  with np.errstate(divide="ignore"):
    pointwise = -np.where(t, np.log(p), np.log(1 - p))
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean(pointwise, lat, (-2, -1)).mean(1)
  np.testing.assert_allclose(
      np.squeeze(lead_level_vals(got)), want, rtol=1e-6
  )


def test_gaussian_brier_score():
  truth, forecast = get_random_truth_and_forecast()
  fc = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  fc["geopotential"] = forecast["geopotential"]
  fc["geopotential_std"] = abs(forecast["geopotential"]) + 0.5
  thr = _FixedThreshold(0.1, 0.5)
  got = metrics.GaussianBrierScore(thresholds=[thr]).compute(fc, truth)
  f = forecast["geopotential"].values
  std = np.abs(f) + 0.5
  tr = truth["geopotential"].values
  exceed = 1 - scipy.stats.norm.cdf((0.1 - f) / std)
  tprob = (tr > 0.1).astype(float)[None]
  lat = np.linspace(-90, 90, 7)
  want = manual_weighted_mean((exceed - tprob) ** 2, lat, (-2, -1)).mean(1)
  np.testing.assert_allclose(
      np.squeeze(lead_level_vals(got)), want, rtol=1e-6
  )


def test_rank_histogram_calibrated():
  """Well-calibrated: truth and forecast from same distribution -> flat."""
  truth, forecast = get_random_truth_and_forecast(
      ensemble_size=3, time_stop="2020-03-01"
  )
  hist = metrics.RankHistogram(seed=0).compute(forecast, truth)
  vals = hist["geopotential"].values  # (lead, level, lon, lat, bins)
  bins_mean = vals.mean(axis=tuple(range(vals.ndim - 1)))
  np.testing.assert_allclose(bins_mean, 0.25, atol=0.02)
  assert vals.shape[-1] == 4


def test_rank_histogram_miscalibrated():
  truth, forecast = get_random_truth_and_forecast(
      ensemble_size=3, time_stop="2020-02-01"
  )
  # shift truth up: it should land in the top bin more often
  truth_hi = truth.copy(
      data={"geopotential": truth["geopotential"].values + 10}
  )
  hist = metrics.RankHistogram(seed=0).compute(forecast, truth_hi)
  vals = hist["geopotential"].values
  bins_mean = vals.mean(axis=tuple(range(vals.ndim - 1)))
  assert bins_mean[-1] > 0.9


def test_rank_histogram_num_bins():
  truth, forecast = get_random_truth_and_forecast(ensemble_size=7)
  hist = metrics.RankHistogram(num_bins=4, seed=0).compute(forecast, truth)
  assert hist["geopotential"].values.shape[-1] == 4
  with pytest.raises(ValueError):
    metrics.RankHistogram(num_bins=3).compute(forecast, truth)


def test_central_reliability_closed_form():
  # A perfectly flat histogram gives desired_prob == actual prob.
  bins = 4
  hist = xds.Dataset(
      {"x": (("bins",), np.full(bins, 1 / bins))},
      coords={"bins": np.arange(bins)},
  )
  rel = metrics.central_reliability(hist)
  np.testing.assert_allclose(
      rel["x"].values,
      np.asarray(rel.coords_dict()["desired_prob"].data),
      rtol=1e-12,
  )
  # odd bins
  bins = 5
  hist = xds.Dataset(
      {"x": (("bins",), np.full(bins, 1 / bins))},
      coords={"bins": np.arange(bins)},
  )
  rel = metrics.central_reliability(hist)
  np.testing.assert_allclose(
      rel["x"].values,
      np.asarray(rel.coords_dict()["desired_prob"].data),
      rtol=1e-12,
  )


def test_metrics_work_with_jax_arrays():
  """The same metric code must run with jax payloads (jit-compatible path)."""
  import jax.numpy as jnp

  truth, forecast = get_random_truth_and_forecast(ensemble_size=5)
  truth_j = truth.to_jax()
  forecast_j = forecast.to_jax()
  got_np = metrics.CRPS().compute(forecast, truth)
  got_j = metrics.CRPS().compute(forecast_j, truth_j)
  np.testing.assert_allclose(
      got_np["geopotential"].values,
      np.asarray(got_j["geopotential"].values),
      rtol=1e-6,
  )
  got_np2 = metrics.MSE().compute(forecast, truth)
  got_j2 = metrics.MSE().compute(forecast_j, truth_j)
  np.testing.assert_allclose(
      got_np2["geopotential"].values,
      np.asarray(got_j2["geopotential"].values),
      rtol=1e-6,
  )
