"""Statistical/structural oracle tests (deeper reference-parity coverage):
Brier-integral ≈ CRPS, rank-histogram binning equivalence, spread/skill
calibration, wind-vector hand-built modifiers, Gaussian identities."""
import numpy as np
import pytest

from weatherbench2_tpu import metrics, schema, utils, xds


def _truth_forecast(ensemble_size=None, seed=7, **kw):
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2019-12-01",
      time_stop="2019-12-15",
      spatial_resolution_in_degrees=30.0,
  )
  kwargs.update(kw)
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=seed)
  forecast = utils.random_like(
      schema.mock_forecast_data(ensemble_size=ensemble_size, **kwargs),
      seed=seed + 1,
  )
  forecast = schema.apply_time_conventions(forecast, by_init=False)
  return truth, forecast


class _FixedThreshold:

  def __init__(self, value, quantile):
    self.value = value
    self.quantile = quantile

  def compute(self, truth):
    out = xds.Dataset({}, coords=dict(truth.coords_dict()))
    for k in truth.keys():
      da = truth[k]
      out[k] = da.copy(data=np.full(da.shape, self.value))
    return out


def test_brier_integral_approximates_crps():
  """∫ BrierScore(threshold) dthreshold == CRPS (reference metrics_test
  integral identity), checked on a discretized threshold grid."""
  truth, forecast = _truth_forecast(ensemble_size=9)
  thresholds_grid = np.linspace(-4.5, 4.5, 181)
  dt = thresholds_grid[1] - thresholds_grid[0]
  thrs = [_FixedThreshold(v, q) for q, v in enumerate(thresholds_grid)]
  brier = metrics.EnsembleBrierScore(thresholds=thrs).compute(
      forecast, truth
  )
  integral = brier["geopotential"].sum("quantile") * dt
  crps = metrics.CRPS().compute(forecast, truth)
  # The integral of the (biased) Brier score over thresholds equals the
  # biased CRPS estimator: E|X-Y| - 0.5 E|X-X'| * M/(M-1) differs from
  # the fair CRPS by spread/(2(M-1))... compare against the matching
  # biased form computed directly:
  f = forecast["geopotential"].values
  tr = truth["geopotential"].values
  m = f.shape[0]
  skill = np.abs(f - tr[None]).mean(0)
  spread_biased = np.abs(f[None, :] - f[:, None]).mean((0, 1))
  pointwise = skill - 0.5 * spread_biased
  lat = np.linspace(-90, 90, 7)
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  wfull = np.broadcast_to(w, pointwise.shape)
  want = ((pointwise * wfull).sum((-2, -1)) / wfull.sum((-2, -1))).mean(1)
  got = integral.transpose("lead_time", "level").values
  np.testing.assert_allclose(got, want, rtol=0.02)


def test_rank_histogram_binning_equivalence():
  """num_bins=K+1 histogram summed into groups equals num_bins=g result."""
  truth, forecast = _truth_forecast(ensemble_size=7)
  full = metrics.RankHistogram(seed=0).compute(forecast, truth)
  grouped = metrics.RankHistogram(num_bins=4, seed=0).compute(
      forecast, truth
  )
  fv = full["geopotential"].values  # (..., 8)
  gv = grouped["geopotential"].values  # (..., 4)
  summed = fv.reshape(fv.shape[:-1] + (4, 2)).sum(-1)
  np.testing.assert_allclose(summed, gv, atol=1e-12)


def test_crps_spread_skill_ratio_calibrated():
  """Same-distribution ensemble: spread/skill ratio ~ 1."""
  truth, forecast = _truth_forecast(
      ensemble_size=20, time_stop="2020-01-30"
  )
  spread = metrics.CRPSSpread().compute(forecast, truth)
  skill = metrics.CRPSSkill().compute(forecast, truth)
  ratio = (
      spread["geopotential"].values.mean()
      / skill["geopotential"].values.mean()
  )
  assert abs(ratio - 1.0) < 0.05, ratio


def test_energy_score_spread_skill_calibrated():
  truth, forecast = _truth_forecast(
      ensemble_size=20, time_stop="2020-01-30"
  )
  spread = metrics.EnergyScoreSpread().compute(forecast, truth)
  skill = metrics.EnergyScoreSkill().compute(forecast, truth)
  ratio = (
      spread["geopotential"].values.mean()
      / skill["geopotential"].values.mean()
  )
  assert abs(ratio - 1.0) < 0.05, ratio


def test_wind_vector_rmse_hand_built():
  """Deterministic uv offsets: wind-vector RMSE = sqrt(du² + dv²)."""
  kwargs = dict(
      variables_3d=["u_component_of_wind", "v_component_of_wind"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-05",
      spatial_resolution_in_degrees=60.0,
  )
  truth = schema.mock_truth_data(**kwargs)
  forecast = schema.mock_forecast_data(lead_stop="1 day", **kwargs)
  forecast = schema.apply_time_conventions(forecast, by_init=False)
  du, dv = 3.0, 4.0
  forecast = forecast.copy(data={
      "u_component_of_wind": np.full(
          forecast["u_component_of_wind"].shape, du
      ),
      "v_component_of_wind": np.full(
          forecast["v_component_of_wind"].shape, dv
      ),
  })
  wv = metrics.WindVectorRMSESqrtBeforeTimeAvg(
      u_name="u_component_of_wind",
      v_name="v_component_of_wind",
      vector_name="wind_vector",
  )
  got = wv.compute(forecast, truth)
  np.testing.assert_allclose(got.values, 5.0, rtol=1e-6)


def test_gaussian_variance_is_std_squared():
  truth, forecast = _truth_forecast()
  fc = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  fc["geopotential"] = forecast["geopotential"]
  fc["geopotential_std"] = forecast["geopotential"] * 0 + 2.0
  got = metrics.GaussianVariance().compute(fc, truth)
  np.testing.assert_allclose(got["geopotential"].values, 4.0, rtol=1e-6)


def test_gaussian_rps_sums_parts():
  truth, forecast = _truth_forecast()
  fc = xds.Dataset({}, coords=dict(forecast.coords_dict()))
  fc["geopotential"] = forecast["geopotential"]
  fc["geopotential_std"] = abs(forecast["geopotential"]) + 0.5
  thrs = [_FixedThreshold(-0.5, 0.33), _FixedThreshold(0.5, 0.67)]
  rps = metrics.GaussianRPS(thresholds=thrs).compute(fc, truth)
  brier_like = metrics.GaussianBrierScore(thresholds=thrs).compute(
      fc, truth
  )
  assert "quantile" not in rps["geopotential"].dims
  assert "quantile" in brier_like["geopotential"].dims


def test_crps_skipna():
  truth, forecast = _truth_forecast(ensemble_size=5)
  tvals = truth["geopotential"].values.copy()
  tvals[0, 0, 0, 0] = np.nan
  truth_nan = truth.copy(data={"geopotential": tvals})
  got = metrics.CRPS().compute(forecast, truth_nan, skipna=False)
  assert np.isnan(got["geopotential"].values).any()
  got_skip = metrics.CRPS().compute(forecast, truth_nan, skipna=True)
  assert np.isfinite(got_skip["geopotential"].values).all()


def test_ensemble_stddev_sqrt_before_time_avg_estimates_sigma():
  truth, forecast = _truth_forecast(
      ensemble_size=40, time_stop="2019-12-05"
  )
  got = metrics.EnsembleStddevSqrtBeforeTimeAvg().compute(forecast, truth)
  # N(0,1) members: sigma ~ 1
  np.testing.assert_allclose(
      got["geopotential"].values.mean(), 1.0, rtol=0.05
  )


def test_rank_histogram_counting_form_properties():
  """Tie-break uniformity and NaN-ranking semantics of RankHistogram."""
  from weatherbench2_tpu import schema, utils, xds

  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2020-01-01", time_stop="2020-01-09",
          lead_stop="2 days", ensemble_size=7,
          spatial_resolution_in_degrees=30.0,
      ),
      seed=1,
  )
  tr = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2020-01-01", time_stop="2020-01-12",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=2,
  )
  tr = tr.sel(time=fc["time"].values)
  m = metrics.RankHistogram(seed=7)

  # tie-free: rank is exactly the count of members below truth
  hist = m.compute_chunk(fc, tr)["2m_temperature"]
  ranks = np.asarray(hist.values).argmax(axis=-1)
  f = fc["2m_temperature"].transpose(
      "realization", *[d for d in hist.dims if d != "bins"]
  ).values
  t = tr["2m_temperature"].variable.broadcast_to_dims(
      tuple(d for d in hist.dims if d != "bins"),
      {d: s for d, s in hist.sizes.items() if d != "bins"},
  ).data
  np.testing.assert_array_equal(ranks, (f < t).sum(axis=0))

  # all-ties: truth's bin is uniform over all K+1 slots
  ones = {"2m_temperature": np.ones_like(fc["2m_temperature"].values)}
  hist_t = m.compute_chunk(
      fc.copy(data=ones),
      tr.copy(
          data={
              "2m_temperature": np.ones_like(tr["2m_temperature"].values)
          }
      ),
  )["2m_temperature"]
  counts = np.asarray(hist_t.values).reshape(-1, 8).sum(axis=0)
  n = counts.sum()
  assert (np.abs(counts - n / 8) < 4 * np.sqrt(n * 7 / 64)).all(), counts

  # NaN truth ranks above every non-NaN member
  tnan = np.full_like(tr["2m_temperature"].values, np.nan)
  hist_n = m.compute_chunk(
      fc, tr.copy(data={"2m_temperature": tnan})
  )["2m_temperature"]
  np.testing.assert_array_equal(
      np.asarray(hist_n.values).argmax(axis=-1), 7
  )


def test_rank_histogram_streaming_engine_parity(tmp_path):
  """RankHistogram through the jit streaming engine ≡ in-memory."""
  import os

  from weatherbench2_tpu import config, evaluation, schema, utils, xds

  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-20",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  forecast = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=5, lead_stop="2 days",
          **{**kwargs, "time_stop": "2020-01-10"},
      ),
      seed=1,
  )
  tp, fp = str(tmp_path / "t.zarr"), str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(forecast, fp)
  ec = config.Eval(
      metrics={"rank_histogram": metrics.RankHistogram(seed=3)},
      regions=None,
      temporal_mean=True,
  )
  results = {}
  for tag, use_mesh in (("mem", False), ("stream", True)):
    dc = config.Data(
        selection=config.Selection(
            variables=["2m_temperature"],
            time_slice=slice("2020-01-01", "2020-01-08"),
        ),
        paths=config.Paths(
            forecast=fp, obs=tp, output_dir=str(tmp_path / tag)
        ),
        by_init=True,
    )
    if use_mesh:
      evaluation.evaluate_with_mesh(
          dc, {"cfg": ec}, input_chunks={"init_time": 3}
      )
    else:
      evaluation.evaluate_in_memory(dc, {"cfg": ec})
    results[tag] = xds.open_netcdf(
        os.path.join(dc.paths.output_dir, "cfg.nc")
    )
  a = results["mem"]["2m_temperature"]
  b = results["stream"]["2m_temperature"]
  np.testing.assert_allclose(
      a.values, b.transpose(*a.dims).values, rtol=1e-6, atol=1e-7
  )
