"""Pointwise-fused tier: every metric family that can be expressed as a
regional mean of per-cell fields rides ONE fused_region_sums kernel call
per chunk (Metric.pointwise_chunk / finalize_fused protocol).

Parity model: streaming (fused) vs in-memory (per metric x region loop),
the same harness the reference uses between its Beam and in-memory
engines (reference evaluation_test.py:30-128).
"""
import numpy as np
import pytest

from weatherbench2_tpu import (
    config, evaluation, metrics, schema, thresholds, utils, xds,
)
from weatherbench2_tpu.parallel import streaming
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


REGIONS = {
    "global": SliceRegion(),
    "tropics": SliceRegion(lat_slice=slice(-20, 20)),
    "extra": ExtraTropicalRegion(),
}


def _write(tmp_path, name, ds):
  path = str(tmp_path / f"{name}.zarr")
  xds.to_zarr(ds, path)
  return path


def _dc(tmp_path, fc_path, truth_path, out, clim_path=None, variables=(),
        aux=()):
  return config.Data(
      selection=config.Selection(
          variables=list(variables),
          aux_variables=list(aux),
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / out), climatology=clim_path,
      ),
      by_init=True,
  )


def _assert_parity(tmp_path, cfg_name):
  a = xds.open_netcdf(str(tmp_path / "mem" / f"{cfg_name}.nc"))
  b = xds.open_netcdf(str(tmp_path / "str" / f"{cfg_name}.nc"))
  assert set(a.keys()) == set(b.keys())
  for k in a.keys():
    np.testing.assert_allclose(
        b[k].transpose(*a[k].dims).values, a[k].values,
        rtol=2e-4, atol=1e-6, err_msg=str(k),
    )


def _protocol_env():
  """Shared ingredients for the per-metric protocol oracle."""
  kwargs = dict(
      variables_3d=[],
      variables_2d=["total_precipitation_24hr"],
      time_start="2020-01-01", time_stop="2020-01-05",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(
      schema.mock_truth_data(**{**kwargs, "time_stop": "2020-01-08"}),
      seed=7,
  )
  det_fc = utils.random_like(
      schema.mock_forecast_data(lead_stop="1 day", **kwargs), seed=8
  )
  ens_fc = utils.random_like(
      schema.mock_forecast_data(lead_stop="1 day", ensemble_size=5,
                                **kwargs),
      seed=9,
  )
  det_fc = schema.apply_time_conventions(det_fc, by_init=True)
  ens_fc = schema.apply_time_conventions(ens_fc, by_init=True)
  truth_det = truth.sel(time=det_fc["valid_time"])
  truth_ens = truth.sel(time=ens_fc["valid_time"])

  gauss_fc = det_fc.copy(
      data={k: v.data for k, v in det_fc.variables_dict().items()}
  )
  gauss_fc["total_precipitation_24hr_std"] = (
      abs(det_fc["total_precipitation_24hr"]) + 0.5
  )

  clim = utils.random_like(
      schema.mock_hourly_climatology_data(
          hour_interval=6,
          variables_3d=[],
          variables_2d=[
              "total_precipitation_24hr",
              "total_precipitation_24hr_seeps_threshold",
              "total_precipitation_24hr_seeps_dry_fraction",
          ],
          spatial_resolution_in_degrees=30.0,
      ),
      seed=10,
  )
  clim["total_precipitation_24hr_seeps_threshold"] = (
      abs(clim["total_precipitation_24hr_seeps_threshold"]) * 0.5 + 0.2
  )
  clim["total_precipitation_24hr_seeps_dry_fraction"] = (
      abs(clim["total_precipitation_24hr_seeps_dry_fraction"]) * 0 + 0.5
  )
  base = clim["total_precipitation_24hr"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  ).astype(np.float32)
  qclim = xds.Dataset(
      {"total_precipitation_24hr_quantile": xds.Variable(
          ("quantile",) + base.dims, qvals)},
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  thr = [thresholds.QuantileThreshold(climatology=qclim, quantile=q)
         for q in (0.25, 0.75)]
  return {
      "truth_det": truth_det, "truth_ens": truth_ens,
      "det_fc": det_fc, "ens_fc": ens_fc, "gauss_fc": gauss_fc,
      "clim": clim, "thr": thr,
  }


_WV = [metrics.WindVectorMSE(
    u_name="total_precipitation_24hr", v_name="total_precipitation_24hr",
    vector_name="vec",
)]
_WV_RMSE = [metrics.WindVectorRMSESqrtBeforeTimeAvg(
    u_name="total_precipitation_24hr", v_name="total_precipitation_24hr",
    vector_name="vec",
)]


def _protocol_cases(env):
  return {
      "bias": (metrics.Bias(), "det"),
      "mae": (metrics.MAE(), "det"),
      "mse_wind": (metrics.MSE(wind_vector_mse=_WV), "det"),
      "rmse_wind": (
          metrics.RMSESqrtBeforeTimeAvg(wind_vector_rmse=_WV_RMSE), "det"
      ),
      "acc": (metrics.ACC(climatology=env["clim"]), "det"),
      "seeps": (metrics.SEEPS(climatology=env["clim"]), "det"),
      "gaussian_crps": (metrics.GaussianCRPS(), "gauss"),
      "gaussian_variance": (metrics.GaussianVariance(), "gauss"),
      "gaussian_brier": (
          metrics.GaussianBrierScore(thresholds=env["thr"]), "gauss"
      ),
      "gaussian_rps": (metrics.GaussianRPS(thresholds=env["thr"]), "gauss"),
      "gaussian_ignorance": (
          metrics.GaussianIgnoranceScore(thresholds=env["thr"]), "gauss"
      ),
      "ens_brier": (
          metrics.EnsembleBrierScore(thresholds=env["thr"]), "ens"
      ),
      "ens_ignorance": (
          metrics.EnsembleIgnoranceScore(thresholds=env["thr"]), "ens"
      ),
      "ens_debiased_brier": (
          metrics.DebiasedEnsembleBrierScore(thresholds=env["thr"]), "ens"
      ),
      "ens_rps": (metrics.EnsembleRPS(thresholds=env["thr"]), "ens"),
      "energy_score": (metrics.EnergyScore(), "ens"),
      "energy_score_spread": (metrics.EnergyScoreSpread(), "ens"),
      "energy_score_skill": (metrics.EnergyScoreSkill(), "ens"),
  }


@pytest.fixture(scope="module")
def protocol_env():
  return _protocol_env()


@pytest.mark.parametrize("case", sorted(_protocol_cases(_protocol_env())))
def test_pointwise_protocol_oracle(case, protocol_env):
  """pointwise_chunk + weighted regional mean + finalize_fused must equal
  compute_chunk for every participating metric class — the unit-level pin
  of the fused tier's math, independent of the engine."""
  env = protocol_env
  metric, which = _protocol_cases(env)[case]
  fc = {"det": env["det_fc"], "ens": env["ens_fc"],
        "gauss": env["gauss_fc"]}[which]
  truth = env["truth_ens"] if which == "ens" else env["truth_det"]
  assert type(metric).supports_pointwise_fused

  prepared = metric.prepare_chunk(fc, truth)
  fields = metric.pointwise_chunk(fc, truth, prepared, skipna=False)
  assert fields is not None

  for rname, region in REGIONS.items():
    eff_skipna = metric.fused_nan_mode == "skip"
    means = metrics._spatial_average(
        fields, region=region, skipna=eff_skipna
    )
    got = metric.finalize_fused(means, skipna=False)
    want = metric.compute_chunk_prepared(
        fc, truth, prepared, region=region, skipna=False
    )
    assert sorted(got.keys()) == sorted(want.keys()), case
    for k in want.keys():
      np.testing.assert_allclose(
          got[k].transpose(*want[k].dims).values,
          want[k].values,
          rtol=1e-5, atol=1e-7,
          err_msg=f"{case}/{rname}/{k}",
      )


def test_partition_assigns_tiers():
  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-10",
      spatial_resolution_in_degrees=30.0,
  )
  fc = utils.random_like(
      schema.mock_forecast_data(lead_stop="2 days", ensemble_size=5,
                                **kwargs),
      seed=1,
  ).rename({"time": "init_time", "prediction_timedelta": "lead_time"})
  clim = schema.mock_hourly_climatology_data(hour_interval=6, **kwargs)
  base = clim["2m_temperature"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  ).astype(np.float32)
  qclim = xds.Dataset(
      {"2m_temperature_quantile": xds.Variable(
          ("quantile",) + base.dims, qvals)},
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  thr = [thresholds.QuantileThreshold(climatology=qclim, quantile=q)
         for q in (0.25, 0.75)]
  mets = {
      "mse": metrics.MSE(),
      "crps": metrics.CRPS(),
      "brier": metrics.EnsembleBrierScore(thresholds=thr),
      "rps": metrics.EnsembleRPS(thresholds=thr),
      "es": metrics.EnergyScore(),
      # ignorance scores emit +Inf fields; they ride the pointwise tier
      # via inf-sanitized rows + indicator rows (metrics._inf_safe_fields)
      "ign": metrics.EnsembleIgnoranceScore(thresholds=thr),
  }
  det, prob, pw, generic = streaming._partition_fused(
      mets, REGIONS, fc, False, True
  )
  assert list(det["stat_of"]) == ["mse"]
  assert list(prob["stat_of"]) == ["crps"]
  assert pw["names"] == ["brier", "rps", "es", "ign"]
  assert list(generic) == []

  # spatial sharding disables every fused tier
  det, prob, pw, generic = streaming._partition_fused(
      mets, REGIONS, fc, False, False
  )
  assert det is None and prob is None and pw is None
  assert set(generic) == set(mets)


def test_mixed_deterministic_wind_seeps_parity(tmp_path):
  """Official-deterministic shape: MSE/RMSE with wind vectors + Bias +
  ACC + SEEPS in ONE config; wind/SEEPS ride the pointwise tier."""
  _run_mixed_deterministic(tmp_path)


def test_pointwise_group_cap_parity(tmp_path, monkeypatch):
  """WB2_FUSED_GROUP_BYTES=1 forces one kernel call PER FIELD (the
  0.25-degree HBM-bounding path: a per-metric concatenate of the
  official 13-variable ACC products is ~11 GB); results must be
  identical to the single-group default."""
  monkeypatch.setenv("WB2_FUSED_GROUP_BYTES", "1")
  _run_mixed_deterministic(tmp_path)


def _run_mixed_deterministic(tmp_path):
  kwargs = dict(
      variables_3d=[],
      variables_2d=[
          "u_component_of_wind", "v_component_of_wind",
          "total_precipitation_24hr",
      ],
      time_start="2020-01-01", time_stop="2020-01-16",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-10"}
      ),
      seed=1,
  )
  # precip must be non-negative-ish for SEEPS categories to vary
  truth["total_precipitation_24hr"] = abs(
      truth["total_precipitation_24hr"]
  ) * 2e-3
  fc["total_precipitation_24hr"] = abs(
      fc["total_precipitation_24hr"]
  ) * 2e-3

  clim = utils.random_like(
      schema.mock_hourly_climatology_data(
          hour_interval=6,
          variables_3d=[],
          variables_2d=[
              "u_component_of_wind", "v_component_of_wind",
              "total_precipitation_24hr",
              "total_precipitation_24hr_seeps_threshold",
              "total_precipitation_24hr_seeps_dry_fraction",
          ],
          spatial_resolution_in_degrees=30.0,
      ),
      seed=2,
  )
  clim["total_precipitation_24hr_seeps_threshold"] = (
      abs(clim["total_precipitation_24hr_seeps_threshold"]) * 1e-3 + 1e-3
  )
  clim["total_precipitation_24hr_seeps_dry_fraction"] = (
      abs(clim["total_precipitation_24hr_seeps_dry_fraction"]) * 0 + 0.5
  )

  truth_path = _write(tmp_path, "t", truth)
  fc_path = _write(tmp_path, "f", fc)
  clim_path = _write(tmp_path, "c", clim)
  clim_open = xds.open_zarr(clim_path)

  wind = [metrics.WindVectorMSE(
      u_name="u_component_of_wind", v_name="v_component_of_wind",
      vector_name="wind_vector",
  )]
  wind_rmse = [metrics.WindVectorRMSESqrtBeforeTimeAvg(
      u_name="u_component_of_wind", v_name="v_component_of_wind",
      vector_name="wind_vector",
  )]

  def ec():
    return {
        "deterministic": config.Eval(
            metrics={
                "mse": metrics.MSE(wind_vector_mse=wind),
                "rmse": metrics.RMSESqrtBeforeTimeAvg(
                    wind_vector_rmse=wind_rmse
                ),
                "bias": metrics.Bias(),
                "mae": metrics.MAE(),
                "acc": metrics.ACC(climatology=clim_open),
                "seeps": metrics.SEEPS(climatology=clim_open),
            },
            regions=dict(REGIONS),
        )
    }

  variables = [
      "u_component_of_wind", "v_component_of_wind",
      "total_precipitation_24hr",
  ]
  # engagement: MSE/RMSE (wind), SEEPS and ACC via pointwise (ACC keeps
  # per-anomaly-product NaN masks there); bias/mae via the fused kernel
  fc_conv = fc.rename(
      {"time": "init_time", "prediction_timedelta": "lead_time"}
  )
  cfg = ec()["deterministic"]
  det, prob, pw, generic = streaming._partition_fused(
      cfg.metrics, cfg.regions, fc_conv, False, True
  )
  assert set(det["stat_of"]) == {"bias", "mae"}
  assert prob is None
  assert set(pw["names"]) == {"mse", "rmse", "seeps", "acc"}
  assert not generic

  evaluation.evaluate_in_memory(
      _dc(tmp_path, fc_path, truth_path, "mem", clim_path, variables), ec()
  )
  evaluation.evaluate_with_mesh(
      _dc(tmp_path, fc_path, truth_path, "str", clim_path, variables),
      ec(), input_chunks={"init_time": 4},
  )
  _assert_parity(tmp_path, "deterministic")


def test_energy_score_suite_parity(tmp_path):
  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-16",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", ensemble_size=6,
          **{**kwargs, "time_stop": "2020-01-10"},
      ),
      seed=1,
  )
  truth_path = _write(tmp_path, "t", truth)
  fc_path = _write(tmp_path, "f", fc)

  def ec():
    return {
        "es": config.Eval(
            metrics={
                "energy_score": metrics.EnergyScore(),
                "energy_score_spread": metrics.EnergyScoreSpread(),
                "energy_score_skill": metrics.EnergyScoreSkill(),
            },
            regions=dict(REGIONS),
        )
    }

  evaluation.evaluate_in_memory(
      _dc(tmp_path, fc_path, truth_path, "mem",
          variables=["2m_temperature"]),
      ec(),
  )
  evaluation.evaluate_with_mesh(
      _dc(tmp_path, fc_path, truth_path, "str",
          variables=["2m_temperature"]),
      ec(), input_chunks={"init_time": 4},
  )
  _assert_parity(tmp_path, "es")


def test_gaussian_suite_parity(tmp_path):
  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-16",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-10"}
      ),
      seed=1,
  )
  fc["2m_temperature_std"] = abs(fc["2m_temperature"]) + 0.5
  truth_path = _write(tmp_path, "t", truth)
  fc_path = _write(tmp_path, "f", fc)

  clim = schema.mock_hourly_climatology_data(
      hour_interval=6, variables_3d=[], variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=30.0,
  )
  base = clim["2m_temperature"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  ).astype(np.float32)
  qclim = xds.Dataset(
      {"2m_temperature_quantile": xds.Variable(
          ("quantile",) + base.dims, qvals)},
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  qclim_path = _write(tmp_path, "qc", qclim)
  qclim_open = xds.open_zarr(qclim_path)
  thr = [thresholds.QuantileThreshold(climatology=qclim_open, quantile=q)
         for q in (0.25, 0.75)]

  def ec():
    return {
        "gaussian": config.Eval(
            metrics={
                "crps": metrics.GaussianCRPS(),
                "variance": metrics.GaussianVariance(),
                "brier": metrics.GaussianBrierScore(thresholds=thr),
                "rps": metrics.GaussianRPS(thresholds=thr),
            },
            regions=dict(REGIONS),
        )
    }

  fc_conv = fc.rename(
      {"time": "init_time", "prediction_timedelta": "lead_time"}
  )
  cfg = ec()["gaussian"]
  det, prob, pw, generic = streaming._partition_fused(
      cfg.metrics, cfg.regions, fc_conv, False, True
  )
  assert det is None and prob is None
  assert set(pw["names"]) == {"crps", "variance", "brier", "rps"}
  assert not generic

  evaluation.evaluate_in_memory(
      _dc(tmp_path, fc_path, truth_path, "mem", qclim_path,
          ["2m_temperature"], aux=["2m_temperature_std"]),
      ec(),
  )
  evaluation.evaluate_with_mesh(
      _dc(tmp_path, fc_path, truth_path, "str", qclim_path,
          ["2m_temperature"], aux=["2m_temperature_std"]),
      ec(), input_chunks={"init_time": 4},
  )
  _assert_parity(tmp_path, "gaussian")


def test_pointwise_skipna_with_nans_parity(tmp_path):
  """skipna=True + NaNs: the kernel's valid-weight sums must match the
  in-memory engine's NaN-aware weighted means."""
  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-16",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-10"}
      ),
      seed=1,
  )
  tvals = truth["2m_temperature"].values.copy()
  tvals[::3, ::2, 1] = np.nan
  truth["2m_temperature"] = xds.Variable(
      truth["2m_temperature"].dims, tvals
  )
  truth_path = _write(tmp_path, "t", truth)
  fc_path = _write(tmp_path, "f", fc)

  # the wind-vector pair pushes mse off the 6-stat det kernel and onto
  # the pointwise tier, so this exercises pointwise NaN accounting
  wind = [metrics.WindVectorMSE(
      u_name="2m_temperature", v_name="2m_temperature",
      vector_name="t2m_vector",
  )]
  mets = {
      "mse": metrics.MSE(wind_vector_mse=wind),
      "bias": metrics.Bias(),
      "mae": metrics.MAE(),
      "rmse": metrics.RMSESqrtBeforeTimeAvg(),
  }

  def ec():
    return {
        "det": config.Eval(
            metrics=dict(mets),
            regions=dict(REGIONS),
        )
    }

  fc_conv = xds.open_zarr(fc_path).rename(
      {"time": "init_time", "prediction_timedelta": "lead_time"}
  )
  det, prob, pw, generic = streaming._partition_fused(
      mets, REGIONS, fc_conv, True, True
  )
  assert set(det["stat_of"]) == {"bias", "mae", "rmse"}
  assert pw["names"] == ["mse"] and not generic

  evaluation.evaluate_in_memory(
      _dc(tmp_path, fc_path, truth_path, "mem",
          variables=["2m_temperature"]),
      ec(), skipna=True,
  )
  evaluation.evaluate_with_mesh(
      _dc(tmp_path, fc_path, truth_path, "str",
          variables=["2m_temperature"]),
      ec(), input_chunks={"init_time": 4}, skipna=True,
  )
  _assert_parity(tmp_path, "det")
