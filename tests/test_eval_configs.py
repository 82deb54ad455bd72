"""End-to-end coverage of the remaining eval-config families:
threshold (binary) metrics with quantile climatologies, spatial metrics to
zarr, rank histograms, Gaussian configs, against-analysis, probabilistic
climatology baselines."""
import os

import numpy as np
import pytest

from weatherbench2_tpu import (
    config,
    evaluation,
    metrics,
    schema,
    thresholds,
    utils,
    xds,
)
from weatherbench2_tpu.regions import SliceRegion


def _mock_env(tmp_path, ensemble_size=None, years=False):
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2018-01-01" if years else "2020-01-01",
      time_stop="2020-02-01",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  forecast = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=ensemble_size,
          lead_stop="3 days",
          **{**kwargs, "time_start": "2020-01-01",
             "time_stop": "2020-01-15"},
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "truth.zarr")
  forecast_path = str(tmp_path / "forecast.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(forecast, forecast_path)
  return truth_path, forecast_path


def _quantile_clim(tmp_path):
  """Climatology with <var>_quantile variables (threshold metric input)."""
  clim = schema.mock_hourly_climatology_data(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=30.0,
      hour_interval=24,
  )
  base = clim["2m_temperature"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  )
  ds = xds.Dataset(
      {
          "2m_temperature_quantile": xds.Variable(
              ("quantile",) + base.dims, qvals
          )
      },
      coords={
          **clim.coords_dict(),
          "quantile": np.array([0.25, 0.75]),
      },
  )
  path = str(tmp_path / "qclim.zarr")
  xds.to_zarr(ds, path)
  return path


def _dc(tmp_path, truth_path, forecast_path, out, clim_path=None):
  return config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-12"),
      ),
      paths=config.Paths(
          forecast=forecast_path, obs=truth_path,
          output_dir=str(tmp_path / out), climatology=clim_path,
      ),
      by_init=True,
  )


def test_ensemble_binary_with_quantile_thresholds(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path, ensemble_size=5)
  clim_path = _quantile_clim(tmp_path)
  clim = xds.open_zarr(clim_path)
  threshold_list = [
      thresholds.QuantileThreshold(climatology=clim, quantile=q)
      for q in (0.25, 0.75)
  ]
  eval_configs = {
      "ensemble_binary": config.Eval(
          metrics={
              "brier_score": metrics.EnsembleBrierScore(
                  thresholds=threshold_list
              ),
              "ignorance_score": metrics.EnsembleIgnoranceScore(
                  thresholds=threshold_list
              ),
              "rps": metrics.EnsembleRPS(thresholds=threshold_list),
          },
          regions={"global": SliceRegion()},
      )
  }
  dc_mem = _dc(tmp_path, truth_path, forecast_path, "mem", clim_path)
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = xds.open_netcdf(
      os.path.join(dc_mem.paths.output_dir, "ensemble_binary.nc")
  )
  assert "quantile" in res_mem.sizes
  brier = res_mem["2m_temperature"].sel(metric="brier_score")
  assert np.isfinite(brier.values).all()
  # symmetric +-0.6 thresholds on N(0,1): Brier scores similar magnitude
  v = brier.values
  assert (v > 0).all() and (v < 1).all()

  dc_str = _dc(tmp_path, truth_path, forecast_path, "str", clim_path)
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 4}
  )
  res_str = xds.open_netcdf(
      os.path.join(dc_str.paths.output_dir, "ensemble_binary.nc")
  )
  for k in res_mem.keys():
    np.testing.assert_allclose(
        res_mem[k].values,
        res_str[k].transpose(*res_mem[k].dims).values,
        rtol=1e-5, atol=1e-7,
    )


def test_spatial_metrics_zarr_output(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path)
  eval_configs = {
      "deterministic_spatial": config.Eval(
          metrics={
              "bias": metrics.SpatialBias(),
              "mse": metrics.SpatialMSE(),
              "mae": metrics.SpatialMAE(),
          },
          output_format="zarr",
      )
  }
  dc = _dc(tmp_path, truth_path, forecast_path, "sp")
  evaluation.evaluate_with_mesh(
      dc, eval_configs, input_chunks={"init_time": 4}
  )
  res = xds.open_zarr(
      os.path.join(dc.paths.output_dir, "deterministic_spatial.zarr")
  )
  assert "longitude" in res.sizes and "latitude" in res.sizes
  assert np.isfinite(res["2m_temperature"].values).all()

  dc_mem = _dc(tmp_path, truth_path, forecast_path, "sp_mem")
  eval_configs_mem = {
      "deterministic_spatial": config.Eval(
          metrics={"mse": metrics.SpatialMSE()},
      )
  }
  evaluation.evaluate_in_memory(dc_mem, eval_configs_mem)
  res_mem = xds.open_netcdf(
      os.path.join(dc_mem.paths.output_dir, "deterministic_spatial.nc")
  )
  a = res_mem["2m_temperature"].sel(metric="mse")
  b = res["2m_temperature"].sel(metric="mse")
  np.testing.assert_allclose(
      a.values, b.transpose(*a.dims).values, rtol=1e-5
  )


def test_rank_histogram_config(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path, ensemble_size=3)
  eval_configs = {
      "hist": config.Eval(
          metrics={"rank_histogram": metrics.RankHistogram(seed=0)},
          output_format="zarr",
      )
  }
  dc = _dc(tmp_path, truth_path, forecast_path, "hist")
  evaluation.evaluate_with_mesh(
      dc, eval_configs, input_chunks={"init_time": 6}
  )
  res = xds.open_zarr(os.path.join(dc.paths.output_dir, "hist.zarr"))
  assert res.sizes["bins"] == 4
  vals = res["2m_temperature"].values
  # histogram probabilities: average over bins = 1/4 exactly
  np.testing.assert_allclose(vals.mean(), 0.25, atol=1e-6)


def test_gaussian_configs(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path)
  # gaussian forecast: add a _std variable
  fc = xds.open_zarr(forecast_path)
  std_vals = np.abs(fc["2m_temperature"].values) + 0.5
  fc["2m_temperature_std"] = xds.Variable(
      fc["2m_temperature"].dims, std_vals
  )
  fc_path = str(tmp_path / "fc_gauss.zarr")
  xds.to_zarr(fc, fc_path)
  eval_configs = {
      "gaussian_probabilistic": config.Eval(
          metrics={
              "crps": metrics.GaussianCRPS(),
              "ensemble_variance": metrics.GaussianVariance(),
          },
          regions={"global": SliceRegion()},
      )
  }
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          aux_variables=["2m_temperature_std"],
          time_slice=slice("2020-01-01", "2020-01-12"),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / "gauss"),
      ),
      by_init=True,
  )
  evaluation.evaluate_in_memory(dc, eval_configs)
  res = xds.open_netcdf(
      os.path.join(dc.paths.output_dir, "gaussian_probabilistic.nc")
  )
  crps = res["2m_temperature"].sel(metric="crps").values
  assert np.isfinite(crps).all() and (crps > 0).all()

  dc2 = config.Data(
      selection=dc.selection,
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / "gauss_str"),
      ),
      by_init=True,
  )
  evaluation.evaluate_with_mesh(
      dc2, eval_configs, input_chunks={"init_time": 4}
  )
  res2 = xds.open_netcdf(
      os.path.join(dc2.paths.output_dir, "gaussian_probabilistic.nc")
  )
  for k in res.keys():
    np.testing.assert_allclose(
        res[k].values,
        res2[k].transpose(*res[k].dims).values,
        rtol=1e-5, atol=1e-7,
    )


def test_against_analysis_by_valid(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path)
  eval_configs = {
      "vs_analysis": config.Eval(
          metrics={"mse": metrics.MSE()},
          against_analysis=True,
      )
  }
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-02", "2020-01-12"),
      ),
      paths=config.Paths(
          forecast=forecast_path, obs=truth_path,
          output_dir=str(tmp_path / "va"),
      ),
      by_init=False,
  )
  evaluation.evaluate_in_memory(dc, eval_configs)
  res = xds.open_netcdf(os.path.join(dc.paths.output_dir,
                                     "vs_analysis.nc"))
  vals = res["2m_temperature"].values
  assert np.isfinite(vals).all()
  # at lead 0, forecast == analysis -> MSE 0
  np.testing.assert_allclose(
      res["2m_temperature"].sel(
          lead_time=np.timedelta64(0, "ns")
      ).values,
      0.0,
      atol=1e-12,
  )


def test_probabilistic_climatology_baseline(tmp_path):
  truth_path, forecast_path = _mock_env(tmp_path, years=True)
  eval_configs = {
      "prob_clim": config.Eval(
          metrics={"crps": metrics.CRPS(ensemble_dim="number")},
          evaluate_probabilistic_climatology=True,
          probabilistic_climatology_start_year=2018,
          probabilistic_climatology_end_year=2019,
          probabilistic_climatology_hour_interval=24,
      )
  }
  dc = _dc(tmp_path, truth_path, forecast_path, "pc")
  evaluation.evaluate_in_memory(dc, eval_configs)
  res = xds.open_netcdf(os.path.join(dc.paths.output_dir,
                                     "prob_clim.nc"))
  vals = res["2m_temperature"].values
  assert np.isfinite(vals).all()
