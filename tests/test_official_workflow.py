"""End-to-end official-protocol workflow (mini scale):

raw truth zarr
  → compute_climatology (mean/std/quantile/seeps)
  → evaluate CLI: deterministic (+ACC+SEEPS), probabilistic (CRPS...),
    ensemble_binary (quantile thresholds) — through the mesh engine
  → visualization scorecard from the results files.

This is the documented reference workflow (official-evaluation.md)
exercised end to end on this framework.
"""
import os
import sys

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_climatology  # noqa: E402
import evaluate  # noqa: E402

from weatherbench2_tpu import config, schema, utils, visualization, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()

VARIABLES_3D = ["geopotential"]
VARIABLES_2D = ["2m_temperature", "total_precipitation_24hr"]


def _make_world(tmp_path):
  rs = np.random.RandomState(0)
  truth = schema.mock_truth_data(
      variables_3d=VARIABLES_3D,
      variables_2d=VARIABLES_2D,
      time_start="2018-01-01",
      time_stop="2020-02-20",
      time_resolution="1 day",
      spatial_resolution_in_degrees=30.0,
  )
  data = {}
  for k, v in truth.variables_dict().items():
    if "precipitation" in k:
      wet = rs.exponential(2e-3, size=v.shape)
      data[k] = np.where(rs.rand(*v.shape) < 0.5, 0.0, wet).astype(
          np.float32
      )
    else:
      data[k] = rs.randn(*v.shape).astype(np.float32)
  truth = truth.copy(data=data)

  forecast = schema.mock_forecast_data(
      variables_3d=VARIABLES_3D,
      variables_2d=VARIABLES_2D,
      time_start="2020-01-01",
      time_stop="2020-01-25",
      time_resolution="1 day",
      lead_stop="3 days",
      ensemble_size=4,
      spatial_resolution_in_degrees=30.0,
  )
  fdata = {}
  for k, v in forecast.variables_dict().items():
    if "precipitation" in k:
      wet = rs.exponential(2e-3, size=v.shape)
      fdata[k] = np.where(rs.rand(*v.shape) < 0.5, 0.0, wet).astype(
          np.float32
      )
    else:
      fdata[k] = rs.randn(*v.shape).astype(np.float32)
  forecast = forecast.copy(data=fdata)
  forecast = forecast.rename({"realization": "number"})

  truth_path = str(tmp_path / "truth.zarr")
  xds.to_zarr(truth, truth_path)
  ens_path = str(tmp_path / "ens.zarr")
  xds.to_zarr(forecast, ens_path)
  det_path = str(tmp_path / "det.zarr")
  xds.to_zarr(forecast.isel(number=0), det_path)
  return truth_path, det_path, ens_path


def test_official_workflow(tmp_path):
  truth_path, det_path, ens_path = _make_world(tmp_path)

  # --- step 1: climatology with every statistic the metrics need
  clim_path = str(tmp_path / "clim.zarr")
  with flagsaver.flagsaver(
      input_path=truth_path,
      output_path=clim_path,
      frequency="hourly",
      hour_interval=24,
      window_size=31,
      start_year=2018,
      end_year=2019,
      statistics=["mean", "std", "quantile", "seeps"],
      quantiles=["0.25", "0.75"],
      seeps_dry_threshold_mm="{'total_precipitation_24hr':0.25}",
  ):
    compute_climatology.main([])
  clim = xds.open_zarr(clim_path)
  for expected in (
      "geopotential",  # mean carries no suffix
      "geopotential_std",
      "geopotential_quantile",
      "total_precipitation_24hr_seeps_threshold",
      "total_precipitation_24hr_seeps_dry_fraction",
  ):
    assert expected in clim, expected

  # --- step 2a: deterministic eval incl. ACC and SEEPS
  det_out = str(tmp_path / "det_results")
  with flagsaver.flagsaver(
      forecast_path=det_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=det_out,
      variables=["geopotential", "2m_temperature",
                 "total_precipitation_24hr"],
      levels=["500", "850"],
      time_start="2020-01-01",
      time_stop="2020-01-18",
      eval_configs="deterministic",
      regions=["global", "tropics", "extra-tropics"],
      compute_seeps=True,
      use_mesh=True,
      input_chunks={"init_time": 6},
  ):
    evaluate.main([])
  det_res = xds.open_netcdf(os.path.join(det_out, "deterministic.nc"))
  names = set(np.asarray(det_res.coords_dict()["metric"].data))
  assert {"mse", "acc", "bias", "mae", "seeps_24hr"} <= names
  acc = det_res["geopotential"].sel(metric="acc").values
  assert np.isfinite(acc).all() and (np.abs(acc) <= 1.01).all()

  # --- step 2b: probabilistic eval
  prob_out = str(tmp_path / "prob_results")
  with flagsaver.flagsaver(
      forecast_path=ens_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=prob_out,
      variables=["geopotential", "2m_temperature"],
      levels=["500", "850"],
      time_start="2020-01-01",
      time_stop="2020-01-18",
      eval_configs="probabilistic",
      ensemble_dim="number",
      use_mesh=True,
      input_chunks={"init_time": 6},
  ):
    evaluate.main([])
  prob_res = xds.open_netcdf(os.path.join(prob_out, "probabilistic.nc"))
  assert "crps" in set(np.asarray(prob_res.coords_dict()["metric"].data))

  # --- step 2c: binary threshold eval from the computed quantiles
  bin_out = str(tmp_path / "bin_results")
  with flagsaver.flagsaver(
      forecast_path=ens_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=bin_out,
      variables=["geopotential", "2m_temperature"],
      levels=["500", "850"],
      time_start="2020-01-01",
      time_stop="2020-01-18",
      eval_configs="ensemble_binary",
      ensemble_dim="number",
      quantile_thresholds=["0.25", "0.75"],
      use_mesh=True,
      input_chunks={"init_time": 6},
  ):
    evaluate.main([])
  bin_res = xds.open_netcdf(os.path.join(bin_out, "ensemble_binary.nc"))
  assert "quantile" in bin_res.sizes
  brier = bin_res["geopotential"].sel(metric="brier_score").values
  assert np.isfinite(brier).all()

  # --- step 3: scorecard from results (climatology run as baseline proxy:
  # reuse deterministic results under two names)
  viz = config.Viz(
      results={
          "baseline": os.path.join(det_out, "deterministic.nc"),
          "model": os.path.join(det_out, "deterministic.nc"),
      },
      save_kwargs={"fname": str(tmp_path / "scorecard.png")},
  )
  visualization.visualize_scorecard(
      viz,
      baseline="baseline",
      forecast="model",
      metric="mse",
      variables=["geopotential", "2m_temperature"],
      region="global",
  )
  assert (tmp_path / "scorecard.png").exists()
