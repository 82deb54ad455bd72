"""CLI tests for scripts/evaluate.py (flagsaver pattern, mirroring the
reference scripts/evaluate_test.py)."""
import os
import sys

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import evaluate  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def _setup_data(tmp_path, ensemble_size=None):
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2021-12-01",
      time_stop="2022-01-10",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  forecast = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=ensemble_size,
          lead_stop="3 days",
          **{**kwargs, "time_stop": "2021-12-20"},
      ),
      seed=1,
  )
  clim = utils.random_like(
      schema.mock_hourly_climatology_data(**kwargs), seed=2
  )
  # rename realization to the reference's default ensemble dim "number"
  if ensemble_size is not None:
    forecast = forecast.rename({"realization": "number"})
  truth_path = str(tmp_path / "truth.zarr")
  forecast_path = str(tmp_path / "forecast.zarr")
  clim_path = str(tmp_path / "clim.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(forecast, forecast_path)
  xds.to_zarr(clim, clim_path)
  return truth_path, forecast_path, clim_path


@pytest.mark.parametrize("use_mesh", [False, True])
def test_evaluate_cli_deterministic(tmp_path, use_mesh):
  truth_path, forecast_path, clim_path = _setup_data(tmp_path)
  out_dir = str(tmp_path / "out")
  with flagsaver.flagsaver(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=out_dir,
      variables=["geopotential", "2m_temperature"],
      levels=["500", "850"],
      time_start="2021-12-01",
      time_stop="2021-12-10",
      eval_configs="deterministic",
      regions=["global", "tropics", "extra-tropics"],
      use_mesh=use_mesh,
      input_chunks={"init_time": 4},
  ):
    evaluate.main([])
  results = xds.open_netcdf(os.path.join(out_dir, "deterministic.nc"))
  assert set(np.asarray(results.coords_dict()["metric"].data)) == {
      "mse", "acc", "bias", "mae",
  }
  assert set(np.asarray(results.coords_dict()["region"].data)) == {
      "global", "tropics", "extra-tropics",
  }
  assert "geopotential" in results
  vals = results["geopotential"].values
  assert np.isfinite(vals).all()


def test_evaluate_cli_probabilistic(tmp_path):
  truth_path, forecast_path, clim_path = _setup_data(
      tmp_path, ensemble_size=4
  )
  out_dir = str(tmp_path / "out")
  with flagsaver.flagsaver(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=out_dir,
      variables=["geopotential", "2m_temperature"],
      levels=["500", "850"],
      time_start="2021-12-01",
      time_stop="2021-12-10",
      eval_configs="probabilistic",
      use_mesh=True,
      input_chunks={"init_time": 5},
  ):
    evaluate.main([])
  results = xds.open_netcdf(os.path.join(out_dir, "probabilistic.nc"))
  metric_names = set(np.asarray(results.coords_dict()["metric"].data))
  assert "crps" in metric_names
  assert "ensemble_variance" in metric_names


def test_evaluate_cli_in_memory_equals_mesh(tmp_path):
  truth_path, forecast_path, clim_path = _setup_data(tmp_path)
  out_mem = str(tmp_path / "out_mem")
  out_mesh = str(tmp_path / "out_mesh")
  common = dict(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      variables=["geopotential"],
      levels=["500", "850"],
      time_start="2021-12-01",
      time_stop="2021-12-10",
      eval_configs="deterministic",
      regions=["global"],
  )
  with flagsaver.flagsaver(output_dir=out_mem, **common):
    evaluate.main([])
  with flagsaver.flagsaver(
      output_dir=out_mesh, use_mesh=True,
      input_chunks={"init_time": 3}, **common,
  ):
    evaluate.main([])
  a = xds.open_netcdf(os.path.join(out_mem, "deterministic.nc"))
  b = xds.open_netcdf(os.path.join(out_mesh, "deterministic.nc"))
  for k in a.keys():
    np.testing.assert_allclose(
        a[k].values,
        b[k].transpose(*a[k].dims).values,
        rtol=1e-5,
        atol=1e-7,
    )


def test_evaluate_cli_missing_climatology_clear_error(tmp_path):
  """Selecting a climatology-needing config without --climatology_path
  must fail fast with an actionable message, not a NoneType error in
  the first chunk."""
  truth_path, forecast_path, _ = _setup_data(tmp_path)
  out_dir = str(tmp_path / "out")
  with flagsaver.flagsaver(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=None,
      output_dir=out_dir,
      variables=["2m_temperature"],
      time_start="2021-12-01",
      time_stop="2021-12-10",
      eval_configs="deterministic",
      regions=["global"],
  ):
    with pytest.raises(ValueError, match="climatology_path"):
      evaluate.main([])
  # compute_seeps has its own clear requirement
  with flagsaver.flagsaver(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=None,
      output_dir=out_dir,
      variables=["2m_temperature"],
      time_start="2021-12-01",
      time_stop="2021-12-10",
      eval_configs="deterministic",
      regions=["global"],
      compute_seeps=True,
  ):
    with pytest.raises(ValueError, match="compute_seeps"):
      evaluate.main([])
