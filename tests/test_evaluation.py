"""Integration tests: evaluate_in_memory ≡ streaming engine (the parity
pattern of reference evaluation_test.py:30-128), plus mesh-sharded runs."""
import os

import numpy as np
import pytest

from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
from weatherbench2_tpu.parallel import make_mesh
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


def make_mock_zarrs(tmp_path, ensemble_size=None, seed=0):
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=["geopotential", "temperature"],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-20",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=seed,
  )
  forecast = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=["geopotential", "temperature"],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-10",
          lead_stop="3 days",
          spatial_resolution_in_degrees=30.0,
          ensemble_size=ensemble_size,
      ),
      seed=seed + 1,
  )
  truth_path = str(tmp_path / "truth.zarr")
  forecast_path = str(tmp_path / "forecast.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(forecast, forecast_path)

  climatology = utils.random_like(
      schema.mock_hourly_climatology_data(
          variables_3d=["geopotential", "temperature"],
          variables_2d=["2m_temperature"],
          spatial_resolution_in_degrees=30.0,
      ),
      seed=seed + 2,
  )
  clim_path = str(tmp_path / "clim.zarr")
  xds.to_zarr(climatology, clim_path)
  return truth_path, forecast_path, clim_path


def _data_config(tmp_path, truth_path, forecast_path, clim_path, by_init,
                 out_name):
  selection = config.Selection(
      variables=["geopotential", "temperature", "2m_temperature"],
      levels=[500, 850],
      time_slice=slice("2020-01-01", "2020-01-08"),
  )
  paths = config.Paths(
      forecast=forecast_path,
      obs=truth_path,
      output_dir=str(tmp_path / out_name),
      climatology=clim_path,
  )
  return config.Data(selection=selection, paths=paths, by_init=by_init)


def _read_results(data_config, name):
  return xds.open_netcdf(
      os.path.join(data_config.paths.output_dir, f"{name}.nc")
  )


def _assert_results_close(a, b, rtol=1e-5):
  assert set(a.keys()) == set(b.keys())
  for k in a.keys():
    da, db = a[k], b[k]
    db = db.transpose(*da.dims)
    np.testing.assert_allclose(
        da.values, db.values, rtol=rtol, atol=1e-7, err_msg=k
    )


@pytest.mark.parametrize("by_init", [True, False])
def test_in_memory_vs_streaming_deterministic(tmp_path, by_init):
  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  clim = xds.open_zarr(clim_path)
  eval_configs = {
      "deterministic": config.Eval(
          metrics={
              "mse": metrics.MSE(),
              "rmse": metrics.RMSESqrtBeforeTimeAvg(),
              "bias": metrics.Bias(),
              "mae": metrics.MAE(),
              "acc": metrics.ACC(climatology=clim),
          },
          regions={
              "global": SliceRegion(),
              "tropics": SliceRegion(lat_slice=slice(-20, 20)),
              "extra-tropics": ExtraTropicalRegion(),
          },
      )
  }
  dc_mem = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, by_init, "out_mem"
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "deterministic")

  dc_str = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, by_init, "out_str"
  )
  chunk_dim = "init_time" if by_init else "time"
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={chunk_dim: 3}
  )
  res_str = _read_results(dc_str, "deterministic")
  _assert_results_close(res_mem, res_str)


def test_in_memory_vs_streaming_probabilistic(tmp_path):
  truth_path, forecast_path, clim_path = make_mock_zarrs(
      tmp_path, ensemble_size=5
  )
  eval_configs = {
      "probabilistic": config.Eval(
          metrics={
              "crps": metrics.CRPS(),
              "crps_spread": metrics.CRPSSpread(),
              "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
              "ensemble_variance": metrics.EnsembleVariance(),
              "debiased_mse": metrics.DebiasedEnsembleMeanMSE(),
              "energy_score": metrics.EnergyScore(),
          },
      )
  }
  dc_mem = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_mem"
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "probabilistic")

  dc_str = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_str"
  )
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 4}
  )
  res_str = _read_results(dc_str, "probabilistic")
  _assert_results_close(res_mem, res_str)


def test_streaming_with_mesh_matches_unsharded(tmp_path):
  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  eval_configs = {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      )
  }
  dc_a = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_a"
  )
  evaluation.evaluate_with_mesh(dc_a, eval_configs,
                                input_chunks={"init_time": 8})
  res_a = _read_results(dc_a, "det")

  mesh = make_mesh()  # 8 virtual cpu devices
  dc_b = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_b"
  )
  evaluation.evaluate_with_mesh(
      dc_b, eval_configs, input_chunks={"init_time": 8}, mesh=mesh
  )
  res_b = _read_results(dc_b, "det")
  _assert_results_close(res_a, res_b, rtol=1e-6)


def test_temporal_results_no_mean(tmp_path):
  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  eval_configs = {
      "temporal": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
          temporal_mean=False,
      )
  }
  dc_mem = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_mem"
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "temporal")
  assert "init_time" in res_mem.sizes

  dc_str = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_str"
  )
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 3}
  )
  res_str = _read_results(dc_str, "temporal")
  _assert_results_close(res_mem, res_str)


def test_climatology_baseline_forecast(tmp_path):
  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  clim = xds.open_zarr(clim_path)
  eval_configs = {
      "clim": config.Eval(
          metrics={"mse": metrics.MSE()},
          evaluate_climatology=True,
      )
  }
  dc_mem = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_mem"
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "clim")

  dc_str = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_str"
  )
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 3}
  )
  res_str = _read_results(dc_str, "clim")
  _assert_results_close(res_mem, res_str)


def test_persistence_baseline(tmp_path):
  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  eval_configs = {
      "pers": config.Eval(
          metrics={"mse": metrics.MSE()},
          evaluate_persistence=True,
      )
  }
  dc_mem = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_mem"
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "pers")

  dc_str = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "out_str"
  )
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 3}
  )
  res_str = _read_results(dc_str, "pers")
  _assert_results_close(res_mem, res_str)


def test_derived_variables_in_eval(tmp_path):
  from weatherbench2_tpu import derived_variables as dvs

  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=["u_component_of_wind", "v_component_of_wind"],
          variables_2d=[],
          time_start="2020-01-01",
          time_stop="2020-01-15",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=5,
  )
  forecast = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=["u_component_of_wind", "v_component_of_wind"],
          variables_2d=[],
          time_start="2020-01-01",
          time_stop="2020-01-08",
          lead_stop="3 days",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=6,
  )
  truth_path = str(tmp_path / "truth.zarr")
  forecast_path = str(tmp_path / "fc.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(forecast, forecast_path)

  selection = config.Selection(
      variables=["u_component_of_wind", "v_component_of_wind"],
      levels=[500, 850],
      time_slice=slice("2020-01-01", "2020-01-05"),
  )
  eval_configs = {
      "derived": config.Eval(
          metrics={"mse": metrics.MSE()},
          derived_variables={
              "wind_speed": dvs.WindSpeed(
                  u_name="u_component_of_wind",
                  v_name="v_component_of_wind",
              )
          },
      )
  }
  dc_mem = config.Data(
      selection=selection,
      paths=config.Paths(
          forecast=forecast_path, obs=truth_path,
          output_dir=str(tmp_path / "om"),
      ),
      by_init=True,
  )
  evaluation.evaluate_in_memory(dc_mem, eval_configs)
  res_mem = _read_results(dc_mem, "derived")
  assert "wind_speed" in res_mem

  dc_str = config.Data(
      selection=selection,
      paths=config.Paths(
          forecast=forecast_path, obs=truth_path,
          output_dir=str(tmp_path / "os"),
      ),
      by_init=True,
  )
  evaluation.evaluate_with_mesh(
      dc_str, eval_configs, input_chunks={"init_time": 2}
  )
  res_str = _read_results(dc_str, "derived")
  _assert_results_close(res_mem, res_str)


def test_streaming_checkpoint_resume(tmp_path):
  """Accumulator state survives a save/load cycle mid-stream."""
  from weatherbench2_tpu.parallel import streaming

  truth_path, forecast_path, clim_path = make_mock_zarrs(tmp_path)
  dc = _data_config(
      tmp_path, truth_path, forecast_path, clim_path, True, "o"
  )
  eval_config = config.Eval(
      metrics={"mse": metrics.MSE()}, regions={"global": SliceRegion()}
  )
  forecast, truth, clim = evaluation.open_forecast_and_truth_datasets(
      dc, eval_config
  )
  ckpt = str(tmp_path / "state.pkl")
  res_full = streaming.evaluate_streaming(
      forecast, truth, clim, eval_config, dc,
      input_chunks={"init_time": 2},
      checkpoint_path=ckpt, checkpoint_every=2,
  )
  assert os.path.exists(ckpt)
  state = streaming.StreamingState.load(ckpt)
  assert state.chunk_index >= 2
  # resuming from the saved state reproduces the full result
  res_resumed = streaming.evaluate_streaming(
      forecast, truth, clim, eval_config, dc,
      input_chunks={"init_time": 2}, state=state,
  )
  for k in res_full.keys():
    np.testing.assert_allclose(
        res_full[k].values, res_resumed[k].values, rtol=1e-6
    )


def test_multi_config_shared_streaming(tmp_path, monkeypatch):
  """Grouped eval configs stream chunks once and match per-config runs."""
  from weatherbench2_tpu.parallel import streaming

  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  forecast = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-10"}
      ),
      seed=1,
  )
  tp, fp = str(tmp_path / "t.zarr"), str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(forecast, fp)

  two_configs = {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      ),
      "det_temporal": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
          temporal_mean=False,
      ),
  }

  calls = []
  orig = streaming._make_truth_chunk
  monkeypatch.setattr(
      streaming, "_make_truth_chunk",
      lambda *a, **k: calls.append(1) or orig(*a, **k),
  )

  def _dc(out):
    return config.Data(
        selection=config.Selection(
            variables=["2m_temperature"],
            time_slice=slice("2020-01-01", "2020-01-08"),
        ),
        paths=config.Paths(
            forecast=fp, obs=tp, output_dir=str(tmp_path / out)
        ),
        by_init=True,
    )

  evaluation.evaluate_with_mesh(
      _dc("grouped"), two_configs, input_chunks={"init_time": 4}
  )
  grouped_calls = len(calls)
  assert grouped_calls == 2, grouped_calls  # 8 inits / chunk 4 = 2 chunks

  calls.clear()
  for name, cfg in two_configs.items():
    evaluation.evaluate_with_mesh(
        _dc(f"solo_{name}"), {name: cfg}, input_chunks={"init_time": 4}
    )
  assert len(calls) == 4  # separate runs re-stream: 2 chunks x 2 configs

  for name in two_configs:
    a = xds.open_netcdf(
        os.path.join(str(tmp_path / "grouped"), f"{name}.nc")
    )
    b = xds.open_netcdf(
        os.path.join(str(tmp_path / f"solo_{name}"), f"{name}.nc")
    )
    for k in a.keys():
      np.testing.assert_allclose(
          a[k].values, b[k].transpose(*a[k].dims).values,
          rtol=1e-6, atol=1e-8, err_msg=name,
      )
