"""Edge-case coverage for the evaluation engine: pressure-level suffixes,
decreasing latitude, time-step thinning, by-valid persistence, lead_time
chunking."""
import os

import numpy as np
import pytest

from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
from weatherbench2_tpu.regions import SliceRegion


def test_decode_pressure_level_suffixes():
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["temperature_500", "temperature_850", "t2m"],
          time_start="2020-01-01",
          time_stop="2020-01-05",
          lead_stop="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  out = evaluation._decode_pressure_level_suffixes(fc)
  assert "temperature" in out
  assert "t2m" in out
  assert out.sizes["level"] == 2
  np.testing.assert_array_equal(
      out.coords_dict()["level"].data, [500, 850]
  )
  np.testing.assert_allclose(
      out["temperature"].sel(level=850).values,
      fc["temperature_850"].values,
  )


def test_make_latitude_increasing():
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_stop="2020-01-05",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  flipped = ds.isel(latitude=np.arange(ds.sizes["latitude"])[::-1])
  fixed = evaluation.make_latitude_increasing(flipped)
  np.testing.assert_array_equal(
      np.asarray(fixed.coords_dict()["latitude"].data),
      np.asarray(ds.coords_dict()["latitude"].data),
  )
  np.testing.assert_allclose(
      fixed["2m_temperature"].values, ds["2m_temperature"].values
  )


def test_ensure_consistent_time_step_sizes():
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_stop="2020-01-09",
          time_resolution="6 hours",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  forecast = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_stop="2020-01-09",
          time_resolution="12 hours",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  )
  t2, f2 = evaluation._ensure_consistent_time_step_sizes(truth, forecast)
  # truth thinned from 6h to 12h
  assert t2.sizes["time"] == forecast.sizes["time"]
  np.testing.assert_array_equal(
      t2.coords_dict()["time"].data, forecast.coords_dict()["time"].data
  )
  # symmetric case: forecast finer than truth
  f3, t3 = evaluation._ensure_consistent_time_step_sizes(forecast, truth)
  assert t3.sizes["time"] == forecast.sizes["time"]


def test_by_valid_persistence():
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=60.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(lead_stop="3 days", **kwargs), seed=1
  )
  fc = schema.apply_time_conventions(fc, by_init=False)
  pers = evaluation.create_persistence_forecast(fc, truth)
  # persistence at (time=T, lead=L) equals truth at T - L
  times = np.asarray(pers.coords_dict()["time"].data)
  leads = np.asarray(pers.coords_dict()["lead_time"].data)
  tr_times = np.asarray(truth.coords_dict()["time"].data)
  ti, lj = 2, 3
  src = np.nonzero(tr_times == times[ti] - leads[lj])[0][0]
  got = pers["2m_temperature"].isel(time=ti, lead_time=lj).values
  want = truth["2m_temperature"].isel(time=src).values
  np.testing.assert_allclose(got, want)


def test_lead_time_chunking_matches_unchunked(tmp_path):
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-25",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="5 days",
          **{**kwargs, "time_stop": "2020-01-15"},
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)

  def dc(out):
    return config.Data(
        selection=config.Selection(
            variables=["geopotential"],
            levels=[500, 850],
            time_slice=slice("2020-01-01", "2020-01-12"),
        ),
        paths=config.Paths(
            forecast=fc_path, obs=truth_path,
            output_dir=str(tmp_path / out),
        ),
        by_init=True,
    )

  ec = {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      )
  }
  evaluation.evaluate_with_mesh(dc("a"), ec, input_chunks={"init_time": 4})
  evaluation.evaluate_with_mesh(
      dc("b"), ec, input_chunks={"init_time": 4, "lead_time": 2}
  )
  a = xds.open_netcdf(str(tmp_path / "a" / "det.nc"))
  b = xds.open_netcdf(str(tmp_path / "b" / "det.nc"))
  for k in a.keys():
    np.testing.assert_allclose(
        a[k].values,
        b[k].transpose(*a[k].dims).values,
        rtol=1e-6,
    )


def test_pressure_level_suffix_pipeline(tmp_path):
  """End-to-end: suffixed forecast variables vs a level-dim truth."""
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=["temperature"],
          variables_2d=[],
          levels=(500, 850),
          time_start="2020-01-01",
          time_stop="2020-01-20",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["temperature_500", "temperature_850"],
          time_start="2020-01-01",
          time_stop="2020-01-10",
          lead_stop="2 days",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)
  data_config = config.Data(
      selection=config.Selection(
          variables=["temperature"],
          levels=[500, 850],
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / "out"),
      ),
      by_init=True,
      pressure_level_suffixes=True,
  )
  ec = {"det": config.Eval(metrics={"mse": metrics.MSE()})}
  evaluation.evaluate_in_memory(data_config, ec)
  res = xds.open_netcdf(str(tmp_path / "out" / "det.nc"))
  assert "temperature" in res
  assert res.sizes["level"] == 2
  assert np.isfinite(res["temperature"].values).all()


def test_rename_variables(tmp_path):
  """rename_variables maps source names (and dims) onto WB2 conventions."""
  from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
  from weatherbench2_tpu.regions import SliceRegion

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
  forecast = forecast.rename({"2m_temperature": "t2m"})
  tp, fp = str(tmp_path / "t.zarr"), str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(forecast, fp)
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / "out")
      ),
      by_init=True,
      rename_variables={"t2m": "2m_temperature"},
  )
  ec = {
      "deterministic": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
      )
  }
  evaluation.evaluate_in_memory(dc, ec)
  res = xds.open_netcdf(
      os.path.join(dc.paths.output_dir, "deterministic.nc")
  )
  assert "2m_temperature" in res
  assert np.isfinite(res["2m_temperature"].values).all()


def test_bfloat16_transfer_mode(tmp_path, monkeypatch):
  """WB2_TRANSFER_DTYPE=bfloat16 approximates the f32 results closely."""
  from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
  from weatherbench2_tpu.regions import SliceRegion

  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=10.0,
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
  ec = {
      "deterministic": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      )
  }
  results = {}
  for tag, dtype in (("f32", ""), ("bf16", "bfloat16")):
    monkeypatch.setenv("WB2_TRANSFER_DTYPE", dtype)
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
    evaluation.evaluate_with_mesh(
        dc, ec, input_chunks={"init_time": 4}
    )
    results[tag] = xds.open_netcdf(
        os.path.join(dc.paths.output_dir, "deterministic.nc")
    )
  a = results["f32"]["2m_temperature"]
  b = results["bf16"]["2m_temperature"]
  np.testing.assert_allclose(
      a.values, b.transpose(*a.dims).values, rtol=3e-2, atol=3e-2
  )
  # and it is NOT bit-identical (the mode actually engaged)
  assert not np.array_equal(a.values, b.transpose(*a.dims).values)


def test_auto_chunk_size(monkeypatch):
  """Auto chunking respects the byte budget and the batch multiple."""
  from weatherbench2_tpu import schema, xds
  from weatherbench2_tpu.parallel import streaming

  fc = schema.mock_forecast_data(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-03-01",
      lead_stop="5 days",
      spatial_resolution_in_degrees=5.625,
  )
  per_init = sum(
      np.prod([s for d, s in zip(v.dims, v.shape) if d != "time"]) * 4
      for v in fc.variables_dict().values()
  )
  monkeypatch.setenv("WB2_CHUNK_BYTES", str(per_init * 7))
  got = streaming._auto_chunk_size(fc, "time", batch=1)
  assert got == 7, got
  got = streaming._auto_chunk_size(fc, "time", batch=4)
  assert got == 4, got  # rounded down to a batch multiple
  monkeypatch.setenv("WB2_CHUNK_BYTES", "1e18")
  assert streaming._auto_chunk_size(fc, "time", batch=1) == fc.sizes["time"]


def test_chunk_prepare_retry(tmp_path, monkeypatch):
  """A transiently failing chunk preparation is retried, not fatal."""
  from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
  from weatherbench2_tpu.parallel import streaming
  from weatherbench2_tpu.regions import SliceRegion

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

  fails = {"left": 1}
  orig = streaming._make_truth_chunk

  def flaky(*args, **kw):
    if fails["left"]:
      fails["left"] -= 1
      raise OSError("transient read failure")
    return orig(*args, **kw)

  monkeypatch.setattr(streaming, "_make_truth_chunk", flaky)
  monkeypatch.setattr(streaming.time, "sleep", lambda s: None)

  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / "out")
      ),
      by_init=True,
  )
  ec = {
      "d": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
      )
  }
  evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 4})
  res = xds.open_netcdf(os.path.join(dc.paths.output_dir, "d.nc"))
  assert np.isfinite(res["2m_temperature"].values).all()
  assert fails["left"] == 0
