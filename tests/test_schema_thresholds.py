"""Tests for schema time conventions and threshold classes."""
import numpy as np
import pandas as pd
import pytest
import scipy.stats

from weatherbench2_tpu import schema, thresholds, utils, xds


def test_apply_time_conventions_by_init():
  fc = schema.mock_forecast_data(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-05",
      lead_stop="2 days",
      spatial_resolution_in_degrees=60.0,
  )
  out = schema.apply_time_conventions(fc, by_init=True)
  assert "init_time" in out.sizes
  assert "lead_time" in out.sizes
  assert "time" not in out.sizes
  vt = out.coords_dict()["valid_time"]
  assert vt.dims == ("init_time", "lead_time")
  init = out.coords_dict()["init_time"].data
  lead = out.coords_dict()["lead_time"].data
  np.testing.assert_array_equal(
      vt.data, init[:, None] + lead[None, :]
  )


def test_apply_time_conventions_by_valid():
  fc = schema.mock_forecast_data(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-05",
      lead_stop="2 days",
      spatial_resolution_in_degrees=60.0,
  )
  out = schema.apply_time_conventions(fc, by_init=False)
  assert "time" in out.sizes
  it = out.coords_dict()["init_time"]
  assert it.dims == ("time", "lead_time")
  time = out.coords_dict()["time"].data
  lead = out.coords_dict()["lead_time"].data
  np.testing.assert_array_equal(it.data, time[:, None] - lead[None, :])


def test_mock_data_shapes():
  ds = schema.mock_truth_data(spatial_resolution_in_degrees=10.0)
  assert ds.sizes["latitude"] == 19
  assert ds.sizes["longitude"] == 36
  assert ds.sizes["level"] == 3
  assert "2m_temperature" in ds
  assert ds["2m_temperature"].dims == ("time", "longitude", "latitude")
  assert ds["geopotential"].dims == (
      "time", "level", "longitude", "latitude"
  )
  clim = schema.mock_hourly_climatology_data(hour_interval=6)
  assert clim.sizes["hour"] == 4
  assert clim.sizes["dayofyear"] == 366


def test_gaussian_quantile_threshold_matches_scipy():
  clim = schema.mock_hourly_climatology_data(
      variables_3d=[],
      variables_2d=["2m_temperature_mean", "2m_temperature_std"],
      spatial_resolution_in_degrees=60.0,
      hour_interval=24,
  )
  rs = np.random.RandomState(0)
  mean_vals = rs.randn(*clim["2m_temperature_mean"].shape)
  std_vals = np.abs(rs.randn(*clim["2m_temperature_std"].shape)) + 0.5
  clim = clim.copy(data={
      "2m_temperature_mean": mean_vals,
      "2m_temperature_std": std_vals,
  })
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-03-01",
          time_stop="2020-03-05",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  )
  thr = thresholds.GaussianQuantileThreshold(climatology=clim, quantile=0.9)
  got = thr.compute(truth)
  # oracle: mean + ppf(0.9) * std gathered at dayofyear
  doys = pd.DatetimeIndex(
      truth.coords_dict()["time"].data
  ).dayofyear.values
  want = (
      mean_vals[doys - 1, 0]
      + scipy.stats.norm.ppf(0.9) * std_vals[doys - 1, 0]
  )
  np.testing.assert_allclose(
      got["2m_temperature"].values, want, rtol=1e-10
  )


def test_quantile_threshold_selects_nearest_quantile():
  clim = schema.mock_hourly_climatology_data(
      variables_3d=[],
      variables_2d=["2m_temperature_quantile"],
      spatial_resolution_in_degrees=60.0,
      hour_interval=24,
  )
  base = clim["2m_temperature_quantile"]
  qvals = np.stack([
      np.full(base.shape, -1.0), np.full(base.shape, 1.0)
  ])
  ds = xds.Dataset(
      {"2m_temperature_quantile": xds.Variable(
          ("quantile",) + base.dims, qvals
      )},
      coords={**clim.coords_dict(), "quantile": np.array([0.1, 0.9])},
  )
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-03-01",
          time_stop="2020-03-05",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  )
  thr = thresholds.QuantileThreshold(climatology=ds, quantile=0.9)
  got = thr.compute(truth)
  np.testing.assert_allclose(got["2m_temperature"].values, 1.0)
  # nearest-with-tolerance lookup fails for distant quantiles
  thr_bad = thresholds.QuantileThreshold(climatology=ds, quantile=0.5)
  with pytest.raises(KeyError):
    thr_bad.compute(truth)


def test_get_threshold_cls():
  assert thresholds.get_threshold_cls("quantile") is (
      thresholds.QuantileThreshold
  )
  assert thresholds.get_threshold_cls("gaussian_quantile") is (
      thresholds.GaussianQuantileThreshold
  )
  with pytest.raises(NotImplementedError):
    thresholds.get_threshold_cls("bogus")


def test_dataset_safe_lru_cache():
  calls = []

  @utils.dataset_safe_lru_cache(maxsize=2)
  def f(ds):
    calls.append(1)
    return ds.mean("time")

  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          spatial_resolution_in_degrees=60.0,
          time_stop="2020-01-05",
      ),
      seed=0,
  )
  a = f(ds)
  b = f(ds)
  assert len(calls) == 1
  assert a is b
