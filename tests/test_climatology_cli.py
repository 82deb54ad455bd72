"""Tests for compute_climatology CLI + utils climatology stats."""
import os
import sys

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_climatology  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def _input_data(tmp_path, variables_2d=("2m_temperature",), years=2):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=list(variables_2d),
          time_start="2019-01-01",
          time_stop=f"{2019 + years}-01-01",
          time_resolution="6 hours",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  path = str(tmp_path / "obs.zarr")
  xds.to_zarr(ds, path)
  return path, ds


def test_hourly_mean_and_std(tmp_path):
  in_path, obs = _input_data(tmp_path)
  out_path = str(tmp_path / "clim.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      frequency="hourly",
      hour_interval=6,
      window_size=21,
      start_year=2019,
      end_year=2020,
      statistics=["mean", "std"],
  ):
    compute_climatology.main([])
  clim = xds.open_zarr(out_path)
  assert "2m_temperature" in clim  # mean carries no suffix
  assert "2m_temperature_std" in clim
  assert clim.sizes["hour"] == 4
  assert clim.sizes["dayofyear"] == 366
  vals = clim["2m_temperature"].values
  assert np.isfinite(vals).all()
  # random normal data -> climatological mean near 0, std near 1
  assert abs(vals.mean()) < 0.05
  np.testing.assert_allclose(
      clim["2m_temperature_std"].values.mean(), 1.0, atol=0.05
  )


def test_daily_fast_vs_explicit_mean_equivalence(tmp_path):
  """Mean via explicit and fast methods must agree (reference utils_test)."""
  _, obs = _input_data(tmp_path)
  explicit = utils.compute_daily_stat(
      obs, window_size=15, clim_years=slice("2019", "2020"), stat_fn="mean"
  )
  fast = utils.compute_daily_stat_fast(
      obs, window_size=15, clim_years=slice("2019", "2020"), stat_fn="mean"
  )
  # Methods agree to the smoothing-order tolerance on uniform sampling
  np.testing.assert_allclose(
      explicit["2m_temperature"].values,
      fast["2m_temperature"].values,
      atol=0.15,
  )


def test_quantile_statistic(tmp_path):
  in_path, obs = _input_data(tmp_path)
  out_path = str(tmp_path / "clim_q.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      frequency="daily",
      window_size=61,
      start_year=2019,
      end_year=2020,
      statistics=["quantile"],
      quantiles=["0.1", "0.9"],
  ):
    compute_climatology.main([])
  clim = xds.open_zarr(out_path)
  assert "2m_temperature_quantile" in clim
  assert clim.sizes["quantile"] == 2
  q = clim["2m_temperature_quantile"]
  q10 = q.sel(quantile=0.1).values
  q90 = q.sel(quantile=0.9).values
  assert (q90 > q10).all()
  # 6-hourly N(0,1) data resampled to daily means has std 1/2:
  # q10 ~ -0.64, q90 ~ +0.64
  assert abs(np.mean(q10) + 0.64) < 0.1
  assert abs(np.mean(q90) - 0.64) < 0.1


def test_seeps_statistic(tmp_path):
  # precip-like data: ~60% dry days, wet values exponential
  rs = np.random.RandomState(0)
  ds = schema.mock_truth_data(
      variables_3d=[],
      variables_2d=["total_precipitation_24hr"],
      time_start="2019-01-01",
      time_stop="2021-01-01",
      time_resolution="1 day",
      spatial_resolution_in_degrees=30.0,
  )
  shape = ds["total_precipitation_24hr"].shape
  wet = rs.exponential(2e-3, size=shape)
  dry_mask = rs.rand(*shape) < 0.6
  precip = np.where(dry_mask, 0.0, wet)
  ds = ds.copy(data={"total_precipitation_24hr": precip})
  in_path = str(tmp_path / "precip.zarr")
  xds.to_zarr(ds, in_path)
  out_path = str(tmp_path / "clim_seeps.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      frequency="daily",
      window_size=61,
      start_year=2019,
      end_year=2020,
      statistics=["seeps"],
  ):
    compute_climatology.main([])
  clim = xds.open_zarr(out_path)
  assert "total_precipitation_24hr_seeps_threshold" in clim
  assert "total_precipitation_24hr_seeps_dry_fraction" in clim
  dry_frac = clim["total_precipitation_24hr_seeps_dry_fraction"].values
  # dry fraction should be close to the generating 0.6
  np.testing.assert_allclose(dry_frac.mean(), 0.6, atol=0.05)
  thresh = clim["total_precipitation_24hr_seeps_threshold"].values
  assert (thresh > 0.25e-3).all()


def test_weighted_quantile_matches_numpy_for_equal_weights():
  rs = np.random.RandomState(0)
  x = rs.randn(5, 2000)
  w = np.ones(2000)
  got = utils.weighted_quantile(x, [0.25, 0.5, 0.75], w, axis=-1)
  want = np.quantile(x, [0.25, 0.5, 0.75], axis=-1)
  np.testing.assert_allclose(got, want, atol=0.01)


def test_weighted_quantile_respects_weights():
  # weight mass concentrated on high values shifts quantiles up
  x = np.array([[0.0, 1.0, 2.0, 3.0]])
  w_uniform = np.ones(4)
  w_high = np.array([0.01, 0.01, 1.0, 1.0])
  q_u = utils.weighted_quantile(x, 0.5, w_uniform, axis=-1)[0, 0]
  q_h = utils.weighted_quantile(x, 0.5, w_high, axis=-1)[0, 0]
  assert q_h > q_u


def test_device_path_matches_host(tmp_path):
  """--use_device (circulant matmuls + device sorts) == host numpy path."""
  in_path, obs = _input_data(tmp_path)
  out_host = str(tmp_path / "host.zarr")
  out_dev = str(tmp_path / "dev.zarr")
  common = dict(
      input_path=in_path,
      frequency="hourly",
      hour_interval=12,
      window_size=15,
      start_year=2019,
      end_year=2020,
      statistics=["mean", "std", "quantile"],
      quantiles=["0.25", "0.9"],
  )
  with flagsaver.flagsaver(output_path=out_host, **common):
    compute_climatology.main([])
  with flagsaver.flagsaver(output_path=out_dev, use_device=True, **common):
    compute_climatology.main([])
  a = xds.open_zarr(out_host)
  b = xds.open_zarr(out_dev)
  for name in a.keys():
    da, db = a[name], b[name]
    db = db.transpose(*da.dims)
    if name.endswith("_quantile"):
      # device quantiles interpolate with f32 cumulative-weight positions;
      # a ~1e-7 position rounding can flip to the adjacent order statistic
      # for borderline points, so compare with an order-statistic-gap bound
      diff = np.abs(da.values - db.values)
      close = diff <= 5e-3 * np.abs(db.values) + 5e-4
      assert close.mean() > 0.995, f"{name}: {1 - close.mean():.4%} off"
      assert diff.max() < 0.3, f"{name}: max diff {diff.max()}"
    else:
      np.testing.assert_allclose(
          da.values, db.values, rtol=5e-3, atol=5e-4, err_msg=name
      )


def test_working_chunks_tiling(tmp_path):
  in_path, obs = _input_data(tmp_path)
  out_full = str(tmp_path / "full.zarr")
  out_tiled = str(tmp_path / "tiled.zarr")
  common = dict(
      input_path=in_path,
      frequency="daily",
      window_size=21,
      start_year=2019,
      end_year=2020,
      statistics=["mean"],
  )
  with flagsaver.flagsaver(output_path=out_full, **common):
    compute_climatology.main([])
  with flagsaver.flagsaver(
      output_path=out_tiled,
      working_chunks={"longitude": 4, "latitude": 3},
      **common,
  ):
    compute_climatology.main([])
  a = xds.open_zarr(out_full)
  b = xds.open_zarr(out_tiled)
  np.testing.assert_allclose(
      a["2m_temperature"].values, b["2m_temperature"].values, rtol=1e-6
  )
