"""Device climatology kernels vs the host (numpy) reference path."""
import numpy as np
import pytest

from weatherbench2_tpu import schema, utils, xds
from weatherbench2_tpu.ops import climatology as dev_clim


def _stacked(seed=0, years=3, pixels=(4,), nan_day366=True):
  rs = np.random.RandomState(seed)
  x = rs.randn(years, 366, *pixels).astype(np.float32)
  if nan_day366:
    x[0::2, 365] = np.nan  # "non-leap" years lack day 366
  return x


def test_circulant_matrix_rows():
  w = utils.create_window_weights(5).values
  m = dev_clim.circulant_window_matrix(w, n_days=10)
  np.testing.assert_allclose(m.sum(axis=1), w.sum(), rtol=1e-6)
  # window weights land at wrapped positions relative to the diagonal
  np.testing.assert_allclose(m[0, [8, 9, 0, 1, 2]], w, rtol=1e-6)


def _host_rolling(x, window, stat):
  """Reference host computation: weighted circular window over (year, win)."""
  w = utils.create_window_weights(window).values
  half = window // 2
  idx = (np.arange(366)[:, None] + np.arange(-half, window - half)) % 366
  pool = x[:, idx]  # (years, day, window, *pixels)
  wfull = np.broadcast_to(
      w[None, None, :, None], pool.shape
  )
  valid = ~np.isnan(pool)
  wm = np.where(valid, wfull, 0.0)
  x0 = np.where(valid, pool, 0.0)
  axes = (0, 2)
  mean = (x0 * wm).sum(axis=axes) / wm.sum(axis=axes)
  if stat == "mean":
    return mean
  dev = np.where(valid, (pool - mean[None, :, None]) ** 2, 0.0)
  return np.sqrt((dev * wm).sum(axis=axes) / wm.sum(axis=axes))


def test_device_mean_matches_host():
  x = _stacked()
  got = np.asarray(dev_clim.device_rolling_clim(
      x, utils.create_window_weights(15).values, "mean"
  ))
  want = _host_rolling(x.astype(np.float64), 15, "mean")
  np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_device_std_matches_host():
  x = _stacked() * 50 + 500  # large offset: tests the centering trick
  got = np.asarray(dev_clim.device_rolling_clim(
      x, utils.create_window_weights(15).values, "std"
  ))
  want = _host_rolling(x.astype(np.float64), 15, "std")
  np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_device_quantile_matches_weighted_quantile():
  x = _stacked(pixels=(3,))
  window = 9
  qs = [0.25, 2 / 3, 0.9]
  got = np.asarray(dev_clim.device_window_quantile(x, window, qs))
  # host oracle via utils.weighted_quantile over the same pools
  w = utils.create_window_weights(window).values
  half = window // 2
  idx = (np.arange(366)[:, None] + np.arange(-half, window - half)) % 366
  pool = x[:, idx]  # (years, day, window, pixels)
  pool = np.moveaxis(pool, (0, 2), (2, 3)).reshape(366, 3, -1)
  wflat = np.broadcast_to(
      w[None, :], (x.shape[0], window)
  ).T.reshape(-1)
  # build matching (years x window) flattened weights ordering
  wpool = np.broadcast_to(
      w[None, None, :, None],
      (x.shape[0], 366, window, 3),
  )
  wpool = np.moveaxis(wpool, (0, 2), (2, 3)).reshape(366, 3, -1)
  for d in (0, 100, 365):
    for p in range(3):
      valid = ~np.isnan(pool[d, p])
      want = utils.weighted_quantile(
          pool[d, p][valid][None], qs, wpool[d, p][valid], axis=-1
      )[:, 0]
      np.testing.assert_allclose(
          got[:, d, p], want, rtol=1e-4, atol=1e-4,
          err_msg=f"day {d} pixel {p}",
      )


def test_device_quantile_day_blocking_invariant(monkeypatch):
  """A tiny byte budget forces many lax.map day-blocks (incl. the padded
  tail block); results must be bit-identical to the single-block path."""
  x = _stacked(pixels=(3,))
  qs = [0.1, 0.9]
  whole = np.asarray(dev_clim.device_window_quantile(x, 9, qs))
  monkeypatch.setenv("WB2_CLIM_QUANTILE_BYTES", "40000")  # few days/block
  blocked = np.asarray(dev_clim.device_window_quantile(x, 9, qs))
  np.testing.assert_array_equal(whole, blocked)


def test_device_matches_compute_rolling_stat_end_to_end():
  """Full pipeline equivalence: device kernel vs utils.compute_rolling_stat."""
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2019-01-01",
          time_stop="2021-01-01",
          time_resolution="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  w = utils.create_window_weights(15)
  host = utils.compute_rolling_stat(ds, w, "mean")
  # build the stacked (year, doy, ...) array the way the host path does
  stacked = utils.build_stacked_windows(ds, w)  # not used; direct stack:
  years = [2019, 2020]
  per_year = [
      utils.replace_time_with_doy(ds.sel(time=str(y))) for y in years
  ]
  all_doys = np.arange(1, 367)
  stacked_vals = np.stack([
      utils.reindex_with_nan(d, "dayofyear", all_doys)[
          "2m_temperature"
      ].values
      for d in per_year
  ])
  # host path fills day 366 from day 365 before windowing
  nanmask = np.isnan(stacked_vals[:, 365])
  stacked_vals[:, 365] = np.where(
      nanmask, stacked_vals[:, 364], stacked_vals[:, 365]
  )
  got = np.asarray(
      dev_clim.device_rolling_clim(stacked_vals, w.values, "mean")
  )
  np.testing.assert_allclose(
      got, host["2m_temperature"].values, rtol=2e-5, atol=1e-5
  )
