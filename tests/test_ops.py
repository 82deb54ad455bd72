"""Tests for the fused Pallas reduction kernels (interpret mode on CPU)."""
import numpy as np
import pytest

from weatherbench2_tpu import metrics, ops, schema, utils, xds
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


def _setup(b=10, n_lon=12, n_lat=7, seed=0, nan_frac=0.0):
  rs = np.random.RandomState(seed)
  f = rs.randn(b, n_lon * n_lat).astype(np.float32)
  t = rs.randn(b, n_lon * n_lat).astype(np.float32)
  c = rs.randn(b, n_lon * n_lat).astype(np.float32)
  if nan_frac:
    f[rs.rand(*f.shape) < nan_frac] = np.nan
    t[rs.rand(*t.shape) < nan_frac] = np.nan
  lat = np.linspace(-90, 90, n_lat)
  lon = np.linspace(0, 360, n_lon, endpoint=False)
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = (w / w.mean()).astype(np.float32)
  masks = [
      np.ones((n_lat, n_lon)),
      ExtraTropicalRegion().mask_weights(lat, lon),
      SliceRegion(lat_slice=slice(-30, 30)).mask_weights(lat, lon),
  ]
  region_w = ops.make_region_weight_matrix(w, masks, n_lon)
  return f, t, c, region_w, lat, w


def test_pallas_matches_reference():
  f, t, c, region_w, *_ = _setup()
  sums_p, wsum_p, nanw_p = ops.fused_deterministic_sums(
      f, t, c, region_w, b_tile=8, l_tile=128, interpret=True
  )
  sums_r, wsum_r, nanw_r = ops.fused_deterministic_sums_reference(
      f.astype(np.float64), t.astype(np.float64), c.astype(np.float64),
      region_w.astype(np.float64),
  )
  np.testing.assert_allclose(np.asarray(sums_p), sums_r, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(wsum_p), wsum_r, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(nanw_p), nanw_r, rtol=2e-5)


def test_pallas_matches_reference_with_nans():
  f, t, c, region_w, *_ = _setup(nan_frac=0.07)
  sums_p, wsum_p, nanw_p = ops.fused_deterministic_sums(
      f, t, c, region_w, b_tile=8, l_tile=256, interpret=True
  )
  sums_r, wsum_r, nanw_r = ops.fused_deterministic_sums_reference(
      f.astype(np.float64), t.astype(np.float64), c.astype(np.float64),
      region_w.astype(np.float64),
  )
  np.testing.assert_allclose(np.asarray(sums_p), sums_r, rtol=2e-4,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(wsum_p), wsum_r, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(nanw_p), nanw_r, rtol=2e-5)


def test_fused_metrics_match_metric_classes():
  """The fused kernel must reproduce metrics.MSE/Bias/MAE/ACC exactly."""
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  forecast = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          lead_stop="0 days",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=1,
  ).isel(prediction_timedelta=0)

  n_lat, n_lon = 7, 12
  lat = np.linspace(-90, 90, n_lat)
  lon = np.linspace(0, 360, n_lon, endpoint=False)
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  regions = {
      "global": SliceRegion(),
      "tropics": SliceRegion(lat_slice=slice(-20, 20)),
      "extra-tropics": ExtraTropicalRegion(),
  }
  masks = [r.mask_weights(lat, lon) for r in regions.values()]
  region_w = ops.make_region_weight_matrix(
      w.astype(np.float32), masks, n_lon
  )

  fv = forecast["2m_temperature"].values.reshape(10, -1)
  tv = truth["2m_temperature"].values.reshape(10, -1)
  got = ops.fused_deterministic_metrics(
      fv, tv, clim=None, region_w=region_w, use_pallas=True
  )

  for i, (rname, region) in enumerate(regions.items()):
    mse = metrics.MSE().compute_chunk(forecast, truth, region=region)
    np.testing.assert_allclose(
        np.asarray(got["mse"])[i],
        mse["2m_temperature"].values,
        rtol=2e-5,
    )
    bias = metrics.Bias().compute_chunk(forecast, truth, region=region)
    np.testing.assert_allclose(
        np.asarray(got["bias"])[i],
        bias["2m_temperature"].values,
        rtol=2e-4, atol=1e-5,
    )
    mae = metrics.MAE().compute_chunk(forecast, truth, region=region)
    np.testing.assert_allclose(
        np.asarray(got["mae"])[i],
        mae["2m_temperature"].values,
        rtol=2e-5,
    )


def test_fused_acc_matches_metric_class():
  truth = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  forecast = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          lead_stop="0 days",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=1,
  ).isel(prediction_timedelta=0)
  clim_full = utils.random_like(
      schema.mock_hourly_climatology_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          spatial_resolution_in_degrees=30.0,
      ),
      seed=2,
  )

  acc_metric = metrics.ACC(climatology=clim_full)
  want = acc_metric.compute_chunk(forecast, truth)

  # align climatology per-time host-side, as the engine does
  clim_aligned = metrics._align_climatology_to_forecast(
      clim_full, forecast, truth
  )
  n_lat, n_lon = 7, 12
  lat = np.linspace(-90, 90, n_lat)
  w = metrics._cell_area_from_latitude(np.deg2rad(lat))
  w = w / w.mean()
  region_w = ops.make_region_weight_matrix(
      w.astype(np.float32), [np.ones((n_lat, n_lon))], n_lon
  )
  fv = forecast["2m_temperature"].values.reshape(10, -1)
  tv = truth["2m_temperature"].values.reshape(10, -1)
  cv = clim_aligned["2m_temperature"].values.reshape(10, -1)
  got = ops.fused_deterministic_metrics(
      fv, tv, clim=cv, region_w=region_w, use_pallas=True
  )
  np.testing.assert_allclose(
      np.asarray(got["acc"])[0],
      want["2m_temperature"].values,
      rtol=2e-5,
  )


def test_skipna_semantics():
  f, t, c, region_w, *_ = _setup(nan_frac=0.05)
  got_propagate = ops.fused_deterministic_metrics(
      f, t, clim=c, region_w=region_w, skipna=False, use_pallas=True
  )
  # NaN present somewhere in every global-region row -> NaN
  assert np.isnan(np.asarray(got_propagate["mse"])[0]).any()
  got_skip = ops.fused_deterministic_metrics(
      f, t, clim=c, region_w=region_w, skipna=True, use_pallas=True
  )
  assert np.isfinite(np.asarray(got_skip["mse"])).all()
  # oracle for skipna=True global mse
  valid = ~(np.isnan(f) | np.isnan(t) | np.isnan(c))
  w_row = region_w[0]
  err2 = np.where(valid, (np.nan_to_num(f) - np.nan_to_num(t)) ** 2, 0.0)
  want = (err2 * w_row).sum(-1) / (valid * w_row).sum(-1)
  np.testing.assert_allclose(
      np.asarray(got_skip["mse"])[0], want, rtol=2e-4, atol=1e-6
  )


def test_pallas_nondivisible_edges_many_regions():
  """Edge masking: L not a multiple of l_tile, B not of b_tile, R > 8."""
  rs = np.random.RandomState(3)
  b, l, r = 13, 1000, 13  # none aligned to (8, 128) tiling
  f = rs.randn(b, l).astype(np.float32)
  t = rs.randn(b, l).astype(np.float32)
  c = rs.randn(b, l).astype(np.float32)
  f[rs.rand(b, l) < 0.05] = np.nan
  region_w = np.abs(rs.randn(r, l)).astype(np.float32)
  region_w[rs.rand(r, l) < 0.3] = 0.0
  sums, wsum, nanw = ops.fused_deterministic_sums(
      f, t, c, region_w, b_tile=128, l_tile=256, interpret=True
  )
  ref = ops.fused_deterministic_sums_reference(
      f.astype(np.float64), t.astype(np.float64), c.astype(np.float64),
      region_w.astype(np.float64),
  )
  for got, want in zip((sums, wsum, nanw), ref):
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=1e-3
    )


def test_region_sums_pallas_matches_reference():
  f, t, c, region_w, *_ = _setup(b=9, nan_frac=0.05)
  x = np.concatenate([f, t, c])  # (3*9, L) rows with NaNs
  sums_p, wsum_p, nanw_p = ops.fused_region_sums(
      x, region_w, n_tile=8, l_tile=128, interpret=True
  )
  sums_r, wsum_r, nanw_r = ops.fused_region_sums_reference(
      x.astype(np.float64), region_w.astype(np.float64)
  )
  np.testing.assert_allclose(np.asarray(sums_p), sums_r, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(wsum_p), wsum_r, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(nanw_p), nanw_r, rtol=2e-5)


def test_region_sums_per_row_nan_accounting():
  # a NaN in one row must not poison other rows' weights
  _, _, _, region_w, *_ = _setup(b=2)
  l = region_w.shape[1]
  x = np.ones((2, l), dtype=np.float32)
  x[0, 0] = np.nan
  sums, wsum, nanw = ops.fused_region_sums(
      x, region_w, n_tile=8, l_tile=128, interpret=True
  )
  sums = np.asarray(sums)
  wsum = np.asarray(wsum)
  nanw = np.asarray(nanw)
  assert nanw[0, 0] > 0          # global region sees row-0's NaN
  assert nanw[0, 1] == 0         # row 1 is clean
  # row 1: weighted sum of ones == total weight
  np.testing.assert_allclose(sums[:, 1], wsum[:, 1], rtol=1e-6)


def test_select_tiles_lane_aligned_any_geometry():
  # Regression: the VMEM-budget loop used to halve tiles with //= 2,
  # which turns a non-power-of-two starting tile (round_up(1035, 128)
  # = 1152 -> 576) into a non-multiple of 128 — Mosaic then rejects the
  # block spec on real TPUs (caught by an 8-degree official13 smoke).
  from weatherbench2_tpu.ops.reductions import _select_tiles

  for rows in (1, 42, 126, 127, 128, 11529):
    for cols in (7, 1035, 2048, 29040, 1038240):
      for budget in (2**14, 131072, 262144, 2**20):
        rt, ct = _select_tiles(rows, cols, 128, 2048, budget)
        assert rt % 128 == 0 and ct % 128 == 0, (rows, cols, budget)
        assert rt * ct <= max(budget, 128 * 128)


def test_fused_kernel_odd_grid_shapes():
  # the 8-degree official13 geometry that exposed the alignment bug:
  # L=1035 cells, tiny budget forcing a tile shrink
  import os

  rng = np.random.default_rng(0)
  b, l, r = 12, 1035, 3
  f = rng.standard_normal((b, l)).astype(np.float32)
  t = rng.standard_normal((b, l)).astype(np.float32)
  w = np.abs(rng.standard_normal((r, l))).astype(np.float32)
  old = os.environ.get("WB2_PALLAS_TILE_BUDGET")
  os.environ["WB2_PALLAS_TILE_BUDGET"] = str(128 * 512)
  try:
    sums_p, wsum_p, nanw_p = ops.fused_deterministic_sums(
        f, t, None, w, interpret=True
    )
  finally:
    if old is None:
      del os.environ["WB2_PALLAS_TILE_BUDGET"]
    else:
      os.environ["WB2_PALLAS_TILE_BUDGET"] = old
  stats = np.stack([f - t, (f - t) ** 2, np.abs(f - t),
                    f * t, f * f, t * t])
  expect = np.einsum("sbl,rl->srb", stats.astype(np.float64),
                     w.astype(np.float64))
  np.testing.assert_allclose(
      np.asarray(sums_p)[:, :r], expect, rtol=1e-3, atol=1e-4
  )
