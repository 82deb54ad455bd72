"""Regression tests for the round-2 utils/visualization/thresholds
review findings: weighted-quantile axis moves, NaN-aware fast
climatology paths, empty resample bins, valid_time thresholds, and
reference plot semantics (x1000 units, spread&skill synthesis).
"""
import numpy as np
import pandas as pd
import pytest

from weatherbench2_tpu import schema, thresholds, utils, xds


def test_weighted_quantile_full_weights_nonlast_axis():
  rng = np.random.default_rng(0)
  values = rng.standard_normal((7, 4, 3))
  weights = rng.uniform(0.5, 2.0, size=values.shape)
  got = utils.weighted_quantile(values, 0.5, weights, axis=0)
  want = utils.weighted_quantile(
      np.moveaxis(values, 0, -1), 0.5, np.moveaxis(weights, 0, -1),
      axis=-1,
  )
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # square shapes silently misaligned before the fix
  sq = rng.standard_normal((5, 5))
  wsq = rng.uniform(0.5, 2.0, size=(5, 5))
  got_sq = utils.weighted_quantile(sq, 0.5, wsq, axis=0)
  want_sq = utils.weighted_quantile(sq.T, 0.5, wsq.T, axis=-1)
  np.testing.assert_allclose(got_sq, want_sq, rtol=1e-12)


def _nan_obs():
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2019-01-01", time_stop="2021-01-01",
          time_resolution="6 hours",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=3,
  )
  vals = np.asarray(ds["2m_temperature"].values).copy()
  vals[5, 0, 0] = np.nan  # one missing slot at one pixel
  ds["2m_temperature"] = xds.Variable(ds["2m_temperature"].dims, vals)
  return ds


def test_fast_climatology_paths_skip_nan():
  obs = _nan_obs()
  daily = utils.resample_daily_mean(obs)
  # the day with one missing 6-hour slot still has a finite mean
  assert np.isfinite(daily["2m_temperature"].values).all()

  mean_fast = utils.compute_daily_climatology_mean(
      obs, window_size=15, clim_years=slice("2019", "2020")
  )
  std_fast = utils.compute_daily_climatology_std(
      obs, window_size=15, clim_years=slice("2019", "2020")
  )
  assert np.isfinite(mean_fast["2m_temperature"].values).all()
  assert np.isfinite(std_fast["2m_temperature"].values).all()


def test_resample_emits_empty_bins_as_nan():
  times = np.concatenate([
      pd.date_range("2020-01-01", periods=12, freq="2h").values,
      pd.date_range("2020-01-05", periods=12, freq="2h").values,
  ])
  label_times, starts, ends = utils.resample_time_plan(times, "1 day")
  assert len(label_times) == 5  # Jan 1..5, including the empty gap days
  assert (ends - starts).tolist() == [12, 0, 0, 0, 12]
  ds = xds.Dataset(
      {"x": xds.Variable(("time",), np.arange(len(times), dtype=float))},
      coords={"time": times},
  )
  out = utils.reduce_time_bins(ds, starts, ends, label_times, "mean")
  vals = out["x"].values
  assert np.isfinite(vals[[0, 4]]).all()
  assert np.isnan(vals[1:4]).all()


def test_threshold_on_valid_time_truth():
  clim = schema.mock_hourly_climatology_data(
      hour_interval=6, variables_3d=[], variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=60.0,
  )
  base = clim["2m_temperature"]
  qvals = np.stack([np.full(base.shape, 0.5)]).astype(np.float32)
  qclim = xds.Dataset(
      {"2m_temperature_quantile": xds.Variable(
          ("quantile",) + base.dims, qvals)},
      coords={**clim.coords_dict(), "quantile": np.array([0.5])},
  )
  fc = schema.mock_forecast_data(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-03",
      lead_stop="1 day", spatial_resolution_in_degrees=60.0,
  )
  fc = schema.apply_time_conventions(fc, by_init=True)
  truth = schema.mock_truth_data(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-05",
      spatial_resolution_in_degrees=60.0,
  ).sel(time=fc["valid_time"])
  # truth is valid_time-keyed (no 'time' dim): must not KeyError
  thr = thresholds.QuantileThreshold(climatology=qclim, quantile=0.5)
  out = thr.compute(truth)
  assert "2m_temperature" in out.keys()


def test_plot_timeseries_scales_precip_and_synthesizes_spread_skill():
  import matplotlib

  matplotlib.use("Agg")
  from weatherbench2_tpu import visualization

  lead = np.array([0, 24, 48], dtype="timedelta64[h]").astype(
      "timedelta64[ns]"
  )
  res = xds.Dataset(
      {
          "total_precipitation_24hr": xds.Variable(
              ("metric", "lead_time"), [[0.001, 0.002, 0.003]]
          )
      },
      coords={
          "metric": np.asarray(["rmse"], dtype=object),
          "lead_time": lead,
      },
  )
  ax = visualization.plot_timeseries(
      {"model": res}, metric="rmse", variable="total_precipitation_24hr"
  )
  ydata = ax.lines[0].get_ydata()
  np.testing.assert_allclose(ydata, [1.0, 2.0, 3.0])  # meters -> mm

  ens = xds.Dataset(
      {
          "2m_temperature": xds.Variable(
              ("metric", "lead_time"),
              [[1.0, 2.0, 3.0], [0.5, 1.5, 2.5]],
          )
      },
      coords={
          "metric": np.asarray(
              ["ensemble_mean_rmse", "ensemble_stddev"], dtype=object
          ),
          "lead_time": lead,
      },
  )
  ax2 = visualization.plot_timeseries(
      {"ens": ens}, metric="spread&skill", variable="2m_temperature"
  )
  assert len(ax2.lines) == 2  # skill solid + spread dashed
  np.testing.assert_allclose(ax2.lines[0].get_ydata(), [1.0, 2.0, 3.0])
  np.testing.assert_allclose(ax2.lines[1].get_ydata(), [0.5, 1.5, 2.5])

  ax3 = visualization.plot_timeseries(
      {"ens": ens}, metric="spread/skill", variable="2m_temperature"
  )
  # ratio line (plus the axhline at 1)
  ratio = [l for l in ax3.lines if len(l.get_ydata()) == 3][0]
  got = np.asarray(ratio.get_ydata(), dtype=float)
  np.testing.assert_allclose(got[1:], [0.75, 2.5 / 3.0])
  assert np.isnan(got[0])  # lead 0 masked


def test_fused_debiased_mse_skipna_truth_nan_matches_generic(tmp_path):
  """Round-3 review regression: under skipna, the fused tier must form
  the debiased ensemble-mean MSE per CELL (meansq - var/M) before the
  regional mean — combining the two REGIONAL means instead averages
  them over different NaN cell sets when truth has NaN cells."""
  import numpy as np

  from weatherbench2_tpu import (
      config, evaluation, metrics, schema, test_utils, utils, xds,
  )

  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-20",
      spatial_resolution_in_degrees=20.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  truth = test_utils.insert_nan(truth, frac_nan=0.05, seed=3)
  fc = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=5, lead_stop="2 days",
          **{**kwargs, "time_stop": "2020-01-10"},
      ),
      seed=1,
  )
  tp = str(tmp_path / "t.zarr")
  fp = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(fc, fp)
  ec = config.Eval(
      metrics={"debiased": metrics.DebiasedEnsembleMeanMSE()},
  )
  results = {}
  for tag, use_mesh in (("mem", False), ("mesh", True)):
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
    if use_mesh:
      evaluation.evaluate_with_mesh(
          dc, {"cfg": ec}, input_chunks={"init_time": 5}, skipna=True
      )
    else:
      evaluation.evaluate_in_memory(dc, {"cfg": ec}, skipna=True)
    results[tag] = xds.open_netcdf(str(tmp_path / tag / "cfg.nc"))
  np.testing.assert_allclose(
      results["mesh"]["2m_temperature"].values,
      results["mem"]["2m_temperature"].values,
      rtol=2e-5,
  )


def test_lazy_vectorized_gather_clustered_and_negative(tmp_path):
  """Round-3 review regressions: (a) a year-straddling dayofyear gather
  must read clustered windows, not the whole [1, 366] bounding box;
  (b) negative indices follow numpy semantics on lazy payloads."""
  import numpy as np

  from weatherbench2_tpu import xds

  data = np.arange(366 * 5 * 4, dtype=np.float32).reshape(366, 5, 4)
  ds = xds.Dataset(
      {"x": xds.Variable(("dayofyear", "a", "b"), data)},
      coords={"dayofyear": np.arange(1, 367)},
  )
  path = str(tmp_path / "c.zarr")
  xds.to_zarr(ds, path, chunks={"dayofyear": 8})
  lz = xds.open_zarr(path, lazy=True)

  idx = xds.DataArray(
      np.array([354, 360, 365, 0, 1, 5], dtype=np.int64), dims=("p",)
  )
  got = np.asarray(lz["x"].isel(dayofyear=idx).data)
  np.testing.assert_array_equal(got, data[[354, 360, 365, 0, 1, 5]])

  neg = xds.DataArray(np.array([-1, -366, 3]), dims=("p",))
  got = np.asarray(lz["x"].isel(dayofyear=neg).data)
  np.testing.assert_array_equal(got, data[[-1, -366, 3]])


def test_lazystack_mixed_advanced_indexing_matches_numpy():
  """Round-3 review regression: multiple advanced indexers on a
  LazyStack must follow numpy's pairing semantics (fallback path)."""
  import numpy as np

  from weatherbench2_tpu.xds.core import LazyStack

  parts = [np.arange(12.0).reshape(3, 4) + 100 * i for i in range(4)]
  st = LazyStack(parts)
  ref = np.stack(parts, axis=0)
  k = (np.array([0, 2]), np.array([1, 2]))
  np.testing.assert_array_equal(st[k], ref[k])
  k2 = (np.array([1, 3]), slice(None), np.array([0, 3]))
  np.testing.assert_array_equal(st[k2], ref[k2])


def test_lazystack_boolean_mask_selects_parts():
  """A 1-D boolean mask on the stack axis must select parts (numpy
  semantics), not cast True/False to part indices 1/0."""
  from weatherbench2_tpu.xds.core import LazyStack

  rng = np.random.default_rng(0)
  parts = [rng.standard_normal((4, 5)) for _ in range(3)]
  st = LazyStack(parts)
  dense = np.stack(parts, axis=0)
  mask = np.array([True, False, True])
  np.testing.assert_array_equal(np.asarray(st[mask]), dense[mask])
  # mask length mismatch is an error, as in numpy
  import pytest as _pytest
  with _pytest.raises(IndexError):
    st[np.array([True, False])]
  # scalar bool defers to numpy semantics (newaxis + mask)
  np.testing.assert_array_equal(np.asarray(st[True]), dense[True])


def test_lazystack_placement_rule_fuzz_matches_numpy():
  """Round-3 regression: numpy moves a NON-CONTIGUOUS advanced block
  (scalar ints count as advanced) to axis 0 of the result; per-part
  application evaluated placement against the part's key and returned
  transposed values for keys like ``st[1, :, [1, 3], :]`` and
  ``st[:, [0, 1], :, [1, 2]]``.  Exhaustive small-key sweep vs numpy."""
  from weatherbench2_tpu.xds.core import LazyStack

  rng = np.random.default_rng(0)
  full = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
  st = LazyStack([full[i] for i in range(3)])

  k0s = [slice(None), slice(0, 2), 1, 2, [0, 2],
         np.array([True, False, True])]
  r1s = [slice(None), slice(1, 3), 0, [0, 2]]
  r2s = [slice(None), 1, [1, 3], np.array([0, 2])]
  r3s = [slice(None), slice(0, 3), 2, [1, 4]]
  checked = 0
  for k0 in k0s:
    for r1 in r1s:
      for r2 in r2s:
        for r3 in r3s:
          key = (k0, r1, r2, r3)
          try:
            want = full[key]
          except IndexError:
            continue  # invalid broadcast combos raise in numpy too
          got = np.asarray(st[key])
          assert want.shape == got.shape, key
          np.testing.assert_array_equal(want, got, err_msg=repr(key))
          checked += 1
  assert checked > 300
