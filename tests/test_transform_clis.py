"""Tests for resample_in_time / resample_daily / slice_dataset /
expand_climatology / compute_quantiles / index_on_valid_time /
compute_probabilistic_climatological_forecasts CLIs."""
import os
import sys

import numpy as np
import pandas as pd
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_probabilistic_climatological_forecasts as cpcf  # noqa: E402
import compute_quantiles  # noqa: E402
import expand_climatology  # noqa: E402
import index_on_valid_time  # noqa: E402
import resample_daily  # noqa: E402
import resample_in_time  # noqa: E402
import slice_dataset  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def _hourly_input(tmp_path, days=20, res="6 hours"):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop=str(np.datetime64("2020-01-01") +
                        np.timedelta64(days, "D")),
          time_resolution=res,
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  path = str(tmp_path / "in.zarr")
  xds.to_zarr(ds, path)
  return path, ds


def test_resample_in_time_mean_matches_manual(tmp_path):
  in_path, ds = _hourly_input(tmp_path)
  out_path = str(tmp_path / "daily.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      method="resample",
      period="1d",
      mean_vars=["2m_temperature"],
      time_start=None,
      time_stop=None,
  ):
    resample_in_time.main([])
  out = xds.open_zarr(out_path)
  vals = ds["2m_temperature"].values  # (time, lon, lat), 6-hourly
  want = vals.reshape(-1, 4, *vals.shape[1:]).mean(axis=1)
  np.testing.assert_allclose(
      out["2m_temperature"].values, want, rtol=1e-6
  )
  assert out.sizes["time"] == 20


def test_resample_in_time_min_max_suffixes(tmp_path):
  in_path, ds = _hourly_input(tmp_path)
  out_path = str(tmp_path / "mm.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      method="resample",
      period="1d",
      min_vars=["2m_temperature"],
      max_vars=["2m_temperature"],
      time_start=None,
      time_stop=None,
  ):
    resample_in_time.main([])
  out = xds.open_zarr(out_path)
  assert "2m_temperature_min" in out
  assert "2m_temperature_max" in out
  vals = ds["2m_temperature"].values.reshape(
      -1, 4, *ds["2m_temperature"].shape[1:]
  )
  np.testing.assert_allclose(
      out["2m_temperature_min"].values, vals.min(axis=1), rtol=1e-6
  )


def test_resample_vs_rolling_alignment(tmp_path):
  """At matching times, resample(left) equals rolling shifted by window-1
  (the reference documents the [T, T+period] window equivalence)."""
  in_path, ds = _hourly_input(tmp_path)
  out_r = str(tmp_path / "r.zarr")
  out_roll = str(tmp_path / "roll.zarr")
  common = dict(
      input_path=in_path,
      mean_vars=["2m_temperature"],
      period="1d",
      time_start=None,
      time_stop=None,
  )
  with flagsaver.flagsaver(output_path=out_r, method="resample", **common):
    resample_in_time.main([])
  with flagsaver.flagsaver(output_path=out_roll, method="rolling", **common):
    resample_in_time.main([])
  a = xds.open_zarr(out_r)
  b = xds.open_zarr(out_roll)
  # rolling value labelled at the window END equals the resample bin that
  # STARTED window-1 steps earlier
  roll_vals = b["2m_temperature"].values[3::4]  # end-of-day entries
  np.testing.assert_allclose(
      a["2m_temperature"].values, roll_vals, rtol=1e-6
  )


def test_slice_dataset_cli(tmp_path):
  in_path, ds = _hourly_input(tmp_path)
  out_path = str(tmp_path / "sliced.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      sel_strings={
          "time_start": "2020-01-03",
          "time_stop": "2020-01-05",
      },
      isel={"latitude_list": "0+2"},
      keep_variables=["2m_temperature"],
  ):
    slice_dataset.main([])
  out = xds.open_zarr(out_path)
  assert out.sizes["latitude"] == 2
  times = out.coords_dict()["time"].data
  assert times.min() >= np.datetime64("2020-01-03")
  assert times.max() <= np.datetime64("2020-01-06")


def test_expand_climatology_cli(tmp_path):
  clim = utils.random_like(
      schema.mock_hourly_climatology_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          hour_interval=6,
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  )
  in_path = str(tmp_path / "clim.zarr")
  xds.to_zarr(clim, in_path)
  out_path = str(tmp_path / "expanded.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      time_start="2020-02-01",
      time_stop="2020-02-03",
  ):
    expand_climatology.main([])
  out = xds.open_zarr(out_path)
  assert "time" in out.sizes
  # Feb 1 = dayofyear 32 (leap year 2020), hour 6 -> index 1
  want = clim["2m_temperature"].sel(dayofyear=32, hour=6).values
  got = out["2m_temperature"].sel(time=np.datetime64("2020-02-01T06")).values
  np.testing.assert_allclose(got, want, rtol=1e-6)


def test_compute_quantiles_cli(tmp_path):
  in_path, ds = _hourly_input(tmp_path)
  out_path = str(tmp_path / "q.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      quantiles=["0.25", "0.75"],
      dim=["time"],
      name_suffix="_quantile",
      variables=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
  ):
    compute_quantiles.main([])
  out = xds.open_zarr(out_path)
  assert "2m_temperature_quantile" in out
  vals = ds["2m_temperature"].values
  want = np.quantile(vals, [0.25, 0.75], axis=0)
  np.testing.assert_allclose(
      out["2m_temperature_quantile"].values, want, rtol=1e-6
  )


def test_index_on_valid_time_cli(tmp_path):
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-06",
          time_resolution="12 hours",
          lead_stop="2 days",
          lead_resolution="6 hours",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=2,
  )
  in_path = str(tmp_path / "fc.zarr")
  xds.to_zarr(fc, in_path)
  out_path = str(tmp_path / "valid.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      desired_time_dims="valid_and_delta",
  ):
    index_on_valid_time.main([])
  out = xds.open_zarr(out_path)
  # forecast spacing = 12h / 6h = 2: every other lead kept
  assert out.sizes["prediction_timedelta"] == 5
  # check one realigned value: valid = init + lead
  init_times = fc.coords_dict()["time"].data
  leads = fc.coords_dict()["prediction_timedelta"].data
  init_i, lead_j = 2, 4  # lead 24h (kept index 2 after spacing-2 thinning)
  valid = init_times[init_i] + leads[lead_j]
  got = out["2m_temperature"].sel(
      time=valid, prediction_timedelta=leads[lead_j]
  ).values
  want = fc["2m_temperature"].isel(
      prediction_timedelta=lead_j, time=init_i
  ).values
  np.testing.assert_allclose(got, want, rtol=1e-6)
  # corners with no contributing forecast are NaN
  first_valid = out["2m_temperature"].isel(time=0)
  assert np.isnan(
      first_valid.isel(prediction_timedelta=slice(1, None)).values
  ).all()


def test_prob_clim_forecast_sampling_properties():
  times = pd.date_range("2000-06-01", "2000-06-10", freq="1D")
  sampled = cpcf.get_sampled_init_times(
      times,
      climatology_start_year=1990,
      climatology_end_year=1995,
      day_window_size=7,
      ensemble_size=50,
      with_replacement=True,
      sample_hold_days=0,
      initial_time_edge_behavior="WRAP_YEAR",
      seed=0,
  )
  assert sampled.shape == (50, 10)
  years = sampled.astype("datetime64[Y]").astype(int) + 1970
  assert years.min() >= 1990 and years.max() <= 1995
  # day-of-year stays within the window around June dates
  doys = pd.DatetimeIndex(sampled.ravel()).dayofyear
  want_doys = pd.DatetimeIndex(np.repeat(times.values, 5)).dayofyear
  assert abs(doys.values.mean() - times.dayofyear.values.mean()) < 2
  # determinism
  sampled2 = cpcf.get_sampled_init_times(
      times, 1990, 1995, 7, 50, True, 0, "WRAP_YEAR", seed=0
  )
  np.testing.assert_array_equal(sampled, sampled2)


def test_prob_clim_forecast_without_replacement_unique():
  times = pd.date_range("2000-06-01", "2000-06-03", freq="1D")
  sampled = cpcf.get_sampled_init_times(
      times, 1990, 1994, 5, ensemble_size=25, with_replacement=False,
      sample_hold_days=0, initial_time_edge_behavior="WRAP_YEAR", seed=1,
  )
  # 5 years x 5 days = 25 combos, all used exactly once per init time
  for j in range(3):
    assert len(np.unique(sampled[:, j])) == 25


def test_prob_clim_forecast_cli(tmp_path):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="1989-12-20",
          time_stop="1996-01-10",
          time_resolution="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=3,
  )
  in_path = str(tmp_path / "obs.zarr")
  xds.to_zarr(ds, in_path)
  out_path = str(tmp_path / "pcf.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      climatology_start_year=1990,
      climatology_end_year=1995,
      initial_time_start="1992-06-01",
      initial_time_end="1992-06-05",
      initial_time_spacing="1d",
      forecast_duration="3 days",
      timedelta_spacing="1d",
      day_window_size=7,
      ensemble_size=4,
      seed=7,
      variables=["2m_temperature"],
      add_source_time=True,
  ):
    cpcf.main([])
  out = xds.open_zarr(out_path)
  assert out.sizes["realization"] == 4
  assert out.sizes["time"] == 5
  assert out.sizes["prediction_timedelta"] == 4
  assert np.isfinite(out["2m_temperature"].values).all()
  # each sample equals the input at its source time
  st = out["source_time"].values.astype("datetime64[ns]")
  input_times = ds.coords_dict()["time"].data
  i0 = int(np.nonzero(input_times == st[1, 2, 1])[0][0])
  np.testing.assert_allclose(
      out["2m_temperature"].values[1, 2, 1],
      ds["2m_temperature"].values[i0],
      rtol=1e-6,
  )


def test_resample_daily_precip_accumulation(tmp_path):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["total_precipitation_24hr"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          time_resolution="6 hours",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=4,
  )
  in_path = str(tmp_path / "p.zarr")
  xds.to_zarr(ds, in_path)
  out_path = str(tmp_path / "pd.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      method="resample",
      period="1d",
      statistics=["mean"],
  ):
    resample_daily.main([])
  out = xds.open_zarr(out_path)
  assert "total_precipitation_24hr" in out
  # accumulative var: after the -1h shift, the day labelled Jan 1 sums the
  # original values at 06/12/18 of Jan 1 plus 00 of Jan 2 (indices 1..4)
  vals = ds["total_precipitation_24hr"].values
  want = vals[1:5].sum(axis=0)
  got = out["total_precipitation_24hr"].sel(
      time=np.datetime64("2020-01-01")
  ).values
  np.testing.assert_allclose(got, want, rtol=1e-6)


def test_prob_clim_forecast_edge_behaviors():
  """WRAP_YEAR wraps, REFLECT_RANGE reflects at the pool edges, sample-hold
  repeats draws within the hold period."""
  # dates near year end so the +/- 10-day window crosses the boundary
  times = pd.date_range("2000-12-28", "2001-01-03", freq="1D")

  wrap = cpcf.get_sampled_init_times(
      times, 1990, 1995, day_window_size=21, ensemble_size=200,
      with_replacement=True, sample_hold_days=0,
      initial_time_edge_behavior="WRAP_YEAR", seed=0,
  )
  years = wrap.astype("datetime64[Y]").astype(int) + 1970
  assert years.min() >= 1990 and years.max() <= 1995
  doys = pd.DatetimeIndex(wrap.ravel()).dayofyear.values
  # wrapping puts some samples in early January and some in late December
  assert (doys <= 20).any() and (doys >= 350).any()

  refl = cpcf.get_sampled_init_times(
      times, 1990, 1995, day_window_size=21, ensemble_size=200,
      with_replacement=True, sample_hold_days=0,
      initial_time_edge_behavior="REFLECT_RANGE", seed=0,
  )
  years_r = refl.astype("datetime64[Y]").astype(int) + 1970
  assert years_r.min() >= 1990 and years_r.max() <= 1995

  # sample-hold: consecutive days within a 2-day hold share the same
  # day offset from their own output time
  held = cpcf.get_sampled_init_times(
      times, 1990, 1995, day_window_size=11, ensemble_size=8,
      with_replacement=True, sample_hold_days=2,
      initial_time_edge_behavior="NO_EDGE", seed=3,
  )
  delta_days = (
      (held - times.values[None, :]).astype("timedelta64[D]")
  ).astype(np.int64)
  for start in range(0, len(times) - 1, 2):
    np.testing.assert_array_equal(
        delta_days[:, start] % 365, delta_days[:, start + 1] % 365,
        err_msg=f"hold period starting at {start}",
    )
