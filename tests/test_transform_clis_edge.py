"""Edge-behavior depth for the streaming transform CLIs: NaN/skipna,
right-edge labels, streaming-window equivalence, valid_and_init mode,
skipna quantiles — mirroring the reference's per-script test depth
(e.g. /root/reference/scripts/resample_in_time_test.py)."""
import os
import sys

import numpy as np
import pandas as pd
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_averages  # noqa: E402
import compute_quantiles  # noqa: E402
import compute_zonal_energy_spectrum  # noqa: E402
import expand_climatology  # noqa: E402
import index_on_valid_time  # noqa: E402
import resample_in_time  # noqa: E402
import slice_dataset  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def _input(tmp_path, days=16, res="6 hours", nan_at=None, name="in.zarr"):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop=str(np.datetime64("2020-01-01")
                        + np.timedelta64(days, "D")),
          time_resolution=res,
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  if nan_at is not None:
    vals = np.asarray(ds["2m_temperature"].values).copy()
    vals[nan_at] = np.nan
    ds["2m_temperature"] = xds.Variable(
        ds["2m_temperature"].dims, vals
    )
  path = str(tmp_path / name)
  xds.to_zarr(ds, path)
  return path, ds


def test_resample_skipna_vs_not(tmp_path):
  in_path, ds = _input(tmp_path, nan_at=(1, 0, 0))
  vals = np.asarray(ds["2m_temperature"].values)

  for skipna, out_name in [(False, "nonan.zarr"), (True, "skipna.zarr")]:
    out = str(tmp_path / out_name)
    with flagsaver.flagsaver(
        input_path=in_path, output_path=out, period="1d",
        mean_vars=["ALL"], skipna=skipna, method="resample",
    ):
      resample_in_time.main([])
    got = np.asarray(xds.open_zarr(out)["2m_temperature"].values)
    if skipna:
      want00 = np.nanmean(vals[:4, 0, 0])
      assert np.isclose(got[0, 0, 0], want00)
      assert np.isfinite(got).all()
    else:
      assert np.isnan(got[0, 0, 0])  # NaN day stays NaN
      assert np.isfinite(got[1:]).all()


def test_resample_right_label_drops_first_bin(tmp_path):
  in_path, ds = _input(tmp_path)
  out = str(tmp_path / "right.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out, period="1d",
      mean_vars=["ALL"], label_side="right",
  ):
    resample_in_time.main([])
  res = xds.open_zarr(out)
  times = np.asarray(res.coords_dict()["time"].data)
  # right labels: bin (T-1d, T]; the first (incomplete) bin is dropped
  assert times[0] == np.datetime64("2020-01-02")
  vals = np.asarray(ds["2m_temperature"].values)
  # (2020-01-01 06:00 .. 2020-01-02 00:00] -> indices 1..4
  want = vals[1:5].mean(axis=0)
  np.testing.assert_allclose(
      np.asarray(res["2m_temperature"].values)[0], want, rtol=1e-6
  )


def test_resample_streaming_windows_equal_single_window(tmp_path):
  in_path, _ = _input(tmp_path, days=20)
  out_a = str(tmp_path / "one.zarr")
  out_b = str(tmp_path / "many.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out_a, period="2d",
      mean_vars=["ALL"], max_vars=["2m_temperature"],
  ):
    resample_in_time.main([])
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out_b, period="2d",
      mean_vars=["ALL"], max_vars=["2m_temperature"],
      working_chunks="time=3,longitude=2",
  ):
    resample_in_time.main([])
  a = xds.open_zarr(out_a)
  b = xds.open_zarr(out_b)
  for k in a.keys():
    np.testing.assert_allclose(a[k].values, b[k].values, rtol=1e-6)


def test_rolling_streaming_matches_unchunked(tmp_path):
  in_path, ds = _input(tmp_path, days=20)
  outs = {}
  for tag, wc in [("one", ""), ("many", "time=5")]:
    out = str(tmp_path / f"roll_{tag}.zarr")
    with flagsaver.flagsaver(
        input_path=in_path, output_path=out, period="2d",
        method="rolling", mean_vars=["ALL"], working_chunks=wc,
    ):
      resample_in_time.main([])
    outs[tag] = xds.open_zarr(out)
  a, b = outs["one"], outs["many"]
  np.testing.assert_allclose(
      a["2m_temperature"].values, b["2m_temperature"].values, rtol=1e-6
  )
  # rolling head: first window-1 entries NaN
  vals = np.asarray(a["2m_temperature"].values)
  assert np.isnan(vals[:7]).all()
  assert np.isfinite(vals[8:]).all()


def test_slice_dataset_drop_and_step(tmp_path):
  in_path, ds = _input(tmp_path)
  out = str(tmp_path / "sl.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out,
      isel="time_start=0,time_stop=40,time_step=2",
      drop_isel="longitude_list=0+2",
  ):
    slice_dataset.main([])
  res = xds.open_zarr(out)
  assert res.sizes["time"] == 20
  assert res.sizes["longitude"] == ds.sizes["longitude"] - 2
  want = np.asarray(ds["2m_temperature"].values)[0:40:2]
  want = np.delete(want, [0, 2], axis=1)
  np.testing.assert_allclose(
      np.asarray(res["2m_temperature"].values), want, rtol=1e-6
  )


def test_index_on_valid_time_valid_and_init(tmp_path):
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-06",
          time_resolution="1 day",
          lead_stop="2 days",
          lead_resolution="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  in_path = str(tmp_path / "fc.zarr")
  xds.to_zarr(fc, in_path)
  out = str(tmp_path / "valid_init.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out,
      desired_time_dims="valid_and_init",
  ):
    index_on_valid_time.main([])
  res = xds.open_zarr(out)
  assert "init" in res.sizes
  src = np.asarray(fc["2m_temperature"].values)  # (lead, init, lon, lat)
  got = np.asarray(res["2m_temperature"].values)  # (valid, init, lon, lat)
  inits = np.asarray(fc.coords_dict()["time"].data)
  valids = np.asarray(res.coords_dict()["time"].data)
  # out[valid, init] = in[init, lead = valid - init] where it exists
  i, j = 2, 1  # valid 2020-01-03, init 2020-01-02 -> lead 1 day
  lead_idx = int(
      (valids[i] - inits[j]) / np.timedelta64(1, "D")
  )
  np.testing.assert_allclose(got[i, j], src[lead_idx, j], rtol=1e-6)
  # missing corner (valid before init) is NaN
  assert np.isnan(got[0, -1]).all()


def test_compute_quantiles_skipna_and_windows(tmp_path):
  in_path, ds = _input(tmp_path, nan_at=(0, 0, 0))
  outs = {}
  for tag, wc in [("one", ""), ("tiled", "longitude=2")]:
    out = str(tmp_path / f"q_{tag}.zarr")
    with flagsaver.flagsaver(
        input_path=in_path, output_path=out,
        quantiles=["0.25", "0.75"], dim=["time"], skipna=True,
        time_start="2020-01-01", time_stop="2020-02-01",
        working_chunks=wc,
    ):
      compute_quantiles.main([])
    outs[tag] = xds.open_zarr(out)
  a, b = outs["one"], outs["tiled"]
  np.testing.assert_allclose(
      a["2m_temperature"].values, b["2m_temperature"].values, rtol=1e-6
  )
  vals = np.asarray(ds["2m_temperature"].values)
  want = np.nanquantile(vals[:, 0, 0], [0.25, 0.75])
  np.testing.assert_allclose(
      np.asarray(a["2m_temperature"].values)[:, 0, 0], want, rtol=1e-6
  )


def test_expand_climatology_daily_no_hour_dim(tmp_path):
  clim = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-03",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  ).isel(time=0, drop=True).expand_dims(dayofyear=1 + np.arange(366))
  clim_path = str(tmp_path / "clim.zarr")
  xds.to_zarr(clim, clim_path)
  out = str(tmp_path / "exp.zarr")
  with flagsaver.flagsaver(
      input_path=clim_path, output_path=out,
      time_start="2020-03-01", time_stop="2020-03-10",
  ):
    expand_climatology.main([])
  res = xds.open_zarr(out)
  assert res.sizes["time"] == 10  # daily cadence without an hour dim
  doy = 61  # 2020-03-01 in a leap year
  np.testing.assert_allclose(
      np.asarray(res["2m_temperature"].values)[0],
      np.asarray(clim["2m_temperature"].values)[doy - 1],
      rtol=1e-6,
  )


def test_compute_averages_over_time_skipna(tmp_path):
  in_path, ds = _input(tmp_path, nan_at=(0, 0, 0))
  out = str(tmp_path / "avg.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out,
      averaging_dims=["time"], skipna=True,
      time_start="2020-01-01", time_stop="2020-02-01",
  ):
    compute_averages.main([])
  res = xds.open_zarr(out)
  vals = np.asarray(ds["2m_temperature"].values)
  np.testing.assert_allclose(
      np.asarray(res["2m_temperature"].values),
      np.nanmean(vals, axis=0),
      rtol=1e-6,
  )
  assert "time" not in res.sizes


def test_resample_daily_midnight_aligned_precip_with_mixed_vars(tmp_path):
  """Midnight-aligned hourly input with precip AND instantaneous vars:
  the shifted accumulative plan must align onto the daily axis instead
  of erroring or emitting a partial leading day."""
  import resample_daily

  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["total_precipitation_24hr", "2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-11",
          time_resolution="1 hour",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  in_path = str(tmp_path / "hourly.zarr")
  xds.to_zarr(ds, in_path)
  out = str(tmp_path / "daily.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out, period="1d",
      statistics=["mean"], method="resample",
  ):
    resample_daily.main([])
  res = xds.open_zarr(out)
  assert res.sizes["time"] == 10
  times = np.asarray(res.coords_dict()["time"].data)
  assert times[0] == np.datetime64("2020-01-01")
  # precip day 1 = sum of hours 01..24 (shifted -1h, aligned to Jan 1)
  tp = np.asarray(ds["total_precipitation_24hr"].values)
  want_day0 = tp[1:25].sum(axis=0)
  np.testing.assert_allclose(
      np.asarray(res["total_precipitation_24hr"].values)[0],
      want_day0, rtol=1e-5,
  )

  with flagsaver.flagsaver(
      input_path=in_path, output_path=str(tmp_path / "x.zarr"),
      period="14d", statistics=["mean"], method="roll",
  ):
    with pytest.raises(NotImplementedError, match="weekly"):
      resample_daily.main([])


def test_statistical_moments_skip_nan(tmp_path):
  import compute_statistical_moments

  in_path, _ = _input(tmp_path, days=8, nan_at=(0, 0, 0))
  out = str(tmp_path / "moments.zarr")
  with flagsaver.flagsaver(input_path=in_path, output_path=out):
    compute_statistical_moments.main([])
  res = xds.open_zarr(out)
  # first/second moments stay finite despite the NaN pixel
  assert np.isfinite(res["2m_temperature_first"].values).all()
  assert np.isfinite(res["2m_temperature_second"].values).all()
  # zeroth moment reflects the NaN fraction (< 1 overall)
  assert float(res["2m_temperature_zeroth"].values) < 1.0


def test_index_on_valid_time_passes_static_vars(tmp_path):
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-05",
          lead_stop="2 days",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  lat = np.asarray(fc.coords_dict()["latitude"].data)
  lon = np.asarray(fc.coords_dict()["longitude"].data)
  fc["land_sea_mask"] = xds.Variable(
      ("latitude", "longitude"),
      np.linspace(0, 1, lat.size * lon.size).reshape(lat.size, lon.size),
  )
  in_path = str(tmp_path / "fc_static.zarr")
  xds.to_zarr(fc, in_path)
  out = str(tmp_path / "valid.zarr")
  with flagsaver.flagsaver(input_path=in_path, output_path=out):
    index_on_valid_time.main([])
  res = xds.open_zarr(out)
  np.testing.assert_allclose(
      np.asarray(res["land_sea_mask"].values),
      np.asarray(fc["land_sea_mask"].values),
      rtol=1e-6,
  )
  assert "2m_temperature" in res.keys()


def test_compute_averages_static_var_not_inflated(tmp_path):
  """A variable without the time dim must not be accumulated once per
  streamed block (regression: N_blocks x inflation under skipna=False)."""
  in_path, _ = _input(tmp_path, days=16)
  full = xds.open_zarr(in_path)
  lat = np.asarray(full.coords_dict()["latitude"].data)
  lon = np.asarray(full.coords_dict()["longitude"].data)
  mask = np.linspace(0.0, 1.0, lat.size * lon.size).reshape(
      lat.size, lon.size
  )
  full["land_sea_mask"] = xds.Variable(("latitude", "longitude"), mask)
  in2 = str(tmp_path / "with_static.zarr")
  xds.to_zarr(full, in2)
  out = str(tmp_path / "avg_static.zarr")
  with flagsaver.flagsaver(
      input_path=in2, output_path=out,
      averaging_dims=["time", "latitude", "longitude"], skipna=False,
      time_start="2020-01-01", time_stop="2020-02-01",
  ):
    compute_averages.main([])
  res = xds.open_zarr(out)
  from weatherbench2_tpu import metrics as m

  w = m.get_lat_weights(full)
  want_static = float(
      (full["land_sea_mask"] * w).mean(["latitude", "longitude"]).values
  )
  np.testing.assert_allclose(
      float(res["land_sea_mask"].values), want_static, rtol=1e-6
  )
  want_t2m = float(
      (full["2m_temperature"] * w)
      .mean(["time", "latitude", "longitude"]).values
  )
  np.testing.assert_allclose(
      float(res["2m_temperature"].values), want_t2m, rtol=1e-6
  )


def test_resample_rejects_unsorted_time():
  times = np.array(
      ["2020-01-02", "2020-01-01", "2020-01-03"], dtype="datetime64[ns]"
  )
  with pytest.raises(ValueError, match="monotonically increasing"):
    utils.resample_time_plan(times, "1 day")


def test_zonal_spectrum_time_kept(tmp_path):
  in_path, ds = _input(tmp_path, days=4)
  out = str(tmp_path / "spec.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out,
      base_variables=["2m_temperature"], levels=[],
      averaging_dims=["latitude"],  # keep time in the output
      time_start="2020-01-01", time_stop="2020-01-03",
  ):
    compute_zonal_energy_spectrum.main([])
  res = xds.open_zarr(out)
  assert "time" in res.sizes and "zonal_wavenumber" in res.sizes
  assert np.isfinite(np.asarray(res["2m_temperature"].values)).all()


def test_slice_dataset_make_dims_increasing(tmp_path):
  """Reference parity (slice_dataset.py:_maybe_make_some_dims_increasing):
  decreasing dims reverse (before selections), increasing pass through,
  non-monotonic raise."""
  in_path, ds = _input(tmp_path)
  # rewrite with latitude flipped to decreasing
  lat = np.asarray(ds.coords_dict()["latitude"].data)
  flipped = ds.isel(latitude=slice(None, None, -1))
  dec_path = str(tmp_path / "dec.zarr")
  xds.to_zarr(flipped, dec_path)

  out = str(tmp_path / "inc.zarr")
  with flagsaver.flagsaver(
      input_path=dec_path, output_path=out,
      make_dims_increasing=["latitude"],
  ):
    slice_dataset.main([])
  res = xds.open_zarr(out)
  got_lat = np.asarray(res.coords_dict()["latitude"].data)
  assert (np.diff(got_lat) > 0).all()
  np.testing.assert_allclose(
      np.asarray(res["2m_temperature"].values),
      np.asarray(ds["2m_temperature"].values), rtol=1e-6
  )

  # composes with a label selection on the now-increasing dim
  out2 = str(tmp_path / "inc_sel.zarr")
  with flagsaver.flagsaver(
      input_path=dec_path, output_path=out2,
      make_dims_increasing=["latitude"],
      sel=f"latitude_start={lat[1]},latitude_stop={lat[-2]}",
  ):
    slice_dataset.main([])
  assert xds.open_zarr(out2).sizes["latitude"] == len(lat) - 2

  # non-monotonic dim: clear error
  shuffled = ds.isel(latitude=[0, 2, 1])
  bad_path = str(tmp_path / "bad.zarr")
  xds.to_zarr(shuffled, bad_path)
  with flagsaver.flagsaver(
      input_path=bad_path, output_path=str(tmp_path / "x.zarr"),
      make_dims_increasing=["latitude"],
  ):
    with pytest.raises(ValueError, match="non-monotonic"):
      slice_dataset.main([])
