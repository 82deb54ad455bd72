"""Tests for regrid / averages / ensemble-mean / derived-variables /
zonal-spectrum / statistical-moments CLIs."""
import os
import sys

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_averages  # noqa: E402
import compute_derived_variables  # noqa: E402
import compute_ensemble_mean  # noqa: E402
import compute_statistical_moments  # noqa: E402
import compute_zonal_energy_spectrum  # noqa: E402
import regrid  # noqa: E402

from weatherbench2_tpu import metrics, schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def _truth(tmp_path, **kw):
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-02-01",
      spatial_resolution_in_degrees=30.0,
  )
  kwargs.update(kw)
  ds = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  path = str(tmp_path / "in.zarr")
  xds.to_zarr(ds, path)
  return path, ds


def test_regrid_cli(tmp_path):
  in_path, ds = _truth(tmp_path)
  out_path = str(tmp_path / "out.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      longitude_nodes=6,
      latitude_nodes=4,
      regridding_method="conservative",
  ):
    regrid.main([])
  out = xds.open_zarr(out_path)
  assert out.sizes["longitude"] == 6
  assert out.sizes["latitude"] == 4
  # constant-preserving check on a constant input
  ds2 = ds.copy(data={
      k: np.full(v.shape, 2.0)
      for k, v in ds.variables_dict().items()
  })
  in2 = str(tmp_path / "in2.zarr")
  xds.to_zarr(ds2, in2)
  out2_path = str(tmp_path / "out2.zarr")
  with flagsaver.flagsaver(
      input_path=in2,
      output_path=out2_path,
      longitude_nodes=6,
      latitude_nodes=4,
      regridding_method="conservative",
  ):
    regrid.main([])
  out2 = xds.open_zarr(out2_path)
  np.testing.assert_allclose(out2["2m_temperature"].values, 2.0, rtol=1e-5)


def test_compute_averages_cli(tmp_path):
  in_path, ds = _truth(tmp_path)
  out_path = str(tmp_path / "avg.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      averaging_dims=["latitude", "longitude"],
      variables=["geopotential", "2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-31",
  ):
    compute_averages.main([])
  out = xds.open_zarr(out_path)
  assert "latitude" not in out.sizes
  # oracle: area-weighted mean
  w = metrics.get_lat_weights(ds).values
  vals = ds["2m_temperature"].isel(time=0).values  # (lon, lat)
  want = (vals * w).mean()
  np.testing.assert_allclose(
      out["2m_temperature"].values[0], want, rtol=1e-6
  )


def test_compute_ensemble_mean_cli(tmp_path):
  ds = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=["geopotential"],
          variables_2d=[],
          time_start="2020-01-01",
          time_stop="2020-01-10",
          lead_stop="2 days",
          ensemble_size=5,
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  in_path = str(tmp_path / "ens.zarr")
  xds.to_zarr(ds, in_path)
  out_path = str(tmp_path / "mean.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      realization_name="realization",
      variables=["geopotential"],
      time_start="2020-01-01",
      time_stop="2020-01-10",
  ):
    compute_ensemble_mean.main([])
  out = xds.open_zarr(out_path)
  assert "realization" not in out.sizes
  np.testing.assert_allclose(
      out["geopotential"].values,
      ds["geopotential"].values.mean(axis=0),
      rtol=1e-6,
  )


def test_compute_derived_variables_cli(tmp_path):
  ds = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=["u_component_of_wind", "v_component_of_wind"],
          variables_2d=["total_precipitation"],
          time_start="2020-01-01",
          time_stop="2020-01-05",
          lead_stop="2 days",
          lead_resolution="6 hours",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  in_path = str(tmp_path / "fc.zarr")
  xds.to_zarr(ds, in_path)
  out_path = str(tmp_path / "derived.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      derived_variables=["wind_speed", "total_precipitation_6hr"],
  ):
    compute_derived_variables.main([])
  out = xds.open_zarr(out_path)
  assert "wind_speed" in out
  assert "total_precipitation_6hr" in out
  want = np.sqrt(
      ds["u_component_of_wind"].values ** 2
      + ds["v_component_of_wind"].values ** 2
  )
  np.testing.assert_allclose(out["wind_speed"].values, want, rtol=1e-6)


def test_zonal_energy_spectrum_cli_and_parseval(tmp_path):
  in_path, ds = _truth(tmp_path)
  out_path = str(tmp_path / "spec.zarr")
  with flagsaver.flagsaver(
      input_path=in_path,
      output_path=out_path,
      base_variables=["geopotential"],
      levels=["500"],
      time_start="2020-01-01",
      time_stop="2020-01-31",
      averaging_dims=["time"],
  ):
    compute_zonal_energy_spectrum.main([])
  out = xds.open_zarr(out_path)
  assert "zonal_wavenumber" in out.sizes
  assert np.isfinite(out["geopotential"].values).all()

  # Parseval: sum of spectrum == discrete integral around the zonal circle.
  # Use an odd longitude count so there is no Nyquist bin (the one-sided
  # doubling convention double-counts Nyquist, matching the reference).
  from weatherbench2_tpu.derived_variables import ZonalEnergySpectrum

  rs = np.random.RandomState(0)
  lat = np.array([-45.0, 0.0, 45.0])
  lon = np.arange(0, 360, 360 / 15)  # 15 points (odd)
  f = rs.randn(15, 3)
  sub = xds.Dataset(
      {"geopotential": (("longitude", "latitude"), f)},
      coords={"longitude": lon, "latitude": lat},
  )
  spectrum = ZonalEnergySpectrum("geopotential").compute(sub)
  circum = 2 * np.pi * schema.EARTH_RADIUS_M * np.cos(np.deg2rad(lat))
  spacing = circum / 15
  integral = (np.abs(f) ** 2).sum(axis=0) * spacing  # per latitude
  total = spectrum.sum("zonal_wavenumber").values
  np.testing.assert_allclose(total, integral, rtol=1e-6)


def test_zonal_spectrum_detects_wave():
  """A pure zonal wave concentrates power at its wavenumber."""
  from weatherbench2_tpu.derived_variables import ZonalEnergySpectrum

  lat = np.array([0.0, 30.0])
  lon = np.arange(0, 360, 10.0)
  k = 4
  field = np.cos(np.deg2rad(k * lon))[:, None] * np.ones((1, 2))
  ds = xds.Dataset(
      {"x": (("longitude", "latitude"), field)},
      coords={"longitude": lon, "latitude": lat},
  )
  spec = ZonalEnergySpectrum("x").compute(ds)
  vals = spec.values  # (wavenumber, lat)? dims: (zonal_wavenumber, latitude)
  peak = np.argmax(vals, axis=spec.dims.index("zonal_wavenumber"))
  assert (peak == k).all()


def test_interpolate_spectral_frequencies():
  from weatherbench2_tpu.derived_variables import (
      ZonalEnergySpectrum,
      interpolate_spectral_frequencies,
  )

  lat = np.array([0.0, 45.0])
  lon = np.arange(0, 360, 10.0)
  rs = np.random.RandomState(0)
  ds = xds.Dataset(
      {"x": (("longitude", "latitude"), rs.rand(36, 2))},
      coords={"longitude": lon, "latitude": lat},
  )
  spec = ZonalEnergySpectrum("x").compute(ds)
  interp = interpolate_spectral_frequencies(spec, "zonal_wavenumber")
  assert "frequency" in interp.dims
  assert np.isfinite(interp.values).any()


def test_compute_statistical_moments_cli(tmp_path):
  in_path, ds = _truth(tmp_path)
  out_path = str(tmp_path / "moments.zarr")
  with flagsaver.flagsaver(
      input_path=in_path, output_path=out_path,
  ):
    compute_statistical_moments.main([])
  out = xds.open_zarr(out_path)
  for order in ("zeroth", "first", "second"):
    assert f"2m_temperature_{order}" in out
  # zeroth moment of non-NaN data is 1
  np.testing.assert_allclose(
      out["2m_temperature_zeroth"].values, 1.0
  )
  vals = ds["2m_temperature"].values
  np.testing.assert_allclose(
      out["2m_temperature_first"].values.squeeze(),
      vals.mean(),
      rtol=1e-6,
  )
  np.testing.assert_allclose(
      out["2m_temperature_second"].values.squeeze(),
      np.square(vals).mean(),
      rtol=1e-6,
  )
