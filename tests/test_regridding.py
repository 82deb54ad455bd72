"""Regridding tests: weight-matrix properties, periodicity, NaN handling,
nearest-neighbor exactness vs brute-force haversine (mirrors the reference
regridding_test.py coverage)."""
import numpy as np
import pytest

from weatherbench2_tpu import regridding, xds


def make_grid(n_lon, n_lat, with_poles=True, periodic=True,
              lon_scheme=regridding.LongitudeScheme.START_AT_ZERO):
  lat_spacing = (
      regridding.LatitudeSpacing.EQUIANGULAR_WITH_POLES
      if with_poles
      else regridding.LatitudeSpacing.EQUIANGULAR_WITHOUT_POLES
  )
  return regridding.Grid(
      longitudes=regridding.longitude_values(lon_scheme, n_lon),
      latitudes=regridding.latitude_values(lat_spacing, n_lat),
      periodic=periodic,
      includes_poles=with_poles,
  )


def test_latitude_weights_rows_sum_to_one():
  src = np.linspace(-90, 90, 73)
  tgt = np.linspace(-90, 90, 19)
  w = regridding.conservative_latitude_weights(src, tgt)
  np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-10)
  assert w.shape == (19, 73)
  assert (w >= 0).all()


def test_longitude_weights_rows_sum_to_one_periodic():
  src = np.arange(0, 360, 5.0)
  tgt = np.arange(0, 360, 15.0)
  w = regridding.conservative_longitude_weights(src, tgt)
  np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-10)
  # periodic: the cell at lon=0 must draw from sources near 355 too
  assert w[0, -1] > 0


def test_longitude_weights_center_at_zero_phase():
  # CENTER_AT_ZERO source vs START_AT_ZERO target: phase alignment required
  src = regridding.longitude_values(
      regridding.LongitudeScheme.CENTER_AT_ZERO, 72
  )
  tgt = regridding.longitude_values(
      regridding.LongitudeScheme.START_AT_ZERO, 24
  )
  w = regridding.conservative_longitude_weights(src, tgt)
  np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-8)


def test_conservative_preserves_global_mean():
  source = make_grid(72, 37)
  target = make_grid(24, 13)
  regridder = regridding.ConservativeRegridder(source, target)
  rs = np.random.RandomState(0)
  field = rs.rand(72, 37)
  out = regridder.regrid_array(field)
  # area-weighted means must agree (conservation)
  def area_mean(vals, lats):
    w = np.cos(np.deg2rad(lats))
    # pole cells have smaller area: use cell-area weights
    b = regridding._cell_bounds_lat(lats, True)
    area = np.sin(np.deg2rad(b[1:])) - np.sin(np.deg2rad(b[:-1]))
    return (vals * area).sum() / (area.sum() * vals.shape[0])

  np.testing.assert_allclose(
      area_mean(field, source.latitudes),
      area_mean(np.asarray(out), target.latitudes),
      rtol=1e-4,
  )


def test_conservative_constant_field_preserved():
  source = make_grid(72, 37)
  target = make_grid(24, 13)
  regridder = regridding.ConservativeRegridder(source, target)
  out = regridder.regrid_array(np.full((72, 37), 3.25))
  np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-5)


def test_conservative_nan_handling():
  source = make_grid(72, 37)
  target = make_grid(24, 13)
  regridder = regridding.ConservativeRegridder(source, target)
  field = np.ones((72, 37))
  field[10, :] = np.nan  # one lon stripe
  out = np.asarray(regridder.regrid_array(field))
  # nanmean semantics: valid neighbors still produce 1.0
  np.testing.assert_allclose(out[np.isfinite(out)], 1.0, rtol=1e-5)
  # all-NaN field -> all NaN
  out2 = np.asarray(regridder.regrid_array(np.full((72, 37), np.nan)))
  assert np.isnan(out2).all()


def test_bilinear_identity_on_same_grid():
  grid = make_grid(36, 19)
  regridder = regridding.BilinearRegridder(grid, grid)
  rs = np.random.RandomState(0)
  field = rs.rand(36, 19)
  out = np.asarray(regridder.regrid_array(field))
  np.testing.assert_allclose(out, field, rtol=1e-10)


def test_bilinear_linear_function_exact():
  source = make_grid(36, 19)
  target = make_grid(72, 37)
  regridder = regridding.BilinearRegridder(source, target)
  # linear in latitude -> exact reconstruction away from wrap effects
  field = np.broadcast_to(source.latitudes, (36, 19)).astype(float)
  out = np.asarray(regridder.regrid_array(field.copy()))
  np.testing.assert_allclose(
      out, np.broadcast_to(target.latitudes, (72, 37)), atol=1e-10
  )


def test_bilinear_periodic_longitude():
  source = make_grid(36, 19)
  target_lons = np.array([355.0, 357.5, 2.5])  # wraps through 0
  target = regridding.Grid(
      longitudes=np.sort(target_lons % 360),
      latitudes=source.latitudes,
      periodic=True,
      includes_poles=True,
  )
  regridder = regridding.BilinearRegridder(source, target)
  # smooth periodic function of lon
  lons = source.latitudes  # unused
  f = np.cos(np.deg2rad(source.longitudes))[:, None] * np.ones((1, 19))
  out = np.asarray(regridder.regrid_array(f))
  want = np.cos(np.deg2rad(target.longitudes))[:, None] * np.ones((1, 19))
  np.testing.assert_allclose(out, want, atol=5e-3)


def test_bilinear_no_poles_extrapolation_nan():
  source = make_grid(36, 18, with_poles=False)
  target = make_grid(36, 19, with_poles=True)
  regridder = regridding.BilinearRegridder(source, target)
  field = np.ones((36, 18))
  out = np.asarray(regridder.regrid_array(field))
  # target pole rows outside source range -> NaN
  assert np.isnan(out[:, 0]).all()
  assert np.isnan(out[:, -1]).all()
  assert np.isfinite(out[:, 5:-5]).all()


def test_nearest_matches_brute_force():
  source = make_grid(24, 13)
  target = make_grid(17, 8)  # deliberately unaligned
  idx = regridding.nearest_neighbor_indices(source, target)

  # brute force haversine over all pairs
  slat, slon = np.deg2rad(source.latitudes), np.deg2rad(source.longitudes)
  tlat, tlon = np.deg2rad(target.latitudes), np.deg2rad(target.longitudes)
  s_pts = np.array(
      [(la, lo) for lo in slon for la in slat]
  )  # (lon, lat) raveled order
  t_pts = np.array([(la, lo) for lo in tlon for la in tlat])

  def hav(a, b):
    dlat = a[0] - b[:, 0]
    dlon = a[1] - b[:, 1]
    return (
        np.sin(dlat / 2) ** 2
        + np.cos(a[0]) * np.cos(b[:, 0]) * np.sin(dlon / 2) ** 2
    )

  for i, t in enumerate(t_pts):
    d = hav(t, s_pts)
    best = d.min()
    got = d[idx[i]]
    np.testing.assert_allclose(got, best, atol=1e-12)


def test_nearest_regrid_identity():
  grid = make_grid(36, 19)
  regridder = regridding.NearestRegridder(grid, grid)
  rs = np.random.RandomState(0)
  field = rs.rand(36, 19)
  out = np.asarray(regridder.regrid_array(field))
  np.testing.assert_allclose(out, field)


def test_regrid_dataset_roundtrip_dims():
  source = make_grid(36, 19)
  target = make_grid(24, 13)
  rs = np.random.RandomState(0)
  import pandas as pd

  ds = xds.Dataset(
      {
          "z": (
              ("time", "level", "longitude", "latitude"),
              rs.rand(2, 3, 36, 19),
          )
      },
      coords={
          "time": pd.date_range("2020-01-01", periods=2).values,
          "level": np.array([500, 700, 850]),
          "longitude": source.longitudes,
          "latitude": source.latitudes,
      },
  )
  regridder = regridding.ConservativeRegridder(source, target)
  out = regridder.regrid_dataset(ds)
  assert out["z"].dims == ("time", "level", "longitude", "latitude")
  assert out.sizes["longitude"] == 24
  assert out.sizes["latitude"] == 13
  np.testing.assert_allclose(
      np.asarray(out.coords_dict()["latitude"].data), target.latitudes
  )


def test_regrid_dataset_decreasing_latitude():
  source = make_grid(36, 19)
  target = make_grid(24, 13)
  rs = np.random.RandomState(0)
  vals = rs.rand(36, 19)
  ds = xds.Dataset(
      {"z": (("longitude", "latitude"), vals[:, ::-1])},
      coords={
          "longitude": source.longitudes,
          "latitude": source.latitudes[::-1],
      },
  )
  regridder = regridding.ConservativeRegridder(source, target)
  out = regridder.regrid_dataset(ds)
  ds_inc = xds.Dataset(
      {"z": (("longitude", "latitude"), vals)},
      coords={
          "longitude": source.longitudes,
          "latitude": source.latitudes,
      },
  )
  out_inc = regridder.regrid_dataset(ds_inc)
  np.testing.assert_allclose(out["z"].values, out_inc["z"].values)


def test_quarter_degree_no_nans_smoke():
  source = make_grid(1440, 721)
  target = make_grid(240, 121)
  regridder = regridding.ConservativeRegridder(source, target)
  field = np.ones((1440, 721), dtype=np.float32)
  out = np.asarray(regridder.regrid_array(field))
  assert np.isfinite(out).all()
  np.testing.assert_allclose(out, 1.0, rtol=1e-4)


def test_regrid_with_jax_arrays():
  import jax.numpy as jnp

  source = make_grid(72, 37)
  target = make_grid(24, 13)
  rs = np.random.RandomState(0)
  field = rs.rand(2, 72, 37).astype(np.float32)
  for cls in (
      regridding.ConservativeRegridder,
      regridding.BilinearRegridder,
      regridding.NearestRegridder,
  ):
    regridder = cls(source, target)
    out_np = np.asarray(regridder.regrid_array(field))
    out_j = np.asarray(regridder.regrid_array(jnp.asarray(field)))
    np.testing.assert_allclose(out_np, out_j, rtol=1e-5, atol=1e-6)
