"""Physics oracle tests for derived variables (reference
derived_variables_test.py coverage class)."""
import numpy as np
import pytest

from weatherbench2_tpu import derived_variables as dvs
from weatherbench2_tpu import schema, utils, xds

R = schema.EARTH_RADIUS_M


def _grid_ds(fields, levels=(500, 700, 850), n_lon=36, n_lat=19):
  lon = np.linspace(0, 360, n_lon, endpoint=False)
  lat = np.linspace(-90, 90, n_lat)
  coords = {
      "longitude": lon,
      "latitude": lat,
      "level": np.array(list(levels)),
  }
  ds = xds.Dataset({}, coords=coords)
  for name, fn in fields.items():
    lon2, lat2 = np.meshgrid(lon, lat, indexing="ij")
    vals = np.stack([fn(lon2, lat2, lev) for lev in levels], axis=0)
    ds[name] = xds.Variable(("level", "longitude", "latitude"), vals)
  return ds


def test_differentiate_matches_gradient_nonuniform():
  x = np.array([500.0, 700.0, 850.0])
  vals = np.array([[1.0, 4.0, 9.0], [2.0, 3.0, 5.0]])
  da = xds.DataArray(
      vals, dims=("a", "level"), coords={"level": x}
  )
  got = da.differentiate("level").values
  want = np.gradient(vals, x, axis=1)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_integrate_matches_trapezoid():
  x = np.array([500.0, 700.0, 850.0])
  rs = np.random.RandomState(0)
  vals = rs.rand(4, 3)
  da = xds.DataArray(vals, dims=("a", "level"), coords={"level": x})
  got = da.integrate("level").values
  want = np.trapezoid(vals, x, axis=1)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_wind_divergence_analytic():
  """u = sin(k·lon): div = k·cos(k·lon) / (R·cosφ)."""
  k = 3

  def u(lon, lat, lev):
    return np.sin(np.deg2rad(k * lon))

  def v(lon, lat, lev):
    return np.zeros_like(lon)

  ds = _grid_ds(
      {"u_component_of_wind": u, "v_component_of_wind": v}, n_lon=144
  )
  div = dvs.WindDivergence().compute(ds)
  lon = np.asarray(ds.coords_dict()["longitude"].data)
  lat = np.asarray(ds.coords_dict()["latitude"].data)
  want = (
      k * np.cos(np.deg2rad(k * lon))[None, :, None]
      / (R * np.cos(np.deg2rad(lat))[None, None, :])
  )
  got = div.values
  # skip poles (zeroed) and the longitude wrap edges (one-sided diff)
  inner = got[:, 2:-2, 2:-2]
  want_inner = np.broadcast_to(want, got.shape)[:, 2:-2, 2:-2]
  np.testing.assert_allclose(inner, want_inner, rtol=1e-2, atol=1e-12)
  # poles zeroed
  assert (got[:, :, 0] == 0).all() and (got[:, :, -1] == 0).all()


def test_wind_vorticity_analytic():
  """v = sin(k·lon): curl = k·cos(k·lon)/(R·cosφ); u = 0."""
  k = 2

  def v(lon, lat, lev):
    return np.sin(np.deg2rad(k * lon))

  def u(lon, lat, lev):
    return np.zeros_like(lon)

  ds = _grid_ds(
      {"u_component_of_wind": u, "v_component_of_wind": v}, n_lon=144
  )
  vort = dvs.WindVorticity().compute(ds)
  lon = np.asarray(ds.coords_dict()["longitude"].data)
  lat = np.asarray(ds.coords_dict()["latitude"].data)
  want = (
      k * np.cos(np.deg2rad(k * lon))[None, :, None]
      / (R * np.cos(np.deg2rad(lat))[None, None, :])
  )
  got = vort.values[:, 2:-2, 2:-2]
  want_inner = np.broadcast_to(want, vort.values.shape)[:, 2:-2, 2:-2]
  np.testing.assert_allclose(got, want_inner, rtol=1e-2, atol=1e-12)


def test_vertical_velocity_constant_divergence():
  """Constant divergence d: omega(p) = -d · (p - p0) in Pa."""
  c = 1e-5  # uniform du/dx after metric factors? use v linear in lat
  # v = c·R·(lat in rad) gives dv/dy = c exactly (before pole effects)

  def v(lon, lat, lev):
    return c * R * np.deg2rad(lat)

  def u(lon, lat, lev):
    return np.zeros_like(lon)

  ds = _grid_ds(
      {"u_component_of_wind": u, "v_component_of_wind": v},
      levels=(500, 700, 850),
  )
  w = dvs.VerticalVelocity().compute(ds)
  got = w.values  # (level, lon, lat)
  # omega = -∫ div dp, div = c -> omega(level) = -c·(p - 500)·100
  p = np.array([500.0, 700.0, 850.0])
  want = -c * (p - 500.0) * 100.0
  mid = got[:, 5, 9]  # away from poles
  np.testing.assert_allclose(mid, want, rtol=1e-6)


def test_eddy_kinetic_energy_zero_for_zonal_mean_flow():
  def u(lon, lat, lev):
    return np.full_like(lon, 7.0)  # no zonal deviation

  def v(lon, lat, lev):
    return np.full_like(lon, -3.0)

  ds = _grid_ds({"u_component_of_wind": u, "v_component_of_wind": v})
  eke = dvs.EddyKineticEnergy().compute(ds)
  np.testing.assert_allclose(eke.values, 0.0, atol=1e-10)


def test_geostrophic_wind_zonally_symmetric():
  """Φ quadratic in latitude -> u_g = -dΦ/dy / f, v_g = 0."""
  a = 10.0

  def z(lon, lat, lev):
    return a * np.deg2rad(lat) ** 2 * R  # Φ = a·R·φ²

  ds = _grid_ds({"geopotential": z}, n_lat=37)
  u = dvs.UComponentOfGeostrophicWind().compute(ds)
  v = dvs.VComponentOfGeostrophicWind().compute(ds)
  lat = np.asarray(ds.coords_dict()["latitude"].data)
  omega = 7.292e-5
  f = 2 * omega * np.sin(np.deg2rad(lat))
  want_u = -2 * a * np.deg2rad(lat) / f  # dΦ/dy = 2aφ·R / R
  # compare away from equator (f -> 0) and poles
  sel = (np.abs(lat) > 20) & (np.abs(lat) < 80)
  got = u.values[0, 5, :]
  np.testing.assert_allclose(got[sel], want_u[sel], rtol=2e-3)
  # v_g is exactly 0 off-equator (0/0 = NaN at the equator by design)
  np.testing.assert_allclose(
      v.values[:, 3:-3, sel], 0.0, atol=1e-10
  )
  speed = dvs.GeostrophicWindSpeed().compute(ds)
  np.testing.assert_allclose(
      speed.values[0, 5, sel], np.abs(want_u[sel]), rtol=2e-3
  )
  # ageostrophic wind of a geostrophically-balanced flow is ~0
  ds2 = _grid_ds({
      "geopotential": z,
      "u_component_of_wind": lambda lon, lat, lev: np.zeros_like(lon),
      "v_component_of_wind": lambda lon, lat, lev: np.zeros_like(lon),
  }, n_lat=37)
  ag_u = dvs.UComponentOfAgeostrophicWind().compute(ds2)
  np.testing.assert_allclose(
      ag_u.values[0, 5, sel], -want_u[sel], rtol=2e-3
  )


def test_lapse_rate_linear_temperature():
  """T linear in z: dT/dz constant = -6.5 K/km."""
  gamma = -0.0065
  g = 9.81

  def temp(lon, lat, lev):
    z = (1000 - lev) * 12.0  # fake height in m, linear in level
    return np.full_like(lon, 288.0 + gamma * z)

  def geop(lon, lat, lev):
    z = (1000 - lev) * 12.0
    return np.full_like(lon, g * z)

  ds = _grid_ds({"temperature": temp, "geopotential": geop})
  lr = dvs.LapseRate().compute(ds)
  np.testing.assert_allclose(lr.values, gamma, rtol=1e-6)


def test_total_column_water_constant_q():
  q0 = 0.01

  def q(lon, lat, lev):
    return np.full_like(lon, q0)

  ds = _grid_ds({"specific_humidity": q}, levels=(300, 500, 850))
  tcw = dvs.TotalColumnWater().compute(ds)
  want = q0 * (850 - 300) / 9.81
  np.testing.assert_allclose(tcw.values, want, rtol=1e-10)


def test_integrated_vapor_transport_constant():
  q0, u0 = 0.01, 10.0
  ds = _grid_ds(
      {
          "specific_humidity": lambda lon, lat, lev: np.full_like(lon, q0),
          "u_component_of_wind": lambda lon, lat, lev: np.full_like(
              lon, u0
          ),
          "v_component_of_wind": lambda lon, lat, lev: np.zeros_like(lon),
      },
      levels=(300, 500, 850),
  )
  ivt = dvs.IntegratedWaterTransport().compute(ds)
  want = q0 * u0 * (850 - 300) / 9.81
  np.testing.assert_allclose(ivt.values, want, rtol=1e-10)


def test_relative_humidity_formula():
  t0, q0, p0 = 283.0, 0.005, 850.0
  ds = _grid_ds(
      {
          "temperature": lambda lon, lat, lev: np.full_like(lon, t0),
          "specific_humidity": lambda lon, lat, lev: np.full_like(
              lon, q0
          ),
      },
      levels=(p0,),
  )
  rh = dvs.RelativeHumidity().compute(ds)
  svp = 6.112 * np.exp(17.67 * (t0 - 273.15) / (t0 - 29.65))
  want = (q0 / (1 - q0)) / (0.622 * svp / (p0 - svp))
  np.testing.assert_allclose(rh.values, want, rtol=1e-10)


def test_aggregate_precipitation_accumulation():
  lead = np.arange(0, 30, 6).astype("timedelta64[h]")
  vals = np.arange(5.0)[None, :]  # (x, lead)
  ds = xds.Dataset(
      {"total_precipitation_6hr": (("x", "prediction_timedelta"), vals)},
      coords={"prediction_timedelta": lead, "x": np.arange(1)},
  )
  agg = dvs.AggregatePrecipitationAccumulation(
      accumulation_hours=24
  ).compute(ds)
  got = agg.values[0]
  # trailing 4-window sums; first 3 NaN
  assert np.isnan(got[:3]).all()
  np.testing.assert_allclose(got[3], 0 + 1 + 2 + 3)
  np.testing.assert_allclose(got[4], 1 + 2 + 3 + 4)


def test_precipitation_accumulation_semantics():
  """24h accumulation at lead T = tp(T) - tp(T-24h); negatives clamped."""
  lead = np.arange(0, 54, 6).astype("timedelta64[h]")
  tp = np.array([0, 1, 2, 3, 4, 5, 4.5, 7, 8], dtype=float)[None, :]
  ds = xds.Dataset(
      {"total_precipitation": (("x", "prediction_timedelta"), tp)},
      coords={"prediction_timedelta": lead, "x": np.arange(1)},
  )
  acc = dvs.PrecipitationAccumulation(
      total_precipitation_name="total_precipitation",
      accumulation_hours=24,
  ).compute(ds)
  got = acc.values[0]
  assert np.isnan(got[:4]).all()  # leads 0..18h incomplete
  np.testing.assert_allclose(got[4], tp[0, 4] - tp[0, 0])
  np.testing.assert_allclose(got[8], tp[0, 8] - tp[0, 4])


def test_wind_speed_with_jax():
  import jax.numpy as jnp

  ds = _grid_ds(
      {
          "u_component_of_wind": lambda lon, lat, lev: np.full_like(
              lon, 3.0
          ),
          "v_component_of_wind": lambda lon, lat, lev: np.full_like(
              lon, 4.0
          ),
      }
  ).to_jax()
  ws = dvs.WindSpeed(
      u_name="u_component_of_wind", v_name="v_component_of_wind"
  ).compute(ds)
  np.testing.assert_allclose(np.asarray(ws.values), 5.0, rtol=1e-6)
