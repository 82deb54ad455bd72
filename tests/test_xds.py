"""Tests for the xds labeled-array core."""
import numpy as np
import pandas as pd
import pytest

from weatherbench2_tpu import xds


def make_ds():
  time = pd.date_range("2020-01-01", "2020-01-10", freq="D").values
  lat = np.linspace(-90, 90, 5)
  lon = np.linspace(0, 360, 8, endpoint=False)
  rng = np.random.RandomState(0)
  data = rng.randn(len(time), len(lon), len(lat))
  ds = xds.Dataset(
      {"t2m": (("time", "longitude", "latitude"), data)},
      coords={"time": time, "latitude": lat, "longitude": lon},
  )
  return ds, data, time, lat, lon


def test_construction_and_sizes():
  ds, data, time, lat, lon = make_ds()
  assert ds.sizes == {"time": 10, "longitude": 8, "latitude": 5}
  assert list(ds.keys()) == ["t2m"]
  np.testing.assert_array_equal(ds["t2m"].values, data)


def test_isel_and_sel_basic():
  ds, data, time, lat, lon = make_ds()
  sub = ds.isel(time=0)
  assert "time" not in sub.sizes
  np.testing.assert_array_equal(sub["t2m"].values, data[0])

  sub = ds.sel(latitude=slice(-45, 45))
  got = sub["latitude"].values
  assert got.min() >= -45 and got.max() <= 45

  sub = ds.sel(time=time[3])
  np.testing.assert_array_equal(sub["t2m"].values, data[3])

  sub = ds.sel(level=None) if False else ds
  sub = ds.sel(latitude=lat[[1, 3]].tolist())
  assert sub.sizes["latitude"] == 2


def test_sel_partial_string_time():
  ds, data, time, *_ = make_ds()
  sub = ds.sel(time="2020-01-03")
  assert sub.sizes["time"] == 1
  sub2 = ds.sel(time="2020")
  assert sub2.sizes["time"] == 10
  sub3 = ds.sel(time=slice("2020-01-02", "2020-01-04"))
  assert sub3.sizes["time"] == 3


def test_sel_nearest():
  ds, *_ = make_ds()
  sub = ds.sel(latitude=1.0, method="nearest")
  assert sub["latitude"].values == 0.0


def test_vectorized_sel():
  ds, data, time, lat, lon = make_ds()
  # gather times with a 2-d indexer -> time dim replaced by (a, b)
  idx_times = time[:6].reshape(2, 3)
  indexer = xds.DataArray(idx_times, dims=("a", "b"))
  sub = ds.sel(time=indexer)
  assert sub["t2m"].dims == ("a", "b", "longitude", "latitude")
  np.testing.assert_array_equal(
      sub["t2m"].values, data[:6].reshape(2, 3, 8, 5)
  )
  # time coord should now have indexer dims
  assert sub.coords_dict()["time"].dims == ("a", "b")


def test_arithmetic_broadcasting():
  ds, data, time, lat, lon = make_ds()
  w = xds.DataArray(np.cos(np.deg2rad(lat)), dims=("latitude",))
  prod = ds["t2m"] * w
  assert prod.dims == ("time", "longitude", "latitude")
  np.testing.assert_allclose(
      prod.values, data * np.cos(np.deg2rad(lat))
  )
  # new-dim-first broadcasting
  lead = xds.DataArray(np.array([0.0, 1.0]), dims=("lead",))
  s = lead + ds["t2m"]
  assert s.dims == ("lead", "time", "longitude", "latitude")


def test_dataset_arithmetic_matches_vars():
  ds, data, *_ = make_ds()
  diff = ds - ds
  np.testing.assert_array_equal(diff["t2m"].values, np.zeros_like(data))


def test_reductions_and_skipna():
  ds, data, *_ = make_ds()
  m = ds.mean("time")
  np.testing.assert_allclose(m["t2m"].values, data.mean(0))
  d2 = data.copy()
  d2[0, 0, 0] = np.nan
  ds2 = ds.copy(data={"t2m": d2})
  m2 = ds2.mean("time", skipna=True)
  np.testing.assert_allclose(m2["t2m"].values, np.nanmean(d2, 0))
  m3 = ds2.mean("time", skipna=False)
  assert np.isnan(m3["t2m"].values[0, 0])
  v = ds.var("time", ddof=1)
  np.testing.assert_allclose(v["t2m"].values, data.var(0, ddof=1))


def test_weighted_mean_matches_manual():
  ds, data, time, lat, lon = make_ds()
  w = xds.DataArray(np.cos(np.deg2rad(lat)) + 1.01, dims=("latitude",))
  got = ds.weighted(w).mean(["latitude", "longitude"])["t2m"].values
  wfull = np.broadcast_to((np.cos(np.deg2rad(lat)) + 1.01), (8, 5))
  want = (data * wfull).sum((1, 2)) / wfull.sum()
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_weighted_mean_skipna():
  ds, data, time, lat, lon = make_ds()
  d2 = data.copy()
  d2[:, 0, 0] = np.nan
  ds2 = ds.copy(data={"t2m": d2})
  w = np.cos(np.deg2rad(lat)) + 1.01
  wda = xds.DataArray(w, dims=("latitude",))
  got = ds2.weighted(wda).mean(["latitude", "longitude"], skipna=True)[
      "t2m"
  ].values
  wfull = np.broadcast_to(w, (8, 5)).copy()
  for t in range(10):
    valid = ~np.isnan(d2[t])
    want = (np.where(valid, d2[t], 0) * wfull * valid).sum() / (
        wfull * valid
    ).sum()
    np.testing.assert_allclose(got[t], want, rtol=1e-12)
  # skipna=False -> NaN propagates
  got2 = ds2.weighted(wda).mean(["latitude", "longitude"], skipna=False)[
      "t2m"
  ].values
  assert np.isnan(got2).all()


def test_expand_dims_and_concat():
  ds, data, *_ = make_ds()
  e = ds.expand_dims(lead_time=np.array([0, 6], dtype="timedelta64[h]"))
  assert e.sizes["lead_time"] == 2
  np.testing.assert_array_equal(e["t2m"].values[0], data)

  a = ds.expand_dims(member=[0])
  b = ds.expand_dims(member=[1])
  c = xds.concat([a, b], "member")
  assert c.sizes["member"] == 2
  np.testing.assert_array_equal(
      c.coords_dict()["member"].data, np.array([0, 1])
  )


def test_concat_with_dataarray_dim():
  ds, *_ = make_ds()
  dim = xds.DataArray(np.array(["a", "b"], dtype=object), dims=("cat",))
  c = xds.concat([ds, ds], dim)
  assert c.sizes["cat"] == 2


def test_rename_and_transpose():
  ds, data, *_ = make_ds()
  r = ds.rename({"t2m": "temp", "time": "init_time"})
  assert "temp" in r
  assert "init_time" in r.sizes
  t = r.transpose("latitude", "init_time", "longitude")
  assert t["temp"].dims == ("latitude", "init_time", "longitude")


def test_dt_accessor():
  ds, data, time, *_ = make_ds()
  doy = ds["time"].dt.dayofyear
  np.testing.assert_array_equal(doy.values, np.arange(1, 11))
  h = ds["time"].dt.hour
  np.testing.assert_array_equal(h.values, np.zeros(10))


def test_where_and_fillna():
  ds, data, *_ = make_ds()
  da = ds["t2m"]
  w = da.where(da > 0)
  assert np.isnan(w.values[data <= 0]).all()
  f = w.fillna(-1.0)
  assert (f.values[data <= 0] == -1.0).all()
  w0 = da.where(da > 0, 0.0)
  np.testing.assert_array_equal(w0.values, np.where(data > 0, data, 0))


def test_diff_thin_roll():
  ds, data, *_ = make_ds()
  d = ds["t2m"].diff("time")
  np.testing.assert_allclose(d.values, np.diff(data, axis=0))
  assert d.sizes["time"] == 9
  t = ds.thin(time=2)
  assert t.sizes["time"] == 5
  r = ds["t2m"].roll(time=1)
  np.testing.assert_array_equal(r.values, np.roll(data, 1, 0))


def test_zarr_roundtrip(tmp_path):
  ds, data, time, lat, lon = make_ds()
  ds = ds.assign_attrs(title="test")
  path = str(tmp_path / "test.zarr")
  xds.to_zarr(ds, path)
  back = xds.open_zarr(path)
  np.testing.assert_allclose(back["t2m"].values, data)
  np.testing.assert_array_equal(
      back.coords_dict()["time"].data, time.astype("datetime64[ns]")
  )
  np.testing.assert_allclose(back.coords_dict()["latitude"].data, lat)
  assert back.attrs.get("title") == "test"


def test_zarr_timedelta_and_strings(tmp_path):
  lead = np.array([0, 6, 12], dtype="timedelta64[h]")
  ds = xds.Dataset(
      {"x": (("lead_time",), np.arange(3.0))},
      coords={
          "lead_time": lead,
          "metric": np.array(["rmse"], dtype=object),
      },
  )
  path = str(tmp_path / "t.zarr")
  xds.to_zarr(ds, path)
  back = xds.open_zarr(path)
  assert back.coords_dict()["lead_time"].data.dtype.kind == "m"
  np.testing.assert_array_equal(
      back.coords_dict()["lead_time"].data.astype("timedelta64[h]"), lead
  )
  assert list(back.coords_dict()["metric"].data) == ["rmse"]


def test_netcdf_roundtrip(tmp_path):
  ds, data, time, lat, lon = make_ds()
  p = str(tmp_path / "out.nc")
  xds.to_netcdf(ds, p)
  back = xds.open_netcdf(p)
  np.testing.assert_allclose(back["t2m"].values, data)
  np.testing.assert_array_equal(
      back.coords_dict()["time"].data, time.astype("datetime64[ns]")
  )


def test_netcdf_strings_roundtrip(tmp_path):
  ds = xds.Dataset(
      {"score": (("metric", "region"), np.arange(6.0).reshape(2, 3))},
      coords={
          "metric": np.array(["rmse", "acc"], dtype=object),
          "region": np.array(["global", "tropics", "extra-tropics"],
                             dtype=object),
      },
  )
  p = str(tmp_path / "res.nc")
  xds.to_netcdf(ds, p)
  back = xds.open_netcdf(p)
  assert list(back.coords_dict()["metric"].data) == ["rmse", "acc"]
  assert list(back.coords_dict()["region"].data) == [
      "global", "tropics", "extra-tropics"
  ]
  np.testing.assert_allclose(back["score"].values, ds["score"].values)


def test_jax_data_interop():
  import jax.numpy as jnp

  ds, data, *_ = make_ds()
  j = ds.to_jax()
  out = (j["t2m"] * 2).mean("time")
  np.testing.assert_allclose(np.asarray(out.values), (data * 2).mean(0),
                             rtol=1e-6)


def test_combine_by_coords():
  ds, data, time, lat, lon = make_ds()
  a = ds.isel(time=slice(0, 5))
  b = ds.isel(time=slice(5, None))
  c = xds.combine_by_coords([b, a])
  np.testing.assert_array_equal(c["t2m"].values, data)


def test_merge_and_getitem_list():
  ds, data, *_ = make_ds()
  other = xds.Dataset(
      {"z500": (("time",), np.arange(10.0))},
      coords={"time": ds.coords_dict()["time"].data},
  )
  m = xds.merge([ds, other])
  assert set(m.keys()) == {"t2m", "z500"}
  sub = m[["t2m"]]
  assert set(sub.keys()) == {"t2m"}


def test_quantile():
  ds, data, *_ = make_ds()
  q = ds["t2m"].quantile([0.25, 0.5], dim="time")
  assert q.dims == ("quantile", "longitude", "latitude")
  np.testing.assert_allclose(
      q.values, np.quantile(data, [0.25, 0.5], axis=0)
  )


def test_alignment_inner_join():
  ds, data, time, lat, lon = make_ds()
  a = ds["t2m"].isel(time=slice(0, 8))
  b = ds["t2m"].isel(time=slice(2, 10))
  s = a - b
  assert s.sizes["time"] == 6
  np.testing.assert_allclose(s.values, data[2:8] - data[2:8])
