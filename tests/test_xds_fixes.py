"""Regression tests for xds data-layer review findings (round 2):
CF attr round-trips, float CF offsets, descending-index nearest lookup,
squeeze/quantile/astype edges, group-level coordinates, template chunking.
"""
import json
import os

import numpy as np
import pytest

from weatherbench2_tpu import schema, utils, xds
from weatherbench2_tpu.xds import core, io_zarr


def _small_ds():
  return utils.random_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-04",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )


def test_stale_cf_units_do_not_survive_roundtrip(tmp_path):
  """A store opened from an xarray-style 'hours since' encoding must not
  re-emit the stale units attr over freshly ns-encoded data."""
  ds = _small_ds()
  # simulate the attrs state after opening an hours-encoded store where
  # the source units attr survived into the variable attrs
  tvar = ds.coords_dict()["time"]
  ds = xds.Dataset(
      dict(ds.variables_dict()),
      coords={
          **ds.coords_dict(),
          "time": xds.Variable(
              tvar.dims, tvar.data,
              {"units": "hours since 1900-01-01", "calendar": "gregorian"},
          ),
      },
  )
  path = str(tmp_path / "rt.zarr")
  xds.to_zarr(ds, path)
  zattrs = json.load(open(os.path.join(path, "time", ".zattrs")))
  assert zattrs["units"].startswith("nanoseconds since")
  back = xds.open_zarr(path)
  np.testing.assert_array_equal(
      np.asarray(back.coords_dict()["time"].data),
      np.asarray(_small_ds().coords_dict()["time"].data),
  )
  # consumed CF encoding attrs are not user-visible attrs after decode
  assert "units" not in back.coords_dict()["time"].attrs


def test_decode_cf_float_offsets_and_nan():
  attrs = {"units": "days since 2000-01-01"}
  data = np.array([0.0, 0.5, np.nan, 2.25])
  got = io_zarr._decode_cf(data, attrs)
  want = np.array(
      ["2000-01-01T00:00", "2000-01-01T12:00", "NaT", "2000-01-03T06:00"],
      dtype="datetime64[ns]",
  )
  np.testing.assert_array_equal(got, want)
  # bare float timedeltas
  td = io_zarr._decode_cf(np.array([1.5, np.nan]), {"units": "hours"})
  assert td.dtype == np.dtype("timedelta64[ns]")
  assert td[0] == np.timedelta64(90, "m")
  assert np.isnat(td[1])


def test_nearest_on_descending_index():
  # ERA5-native descending latitude ordering
  da = xds.DataArray(
      np.arange(5.0), dims=("latitude",),
      coords={"latitude": np.array([90.0, 45.0, 0.0, -45.0, -90.0])},
  )
  got = da.sel(latitude=44.0, method="nearest")
  assert float(got.values) == 1.0  # position of 45.0
  got2 = da.sel(latitude=-46.0, method="nearest")
  assert float(got2.values) == 3.0
  with pytest.raises(KeyError):
    da.sel(latitude=20.0, method="nearest", tolerance=1.0)
  # ascending still exact
  da2 = xds.DataArray(
      np.arange(5.0), dims=("latitude",),
      coords={"latitude": np.array([-90.0, -45.0, 0.0, 45.0, 90.0])},
  )
  assert float(da2.sel(latitude=44.0, method="nearest").values) == 3.0


def test_isel_scalar_plus_array_placement():
  """numpy's advanced-index placement rule (scalar int + array separated
  by a slice moves the broadcast axis first) must not leak into isel."""
  da = xds.DataArray(
      np.arange(5 * 4 * 6).reshape(5, 4, 6).astype(float),
      dims=("time", "lat", "lon"),
      coords={
          "time": np.arange(5), "lat": np.arange(4), "lon": np.arange(6)
      },
  )
  got = da.isel(time=0, lon=[0, 2, 3])
  assert got.dims == ("lat", "lon")
  want = np.arange(5 * 4 * 6).reshape(5, 4, 6)[0][:, [0, 2, 3]]
  np.testing.assert_array_equal(got.values, want)


def test_isel_fuzz_vs_orthogonal_oracle():
  """Random mixes of scalar/slice/array indexers must match a sequential
  per-axis (orthogonal) numpy oracle — the semantics xarray guarantees
  and numpy's placement rule silently violates for some mixes."""
  rng = np.random.default_rng(12)
  dims = ("a", "b", "c", "d")
  shape = (5, 4, 6, 3)
  data = rng.standard_normal(shape)
  da = xds.DataArray(
      data, dims=dims,
      coords={d: np.arange(n) for d, n in zip(dims, shape)},
  )
  for _ in range(50):
    indexers = {}
    for d, n in zip(dims, shape):
      kind = rng.integers(0, 4)
      if kind == 0:
        continue
      if kind == 1:
        indexers[d] = int(rng.integers(0, n))
      elif kind == 2:
        lo = int(rng.integers(0, n))
        indexers[d] = slice(lo, int(rng.integers(lo, n)) + 1)
      else:
        k = int(rng.integers(1, n + 1))
        indexers[d] = rng.choice(n, size=k, replace=False)
    if not indexers:
      continue
    got = da.isel(indexers)
    # oracle: apply one axis at a time
    want = data
    want_dims = list(dims)
    for d in dims:
      if d not in indexers:
        continue
      ax = want_dims.index(d)
      k = indexers[d]
      key = [slice(None)] * want.ndim
      key[ax] = k
      want = want[tuple(key)]
      if isinstance(k, (int, np.integer)):
        want_dims.remove(d)
    assert got.dims == tuple(want_dims), (indexers, got.dims, want_dims)
    np.testing.assert_array_equal(got.values, want, err_msg=str(indexers))


def test_partial_string_second_resolution_and_inclusive_stop():
  t = np.arange(
      np.datetime64("2020-01-01"), np.datetime64("2020-01-03"),
      np.timedelta64(6, "h"),
  )
  da = xds.DataArray(
      np.arange(len(t), dtype=float), dims=("time",), coords={"time": t}
  )
  assert float(da.sel(time="2020-01-01T06:00:00").values) == 1.0
  got = da.sel(time=slice("2020-01-01T00:00:00", "2020-01-01T18:00:00"))
  assert len(got.values) == 4  # label slicing is stop-inclusive


def test_expand_dims_negative_axis():
  v = xds.Variable(("a", "b"), np.zeros((3, 4)))
  out = v.expand_dims_var("new", axis=-1)
  assert out.dims == ("a", "b", "new")
  assert out.shape == (3, 4, 1)


def test_align_preserves_descending_order():
  a = xds.DataArray(
      np.arange(3.0), dims=("lat",),
      coords={"lat": np.array([90.0, 45.0, 0.0])},
  )
  b = xds.DataArray(
      np.arange(2.0), dims=("lat",),
      coords={"lat": np.array([45.0, 0.0])},
  )
  c = a + b
  np.testing.assert_array_equal(
      np.asarray(c.coords["lat"].data), [45.0, 0.0]
  )


def test_merge_conflicting_values_raise():
  a = xds.Dataset({"t": xds.Variable(("x",), np.array([1.0, 2.0]))})
  b = xds.Dataset({"t": xds.Variable(("x",), np.array([9.0, 9.0]))})
  with pytest.raises(ValueError, match="conflicting"):
    xds.merge([a, b])
  # equal duplicates merge fine
  out = xds.merge([a, a])
  np.testing.assert_array_equal(out["t"].values, [1.0, 2.0])


def test_equals_compares_coords():
  a = xds.DataArray(
      np.array([1.0, 2.0]), dims=("t",), coords={"t": np.array([0, 1])}
  )
  b = xds.DataArray(
      np.array([1.0, 2.0]), dims=("t",), coords={"t": np.array([5, 6])}
  )
  assert not a.equals(b)
  assert a.equals(a.copy(data=a.values))


def test_unsupported_sel_method_raises():
  da = xds.DataArray(
      np.arange(3.0), dims=("x",), coords={"x": np.arange(3.0)}
  )
  with pytest.raises(NotImplementedError, match="method"):
    da.sel(x=1.5, method="ffill")


def test_nearest_tiebreak_and_datetime_tolerance():
  # equidistant labels resolve to the LARGER value (pandas semantics)
  da = xds.DataArray(
      np.arange(2.0), dims=("x",), coords={"x": np.array([0.0, 2.0])}
  )
  assert float(da.sel(x=1.0, method="nearest").values) == 1.0
  # datetime tolerance compares in the time domain, not float64
  t = np.array(
      ["2020-01-01T00", "2020-01-01T06"], dtype="datetime64[ns]"
  )
  da2 = xds.DataArray(np.arange(2.0), dims=("time",), coords={"time": t})
  v = da2.sel(
      time=np.datetime64("2020-01-01T05"), method="nearest",
      tolerance=np.timedelta64(2, "h"),
  )
  assert float(v.values) == 1.0
  with pytest.raises(KeyError):
    da2.sel(
        time=np.datetime64("2020-01-02T05"), method="nearest",
        tolerance=np.timedelta64(2, "h"),
    )


def test_quantile_mixed_dims_and_lazy_cast(tmp_path):
  ds = xds.Dataset(
      {
          "t2m": xds.Variable(("time", "lat"), np.random.randn(4, 3)),
          "z": xds.Variable(
              ("time", "level", "lat"), np.random.randn(4, 2, 3)
          ),
      },
      coords={
          "time": np.arange(4), "level": np.array([500, 850]),
          "lat": np.arange(3),
      },
  )
  qq = ds.quantile(0.5, dim=["time", "level"])
  assert qq["t2m"].dims == ("lat",) and qq["z"].dims == ("lat",)

  # astype on a lazy payload stays lazy (per-read cast)
  small = _small_ds()
  path = str(tmp_path / "lazycast.zarr")
  xds.to_zarr(small, path)
  lazy = xds.open_zarr(path, lazy=True)
  cast = lazy["2m_temperature"].astype(np.float64)
  from weatherbench2_tpu.xds import core as xcore

  assert isinstance(cast.data, xcore.LazyArrayBase)
  sub = cast.isel(time=slice(0, 1))
  vals = np.asarray(sub.values)
  assert vals.dtype == np.float64
  np.testing.assert_allclose(
      vals, np.asarray(small["2m_temperature"].values)[:1], rtol=1e-6
  )


def test_binop_keeps_dataset_level_coords():
  a = xds.Dataset(
      {"v": xds.Variable(("x",), np.ones(3))},
      coords={
          "x": np.arange(3),
          "z": xds.Variable(("y",), np.arange(2)),
      },
  )
  b = xds.Dataset(
      {"v": xds.Variable(("x",), np.ones(3))}, coords={"x": np.arange(3)}
  )
  assert "z" in (a + b).coords_dict()


def test_dataset_squeeze_validates_size():
  ds = _small_ds()
  with pytest.raises(ValueError, match="cannot squeeze"):
    ds.squeeze("time")
  one = ds.isel(time=[0])
  assert "time" not in one.squeeze("time").sizes


def test_quantile_dim_none_reduces_all():
  ds = _small_ds()
  got = ds.quantile(0.5)
  assert got["2m_temperature"].ndim == 0
  da = ds["2m_temperature"]
  np.testing.assert_allclose(
      float(da.quantile(0.5).values), np.quantile(da.values, 0.5)
  )


def test_astype_on_lazy_payload(tmp_path):
  ds = _small_ds()
  path = str(tmp_path / "lazy.zarr")
  xds.to_zarr(ds, path)
  lazy = xds.open_zarr(path, lazy=True)
  out = lazy["2m_temperature"].astype(np.float64)
  assert out.dtype == np.float64
  np.testing.assert_allclose(
      out.values, np.asarray(ds["2m_temperature"].values), rtol=1e-6
  )


def test_group_level_coordinates_attr(tmp_path):
  """xarray records dataset-level non-dim coords in the GROUP zattrs."""
  ds = _small_ds()
  path = str(tmp_path / "gc.zarr")
  xds.to_zarr(ds, path)
  # add a scalar-ish auxiliary array + declare it at group level only
  import numpy as np_

  zarr_dir = os.path.join(path, "height")
  os.makedirs(zarr_dir, exist_ok=True)
  io_zarr._write_json_key(
      path, "height/.zarray",
      {
          "shape": [], "chunks": [], "dtype": "<f8",
          "compressor": None, "fill_value": None, "filters": None,
          "order": "C", "zarr_format": 2,
      },
  )
  io_zarr._write_json_key(
      path, "height/.zattrs", {"_ARRAY_DIMENSIONS": []}
  )
  with open(os.path.join(zarr_dir, "0"), "wb") as f:
    f.write(np_.float64(2.0).tobytes())
  gattrs = io_zarr._read_json_key(path, ".zattrs") or {}
  gattrs["coordinates"] = "height"
  io_zarr._write_json_key(path, ".zattrs", gattrs)
  # remove stale consolidated metadata so the group attrs are re-read
  os.remove(os.path.join(path, ".zmetadata"))
  back = xds.open_zarr(path)
  assert "height" in back.coords_dict()
  assert "height" not in back.variables_dict()
  assert "coordinates" not in back.attrs


def test_streaming_transform_chunks_follow_stream_chunks(tmp_path):
  ds = _small_ds()
  out_path = str(tmp_path / "st.zarr")
  template = xds.Dataset(
      {
          "2m_temperature": xds.stub_variable(
              ds["2m_temperature"].dims, ds["2m_temperature"].sizes,
              np.float32,
          )
      },
      coords=dict(ds.coords_dict()),
  )
  xds.stream.streaming_transform(
      template, out_path, {"time": 2},
      lambda w: xds.Dataset(
          {"2m_temperature": ds["2m_temperature"].isel(w).variable},
          coords={},
      ),
  )
  zarray = json.load(
      open(os.path.join(out_path, "2m_temperature", ".zarray"))
  )
  # time chunk == stream block, not the whole axis
  assert zarray["chunks"][0] == 2
  back = xds.open_zarr(out_path)
  np.testing.assert_allclose(
      np.asarray(back["2m_temperature"].values),
      np.asarray(ds["2m_temperature"].values),
      rtol=1e-6,
  )
