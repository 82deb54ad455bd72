"""Lazy zarr-backed variables: no full-dataset reads in the streaming path."""
import numpy as np
import pytest

from weatherbench2_tpu import schema, utils, xds
from weatherbench2_tpu.xds.core import LazyArrayBase


def _store(tmp_path):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=["geopotential"],
          variables_2d=[],
          time_start="2020-01-01",
          time_stop="2020-02-01",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  path = str(tmp_path / "ds.zarr")
  xds.to_zarr(ds, path, chunks={"time": 4})
  return path, ds


def test_lazy_open_defers_reads(tmp_path):
  path, ds = _store(tmp_path)
  lazy = xds.open_zarr(path, lazy=True)
  assert isinstance(
      lazy.variables_dict()["geopotential"].data, LazyArrayBase
  )
  # coords are eager
  assert isinstance(
      lazy.coords_dict()["time"].data, np.ndarray
  )
  # slicing stays lazy
  sub = lazy.isel(time=slice(4, 8))
  assert isinstance(
      sub.variables_dict()["geopotential"].data, LazyArrayBase
  )
  # materialization matches the eager read
  np.testing.assert_allclose(
      np.asarray(sub["geopotential"].values),
      ds["geopotential"].values[4:8],
  )


def test_lazy_label_selection(tmp_path):
  path, ds = _store(tmp_path)
  lazy = xds.open_zarr(path, lazy=True)
  sub = lazy.sel(
      time=slice("2020-01-05", "2020-01-10"), level=[500, 850]
  )
  v = sub.variables_dict()["geopotential"].data
  assert isinstance(v, LazyArrayBase) or v.shape[0] == 6
  got = np.asarray(sub["geopotential"].values)
  want = ds.sel(
      time=slice("2020-01-05", "2020-01-10"), level=[500, 850]
  )["geopotential"].values
  np.testing.assert_allclose(got, want)


def test_lazy_vectorized_gather(tmp_path):
  path, ds = _store(tmp_path)
  lazy = xds.open_zarr(path, lazy=True)
  times = ds.coords_dict()["time"].data
  idx = xds.DataArray(
      times[[3, 8, 2, 8]].reshape(2, 2), dims=("a", "b")
  )
  sub = lazy.sel(time=idx)
  want = ds.sel(time=idx)
  np.testing.assert_allclose(
      sub["geopotential"].values, want["geopotential"].values
  )


def test_lazy_reversed_latitude(tmp_path):
  path, ds = _store(tmp_path)
  lazy = xds.open_zarr(path, lazy=True)
  n = lazy.sizes["latitude"]
  flipped = lazy.isel(latitude=np.arange(n)[::-1])
  got = np.asarray(flipped["geopotential"].values)
  np.testing.assert_allclose(
      got, ds["geopotential"].values[..., ::-1]
  )
