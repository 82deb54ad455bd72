"""netCDF4/HDF5 IO round trips (the reference emits netCDF4 via xarray)."""
import numpy as np
import pytest

from weatherbench2_tpu import xds


def _sample_ds():
  times = (np.datetime64("2020-01-01", "ns")
           + np.arange(4) * np.timedelta64(6, "h"))
  leads = np.arange(3) * np.timedelta64(1, "D")
  return xds.Dataset(
      {
          "temperature": xds.Variable(
              ("time", "lead_time", "latitude"),
              np.arange(24, dtype=np.float32).reshape(4, 3, 2),
              {"units": "K"},
          ),
          "level": xds.Variable(  # data var named like a coord
              ("time",), np.arange(4.0)
          ),
      },
      coords={
          "time": times,
          "lead_time": leads,
          "latitude": np.array([-45.0, 45.0]),
          "valid_time": xds.Variable(
              ("time", "lead_time"), times[:, None] + leads[None, :]
          ),
          "metric": xds.Variable((), np.asarray("mse", dtype=object)),
      },
      attrs={"title": "sample"},
  )


def test_netcdf4_roundtrip(tmp_path):
  ds = _sample_ds()
  path = str(tmp_path / "x.nc")
  xds.to_netcdf(ds, path)
  with open(path, "rb") as f:
    assert f.read(8) == b"\x89HDF\r\n\x1a\n"  # actually HDF5 on disk
  back = xds.open_netcdf(path)
  assert sorted(back.keys()) == ["level", "temperature"]
  assert "valid_time" in back.coords_dict()
  np.testing.assert_allclose(
      back["temperature"].values, ds["temperature"].values
  )
  assert back["temperature"].attrs["units"] == "K"
  np.testing.assert_array_equal(
      np.asarray(back.coords_dict()["time"].data),
      np.asarray(ds.coords_dict()["time"].data),
  )
  np.testing.assert_array_equal(
      np.asarray(back.coords_dict()["lead_time"].data), leads_ns(ds)
  )
  np.testing.assert_array_equal(
      np.asarray(back.coords_dict()["valid_time"].data),
      np.asarray(ds.coords_dict()["valid_time"].data),
  )
  assert str(np.asarray(back.coords_dict()["metric"].data)) == "mse"
  assert back.attrs["title"] == "sample"


def leads_ns(ds):
  return np.asarray(ds.coords_dict()["lead_time"].data).astype(
      "timedelta64[ns]"
  )


def test_netcdf3_explicit_format_still_works(tmp_path):
  ds = _sample_ds().drop_vars(["level"])
  path = str(tmp_path / "classic.nc")
  xds.to_netcdf(ds, path, format="NETCDF3")
  with open(path, "rb") as f:
    assert f.read(3) == b"CDF"
  back = xds.open_netcdf(path)
  np.testing.assert_allclose(
      back["temperature"].values, ds["temperature"].values
  )


def test_bytes_roundtrip_unchanged():
  ds = _sample_ds().drop_vars(["level"])
  blob = xds.to_netcdf(ds)
  assert isinstance(blob, bytes)
  back = xds.open_netcdf(blob)
  np.testing.assert_allclose(
      back["temperature"].values, ds["temperature"].values
  )


def test_h5py_reads_engine_output(tmp_path):
  """The evaluation engine's saved results are standard netCDF4/HDF5."""
  import h5py

  from weatherbench2_tpu import config, evaluation, metrics, schema, utils
  from weatherbench2_tpu.regions import SliceRegion

  kwargs = dict(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2020-01-01", time_stop="2020-01-15",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-10"}
      ),
      seed=1,
  )
  tp, fp = str(tmp_path / "t.zarr"), str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(fc, fp)
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / "out")
      ),
      by_init=True,
  )
  ec = {"det": config.Eval(metrics={"mse": metrics.MSE()},
                           regions={"global": SliceRegion()})}
  evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 4})
  path = str(tmp_path / "out" / "det.nc")
  # independent reader: raw h5py sees dimension-scale structure
  with h5py.File(path, "r") as f:
    dset = f["2m_temperature"]
    dim_names = [
        dset.dims[i].items()[0][1].name.split("/")[-1]
        for i in range(dset.ndim)
    ]
    assert "lead_time" in dim_names
