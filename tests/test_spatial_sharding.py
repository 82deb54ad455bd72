"""Spatial (latitude) sharding over a 2-D mesh matches unsharded results."""
import numpy as np
import pytest

from weatherbench2_tpu import config, metrics, schema, utils
from weatherbench2_tpu.parallel import make_mesh, streaming
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


def _env():
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      # 21 lats won't divide the spatial axis; use without-poles grid of 20?
      spatial_resolution_in_degrees=10.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days",
          ensemble_size=3,
          **{**kwargs, "time_stop": "2020-01-09"},
      ),
      seed=1,
  )
  fc = schema.apply_time_conventions(fc, by_init=True)
  dc = config.Data(
      selection=config.Selection(
          variables=["geopotential"], time_slice=slice(None)
      ),
      paths=config.Paths(forecast="", obs="", output_dir=""),
      by_init=True,
  )
  return truth, fc, dc


def test_2d_mesh_axis_sizes():
  mesh = make_mesh(axis_names=("batch", "spatial"), axis_sizes=[4, 2])
  assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
      "batch": 4, "spatial": 2,
  }


def test_spatial_sharding_indivisible_latitude_raises():
  """19 latitudes don't divide a spatial axis of 2: the engine must
  refuse loudly (silent replication would quietly waste half the mesh —
  exactly the 721-latitude trap at the official 0.25-degree grid; see
  docs/scaling.md 'Choosing a mesh')."""
  truth, fc, dc = _env()
  ec = config.Eval(
      metrics={
          "mse": metrics.MSE(),
          "crps": metrics.CRPS(),
      },
      regions={
          "global": SliceRegion(),
          "extra-tropics": ExtraTropicalRegion(),
      },
  )
  mesh = make_mesh(axis_names=("batch", "spatial"), axis_sizes=[4, 2])
  with pytest.raises(ValueError, match="does not divide the latitude"):
    streaming.evaluate_streaming(
        forecast=fc, truth=truth, climatology=None,
        eval_config=ec, data_config=dc,
        input_chunks={"init_time": 8},
        mesh=mesh,
    )


def test_spatial_sharding_divisible_latitude():
  """With a latitude count divisible by the spatial axis, data is actually
  sharded across it (and results still match)."""
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=[],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=10.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days",
          **{**kwargs, "time_stop": "2020-01-09"},
      ),
      seed=1,
  )
  # trim to 18 latitudes (divisible by 2)
  truth = truth.isel(latitude=slice(0, 18))
  fc = fc.isel(latitude=slice(0, 18))
  fc = schema.apply_time_conventions(fc, by_init=True)
  dc = config.Data(
      selection=config.Selection(
          variables=["geopotential"], time_slice=slice(None)
      ),
      paths=config.Paths(forecast="", obs="", output_dir=""),
      by_init=True,
  )
  ec = config.Eval(
      metrics={"mse": metrics.MSE(), "mae": metrics.MAE()},
      regions={"global": SliceRegion()},
  )
  res_plain = streaming.evaluate_streaming(
      forecast=fc, truth=truth, climatology=None,
      eval_config=ec, data_config=dc, input_chunks={"init_time": 8},
  )
  mesh = make_mesh(axis_names=("batch", "spatial"), axis_sizes=[4, 2])
  res_mesh = streaming.evaluate_streaming(
      forecast=fc, truth=truth, climatology=None,
      eval_config=ec, data_config=dc, input_chunks={"init_time": 8},
      mesh=mesh,
  )
  for k in res_plain.keys():
    np.testing.assert_allclose(
        np.asarray(res_plain[k].values),
        np.asarray(res_mesh[k].transpose(*res_plain[k].dims).values),
        rtol=1e-6,
    )
