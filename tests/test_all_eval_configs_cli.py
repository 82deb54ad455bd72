"""Smoke-run every predefined eval config through the evaluate CLI + mesh.

The reference predefines 12 eval configs (reference scripts/evaluate.py:
462-651); each must run end to end through this framework's streaming
engine from the same flags.
"""
import os
import sys

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import evaluate  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()

DETERMINISTIC_CONFIGS = [
    "deterministic",
    "deterministic_spatial",
    "deterministic_temporal",
    "deterministic_vs_analysis",
]
ENSEMBLE_CONFIGS = [
    "probabilistic",
    "ensemble_binary",
    "ensemble_forecast_vs_era_experimental_metrics",
    "probabilistic_spatial",
    "ensemble_binary_spatial",
    "probabilistic_spatial_histograms",
]
GAUSSIAN_CONFIGS = ["gaussian_probabilistic", "gaussian_binary"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
  tmp = tmp_path_factory.mktemp("all_cfg")
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-02-01",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  ens = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=4, lead_stop="2 days",
          **{**kwargs, "time_stop": "2020-01-12"},
      ),
      seed=1,
  )
  det = ens.isel(realization=0)
  gauss = det.copy()
  gauss["2m_temperature_std"] = xds.Variable(
      det["2m_temperature"].dims,
      np.abs(det["2m_temperature"].values) + 0.5,
  )

  # climatology with mean (no suffix), std, and quantiles
  clim = schema.mock_hourly_climatology_data(
      variables_3d=[], variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=30.0, hour_interval=24,
  )
  base = clim["2m_temperature"]
  rs = np.random.RandomState(7)
  clim["2m_temperature"] = xds.Variable(
      base.dims, rs.randn(*base.shape).astype(np.float32)
  )
  clim["2m_temperature_std"] = xds.Variable(
      base.dims, (0.5 + rs.rand(*base.shape)).astype(np.float32)
  )
  clim_full = xds.Dataset(
      {
          **clim.variables_dict(),
          "2m_temperature_quantile": xds.Variable(
              ("quantile",) + base.dims,
              np.stack(
                  [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
              ).astype(np.float32),
          ),
      },
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )

  paths = {}
  for name, ds in (
      ("truth", truth), ("ens", ens), ("det", det), ("gauss", gauss),
      ("clim", clim_full),
  ):
    paths[name] = str(tmp / f"{name}.zarr")
    xds.to_zarr(ds, paths[name])
  paths["tmp"] = tmp
  return paths


def _run(world, cfg, forecast_key, time_stop="2020-01-10", **extra):
  out_dir = str(world["tmp"] / f"out_{cfg}")
  with flagsaver.flagsaver(
      forecast_path=world[forecast_key],
      obs_path=world["truth"],
      climatology_path=world["clim"],
      output_dir=out_dir,
      variables=["2m_temperature"],
      levels=[],
      time_start="2020-01-01",
      time_stop=time_stop,
      eval_configs=cfg,
      regions=["global", "tropics"],
      use_mesh=True,
      input_chunks={"init_time": 4},
      **extra,
  ):
    evaluate.main([])
  nc = os.path.join(out_dir, f"{cfg}.nc")
  zarr = os.path.join(out_dir, f"{cfg}.zarr")
  assert os.path.exists(nc) or os.path.exists(zarr), cfg
  res = (
      xds.open_netcdf(nc) if os.path.exists(nc) else xds.open_zarr(zarr)
  )
  assert "2m_temperature" in res
  assert res["2m_temperature"].values.size > 0
  return res


@pytest.mark.parametrize("cfg", DETERMINISTIC_CONFIGS)
def test_deterministic_family(world, cfg):
  # vs_analysis scores against the forecast's own lead-0 field, so the
  # latest valid time must not outrun the available init times
  stop = "2020-01-08" if cfg == "deterministic_vs_analysis" else "2020-01-10"
  res = _run(world, cfg, "det", time_stop=stop)
  names = set(np.asarray(res.coords_dict()["metric"].data))
  assert "mse" in names
  if cfg == "deterministic_temporal":
    # per-time results keep the time axis
    assert "init_time" in res.sizes or "time" in res.sizes


@pytest.mark.parametrize("cfg", ENSEMBLE_CONFIGS)
def test_ensemble_family(world, cfg):
  extra = {"ensemble_dim": "realization"}
  if "binary" in cfg:
    extra["quantile_thresholds"] = ["0.25", "0.75"]
  res = _run(world, cfg, "ens", **extra)
  if cfg == "probabilistic_spatial_histograms":
    assert "bins" in res.sizes
  if "binary" in cfg:
    assert "quantile" in res.sizes


@pytest.mark.parametrize("cfg", GAUSSIAN_CONFIGS)
def test_gaussian_family(world, cfg):
  extra = {"aux_variables": ["2m_temperature_std"]}
  if cfg == "gaussian_binary":
    extra["quantile_thresholds"] = ["0.25", "0.75"]
  res = _run(world, cfg, "gauss", **extra)
  names = set(np.asarray(res.coords_dict()["metric"].data))
  assert names, cfg
