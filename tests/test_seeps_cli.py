"""SEEPS end-to-end: climatology thresholds pipeline -> evaluate CLI."""
import os
import sys

import numpy as np
import pytest
from absl import flags
from absl.testing import flagsaver

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import compute_climatology  # noqa: E402
import evaluate  # noqa: E402

from weatherbench2_tpu import schema, utils, xds  # noqa: E402

FLAGS = flags.FLAGS
FLAGS.mark_as_parsed()


def test_seeps_full_pipeline(tmp_path):
  """compute_climatology --statistics=seeps feeds evaluate --compute_seeps."""
  rs = np.random.RandomState(0)

  def precip_like(ds, dry_frac):
    out = {}
    for k, v in ds.variables_dict().items():
      wet = rs.exponential(2e-3, size=v.shape)
      mask = rs.rand(*v.shape) < dry_frac
      out[k] = np.where(mask, 0.0, wet).astype(np.float32)
    return ds.copy(data=out)

  truth = precip_like(
      schema.mock_truth_data(
          variables_3d=[],
          variables_2d=["total_precipitation_24hr"],
          time_start="2018-01-01",
          time_stop="2020-02-15",
          time_resolution="1 day",
          spatial_resolution_in_degrees=30.0,
      ),
      dry_frac=0.5,
  )
  forecast = precip_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["total_precipitation_24hr"],
          time_start="2020-01-01",
          time_stop="2020-01-20",
          time_resolution="1 day",
          lead_stop="3 days",
          spatial_resolution_in_degrees=30.0,
      ),
      dry_frac=0.5,
  )
  truth_path = str(tmp_path / "truth.zarr")
  forecast_path = str(tmp_path / "forecast.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(forecast, forecast_path)

  # 1. SEEPS climatology (hourly so evaluate's gather finds hour dim)
  clim_path = str(tmp_path / "clim.zarr")
  with flagsaver.flagsaver(
      input_path=truth_path,
      output_path=clim_path,
      frequency="hourly",
      hour_interval=24,
      window_size=61,
      start_year=2018,
      end_year=2019,
      statistics=["seeps", "mean"],
      seeps_dry_threshold_mm="{'total_precipitation_24hr':0.25}",
  ):
    compute_climatology.main([])
  clim = xds.open_zarr(clim_path)
  assert "total_precipitation_24hr_seeps_threshold" in clim
  assert "total_precipitation_24hr_seeps_dry_fraction" in clim

  # 2. evaluate with --compute_seeps
  out_dir = str(tmp_path / "out")
  with flagsaver.flagsaver(
      forecast_path=forecast_path,
      obs_path=truth_path,
      climatology_path=clim_path,
      output_dir=out_dir,
      variables=["total_precipitation_24hr"],
      levels=[],
      time_start="2020-01-01",
      time_stop="2020-01-15",
      eval_configs="deterministic",
      regions=["global"],
      compute_seeps=True,
      use_mesh=True,
      input_chunks={"init_time": 5},
  ):
    evaluate.main([])
  res = xds.open_netcdf(os.path.join(out_dir, "deterministic.nc"))
  metric_names = set(np.asarray(res.coords_dict()["metric"].data))
  assert "seeps_24hr" in metric_names
  seeps = res["total_precipitation_24hr"].sel(metric="seeps_24hr").values
  assert np.isfinite(seeps).all()
  # random precip forecast vs truth: SEEPS should be O(1), not degenerate
  assert (seeps > 0.1).all() and (seeps < 3.0).all()
