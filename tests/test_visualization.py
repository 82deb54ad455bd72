"""Tests for the visualization layer (headless matplotlib)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from weatherbench2_tpu import config, visualization, xds


def _results_ds(seed=0, with_level=True):
  rs = np.random.RandomState(seed)
  lead = np.arange(1, 6).astype("timedelta64[D]").astype("timedelta64[ns]")
  coords = {
      "metric": np.array(["rmse", "acc"], dtype=object),
      "region": np.array(["global"], dtype=object),
      "lead_time": lead,
      "level": np.array([500, 850]),
  }
  dims = ("metric", "region", "lead_time", "level")
  shape = (2, 1, 5, 2)
  ds = xds.Dataset(
      {
          "geopotential": (dims, np.abs(rs.rand(*shape)) + 0.1),
          "2m_temperature": (
              ("metric", "region", "lead_time"),
              np.abs(rs.rand(2, 1, 5)) + 0.1,
          ),
      },
      coords=coords,
  )
  return ds


def test_load_results_inserts_perfect_t0(tmp_path):
  ds = _results_ds()
  p = str(tmp_path / "res.nc")
  xds.to_netcdf(ds, p)
  loaded = visualization.load_results({"model": p})["model"]
  lead = np.asarray(loaded.coords_dict()["lead_time"].data)
  assert lead[0] == np.timedelta64(0, "ns")
  rmse0 = loaded["geopotential"].sel(
      metric="rmse", lead_time=np.timedelta64(0, "ns")
  ).values
  np.testing.assert_allclose(rmse0, 0.0)
  acc0 = loaded["geopotential"].sel(
      metric="acc", lead_time=np.timedelta64(0, "ns")
  ).values
  np.testing.assert_allclose(acc0, 1.0)


def test_compute_relative_metrics():
  a = _results_ds(0)
  b = _results_ds(1)
  rel = visualization.compute_relative_metrics(
      {"base": a, "model": b}, "base", "rmse"
  )
  assert "model" in rel
  got = rel["model"]["2m_temperature"].sel(metric="rmse").values
  av = a["2m_temperature"].sel(metric="rmse").values
  bv = b["2m_temperature"].sel(metric="rmse").values
  np.testing.assert_allclose(got, (bv - av) / av * 100, rtol=1e-10)


def test_plot_timeseries_and_panels(tmp_path):
  results = {"a": _results_ds(0), "b": _results_ds(1)}
  ax = visualization.plot_timeseries(
      results, metric="rmse", variable="geopotential", level=500,
      region="global",
  )
  assert len(ax.lines) == 2

  viz = config.Viz(
      results={},  # bypassed: pass datasets directly
      save_kwargs={"fname": str(tmp_path / "panels.png")},
  )
  viz.results = results
  panels = [
      config.Panel(metric="rmse", variable="geopotential", level=500,
                   region="global"),
      config.Panel(metric="acc", variable="2m_temperature",
                   region="global"),
  ]
  fig = visualization.visualize_timeseries(viz, panels)
  assert (tmp_path / "panels.png").exists()


def test_visualize_scorecard(tmp_path):
  viz = config.Viz(
      results={"base": _results_ds(0), "model": _results_ds(1)},
      save_kwargs={"fname": str(tmp_path / "scorecard.png")},
  )
  fig = visualization.visualize_scorecard(
      viz,
      baseline="base",
      forecast="model",
      metric="rmse",
      variables=["geopotential", "2m_temperature"],
      region="global",
  )
  assert (tmp_path / "scorecard.png").exists()
