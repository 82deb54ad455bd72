"""A/B the pointwise-fused tier vs the generic per-metric region loop.

Workload: the official ensemble_binary shape — Brier + debiased Brier +
RPS at 2 climatological quantile thresholds, the 13 official predefined
regions, 50-member ensemble (official ENS size,
/root/reference/docs/source/official-evaluation.md:887), one month of
12-hourly inits at 64x32.  This is the largest metric x region x
threshold product in the official suite: 13 regions x (2+2+2) threshold
rows per variable per chunk.

Runs evaluate_with_mesh twice per repetition — WB2_FUSED=1 (pointwise
tier: ONE fused_region_sums call per chunk) vs WB2_FUSED=0 (generic
loop: one weighted reduction per metric x region x threshold) —
interleaved A/B to cancel tunnel drift.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_pointwise.py [reps]
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/wb2_jax_compile_cache"
)

CACHE = os.environ.get("WB2_PW_CACHE", "/tmp/wb2_pointwise_bench")


def _gen():
  from weatherbench2_tpu import schema, utils, xds

  os.makedirs(CACHE, exist_ok=True)
  tp = os.path.join(CACHE, "truth.zarr")
  fp = os.path.join(CACHE, "forecast.zarr")
  cp = os.path.join(CACHE, "qclim.zarr")
  if all(
      os.path.exists(os.path.join(p, ".zmetadata")) for p in (tp, fp, cp)
  ):
    return tp, fp, cp
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=5.625,
  )
  truth = utils.random_like(
      schema.mock_truth_data(
          time_start="2020-01-01", time_stop="2020-02-15",
          time_resolution="6 hours", **kwargs,
      ),
      seed=0,
  )
  fc = utils.random_like(
      schema.mock_forecast_data(
          time_start="2020-01-01", time_stop="2020-02-01",
          time_resolution="12 hours", lead_start="0 days",
          lead_stop="10 days", lead_resolution="12 hours",
          ensemble_size=50, **kwargs,
      ),
      seed=1,
  )
  clim = schema.mock_hourly_climatology_data(hour_interval=6, **kwargs)
  base = clim["2m_temperature"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  ).astype(np.float32)
  qclim = xds.Dataset(
      {
          "2m_temperature_quantile": xds.Variable(
              ("quantile",) + base.dims, qvals
          )
      },
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  xds.to_zarr(truth, tp, chunks={"time": 64})
  xds.to_zarr(fc, fp, chunks={"time": 8})
  xds.to_zarr(qclim, cp)
  return tp, fp, cp


def _run(paths, out):
  # fresh import AFTER WB2_FUSED is set (plans read it at build time)
  import sys as _sys

  sys.path.insert(0, "/root/repo")
  from weatherbench2_tpu import config, evaluation, metrics, thresholds, xds

  sys.path.pop(0)
  from scripts.evaluate import predefined_regions_dict

  tp, fp, cp = paths
  clim = xds.open_zarr(cp)
  thr = [
      thresholds.QuantileThreshold(climatology=clim, quantile=q)
      for q in (0.25, 0.75)
  ]
  ec = {
      "ensemble_binary": config.Eval(
          metrics={
              "brier": metrics.EnsembleBrierScore(thresholds=thr),
              "debiased_brier": metrics.DebiasedEnsembleBrierScore(
                  thresholds=thr
              ),
              "rps": metrics.EnsembleRPS(thresholds=thr),
          },
          regions=predefined_regions_dict(),
      )
  }
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-31"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp,
          output_dir=os.path.join(CACHE, out),
      ),
      by_init=True,
  )
  start = time.perf_counter()
  evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 16})
  return time.perf_counter() - start


def main(reps):
  from weatherbench2_tpu import xds

  paths = _gen()
  # three formulations of the same chunk program:
  #   pallas : pointwise tier -> fused_region_sums Pallas kernel
  #   einsum : pointwise tier -> XLA matmul epilogue (no custom-call
  #            barrier, so XLA may fuse field computation into the matmul)
  #   generic: per metric x region x threshold weighted reductions
  modes = {
      "pallas": {"WB2_FUSED": "1", "WB2_USE_PALLAS": "1"},
      "einsum": {"WB2_FUSED": "1", "WB2_USE_PALLAS": "0"},
      "generic": {"WB2_FUSED": "0", "WB2_USE_PALLAS": "0"},
  }
  timings = {k: [] for k in modes}
  names = list(modes)
  for rep in range(reps):
    # rotate execution order: the tunneled backend memoizes repeated
    # transfers/executions, which otherwise favors later modes in a rep
    order = names[rep % len(names):] + names[:rep % len(names)]
    for mode in order:
      os.environ.update(modes[mode])
      timings[mode].append(_run(paths, f"out_{mode}_{rep}"))
      print(
          f"rep {rep} {mode}: {timings[mode][-1]:.2f}s", file=sys.stderr,
          flush=True,
      )
    # on-chip parity: all formulations must agree
    ref = xds.open_netcdf(
        os.path.join(CACHE, f"out_generic_{rep}", "ensemble_binary.nc")
    )
    for mode in ("pallas", "einsum"):
      got = xds.open_netcdf(
          os.path.join(CACHE, f"out_{mode}_{rep}", "ensemble_binary.nc")
      )
      for k in ref.keys():
        np.testing.assert_allclose(
            got[k].values, ref[k].transpose(*got[k].dims).values,
            rtol=2e-4, atol=1e-6,
        )
    print(f"rep {rep}: all modes agree on chip", file=sys.stderr, flush=True)
  print(json.dumps({
      "workload": "ensemble_binary_13regions_50mem_64x32_1mo",
      **{f"{k}_s": [round(x, 2) for x in v] for k, v in timings.items()},
      **{f"{k}_best": round(min(v), 2) for k, v in timings.items()},
  }), flush=True)


def _gen_gaussian_240():
  """Gaussian (mean+std) forecast, truth, and quantile clim at 240x121."""
  from weatherbench2_tpu import schema, utils, xds

  os.makedirs(CACHE, exist_ok=True)
  tp = os.path.join(CACHE, "truth_g240.zarr")
  fp = os.path.join(CACHE, "forecast_g240.zarr")
  cp = os.path.join(CACHE, "qclim_g240.zarr")
  if all(
      os.path.exists(os.path.join(p, ".zmetadata")) for p in (tp, fp, cp)
  ):
    return tp, fp, cp
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=1.5,
  )
  truth = utils.random_like(
      schema.mock_truth_data(
          time_start="2020-01-01", time_stop="2020-02-15",
          time_resolution="6 hours", **kwargs,
      ),
      seed=0,
  )
  fc = utils.random_like(
      schema.mock_forecast_data(
          time_start="2020-01-01", time_stop="2020-02-01",
          time_resolution="12 hours", lead_start="0 days",
          lead_stop="10 days", lead_resolution="12 hours", **kwargs,
      ),
      seed=1,
  )
  fc["2m_temperature_std"] = abs(fc["2m_temperature"]) * 0.3 + 0.5
  clim = schema.mock_hourly_climatology_data(hour_interval=6, **kwargs)
  base = clim["2m_temperature"]
  qvals = np.stack(
      [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
  ).astype(np.float32)
  qclim = xds.Dataset(
      {
          "2m_temperature_quantile": xds.Variable(
              ("quantile",) + base.dims, qvals
          )
      },
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  xds.to_zarr(truth, tp, chunks={"time": 64})
  xds.to_zarr(fc, fp, chunks={"time": 8})
  xds.to_zarr(qclim, cp)
  return tp, fp, cp


def _run_gaussian(paths, out):
  from weatherbench2_tpu import config, evaluation, metrics, thresholds, xds
  from scripts.evaluate import predefined_regions_dict

  tp, fp, cp = paths
  clim = xds.open_zarr(cp)
  thr = [
      thresholds.QuantileThreshold(climatology=clim, quantile=q)
      for q in (0.25, 0.75)
  ]
  ec = {
      "gaussian_probabilistic": config.Eval(
          metrics={
              "crps": metrics.GaussianCRPS(),
              "ensemble_variance": metrics.GaussianVariance(),
          },
          regions=predefined_regions_dict(),
      ),
      "gaussian_binary": config.Eval(
          metrics={
              "brier_score": metrics.GaussianBrierScore(thresholds=thr),
              "ignorance_score": metrics.GaussianIgnoranceScore(
                  thresholds=thr
              ),
          },
          regions=predefined_regions_dict(),
      ),
  }
  dc = config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          aux_variables=["2m_temperature_std"],
          time_slice=slice("2020-01-01", "2020-01-31"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp,
          output_dir=os.path.join(CACHE, out),
      ),
      by_init=True,
  )
  start = time.perf_counter()
  evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 16})
  return time.perf_counter() - start


def main_gaussian_240(reps):
  """A/B the gaussian_* configs (fused pointwise incl. the round-3
  inf-safe ignorance rows vs the generic loop) at the official 1.5-degree
  geometry, 13 regions, one month."""
  from weatherbench2_tpu import xds

  paths = _gen_gaussian_240()
  modes = {
      "pallas": {"WB2_FUSED": "1", "WB2_USE_PALLAS": "1"},
      "generic": {"WB2_FUSED": "0", "WB2_USE_PALLAS": "0"},
  }
  timings = {k: [] for k in modes}
  names = list(modes)
  for rep in range(reps):
    order = names[rep % len(names):] + names[:rep % len(names)]
    for mode in order:
      os.environ.update(modes[mode])
      timings[mode].append(_run_gaussian(paths, f"outg_{mode}_{rep}"))
      print(
          f"rep {rep} {mode}: {timings[mode][-1]:.2f}s", file=sys.stderr,
          flush=True,
      )
    for cfg in ("gaussian_probabilistic", "gaussian_binary"):
      ref = xds.open_netcdf(
          os.path.join(CACHE, f"outg_generic_{rep}", f"{cfg}.nc")
      )
      got = xds.open_netcdf(
          os.path.join(CACHE, f"outg_pallas_{rep}", f"{cfg}.nc")
      )
      for k in ref.keys():
        np.testing.assert_allclose(
            got[k].values, ref[k].transpose(*got[k].dims).values,
            rtol=2e-4, atol=1e-6,
        )
    print(f"rep {rep}: modes agree on chip", file=sys.stderr, flush=True)
  print(json.dumps({
      "workload": "gaussian_13regions_240x121_1mo",
      **{f"{k}_s": [round(x, 2) for x in v] for k, v in timings.items()},
      **{f"{k}_best": round(min(v), 2) for k, v in timings.items()},
  }), flush=True)


def main_spatial_hist_240(reps):
  """Measure the all-generic configs (RankHistogram + the Spatial*
  ensemble suite) at 240x121, 50 members, one month.

  These metrics deliberately stay OUTSIDE the fused tiers: spatial
  variants emit per-cell maps (there is no region reduction to fuse —
  the per-cell field IS the result, and XLA already fuses its
  elementwise math), and RankHistogram is a per-cell scatter-add into
  bins (a dense one-hot through the region matmul would be 50x the
  chunk bytes; the jit program's bincount form is one pass).  The member
  sort feeding rank/CRPS-family fields is shared across metrics by XLA
  CSE inside the single chunk program.
  """
  from weatherbench2_tpu import config, evaluation, metrics, xds

  tp = os.path.join(CACHE, "truth.zarr")
  fp = os.path.join(CACHE, "forecast.zarr")
  paths_240 = (
      "/tmp/wb2_official/truth_prob_240.zarr",
      "/tmp/wb2_official/forecast_prob_240.zarr",
  )
  if all(
      os.path.exists(os.path.join(p, ".zmetadata")) for p in paths_240
  ):
    tp, fp = paths_240  # reuse the official-geometry cached stores
  ec = {
      "probabilistic_spatial": config.Eval(
          metrics={
              "crps": metrics.SpatialCRPS(),
              "crps_spread": metrics.SpatialCRPSSpread(),
              "crps_skill": metrics.SpatialCRPSSkill(),
              "ensemble_variance": metrics.SpatialEnsembleVariance(),
          },
          output_format="zarr",
      ),
      "probabilistic_spatial_histograms": config.Eval(
          metrics={"rank_histogram": metrics.RankHistogram()},
          output_format="zarr",
      ),
  }
  timings = []
  for rep in range(reps):
    dc = config.Data(
        selection=config.Selection(
            variables=["2m_temperature"],
            time_slice=slice("2020-01-01", "2020-01-31"),
        ),
        paths=config.Paths(
            forecast=fp, obs=tp,
            output_dir=os.path.join(CACHE, f"outsp_{rep}"),
        ),
        by_init=True,
    )
    start = time.perf_counter()
    evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 8})
    timings.append(time.perf_counter() - start)
    print(f"rep {rep}: {timings[-1]:.2f}s", file=sys.stderr, flush=True)
  res = xds.open_zarr(os.path.join(
      CACHE, "outsp_0", "probabilistic_spatial_histograms.zarr"
  ))
  hist = np.asarray(res["2m_temperature"].data, dtype=np.float64)
  assert np.isfinite(hist).all()
  print(json.dumps({
      "workload": "spatial_hist_50mem_240x121_1mo",
      "seconds": [round(x, 2) for x in timings],
      "best": round(min(timings), 2),
  }), flush=True)


if __name__ == "__main__":
  argv = [a for a in sys.argv[1:]]
  workload = "binary"
  if argv and not argv[0].isdigit():
    workload = argv.pop(0)
  reps = int(argv[0]) if argv else 3
  {
      "binary": main,
      "gaussian_240": main_gaussian_240,
      "spatial_hist_240": main_spatial_hist_240,
  }[workload](reps)
