"""Shared fixture builder for the golden regression tests.

Inputs are pure functions of fixed seeds (np.random.RandomState is
stable across numpy versions), so the test can rebuild them exactly and
compare fresh results against the committed NetCDFs.
"""
import tempfile

import numpy as np

from weatherbench2_tpu import (
    config, evaluation, metrics, schema, thresholds, utils, xds,
)
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


def build_inputs(tmp_dir: str):
  """Fixed-seed truth/forecast/climatology zarr stores."""
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-02-01",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=101)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="3 days",
          **{**kwargs, "time_stop": "2020-01-20"},
      ),
      seed=202,
  )
  ens = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="3 days",
          ensemble_size=5,
          **{**kwargs, "time_stop": "2020-01-20"},
      ),
      seed=303,
  )
  clim = utils.random_like(
      schema.mock_hourly_climatology_data(
          variables_3d=["geopotential"],
          variables_2d=["2m_temperature"],
          spatial_resolution_in_degrees=30.0,
          hour_interval=6,
      ),
      seed=404,
  )
  # gaussian forecast: deterministic forecast + per-variable _std fields
  gauss = fc.copy(data={k: v.data for k, v in fc.variables_dict().items()})
  for var in list(fc.keys()):
    gauss[f"{var}_std"] = abs(fc[var]) + 0.5

  # threshold climatology: per-variable fixed quantile surfaces
  qvars = {}
  for var in list(clim.keys()):
    base = clim[var]
    qvals = np.stack(
        [np.full(base.shape, -0.6), np.full(base.shape, 0.6)]
    ).astype(np.float32)
    qvars[f"{var}_quantile"] = xds.Variable(
        ("quantile",) + base.dims, qvals
    )
  qclim = xds.Dataset(
      qvars,
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )

  paths = {}
  for name, ds in [("truth", truth), ("forecast", fc),
                   ("ensemble", ens), ("climatology", clim),
                   ("gaussian", gauss), ("qclim", qclim)]:
    path = f"{tmp_dir}/{name}.zarr"
    xds.to_zarr(ds, path)
    paths[name] = path
  return paths


def eval_configs(clim, qclim=None):
  regions = {
      "global": SliceRegion(),
      "tropics": SliceRegion(lat_slice=slice(-20, 20)),
      "extra-tropics": ExtraTropicalRegion(),
  }
  thr = (
      [thresholds.QuantileThreshold(climatology=qclim, quantile=q)
       for q in (0.25, 0.75)]
      if qclim is not None
      else []
  )
  return {
      "deterministic": config.Eval(
          metrics={
              "mse": metrics.MSE(),
              "rmse": metrics.RMSESqrtBeforeTimeAvg(),
              "acc": metrics.ACC(climatology=clim),
              "bias": metrics.Bias(),
              "mae": metrics.MAE(),
          },
          regions=regions,
      ),
      "deterministic_temporal": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions=regions,
          temporal_mean=False,
      ),
      "probabilistic": config.Eval(
          metrics={
              "crps": metrics.CRPS(),
              "crps_spread": metrics.CRPSSpread(),
              "crps_skill": metrics.CRPSSkill(),
              "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
              "debiased_ensemble_mean_mse": (
                  metrics.DebiasedEnsembleMeanMSE()
              ),
              "ensemble_variance": metrics.EnsembleVariance(),
          },
          regions=regions,
      ),
      "ensemble_binary": config.Eval(
          metrics={
              "brier": metrics.EnsembleBrierScore(thresholds=thr),
              "debiased_brier": metrics.DebiasedEnsembleBrierScore(
                  thresholds=thr
              ),
              "rps": metrics.EnsembleRPS(thresholds=thr),
          },
          regions=regions,
      ),
      # the two gaussian configs mirror the registry split
      # (scripts/evaluate.py gaussian_probabilistic / gaussian_binary;
      # reference scripts/evaluate.py:462-651) so golden names map 1:1
      # to config names; the binary golden carries GaussianRPS as an
      # extra metric to keep its numerics pinned too
      "gaussian_probabilistic": config.Eval(
          metrics={
              "gaussian_crps": metrics.GaussianCRPS(),
              "gaussian_variance": metrics.GaussianVariance(),
          },
          regions=regions,
      ),
      "gaussian_binary": config.Eval(
          metrics={
              "gaussian_brier": metrics.GaussianBrierScore(thresholds=thr),
              "gaussian_ignorance": metrics.GaussianIgnoranceScore(
                  thresholds=thr
              ),
              "gaussian_rps": metrics.GaussianRPS(thresholds=thr),
          },
          regions=regions,
      ),
      # ---- round-4 additions: the remaining reference config shapes
      # (reference scripts/evaluate.py:462-651) ------------------------
      "deterministic_spatial": config.Eval(
          metrics={
              "mse": metrics.SpatialMSE(),
              "bias": metrics.SpatialBias(),
              "mae": metrics.SpatialMAE(),
          },
      ),
      "deterministic_vs_analysis": config.Eval(
          metrics={
              "mse": metrics.MSE(),
              "bias": metrics.Bias(),
              "mae": metrics.MAE(),
          },
          against_analysis=True,
          regions=regions,
      ),
      "probabilistic_spatial": config.Eval(
          metrics={
              "crps": metrics.SpatialCRPS(),
              "crps_spread": metrics.SpatialCRPSSpread(),
              "crps_skill": metrics.SpatialCRPSSkill(),
              "ensemble_mean_mse": metrics.SpatialEnsembleMeanMSE(),
              "debiased_ensemble_mean_mse": (
                  metrics.DebiasedSpatialEnsembleMeanMSE()
              ),
              "ensemble_variance": metrics.SpatialEnsembleVariance(),
          },
      ),
      "ensemble_binary_spatial": config.Eval(
          metrics={
              "brier_score": metrics.SpatialEnsembleBrierScore(
                  thresholds=thr
              ),
              "debiased_brier_score": (
                  metrics.SpatialDebiasedEnsembleBrierScore(thresholds=thr)
              ),
              "ignorance_score": metrics.SpatialEnsembleIgnoranceScore(
                  thresholds=thr
              ),
          },
      ),
      "probabilistic_spatial_histograms": config.Eval(
          metrics={
              "rank_histogram": metrics.RankHistogram(seed=771),
          },
      ),
      "ensemble_forecast_vs_era_experimental_metrics": config.Eval(
          metrics={
              "energy_score": metrics.EnergyScore(),
              "energy_score_spread": metrics.EnergyScoreSpread(),
              "energy_score_skill": metrics.EnergyScoreSkill(),
              "ensemble_mean_rmse_sqrt_before_time_avg": (
                  metrics.EnsembleMeanRMSESqrtBeforeTimeAvg()
              ),
              "ensemble_stddev_sqrt_before_time_avg": (
                  metrics.EnsembleStddevSqrtBeforeTimeAvg()
              ),
          },
      ),
  }


def compute_results() -> dict:
  """{config_name: results Dataset} via evaluate_in_memory."""
  results = {}
  with tempfile.TemporaryDirectory() as tmp:
    paths = build_inputs(tmp)
    clim = xds.open_zarr(paths["climatology"])
    qclim = xds.open_zarr(paths["qclim"])
    configs = eval_configs(clim, qclim)
    for name, cfg in configs.items():
      fc_path = {
          "probabilistic": paths["ensemble"],
          "ensemble_binary": paths["ensemble"],
          "gaussian_probabilistic": paths["gaussian"],
          "gaussian_binary": paths["gaussian"],
          "probabilistic_spatial": paths["ensemble"],
          "ensemble_binary_spatial": paths["ensemble"],
          "probabilistic_spatial_histograms": paths["ensemble"],
          "ensemble_forecast_vs_era_experimental_metrics": (
              paths["ensemble"]
          ),
      }.get(name, paths["forecast"])
      aux = (
          ["geopotential_std", "2m_temperature_std"]
          if name.startswith("gaussian")
          else []
      )
      dc = config.Data(
          selection=config.Selection(
              variables=["geopotential", "2m_temperature"],
              aux_variables=aux,
              levels=[500, 850],
              time_slice=slice("2020-01-01", "2020-01-15"),
          ),
          paths=config.Paths(
              forecast=fc_path,
              obs=paths["truth"],
              climatology=paths["climatology"],
              output_dir=f"{tmp}/out_{name}",
          ),
          by_init=True,
      )
      evaluation.evaluate_in_memory(dc, {name: cfg})
      results[name] = xds.open_netcdf(f"{tmp}/out_{name}/{name}.nc")
  return results
