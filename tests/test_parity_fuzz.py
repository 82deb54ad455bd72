"""Randomized in-memory ≡ streaming parity, including NaN/skipna paths."""
import os

import numpy as np
import pytest

from weatherbench2_tpu import (
    config,
    evaluation,
    metrics,
    schema,
    test_utils,
    utils,
    xds,
)
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion


def _setup(tmp_path, seed, nan_frac=0.0, ensemble=None):
  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-25",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=seed)
  forecast = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=ensemble,
          lead_stop="3 days",
          **{**kwargs, "time_stop": "2020-01-12"},
      ),
      seed=seed + 1,
  )
  if nan_frac:
    truth = test_utils.insert_nan(truth, frac_nan=nan_frac, seed=seed)
    forecast = test_utils.insert_nan(
        forecast, frac_nan=nan_frac, seed=seed + 1
    )
  tp = str(tmp_path / f"t{seed}.zarr")
  fp = str(tmp_path / f"f{seed}.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(forecast, fp)
  return tp, fp


def _run_both(tmp_path, tp, fp, eval_config, by_init, skipna, chunk, tag,
              rtol=1e-5):
  dc_mem = config.Data(
      selection=config.Selection(
          variables=["geopotential", "2m_temperature"],
          levels=[500, 850],
          time_slice=slice("2020-01-01", "2020-01-10"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / f"m{tag}")
      ),
      by_init=by_init,
  )
  evaluation.evaluate_in_memory(dc_mem, {"cfg": eval_config},
                                skipna=skipna)
  a = xds.open_netcdf(os.path.join(dc_mem.paths.output_dir, "cfg.nc"))

  dc_str = config.Data(
      selection=dc_mem.selection,
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / f"s{tag}")
      ),
      by_init=by_init,
  )
  chunk_dim = "init_time" if by_init else "time"
  evaluation.evaluate_with_mesh(
      dc_str, {"cfg": eval_config}, input_chunks={chunk_dim: chunk},
      skipna=skipna,
  )
  b = xds.open_netcdf(os.path.join(dc_str.paths.output_dir, "cfg.nc"))
  for k in a.keys():
    np.testing.assert_allclose(
        a[k].values,
        b[k].transpose(*a[k].dims).values,
        rtol=rtol,
        atol=1e-7,
        err_msg=f"{tag}:{k}",
        equal_nan=True,
    )


@pytest.mark.parametrize("skipna", [False, True])
@pytest.mark.parametrize("by_init", [True, False])
def test_parity_with_nans(tmp_path, skipna, by_init):
  tp, fp = _setup(tmp_path, seed=11, nan_frac=0.03)
  ec = config.Eval(
      metrics={
          "mse": metrics.MSE(),
          "mae": metrics.MAE(),
          "bias": metrics.Bias(),
          "rmse": metrics.RMSESqrtBeforeTimeAvg(),
      },
      regions={
          "global": SliceRegion(),
          "et": ExtraTropicalRegion(),
          "tropics": SliceRegion(lat_slice=slice(-20, 20)),
      },
  )
  _run_both(
      tmp_path, tp, fp, ec, by_init, skipna, chunk=3,
      tag=f"{skipna}{by_init}",
  )


@pytest.mark.parametrize("skipna", [False, True])
def test_parity_ensemble_with_nans(tmp_path, skipna):
  tp, fp = _setup(tmp_path, seed=23, nan_frac=0.02, ensemble=4)
  ec = config.Eval(
      metrics={
          "crps": metrics.CRPS(),
          "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
          "ensemble_variance": metrics.EnsembleVariance(),
      },
      regions={"global": SliceRegion()},
  )
  _run_both(tmp_path, tp, fp, ec, True, skipna, chunk=4,
            tag=f"ens{skipna}")


@pytest.mark.parametrize("skipna", [False, True])
def test_parity_prob_fused_skipna_50_members(tmp_path, skipna):
  """Full CRPS-family suite at the official 50-member size with NaNs in
  both skipna modes: the fused member pass (per-cell valid counts under
  skipna) must match the generic in-memory loop (reference semantics:
  metrics.py:611-846 with xarray skipna)."""
  tp, fp = _setup(tmp_path, seed=31, nan_frac=0.02, ensemble=50)
  ec = config.Eval(
      metrics={
          "crps": metrics.CRPS(),
          "crps_spread": metrics.CRPSSpread(),
          "crps_skill": metrics.CRPSSkill(),
          "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
          "debiased_ensemble_mean_mse": metrics.DebiasedEnsembleMeanMSE(),
          "ensemble_variance": metrics.EnsembleVariance(),
      },
      regions={
          "global": SliceRegion(),
          "et": ExtraTropicalRegion(),
      },
  )
  # rtol 1e-4: the fused tier accumulates in float32 on device; at 50
  # members the PWM sum carries coefficients up to +/-(M-1) with heavy
  # cancellation, so ~1e-5 relative noise vs the float64 host loop is
  # expected, not a semantics difference
  _run_both(tmp_path, tp, fp, ec, True, skipna, chunk=4,
            tag=f"p50{skipna}", rtol=1e-4)


@pytest.mark.parametrize("skipna", [False, True])
def test_parity_pointwise_tier_with_nans(tmp_path, skipna):
  """Threshold + energy-score metrics (the pointwise-fused tier) under
  randomized NaNs, both skipna modes, streaming vs in-memory."""
  from weatherbench2_tpu import thresholds

  tp, fp = _setup(tmp_path, seed=47, nan_frac=0.02, ensemble=4)
  clim = schema.mock_hourly_climatology_data(
      hour_interval=6,
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      spatial_resolution_in_degrees=30.0,
  )
  qvars = {}
  for var in list(clim.keys()):
    base = clim[var]
    qvals = np.stack(
        [np.full(base.shape, -0.5), np.full(base.shape, 0.5)]
    ).astype(np.float32)
    qvars[f"{var}_quantile"] = xds.Variable(
        ("quantile",) + base.dims, qvals
    )
  qclim = xds.Dataset(
      qvars,
      coords={**clim.coords_dict(), "quantile": np.array([0.25, 0.75])},
  )
  thr = [thresholds.QuantileThreshold(climatology=qclim, quantile=q)
         for q in (0.25, 0.75)]
  ec = config.Eval(
      metrics={
          "brier": metrics.EnsembleBrierScore(thresholds=thr),
          "rps": metrics.EnsembleRPS(thresholds=thr),
          "energy_score": metrics.EnergyScore(),
      },
      regions={
          "global": SliceRegion(),
          "et": ExtraTropicalRegion(),
      },
  )
  _run_both(tmp_path, tp, fp, ec, True, skipna, chunk=3,
            tag=f"pw{skipna}")


def test_parity_fuzzed_chunk_sizes(tmp_path):
  tp, fp = _setup(tmp_path, seed=31)
  ec = config.Eval(
      metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
      regions={"global": SliceRegion()},
  )
  for chunk in (1, 2, 5, 7, 100):
    _run_both(tmp_path, tp, fp, ec, True, False, chunk=chunk,
              tag=f"c{chunk}")
