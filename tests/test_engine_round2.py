"""Round-2 engine coverage: lead-chunk guard, checkpoint/resume edges,
host (non-jit) metric path, CRPS-spread caching."""
import os

import numpy as np
import pytest

from weatherbench2_tpu import (
    config, derived_variables, evaluation, metrics, schema, utils, xds,
)
from weatherbench2_tpu.parallel import streaming
from weatherbench2_tpu.regions import SliceRegion


def _mk_data(tmp_path, n_days=12, lead_stop="3 days"):
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop=f"2020-01-{n_days + 13:02d}",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop=lead_stop,
          **{**kwargs, "time_stop": f"2020-01-{n_days + 1:02d}"},
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)
  return truth_path, fc_path


def _data_config(tmp_path, truth_path, fc_path, out="out"):
  return config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-10"),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / out),
      ),
      by_init=True,
  )


def test_lead_chunking_with_lead_core_derived_variable_raises(tmp_path):
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path)
  ec = {
      "det": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
          derived_variables={
              "t2m_accum": derived_variables.PrecipitationAccumulation(
                  total_precipitation_name="2m_temperature",
                  accumulation_hours=24,
                  lead_time_name="lead_time",
              )
          },
      )
  }
  with pytest.raises(ValueError, match="full lead_time axis"):
    evaluation.evaluate_with_mesh(
        dc, ec, input_chunks={"init_time": 4, "lead_time": 1}
    )


def test_resume_without_accumulators_raises(tmp_path):
  """A state with chunk progress but no accumulators cannot resume: the
  covered chunks' contributions would be silently dropped.  (Round 4
  replaced the old blanket lead-chunking refusal with real support —
  see test_checkpoint_round4.py — so this is the remaining guard.)"""
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path)
  forecast, truth, clim = evaluation.open_forecast_and_truth_datasets(
      dc, config.Eval(metrics={"mse": metrics.MSE()}), lazy=True
  )
  state = streaming.StreamingState(chunk_index=1)
  with pytest.raises(ValueError, match="no accumulators"):
    streaming.evaluate_streaming(
        forecast, truth, clim,
        config.Eval(metrics={"mse": metrics.MSE()},
                    regions={"global": SliceRegion()}),
        dc,
        input_chunks={"init_time": 4, "lead_time": 2},
        state=state,
    )


def test_acc_host_gather_fallback_matches_device_resident(monkeypatch):
  """Climatologies over WB2_CLIM_DEVICE_BYTES fall back to per-chunk
  host gathers (the 0.25-degree hourly climatology exceeds HBM); both
  modes must agree."""
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-10",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(
      schema.mock_truth_data(**{**kwargs, "time_stop": "2020-01-14"}),
      seed=0,
  )
  fc = utils.random_like(
      schema.mock_forecast_data(lead_stop="2 days", **kwargs), seed=1
  )
  fc = schema.apply_time_conventions(fc, by_init=True)
  truth_sel = truth.sel(time=fc["valid_time"])
  clim = utils.random_like(
      schema.mock_hourly_climatology_data(
          hour_interval=6, **{k: v for k, v in kwargs.items()
                              if not k.startswith("time")},
      ),
      seed=2,
  )

  device_res = metrics.ACC(climatology=clim).compute_chunk(fc, truth_sel)
  monkeypatch.setenv("WB2_CLIM_DEVICE_BYTES", "1")
  host_metric = metrics.ACC(climatology=clim)
  prepared = host_metric.prepare_chunk(fc, truth_sel)
  assert "clim_u" in prepared  # fallback engaged (deduped host-gather)
  # the deduped block is at most the chunk's unique-pair count (bucketed)
  n_entries = fc.sizes["init_time"] * fc.sizes["lead_time"]
  assert prepared["clim_u"].sizes["__clim_upair"] <= -(-n_entries // 32) * 32
  assert prepared["uinv"].sizes == {
      "init_time": fc.sizes["init_time"], "lead_time": fc.sizes["lead_time"]
  }
  host_res = host_metric.compute_chunk_prepared(fc, truth_sel, prepared)
  np.testing.assert_allclose(
      host_res["2m_temperature"].values,
      device_res["2m_temperature"].values,
      rtol=1e-6,
  )
  # pointwise protocol works in host-gather mode too
  fields = host_metric.pointwise_chunk(fc, truth_sel, prepared, False)
  assert fields is not None


def test_resume_with_different_chunk_size_raises(tmp_path):
  """chunk_index counts chunks: a resume must use the same chunk size."""
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path, out="p1")
  ec = lambda: {
      "det": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
      )
  }
  cpath = str(tmp_path / "ck")
  evaluation.evaluate_with_mesh(
      dc, ec(), input_chunks={"init_time": 4},
      checkpoint_path=cpath, checkpoint_every=1,
  )
  dc2 = _data_config(tmp_path, truth_path, fc_path, out="p2")
  with pytest.raises(ValueError, match="chunk_size"):
    evaluation.evaluate_with_mesh(
        dc2, ec(), input_chunks={"init_time": 5},
        checkpoint_path=cpath, checkpoint_every=1,
    )


def test_merge_metric_results_union_quantile_coords():
  """Metrics sharing a dim name with different labels reindex onto the
  union with NaN fill (xarray outer-join semantics)."""
  a = xds.Dataset(
      {"t2m": xds.Variable(("metric", "quantile"), [[1.0, 2.0]])},
      coords={
          "metric": np.asarray(["brier"], dtype=object),
          "quantile": np.array([0.25, 0.75]),
      },
  )
  b = xds.Dataset(
      {"t2m": xds.Variable(("metric", "quantile"), [[3.0, 4.0, 5.0]])},
      coords={
          "metric": np.asarray(["gauss_brier"], dtype=object),
          "quantile": np.array([0.5, 0.25, 0.9]),
      },
  )
  merged = evaluation.merge_metric_results([a, b])
  q = np.asarray(merged.coords_dict()["quantile"].data)
  np.testing.assert_array_equal(q, [0.25, 0.75, 0.5, 0.9])
  vals = merged["t2m"].values
  np.testing.assert_array_equal(vals[0], [1.0, 2.0, np.nan, np.nan])
  np.testing.assert_array_equal(vals[1], [4.0, np.nan, 3.0, 5.0])


def test_checkpoint_with_nontemporal_config_raises(tmp_path):
  """Per-time results live in a host list, not StreamingState: resuming
  would silently drop completed chunks, so checkpointing must refuse."""
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path)
  ec = {
      "temporal": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
          temporal_mean=False,
      )
  }
  with pytest.raises(ValueError, match="temporal_mean"):
    evaluation.evaluate_with_mesh(
        dc, ec, input_chunks={"init_time": 4},
        checkpoint_path=str(tmp_path / "ck.pkl"), checkpoint_every=1,
    )


def test_checkpoint_resume_matches_full_run(tmp_path):
  truth_path, fc_path = _mk_data(tmp_path)
  dc_full = _data_config(tmp_path, truth_path, fc_path, out="full")
  ec = lambda: {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      )
  }
  # ground truth: uninterrupted run
  evaluation.evaluate_with_mesh(
      dc_full, ec(), input_chunks={"init_time": 4}
  )
  want = xds.open_netcdf(str(tmp_path / "full" / "det.nc"))

  # "interrupted" run: evaluate only the first 2 chunks (8 init times),
  # checkpointing every chunk, then resume on the full range
  dc_part = _data_config(tmp_path, truth_path, fc_path, out="part")
  dc_part.selection.time_slice = slice("2020-01-01", "2020-01-08")
  cpath = str(tmp_path / "ckpt")
  evaluation.evaluate_with_mesh(
      dc_part, ec(), input_chunks={"init_time": 4},
      checkpoint_path=cpath, checkpoint_every=1,
  )
  assert os.path.exists(cpath + ".det")
  st = streaming.StreamingState.load(cpath + ".det")
  assert st.chunk_index == 2

  dc_res = _data_config(tmp_path, truth_path, fc_path, out="resumed")
  evaluation.evaluate_with_mesh(
      dc_res, ec(), input_chunks={"init_time": 4},
      checkpoint_path=cpath, checkpoint_every=1,
  )
  got = xds.open_netcdf(str(tmp_path / "resumed" / "det.nc"))
  for k in want.keys():
    np.testing.assert_allclose(
        got[k].transpose(*want[k].dims).values, want[k].values, rtol=1e-6
    )


class _HostMSE(metrics.MSE):
  """A user-defined metric that cannot run under jit."""

  supports_jit = False

  def compute_chunk(self, forecast, truth, region=None, skipna=False):
    assert isinstance(
        next(iter(forecast.variables_dict().values())).data, np.ndarray
    ), "host metric must see numpy payloads"
    return super().compute_chunk(forecast, truth, region=region,
                                 skipna=skipna)


def test_host_metric_path_matches_jit(tmp_path):
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path, out="host")
  ec = {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "mse_host": _HostMSE()},
          regions={"global": SliceRegion(),
                   "tropics": SliceRegion(lat_slice=slice(-20, 20))},
      )
  }
  evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 4})
  res = xds.open_netcdf(str(tmp_path / "host" / "det.nc"))
  got = res["2m_temperature"]
  jit_vals = got.sel(metric="mse").values
  host_vals = got.sel(metric="mse_host").values
  np.testing.assert_allclose(host_vals, jit_vals, rtol=1e-6)


def test_crps_spread_cached_once_per_forecast():
  fc = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          ensemble_size=5,
          time_start="2020-01-01",
          time_stop="2020-01-04",
          lead_stop="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=0,
  )
  truth = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[],
          variables_2d=["2m_temperature"],
          ensemble_size=1,
          time_start="2020-01-01",
          time_stop="2020-01-04",
          lead_stop="1 day",
          spatial_resolution_in_degrees=60.0,
      ),
      seed=1,
  ).isel(realization=0, drop=True)

  calls = {"n": 0}
  raw = metrics._pointwise_crps_spread

  def counting(*args, **kwargs):
    calls["n"] += 1
    return raw(*args, **kwargs)

  metrics._CRPS_SPREAD_CACHE.clear()
  metrics._pointwise_crps_spread = counting
  try:
    regions = [None, SliceRegion(lat_slice=slice(-30, 30))]
    for region in regions:
      for m in (metrics.CRPS(), metrics.CRPSSpread(), metrics.CRPS()):
        m.compute_chunk(fc, truth, region=region, skipna=False)
  finally:
    metrics._pointwise_crps_spread = raw
  # one sort for the whole metricxregion loop (reference parity:
  # dataset_safe_lru_cache(maxsize=1), reference metrics.py:775-780)
  assert calls["n"] == 1
  # different skipna -> new cache entry
  metrics.CRPSSpread().compute_chunk(fc, truth, skipna=True)


def test_fused_probabilistic_suite_matches_in_memory(tmp_path):
  """Streaming fused CRPS-family path vs the in-memory engine."""
  from weatherbench2_tpu.parallel import streaming
  from weatherbench2_tpu.regions import ExtraTropicalRegion

  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", ensemble_size=7,
          **{**kwargs, "time_stop": "2020-01-10"},
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)

  def ec():
    return {
        "prob": config.Eval(
            metrics={
                "crps": metrics.CRPS(),
                "crps_spread": metrics.CRPSSpread(),
                "crps_skill": metrics.CRPSSkill(),
                "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
                "debiased_mse": metrics.DebiasedEnsembleMeanMSE(),
                "ensemble_variance": metrics.EnsembleVariance(),
                "ensemble_mean_rmse": (
                    metrics.EnsembleMeanRMSESqrtBeforeTimeAvg()
                ),
                "ensemble_stddev": (
                    metrics.EnsembleStddevSqrtBeforeTimeAvg()
                ),
            },
            regions={
                "global": SliceRegion(),
                "extra": ExtraTropicalRegion(),
                "tropics": SliceRegion(lat_slice=slice(-20, 20)),
            },
        )
    }

  def dc(out):
    return config.Data(
        selection=config.Selection(
            variables=["2m_temperature"],
            time_slice=slice("2020-01-01", "2020-01-08"),
        ),
        paths=config.Paths(
            forecast=fc_path, obs=truth_path,
            output_dir=str(tmp_path / out),
        ),
        by_init=True,
    )

  # sanity: the fused plan must actually engage for this suite
  fc_sel = xds.open_zarr(fc_path)
  plan = streaming._build_prob_fused_plan(
      ec()["prob"].metrics,
      ec()["prob"].regions,
      fc_sel.rename({"time": "init_time", "prediction_timedelta":
                     "lead_time"}),
      skipna=False,
  )
  assert plan is not None
  assert plan["fields"] == ["debiased", "meansq", "skill", "spread", "var"]

  evaluation.evaluate_in_memory(dc("mem"), ec())
  evaluation.evaluate_with_mesh(
      dc("str"), ec(), input_chunks={"init_time": 4}
  )
  a = xds.open_netcdf(str(tmp_path / "mem" / "prob.nc"))
  b = xds.open_netcdf(str(tmp_path / "str" / "prob.nc"))
  for k in a.keys():
    np.testing.assert_allclose(
        b[k].transpose(*a[k].dims).values, a[k].values,
        rtol=2e-4, atol=1e-6,
    )


def test_truth_h2d_dedup_parity_and_reduction(tmp_path, monkeypatch):
  """Truth h2d dedup (unique valid times + device expansion) must match
  the undeduped path exactly and ship fewer truth bytes per chunk."""
  import contextlib
  import io

  from weatherbench2_tpu import config, evaluation

  kwargs = dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-25",
      spatial_resolution_in_degrees=20.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="3 days", **{**kwargs, "time_stop": "2020-01-12"}
      ),
      seed=1,
  )
  tp = str(tmp_path / "t.zarr")
  fp = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(fc, fp)
  ec = config.Eval(metrics={"mse": metrics.MSE(), "mae": metrics.MAE()})
  results = {}
  truth_bytes = {}
  monkeypatch.setenv("WB2_STREAM_VERBOSE", "1")
  # reload the module-level _VERBOSE flag read at import time
  from weatherbench2_tpu.parallel import streaming as _streaming
  monkeypatch.setattr(_streaming, "_VERBOSE", True)
  for env in ("1", "0"):
    monkeypatch.setenv("WB2_TRUTH_DEDUP", env)
    dc = config.Data(
        selection=config.Selection(
            variables=["geopotential", "2m_temperature"], levels=[500],
            time_slice=slice("2020-01-01", "2020-01-10"),
        ),
        paths=config.Paths(
            forecast=fp, obs=tp, output_dir=str(tmp_path / f"out{env}")
        ),
        by_init=True,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
      evaluation.evaluate_with_mesh(
          dc, {"cfg": ec}, input_chunks={"init_time": 5}
      )
    results[env] = xds.open_netcdf(
        str(tmp_path / f"out{env}" / "cfg.nc")
    )
    truth_bytes[env] = sum(
        int(line.split("truth=")[1].split()[0])
        for line in buf.getvalue().splitlines()
        if "truth=" in line
    )
  assert truth_bytes["1"] < truth_bytes["0"]
  for k in results["0"].keys():
    np.testing.assert_allclose(
        results["1"][k].values, results["0"][k].values, rtol=1e-6,
        equal_nan=True,
    )


def test_truth_dedup_gate_disables_for_lead_core_derived(
    tmp_path, monkeypatch
):
  """Lead-core-dim derived variables (precip accumulation) compute on
  the truth chunk too; the compact unique-time truth has no lead axis,
  so the dedup gate must fall back to lead-aligned truth (and match the
  dedup-off results exactly)."""
  from weatherbench2_tpu import config, derived_variables, evaluation

  kwargs = dict(
      variables_3d=[],
      variables_2d=["total_precipitation"],
      time_start="2020-01-01",
      time_stop="2020-01-20",
      spatial_resolution_in_degrees=20.0,
      time_resolution="6 hours",
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="3 days", lead_resolution="6 hours",
          **{**kwargs, "time_stop": "2020-01-10"},
      ),
      seed=1,
  )
  tp, fp = str(tmp_path / "t.zarr"), str(tmp_path / "f.zarr")
  xds.to_zarr(truth, tp)
  xds.to_zarr(fc, fp)
  dv = derived_variables.DERIVED_VARIABLE_DICT["total_precipitation_24hr"]
  ec = config.Eval(
      metrics={"mse": metrics.MSE()},
      derived_variables={"total_precipitation_24hr": dv},
  )
  results = {}
  for env in ("1", "0"):
    monkeypatch.setenv("WB2_TRUTH_DEDUP", env)
    dc = config.Data(
        selection=config.Selection(
            variables=["total_precipitation"], levels=[],
            time_slice=slice("2020-01-01", "2020-01-08"),
        ),
        paths=config.Paths(
            forecast=fp, obs=tp, output_dir=str(tmp_path / f"o{env}")
        ),
        by_init=True,
    )
    evaluation.evaluate_with_mesh(
        dc, {"cfg": ec}, input_chunks={"init_time": 4}
    )
    results[env] = xds.open_netcdf(str(tmp_path / f"o{env}" / "cfg.nc"))
  # the in-memory path shares the rename-aware DV helper: must agree
  dc_mem = config.Data(
      selection=config.Selection(
          variables=["total_precipitation"], levels=[],
          time_slice=slice("2020-01-01", "2020-01-08"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, output_dir=str(tmp_path / "omem")
      ),
      by_init=True,
  )
  evaluation.evaluate_in_memory(dc_mem, {"cfg": ec})
  results["mem"] = xds.open_netcdf(str(tmp_path / "omem" / "cfg.nc"))
  for k in results["0"].keys():
    for other in ("1", "mem"):
      np.testing.assert_allclose(
          results[other][k].transpose(*results["0"][k].dims).values,
          results["0"][k].values, rtol=1e-5,
          equal_nan=True,
      )


def test_backpressure_engages_for_nontemporal_configs(
    tmp_path, monkeypatch
):
  """temporal_mean=False configs carry counts=None leaves; the
  completion token must come from sums or the device-memory bound
  silently never engages (round-3 review finding)."""
  import contextlib
  import io

  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path)
  ec = {
      "temporal": config.Eval(
          metrics={"mse": metrics.MSE()},
          regions={"global": SliceRegion()},
          temporal_mean=False,
      )
  }
  monkeypatch.setenv("WB2_DEVICE_INFLIGHT", "1")
  monkeypatch.setattr(streaming, "_VERBOSE", True)
  buf = io.StringIO()
  with contextlib.redirect_stdout(buf):
    evaluation.evaluate_with_mesh(dc, ec, input_chunks={"init_time": 3})
  assert "backpressure wait" in buf.getvalue()
