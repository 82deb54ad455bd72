"""Measured official-geometry runs for PERF.md (one-off, real TPU).

Workloads (synthetic data, official geometries/protocols):
  det_0p25   — deterministic suite (MSE/RMSE/Bias/ACC), 1 month of 2020,
               1440x721, z500 + 2m_temperature, 62 inits x 21 leads
               (official chunking --input_chunks=init_time=1,lead_time=1,
               /root/reference/docs/source/official-evaluation.md:546 —
               auto-sized here to the HBM budget).
  prob_240   — CRPS/spread/skill + ensemble mean/var, 1 month, 240x121,
               50-member 2m_temperature, 62 inits x 21 leads (official ENS
               protocol at 1.5 deg, official-evaluation.md:887).
  det_240    — same month at 240x121 deterministic (for the prob-vs-det
               throughput ratio at matched geometry).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_official.py [workload ...]
Prints one JSON line per workload: seconds, input GiB streamed, GiB/s.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/wb2_jax_compile_cache"
)

CACHE = os.environ.get("WB2_OFFICIAL_CACHE", "/tmp/wb2_official")


def _write_random(ds, path, stream_dim, block, chunks, seed):
  from weatherbench2_tpu import xds

  if os.path.exists(os.path.join(path, ".zmetadata")):
    return
  # PCG64 + float32 output is ~4x faster than the legacy RandomState
  # Mersenne path — datagen is single-core and would otherwise dominate
  # the tool's wall-clock at the 0.25-degree geometry.
  rs = np.random.default_rng(seed)
  template = xds.Dataset(
      {k: xds.stub_variable(v.dims, v.sizes, np.float32)
       for k, v in ds.variables_dict().items()},
      coords=dict(ds.coords_dict()),
  )
  writer = xds.RegionWriter(path, template, chunks=chunks)
  n = ds.sizes[stream_dim]
  for start in range(0, n, block):
    sl = slice(start, min(start + block, n))
    for name, v in ds.variables_dict().items():
      shape = [(sl.stop - sl.start) if d == stream_dim else v.sizes[d]
               for d in v.dims]
      writer.write_array(
          name,
          tuple(sl if d == stream_dim else slice(None) for d in v.dims),
          rs.standard_normal(shape, dtype=np.float32),
      )
  writer.finish()


def _nbytes(ds):
  return sum(
      4 * v.size for v in ds.variables_dict().values()
  )


def _specs(res_deg, with_levels):
  return dict(
      variables_3d=["geopotential"] if with_levels else [],
      variables_2d=["2m_temperature"],
      levels=(500,),
      spatial_resolution_in_degrees=res_deg,
  )


def _gen(tag, res_deg, with_levels, ensemble=None):
  from weatherbench2_tpu import schema

  os.makedirs(CACHE, exist_ok=True)
  specs = _specs(res_deg, with_levels)
  truth = schema.mock_truth_data(
      time_start="2020-01-01", time_stop="2020-02-15",
      time_resolution="6 hours", **specs,
  )
  forecast = schema.mock_forecast_data(
      time_start="2020-01-01", time_stop="2020-02-01",
      time_resolution="12 hours",
      lead_start="0 days", lead_stop="10 days", lead_resolution="12 hours",
      ensemble_size=ensemble, **specs,
  )
  # hour resolution must cover the forecast's valid hours (12-hourly
  # inits x 12-hourly leads -> hours {0, 12}); ACC's climatology gather
  # validates exact hour matches like the reference's .sel
  clim = schema.mock_hourly_climatology_data(hour_interval=12, **specs)
  tp = os.path.join(CACHE, f"truth_{tag}.zarr")
  fp = os.path.join(CACHE, f"forecast_{tag}.zarr")
  cp = os.path.join(CACHE, f"clim_{tag}.zarr")
  _write_random(truth, tp, "time", 16, {"time": 16}, 1)
  _write_random(forecast, fp, "time", 2,
                {"time": 2, "prediction_timedelta": -1}, 2)
  _write_random(clim, cp, "dayofyear", 46, {"dayofyear": 46}, 3)
  return (tp, fp, cp), _nbytes(forecast) + _nbytes(truth)


def _run(tag, paths, probabilistic):
  from weatherbench2_tpu import config, evaluation, metrics, xds
  from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion

  tp, fp, cp = paths
  regions = {
      "global": SliceRegion(),
      "tropics": SliceRegion(lat_slice=slice(-20, 20)),
      "extra-tropics": ExtraTropicalRegion(),
  }
  if probabilistic:
    ec = config.Eval(
        metrics={
            "crps": metrics.CRPS(),
            "crps_spread": metrics.CRPSSpread(),
            "crps_skill": metrics.CRPSSkill(),
            "ensemble_mean_mse": metrics.EnsembleMeanMSE(),
            "debiased_ensemble_mean_mse":
                metrics.DebiasedEnsembleMeanMSE(),
            "ensemble_variance": metrics.EnsembleVariance(),
        },
        regions=regions,
    )
  else:
    # lazy like the CLI: host-gather ACC reads bounded per-chunk slices
    clim = xds.open_zarr(cp, lazy=True)
    ec = config.Eval(
        metrics={
            "mse": metrics.MSE(),
            "rmse": metrics.RMSESqrtBeforeTimeAvg(),
            "bias": metrics.Bias(),
            "acc": metrics.ACC(climatology=clim),
        },
        regions=regions,
    )
  dc = config.Data(
      selection=config.Selection(
          variables=["geopotential", "2m_temperature"]
          if not probabilistic else ["2m_temperature"],
          levels=[500],
          time_slice=slice("2020-01-01", "2020-01-31"),
      ),
      paths=config.Paths(
          forecast=fp, obs=tp, climatology=cp,
          output_dir=os.path.join(CACHE, f"out_{tag}"),
      ),
      by_init=True,
  )
  start = time.perf_counter()
  evaluation.evaluate_with_mesh(dc, {tag: ec})
  return time.perf_counter() - start


WORKLOADS = {
    "det_0p25": dict(res=0.25, levels=True, ensemble=None, prob=False),
    "prob_240": dict(res=1.5, levels=False, ensemble=50, prob=True),
    "det_240": dict(res=1.5, levels=True, ensemble=None, prob=False),
}

_OFFICIAL_3D = [
    "geopotential", "temperature", "specific_humidity",
    "u_component_of_wind", "v_component_of_wind",
]
_OFFICIAL_2D = [
    "2m_temperature", "10m_u_component_of_wind",
    "10m_v_component_of_wind", "mean_sea_level_pressure",
    "total_precipitation_24hr",
]


def _official_cli_240():
  """The full official deterministic config through scripts/evaluate.py:
  13 variables (wind pairs -> vector errors), derived wind_speed, SEEPS,
  the 13 predefined regions, one month at 240x121 (docs §2)."""
  import subprocess

  from weatherbench2_tpu import schema

  tag = "official_240"
  specs = dict(
      variables_3d=_OFFICIAL_3D,
      variables_2d=_OFFICIAL_2D,
      levels=(500, 700, 850),
      spatial_resolution_in_degrees=1.5,
  )
  truth = schema.mock_truth_data(
      time_start="2020-01-01", time_stop="2020-02-15",
      time_resolution="6 hours", **specs,
  )
  forecast = schema.mock_forecast_data(
      time_start="2020-01-01", time_stop="2020-02-01",
      time_resolution="12 hours",
      lead_start="0 days", lead_stop="10 days", lead_resolution="12 hours",
      **specs,
  )
  clim = schema.mock_hourly_climatology_data(
      hour_interval=12,
      # the official climatology carries the derived wind_speed too
      # (ACC needs a climatology entry per evaluated variable)
      variables_3d=_OFFICIAL_3D + ["wind_speed"],
      variables_2d=_OFFICIAL_2D + [
          "total_precipitation_24hr_seeps_threshold",
          "total_precipitation_24hr_seeps_dry_fraction",
      ],
      levels=(500, 700, 850),
      spatial_resolution_in_degrees=1.5,
  )
  tp = os.path.join(CACHE, f"truth_{tag}.zarr")
  fp = os.path.join(CACHE, f"forecast_{tag}.zarr")
  cp = os.path.join(CACHE, f"clim_{tag}.zarr")
  t0 = time.perf_counter()
  _write_random(truth, tp, "time", 8, {"time": 8}, 11)
  _write_random(forecast, fp, "time", 2,
                {"time": 2, "prediction_timedelta": -1}, 12)
  _write_random(clim, cp, "dayofyear", 46, {"dayofyear": 46}, 13)
  gen_s = time.perf_counter() - t0
  in_bytes = _nbytes(truth) + _nbytes(forecast)

  start = time.perf_counter()
  subprocess.run(
      [
          sys.executable, "/root/repo/scripts/evaluate.py",
          f"--forecast_path={fp}", f"--obs_path={tp}",
          f"--climatology_path={cp}",
          f"--output_dir={os.path.join(CACHE, 'out_' + tag)}",
          "--eval_configs=deterministic",
          "--use_mesh", "--regions=all",
          "--variables=" + ",".join(_OFFICIAL_3D + _OFFICIAL_2D),
          "--derived_variables=wind_speed",
          "--compute_seeps",
          "--levels=500,700,850",
          "--time_start=2020-01-01", "--time_stop=2020-01-31",
          "--input_chunks=init_time=8",
      ],
      check=True,
      env={**os.environ, "PYTHONPATH": "/root/repo:/root/.axon_site"},
  )
  elapsed = time.perf_counter() - start
  gib = in_bytes / 2 ** 30
  print(json.dumps({
      "workload": tag,
      "seconds": round(elapsed, 2),
      "input_gib": round(gib, 2),
      "gib_per_s": round(gib / elapsed, 3),
      "datagen_seconds": round(gen_s, 1),
  }), flush=True)


def main(names):
  for name in names:
    if name == "official_240":
      _official_cli_240()
      continue
    w = WORKLOADS[name]
    t0 = time.perf_counter()
    paths, in_bytes = _gen(name, w["res"], w["levels"], w["ensemble"])
    gen_s = time.perf_counter() - t0
    elapsed = _run(name, paths, w["prob"])
    gib = in_bytes / 2 ** 30
    print(json.dumps({
        "workload": name,
        "seconds": round(elapsed, 2),
        "input_gib": round(gib, 2),
        "gib_per_s": round(gib / elapsed, 3),
        "datagen_seconds": round(gen_s, 1),
    }), flush=True)


if __name__ == "__main__":
  main(sys.argv[1:] or list(WORKLOADS))
