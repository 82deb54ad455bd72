"""Benchmark: deterministic eval-suite wall-clock at official geometry.

Headline workload (the 240x121 official protocol geometry,
/root/reference/docs/source/official-evaluation.md:281): MSE + RMSE +
Bias + ACC of geopotential (levels 500/700/850) and 2m_temperature vs
truth + hourly climatology, full-year 2020, 240x121 grid (1.5 deg), 730
init times x 21 lead times, 3 regions — streamed through the full engine
path: zarr (tensorstore) -> host -> HBM chunks -> jit-fused metric x
region program -> on-device accumulators -> NetCDF results.

Secondary workload (round-1 continuity): the same suite at 64x32, the
geometry of the reference's only published timing ("takes around 5
minutes" on a Colab CPU, docs/source/evaluation.ipynb; 300 s).

The single JSON line reports the headline 240x121 wall-clock.
vs_baseline scales the 300 s Colab figure by the grid-cell ratio
(240*121)/(64*32) = 14.18x -> 4253 s (a conservative linear-scaling
proxy; the reference publishes no number at this geometry).  The
secondary 64x32 figure (vs its direct 300 s baseline) and the
attempt/failure counts ride along as extra fields.
"""
import json
import os
import sys
import threading
import time

import numpy as np

# Persistent compilation cache: repeated bench runs (and the driver's
# measurement run) skip the multi-second remote AOT compile.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/wb2_jax_compile_cache"
)
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1"
)

CACHE = os.environ.get("WB2_BENCH_CACHE", "/tmp/wb2_tpu_bench")
BASELINE_64x32_SECONDS = 300.0  # "Takes around 5 minutes" (reference)
CELL_RATIO = (240 * 121) / (64 * 32)  # 14.18x the 64x32 grid
BASELINE_240x121_SECONDS = BASELINE_64x32_SECONDS * CELL_RATIO


def _mock_specs(resolution_degrees):
  return dict(
      variables_3d=["geopotential"],
      variables_2d=["2m_temperature"],
      levels=(500, 700, 850),
      spatial_resolution_in_degrees=resolution_degrees,
  )


def _generate_geometry(tag, resolution_degrees):
  """Write synthetic truth/forecast/climatology stores block-wise."""
  from weatherbench2_tpu import schema, xds

  os.makedirs(CACHE, exist_ok=True)
  truth_path = os.path.join(CACHE, f"truth_{tag}.zarr")
  forecast_path = os.path.join(CACHE, f"forecast_{tag}.zarr")
  clim_path = os.path.join(CACHE, f"clim_{tag}.zarr")
  if all(os.path.exists(p) for p in (truth_path, forecast_path, clim_path)):
    return truth_path, forecast_path, clim_path

  specs = _mock_specs(resolution_degrees)
  truth = schema.mock_truth_data(
      time_start="2020-01-01",
      time_stop="2021-01-11",  # truth must cover init + max lead
      time_resolution="6 hours",
      **specs,
  )
  forecast = schema.mock_forecast_data(
      time_start="2020-01-01",
      time_stop="2021-01-01",
      time_resolution="12 hours",
      lead_start="0 days",
      lead_stop="10 days",
      lead_resolution="12 hours",
      **specs,
  )
  clim = schema.mock_hourly_climatology_data(hour_interval=6, **specs)

  # PCG64 + float32 output: ~4x faster than the legacy RandomState path;
  # datagen is single-core and dominates first-run setup at 240x121.
  rs = np.random.default_rng(0)

  def write_streamed(ds, path, stream_dim, block, chunks):
    template = xds.Dataset(
        {
            k: xds.stub_variable(v.dims, v.sizes, np.float32)
            for k, v in ds.variables_dict().items()
        },
        coords=dict(ds.coords_dict()),
    )
    writer = xds.RegionWriter(path, template, chunks=chunks)
    n = ds.sizes[stream_dim]
    for start in range(0, n, block):
      sl = slice(start, min(start + block, n))
      for name, v in ds.variables_dict().items():
        shape = [
            (sl.stop - sl.start) if d == stream_dim else v.sizes[d]
            for d in v.dims
        ]
        writer.write_array(
            name,
            tuple(sl if d == stream_dim else slice(None) for d in v.dims),
            rs.standard_normal(shape, dtype=np.float32),
        )
    writer.finish()

  write_streamed(truth, truth_path, "time", 124, {"time": 124})
  write_streamed(
      forecast, forecast_path, "time", 16,
      {"time": 16, "prediction_timedelta": -1},
  )
  write_streamed(clim, clim_path, "dayofyear", 92, {"dayofyear": 92})
  return truth_path, forecast_path, clim_path


def _run_suite(truth_path, forecast_path, clim_path, out_tag, input_chunks):
  from weatherbench2_tpu import config, evaluation, metrics, xds
  from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion

  selection = config.Selection(
      variables=["geopotential", "2m_temperature"],
      levels=[500, 700, 850],
      time_slice=slice("2020-01-01", "2020-12-31"),
  )
  paths = config.Paths(
      forecast=forecast_path, obs=truth_path,
      output_dir=os.path.join(CACHE, f"results_{out_tag}"),
      climatology=clim_path,
  )
  data_config = config.Data(selection=selection, paths=paths, by_init=True)
  clim = xds.open_zarr(clim_path)
  eval_configs = {
      "deterministic": config.Eval(
          metrics={
              "mse": metrics.MSE(),
              "rmse": metrics.RMSESqrtBeforeTimeAvg(),
              "bias": metrics.Bias(),
              "acc": metrics.ACC(climatology=clim),
          },
          regions={
              "global": SliceRegion(),
              "tropics": SliceRegion(lat_slice=slice(-20, 20)),
              "extra-tropics": ExtraTropicalRegion(),
          },
      )
  }
  start = time.perf_counter()
  evaluation.evaluate_with_mesh(
      data_config, eval_configs, input_chunks=input_chunks
  )
  return time.perf_counter() - start


def _timed_runs(fn, n_runs, max_attempts):
  timings = []
  attempts = 0
  failures = 0
  while len(timings) < n_runs and attempts < max_attempts:
    attempts += 1
    try:
      timings.append(fn())
    except Exception:
      # transient tunnel/backend failures: back off and retry
      failures += 1
      if attempts >= max_attempts and not timings:
        raise
      time.sleep(20)
  return timings, attempts, failures


def main():
  # Backend-claim watchdog: when the tunneled TPU is in an outage, the
  # axon PJRT plugin BLOCKS inside `import jax` / the first execution
  # rather than raising, which would hang this process (and its caller)
  # indefinitely.  Fail fast with a diagnosable error instead.
  warm = {"done": False}
  watchdog_s = int(os.environ.get("WB2_BENCH_WATCHDOG_S", "600"))

  def _watchdog():
    time.sleep(watchdog_s)
    if not warm["done"]:
      print(
          f"bench.py: backend warmup did not complete within "
          f"{watchdog_s}s (TPU tunnel outage?) — aborting",
          file=sys.stderr, flush=True,
      )
      os._exit(3)

  threading.Thread(target=_watchdog, daemon=True).start()

  # Warm up the accelerator session (tunnel claim + transfer path) so the
  # timed regions measure the workload, not one-time backend setup.
  import jax
  import jax.numpy as jnp

  for attempt in range(3):
    try:
      _ = np.asarray(jax.jit(lambda x: (x * x).sum())(jnp.ones((128, 128))))
      break
    except Exception:
      if attempt == 2:
        raise
      time.sleep(30)
  warm["done"] = True

  # --- headline: official 240x121 geometry, full year ---------------------
  t240, f240, c240 = _generate_geometry("240x121", 1.5)
  big_timings, big_attempts, big_failures = _timed_runs(
      lambda: _run_suite(t240, f240, c240, "240x121", {"init_time": 16}),
      n_runs=int(os.environ.get("WB2_BENCH_BIG_RUNS", "2")),
      max_attempts=4,
  )

  # --- continuity: 64x32 geometry (round-1 metric) -------------------------
  t64, f64, c64 = _generate_geometry("64x32", 5.625)
  small_timings, small_attempts, small_failures = _timed_runs(
      lambda: _run_suite(t64, f64, c64, "64x32", {"init_time": 183}),
      n_runs=3,
      max_attempts=5,
  )

  big = min(big_timings)
  small = min(small_timings)

  # measured 0.25-degree north-star rows (tools/north_star.py), if the
  # year run has produced any: surfaces the real 1440x721 numbers in the
  # bench record without re-running hours of streaming here
  north_star = {}
  ns_path = os.path.join(os.path.dirname(__file__), "NORTHSTAR.jsonl")
  if os.path.exists(ns_path):
    # keep the LAST ok row per (workload, segment): re-run segments
    # (integrity re-runs, backend-outage retries) supersede, not add
    by_seg: dict = {}
    with open(ns_path) as f:
      for line in f:
        row = json.loads(line)
        if row.get("status") == "ok":
          by_seg[(row["workload"], row["segment"])] = row
    by_wl: dict = {}
    for (wl, _), row in by_seg.items():
      by_wl.setdefault(wl, []).append(row)
    # workloads projected to a year when only partially measured
    _year_projected = ("prob_0p25", "official13_0p25")

    def _segment_days(seg):
      # 'YYYY-MM' (a month) or 'YYYY-MM-DD:YYYY-MM-DD' ([start, stop))
      if ":" in seg:
        start, stop = seg.split(":")
        return int((np.datetime64(stop) - np.datetime64(start))
                   // np.timedelta64(1, "D"))
      first = np.datetime64(seg, "M")
      return int(((first + 1).astype("datetime64[D]")
                  - first.astype("datetime64[D]"))
                 // np.timedelta64(1, "D"))

    for wl, rows in by_wl.items():
      entry = {
          "segments": len(rows),
          "days_measured": sum(_segment_days(r["segment"]) for r in rows),
          "total_wall_s": round(sum(r["wall_s"] for r in rows), 1),
          "total_input_gib": round(
              sum(r["input_gib"] for r in rows), 1
          ),
      }
      # project from DAYS, not segment counts: the chain mixes 5- and
      # 6-day spans, so mean-wall x segments/year was inconsistent
      # between workloads on the same grid (round-4 advisor finding)
      days = entry["days_measured"]
      if wl in _year_projected and 0 < days < 366:
        entry["year_projection_s"] = round(
            entry["total_wall_s"] / days * 366, 0)
        entry["year_projection_basis"] = (
            f"total wall over {days} measured days x 366/{days} "
            f"(tunnel-bound; see NORTHSTAR.md)"
        )
      north_star[wl] = entry

  print(
      json.dumps(
          {
              "metric": "deterministic_eval_suite_wallclock_1yr_240x121",
              "value": round(big, 3),
              "unit": "seconds",
              "vs_baseline": round(BASELINE_240x121_SECONDS / big, 2),
              "baseline_basis": (
                  "300 s Colab-CPU 64x32 figure scaled by the "
                  "(240*121)/(64*32)=14.18 cell ratio"
              ),
              "runs": [round(t, 3) for t in big_timings],
              "attempts": big_attempts,
              "failed_attempts": big_failures,
              "north_star_0p25_measured": north_star,
              # the reference's headline production protocol
              # (official-evaluation.md:546) measured at 1440x721
              "north_star_headline": north_star.get("official13_0p25"),
              "secondary": {
                  "metric": "deterministic_eval_suite_wallclock_1yr_64x32",
                  "value": round(small, 3),
                  "unit": "seconds",
                  "vs_baseline": round(BASELINE_64x32_SECONDS / small, 2),
                  "runs": [round(t, 3) for t in small_timings],
                  "attempts": small_attempts,
                  "failed_attempts": small_failures,
              },
          }
      )
  )


if __name__ == "__main__":
  main()
