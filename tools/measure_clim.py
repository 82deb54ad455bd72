"""Official-scale climatology COMPUTATION benchmark (real TPU).

The climatology the official evaluation consumes (ACC anomalies, SEEPS
thresholds, quantile thresholds) is itself a bigger job than the eval:
the reference computes it from ~30 years of 6-hourly ERA5 with a
61-day rolling window via a Beam rechunk-to-time-pencils shuffle
(reference compute_climatology.py:358-431).  Round 2 only timed the
device path at 64x32/10-years; this measures:

  clim_240   — 30 years, 6-hourly, 240x121, t2m + 6h precip;
               mean+std+quantile(0.1,0.9) + SEEPS thresholds,
               --use_device (circulant window matmuls + device
               weighted quantiles).
  clim_0p25_tile — the same on one 0.25-degree spatial tile
               (1440x103 = 1/7 of the latitude rows), the unit of the
               spatially-tiled full-resolution job.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_clim.py [clim_240|clim_0p25_tile ...]
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/wb2_jax_compile_cache"
)
CACHE = os.environ.get("WB2_CLIM_CACHE", "/tmp/wb2_clim_bench")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen(tag, res_deg, lat_rows=None):
  from weatherbench2_tpu import schema
  from tools.north_star import write_pool_random

  os.makedirs(CACHE, exist_ok=True)
  path = os.path.join(CACHE, f"input_{tag}.zarr")
  ds = schema.mock_truth_data(
      variables_3d=[],
      variables_2d=["2m_temperature", "total_precipitation_6hr"],
      time_start="1990-01-01", time_stop="2020-01-01",
      time_resolution="6 hours",
      spatial_resolution_in_degrees=res_deg,
  )
  if lat_rows is not None:
    ds = ds.isel(latitude=slice(0, lat_rows))
  t0 = time.perf_counter()
  write_pool_random(ds, path, {"time": 256}, {"time": 256})
  gen_s = time.perf_counter() - t0
  nbytes = sum(4 * v.size for v in ds.variables_dict().values())
  return path, nbytes, gen_s


def run(tag, res_deg, lat_rows=None):
  path, nbytes, gen_s = _gen(tag, res_deg, lat_rows)
  out = os.path.join(CACHE, f"clim_{tag}.zarr")
  env = {
      **os.environ,
      "PYTHONPATH": f"{REPO}:/root/.axon_site",
      "WB2_ZARR_COMPRESSOR": "none",
  }
  cmd = [
      sys.executable, os.path.join(REPO, "scripts/compute_climatology.py"),
      f"--input_path={path}", f"--output_path={out}",
      "--statistics=mean,std,quantile,seeps",
      "--quantiles=0.1,0.9",
      "--hour_interval=6", "--window_size=61",
      "--start_year=1990", "--end_year=2019",
      "--use_device",
      "--working_chunks=longitude=48",
  ]
  start = time.perf_counter()
  proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
  wall = time.perf_counter() - start
  if proc.returncode != 0:
    print(proc.stderr[-3000:], file=sys.stderr)
    raise SystemExit(f"{tag} failed rc={proc.returncode}")
  gib = nbytes / 2**30
  print(json.dumps({
      "workload": tag,
      "seconds": round(wall, 1),
      "input_gib": round(gib, 2),
      "gib_per_s": round(gib / wall, 3),
      "datagen_s": round(gen_s, 1),
  }), flush=True)


WORKLOADS = {
    "clim_240": dict(res_deg=1.5),
    "clim_0p25_tile": dict(res_deg=0.25, lat_rows=103),
}


if __name__ == "__main__":
  names = sys.argv[1:] or list(WORKLOADS)
  for name in names:
    run(name, **WORKLOADS[name])
