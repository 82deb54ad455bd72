"""Peak-RSS bounds for the heavyweight CLIs (round-3 coverage).

Extends tests/test_streaming_scale.py's subprocess-RSS pattern to the
evaluation path and the heavy transform pipelines: each test builds an
input meaningfully larger than the streaming budget, runs the real CLI
in a child process, and asserts the child's peak RSS stays bounded —
the property the reference gets from Beam's chunk streaming
(/root/reference/docs/source/official-evaluation.md:546 protocol).
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from weatherbench2_tpu import schema, xds

from .test_streaming_scale import (
    _RUNNER, _baseline_rss, rss_measurement_lock,
)

# scale tier: excluded from the default gate; serialized RSS measurement
pytestmark = pytest.mark.scale

REPO = os.path.join(os.path.dirname(__file__), "..")

N_LAT, N_LON = 36, 72  # 5 degrees


def _run_cli(script: str, args: list, tmp_path, extra_env=None,
             timeout=420) -> int:
  env = dict(os.environ)
  env["PYTHONPATH"] = REPO
  env["JAX_PLATFORMS"] = "cpu"
  env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/wb2_jax_cpu_compile_cache"
  # conftest's 8-virtual-device XLA_FLAGS would leak into the child and
  # make the mesh engine shard 8 ways on one core (8x compile + slow
  # execution); these tests assert MEMORY, not sharding
  env.pop("XLA_FLAGS", None)
  env.update(extra_env or {})
  runner = str(tmp_path / "_runner.py")
  with open(runner, "w") as f:
    f.write(_RUNNER)
  with rss_measurement_lock():
    proc = subprocess.run(
        [sys.executable, runner, os.path.join(REPO, "scripts", script)]
        + args,
        capture_output=True, text=True, env=env, timeout=timeout,
    )
  assert proc.returncode == 0, proc.stderr[-4000:]
  for line in proc.stderr.splitlines():
    if line.startswith("PEAK_RSS_KB"):
      return int(line.split()[1]) * 1024
  raise AssertionError("peak RSS line not found:\n" + proc.stderr[-2000:])


def _peaks_with_retry(measures, budget):
  """measures: {tag: zero-arg callable -> peak bytes}, insertion-ordered
  small to large.  If the (largest - smallest) delta exceeds ``budget``,
  re-measure every tag once and keep the per-tag minima: subprocess
  peak-RSS is inflated one-sidedly by concurrent system load (page-cache
  pressure, CPU contention stretching allocator growth), so a genuine
  leak reproduces across re-measurement while load noise does not."""
  tags = list(measures)
  peaks = {t: measures[t]() for t in tags}
  if peaks[tags[-1]] - peaks[tags[0]] >= budget:
    for t in tags:
      peaks[t] = min(peaks[t], measures[t]())
  return peaks


def _write_patterned(ds, path, chunks, seed=0):
  """Fill ds's shape with a cheap deterministic pattern, stream-written."""
  template = xds.Dataset(
      {k: xds.stub_variable(v.dims, v.sizes, np.float32)
       for k, v in ds.variables_dict().items()},
      coords=dict(ds.coords_dict()),
  )
  writer = xds.RegionWriter(path, template, chunks=chunks)
  rng = np.random.default_rng(seed)
  pool = rng.standard_normal(1 << 22).astype(np.float32)
  for name, v in ds.variables_dict().items():
    stream_dim = next(
        (d for d in v.dims if d in chunks), v.dims[0]
    )
    n = v.sizes[stream_dim]
    step = max(1, chunks.get(stream_dim, n))
    while step > 1 and (v.size // n) * step > pool.size:
      step //= 2
    for start in range(0, n, step):
      stop = min(start + step, n)
      shape = [(stop - start) if d == stream_dim else v.sizes[d]
               for d in v.dims]
      cells = int(np.prod(shape))
      o = int(rng.integers(0, pool.size - cells + 1))
      writer.write_array(
          name,
          tuple(slice(start, stop) if d == stream_dim else slice(None)
                for d in v.dims),
          pool[o:o + cells].reshape(shape),
      )
  writer.finish()


def _forecast_truth_specs(suffixed=False):
  if suffixed:
    variables_2d = ["geopotential_500", "geopotential_700",
                    "2m_temperature"]
    variables_3d = []
  else:
    variables_2d = ["2m_temperature"]
    variables_3d = ["geopotential"]
  return dict(
      variables_3d=variables_3d,
      variables_2d=variables_2d,
      levels=(500, 700),
      spatial_resolution_in_degrees=5.0,
  )


def _build_eval_inputs(tmp_path, suffixed=False):
  specs = _forecast_truth_specs(suffixed)
  # only the FORECAST carries suffixed names (the reference decode
  # applies to the forecast store; truth/climatology have level dims)
  truth = schema.mock_truth_data(
      time_start="2020-01-01", time_stop="2020-06-15",
      time_resolution="6 hours", **_forecast_truth_specs(False),
  )
  forecast = schema.mock_forecast_data(
      time_start="2020-01-01", time_stop="2020-06-01",
      time_resolution="12 hours",
      lead_start="0 days", lead_stop="10 days",
      lead_resolution="12 hours",
      **specs,
  )
  clim = schema.mock_hourly_climatology_data(
      hour_interval=12, **{**_forecast_truth_specs(), "levels": (500, 700)}
  )
  tag = "sfx" if suffixed else "std"
  tp = str(tmp_path / f"truth_{tag}.zarr")
  fp = str(tmp_path / f"forecast_{tag}.zarr")
  cp = str(tmp_path / f"clim_{tag}.zarr")
  _write_patterned(truth, tp, {"time": 64}, seed=1)
  _write_patterned(forecast, fp, {"time": 4}, seed=2)
  _write_patterned(clim, cp, {"dayofyear": 46}, seed=6)
  fc_bytes = sum(4 * v.size for v in forecast.variables_dict().values())
  return tp, fp, cp, fc_bytes


def _eval_cli_args(tp, fp, cp, out_dir, stop, extra=()):
  return [
      f"--forecast_path={fp}", f"--obs_path={tp}",
      f"--climatology_path={cp}", f"--output_dir={out_dir}",
      "--eval_configs=deterministic", "--use_mesh",
      "--variables=geopotential,2m_temperature", "--levels=500,700",
      "--time_start=2020-01-01", f"--time_stop={stop}",
      "--input_chunks=init_time=16", *extra,
  ]


@pytest.fixture(scope="module")
def eval_inputs(tmp_path_factory):
  return _build_eval_inputs(tmp_path_factory.mktemp("evalin"))


def test_evaluate_use_mesh_rss_flat_in_input(tmp_path, eval_inputs):
  """The flagship CLI must stream: peak RSS may NOT grow with the
  evaluated span (the reference gets this from --input_chunks=init_time=1
  Beam streaming).  Evaluating 2.5x the inits must add only a small
  fraction of the extra bytes."""
  tp, fp, cp, fc_bytes = eval_inputs
  extra_bytes = fc_bytes * (5 - 2) / 5.0
  peaks = _peaks_with_retry({
      "2mo": lambda: _run_cli(
          "evaluate.py",
          _eval_cli_args(tp, fp, cp, tmp_path / "out2", "2020-02-28"),
          tmp_path, timeout=600),
      "5mo": lambda: _run_cli(
          "evaluate.py",
          _eval_cli_args(tp, fp, cp, tmp_path / "out5", "2020-05-30"),
          tmp_path, timeout=600),
  }, 0.4 * extra_bytes)
  peak2, peak5 = peaks["2mo"], peaks["5mo"]
  assert peak5 - peak2 < 0.4 * extra_bytes, (
      f"peak RSS grew {max(0, peak5 - peak2)/2**20:.0f} MiB for "
      f"{extra_bytes/2**20:.0f} MiB more input "
      f"(peaks {peak2/2**20:.0f} -> {peak5/2**20:.0f} MiB)"
  )
  res = xds.open_netcdf(str(tmp_path / "out5" / "deterministic.nc"))
  vals = np.asarray(res["2m_temperature"].values)
  assert np.isfinite(vals).all()


def test_evaluate_suffixed_store_rss_flat_in_input(tmp_path):
  """pressure_level_suffixes decode must stay lazy end to end
  (round-2 gap: suffixed stores opened eagerly into host RAM)."""
  tp, fp, cp, fc_bytes = _build_eval_inputs(tmp_path, suffixed=True)
  extra = ("--pressure_level_suffixes",)
  extra_bytes = fc_bytes * (5 - 2) / 5.0
  peaks = _peaks_with_retry({
      "2mo": lambda: _run_cli(
          "evaluate.py",
          _eval_cli_args(tp, fp, cp, tmp_path / "o2", "2020-02-28", extra),
          tmp_path, timeout=600),
      "5mo": lambda: _run_cli(
          "evaluate.py",
          _eval_cli_args(tp, fp, cp, tmp_path / "o5", "2020-05-30", extra),
          tmp_path, timeout=600),
  }, 0.4 * extra_bytes)
  peak2, peak5 = peaks["2mo"], peaks["5mo"]
  assert peak5 - peak2 < 0.4 * extra_bytes, (
      f"peak RSS grew {max(0, peak5 - peak2)/2**20:.0f} MiB for "
      f"{extra_bytes/2**20:.0f} MiB more suffixed input "
      f"(peaks {peak2/2**20:.0f} -> {peak5/2**20:.0f} MiB)"
  )
  res = xds.open_netcdf(str(tmp_path / "o5" / "deterministic.nc"))
  assert "level" in res["geopotential"].dims


def test_evaluate_rss_flat_in_climatology(tmp_path):
  """A climatology over the device budget must neither load into RAM at
  open (lazy CLI open) nor ship whole to the device (host-gather dedup):
  a 12x larger climatology may not add a comparable RSS delta."""
  specs = _forecast_truth_specs()
  truth = schema.mock_truth_data(
      time_start="2020-01-01", time_stop="2020-02-15",
      time_resolution="6 hours", **specs,
  )
  forecast = schema.mock_forecast_data(
      time_start="2020-01-01", time_stop="2020-02-01",
      time_resolution="12 hours",
      lead_start="0 days", lead_stop="5 days", lead_resolution="12 hours",
      **specs,
  )
  tp = str(tmp_path / "truth.zarr")
  fp = str(tmp_path / "forecast.zarr")
  _write_patterned(truth, tp, {"time": 64}, seed=3)
  _write_patterned(forecast, fp, {"time": 4}, seed=4)
  clim_bytes = {}
  clim_paths = {}
  for hour_interval in (12, 1):
    clim = schema.mock_hourly_climatology_data(
        hour_interval=hour_interval, **specs
    )
    cp = str(tmp_path / f"clim{hour_interval}.zarr")
    _write_patterned(clim, cp, {"dayofyear": 12}, seed=5)
    clim_paths[hour_interval] = cp
    clim_bytes[hour_interval] = sum(
        4 * v.size for v in clim.variables_dict().values()
    )

  def _measure(hour_interval):
    return _run_cli(
        "evaluate.py",
        [f"--forecast_path={fp}", f"--obs_path={tp}",
         f"--climatology_path={clim_paths[hour_interval]}",
         f"--output_dir={tmp_path / ('outc%d' % hour_interval)}",
         "--eval_configs=deterministic", "--use_mesh",
         "--variables=geopotential,2m_temperature", "--levels=500,700",
         "--time_start=2020-01-01", "--time_stop=2020-02-28",
         "--input_chunks=init_time=16"],
        tmp_path,
        # force ACC's host-gather fallback (the 0.25-degree regime)
        extra_env={"WB2_CLIM_DEVICE_BYTES": "1000000"},
        timeout=600,
    )

  grown = clim_bytes[1] - clim_bytes[12]
  peaks = _peaks_with_retry(
      {12: lambda: _measure(12), 1: lambda: _measure(1)}, 0.4 * grown)
  assert grown > 200e6
  assert peaks[1] - peaks[12] < 0.4 * grown, (
      f"peak RSS grew {max(0, peaks[1] - peaks[12])/2**20:.0f} MiB for a "
      f"{grown/2**20:.0f} MiB larger climatology "
      f"(peaks {peaks[12]/2**20:.0f} -> {peaks[1]/2**20:.0f} MiB)"
  )
  res = xds.open_netcdf(str(tmp_path / "outc1" / "deterministic.nc"))
  acc = np.asarray(res["2m_temperature"].sel(metric="acc").values)
  assert np.isfinite(acc).all()


@pytest.fixture(scope="module")
def big_series(tmp_path_factory):
  """~500 MB single-variable 6-hourly series at 1 degree."""
  path = str(tmp_path_factory.mktemp("scale3") / "series.zarr")
  ds = schema.mock_truth_data(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2019-01-01", time_stop="2021-01-01",
      time_resolution="6 hours",
      spatial_resolution_in_degrees=1.0,
  )
  _write_patterned(ds, path, {"time": 32}, seed=7)
  nbytes = sum(4 * v.size for v in ds.variables_dict().values())
  return path, nbytes


def test_regrid_bounded_rss(big_series, tmp_path):
  path, nbytes = big_series
  assert nbytes > 450e6
  # tiny-run baseline: same CLI on a 20-step slice (jax import + compile)
  tiny = schema.mock_truth_data(
      variables_3d=[], variables_2d=["2m_temperature"],
      time_start="2019-01-01", time_stop="2019-01-06",
      time_resolution="6 hours", spatial_resolution_in_degrees=1.0,
  )
  tiny_path = str(tmp_path / "tiny.zarr")
  _write_patterned(tiny, tiny_path, {"time": 32}, seed=8)
  base = _run_cli(
      "regrid.py",
      [f"--input_path={tiny_path}",
       f"--output_path={tmp_path / 'tiny_out.zarr'}",
       "--latitude_nodes=37", "--longitude_nodes=72",
       "--regridding_method=conservative", "--time_chunk_size=32"],
      tmp_path, timeout=600,
  )
  out = str(tmp_path / "regridded.zarr")
  peak = _run_cli(
      "regrid.py",
      [f"--input_path={path}", f"--output_path={out}",
       "--latitude_nodes=37", "--longitude_nodes=72",
       "--regridding_method=conservative", "--time_chunk_size=32"],
      tmp_path, timeout=600,
  )
  budget = base + int(nbytes * 0.4)
  assert peak < budget, (
      f"peak RSS {peak/2**20:.0f} MiB exceeds budget "
      f"{budget/2**20:.0f} MiB (baseline {base/2**20:.0f} MiB)"
  )
  res = xds.open_zarr(out)
  assert res.sizes["longitude"] == 72


def test_compute_climatology_rss_flat_in_input(big_series, tmp_path):
  """The device climatology pipeline must stream longitude pencils:
  doubling the input years may only add a small fraction of the extra
  bytes to peak RSS (the jax CPU arena contributes a large constant)."""
  del big_series  # the 3y/1y pair below gives a wider, noise-proof delta
  stores = {}
  sizes = {}
  for tag, stop in (("1y", "2020-01-01"), ("3y", "2022-01-01")):
    ds = schema.mock_truth_data(
        variables_3d=[], variables_2d=["2m_temperature"],
        time_start="2019-01-01", time_stop=stop,
        time_resolution="6 hours",
        spatial_resolution_in_degrees=1.0,
    )
    stores[tag] = str(tmp_path / f"series{tag}.zarr")
    _write_patterned(ds, stores[tag], {"time": 32}, seed=7)
    sizes[tag] = sum(4 * v.size for v in ds.variables_dict().values())
  nbytes1, nbytes2 = sizes["1y"], sizes["3y"]

  def _measure(tag, path):
    return _run_cli(
        "compute_climatology.py",
        [f"--input_path={path}",
         f"--output_path={tmp_path / ('clim_' + tag + '.zarr')}",
         "--statistics=mean,std", "--hour_interval=6",
         "--use_device", "--working_chunks=longitude=60",
         "--start_year=2019", "--end_year=2021"],
        tmp_path, timeout=600,
    )

  extra = nbytes2 - nbytes1
  peaks = _peaks_with_retry({
      "1y": lambda: _measure("1y", stores["1y"]),
      "2y": lambda: _measure("2y", stores["3y"]),
  }, 0.6 * extra)
  assert extra > 600e6
  assert peaks["2y"] - peaks["1y"] < 0.6 * extra, (
      f"peak RSS grew {max(0, peaks['2y'] - peaks['1y'])/2**20:.0f} MiB "
      f"for {extra/2**20:.0f} MiB more input "
      f"(peaks {peaks['1y']/2**20:.0f} -> {peaks['2y']/2**20:.0f} MiB)"
  )
  res = xds.open_zarr(str(tmp_path / "clim_2y.zarr"))
  assert "2m_temperature" in res or "2m_temperature_mean" in res


def test_prob_clim_forecasts_bounded_rss(big_series, tmp_path):
  path, nbytes = big_series
  out = str(tmp_path / "probfc.zarr")
  peak = _run_cli(
      "compute_probabilistic_climatological_forecasts.py",
      [f"--input_path={path}", f"--output_path={out}",
       "--ensemble_size=4",
       "--initial_time_start=2020-06-01",
       "--initial_time_end=2020-06-20",
       "--initial_time_spacing=1d",
       "--forecast_duration=3d", "--timedelta_spacing=1d",
       "--day_window_size=10",
       "--climatology_start_year=2019",
       "--climatology_end_year=2020"],
      tmp_path, timeout=600,
  )
  base = _baseline_rss(tmp_path)
  budget = base + int(nbytes * 0.4)
  assert peak < budget, (
      f"peak RSS {peak/2**20:.0f} MiB exceeds budget "
      f"{budget/2**20:.0f} MiB (baseline {base/2**20:.0f} MiB)"
  )
  res = xds.open_zarr(out)
  assert res.sizes["realization"] == 4


def test_index_on_valid_time_rss_flat_in_input(tmp_path):
  """(init, lead) -> (valid, lead) realignment must stream valid-time
  blocks: doubling the input span must not add a comparable RSS delta
  (block size pinned so both runs use identical windows)."""
  peaks = {}
  sizes = {}
  for tag, stop in (("3mo", "2020-04-01"), ("12mo", "2021-01-01")):
    fc = schema.mock_forecast_data(
        variables_3d=[], variables_2d=["2m_temperature"],
        time_start="2020-01-01", time_stop=stop,
        time_resolution="12 hours",
        lead_start="0 days", lead_stop="5 days",
        lead_resolution="12 hours",
        spatial_resolution_in_degrees=2.0,
    )
    sizes[tag] = sum(4 * v.size for v in fc.variables_dict().values())
    path = str(tmp_path / f"by_init_{tag}.zarr")
    _write_patterned(fc, path, {"time": 8}, seed=9)
    peaks[tag] = _run_cli(
        "index_on_valid_time.py",
        [f"--input_path={path}",
         f"--output_path={tmp_path / ('by_valid_' + tag + '.zarr')}"],
        tmp_path, timeout=600,
        extra_env={"WB2_BLOCK_BYTES": "16000000"},
    )
  extra = sizes["12mo"] - sizes["3mo"]
  assert extra > 300e6
  # allocator/tensorstore constants saturate around ~250 MiB (measured
  # 3/6/12-month curve: 452 -> 605 -> 693 MiB); real whole-input
  # buffering would add >= 1.0x the extra bytes
  assert peaks["12mo"] - peaks["3mo"] < 0.75 * extra, (
      f"peak RSS grew {max(0, peaks['12mo'] - peaks['3mo'])/2**20:.0f} MiB "
      f"for {extra/2**20:.0f} MiB more input "
      f"(peaks {peaks['3mo']/2**20:.0f} -> {peaks['12mo']/2**20:.0f} MiB)"
  )
  res = xds.open_zarr(str(tmp_path / "by_valid_12mo.zarr"))
  assert "time" in res.sizes
