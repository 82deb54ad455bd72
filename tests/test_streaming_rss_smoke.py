"""Default-tier RSS smoke for the streaming transform CLIs.

The full peak-RSS tier (test_streaming_scale*.py) is `-m scale` and
excluded from the default gate, so a host-memory regression in the
transform CLIs (e.g. a block-size bump interacting with to_device's
host-copy + device-buffer residency) could merge unnoticed (round-4
advisor finding).  This is the small always-on guard: a ~100 MB input
streamed at a pinned 8 MB block budget through a to_device CLI must
stay well under whole-array residency.  Runtime target: tens of
seconds, cheap enough for every gate run.
"""
import os

import numpy as np
import pytest

from weatherbench2_tpu import xds
from tests import test_streaming_scale as scale

REPO = os.path.join(os.path.dirname(__file__), "..")

# ~100 MB of float32 (time=400, lat=181, lon=360)
N_TIME, N_LAT, N_LON = 400, 181, 360
INPUT_BYTES = N_TIME * N_LAT * N_LON * 4


@pytest.fixture(scope="module")
def smoke_input(tmp_path_factory):
  path = str(tmp_path_factory.mktemp("rss_smoke") / "smoke.zarr")
  times = (np.datetime64("2019-01-01", "ns")
           + np.arange(N_TIME) * np.timedelta64(6, "h"))
  template = xds.Dataset(
      {"temperature": xds.stub_variable(
          ("time", "latitude", "longitude"),
          {"time": N_TIME, "latitude": N_LAT, "longitude": N_LON},
          np.float32)},
      coords={
          "time": xds.Variable(("time",), times),
          "latitude": np.linspace(-90, 90, N_LAT),
          "longitude": np.arange(0, 360, 360 / N_LON),
      },
  )
  writer = xds.RegionWriter(path, template, chunks={"time": 50})
  lat = np.linspace(-1, 1, N_LAT, dtype=np.float32)[None, :, None]
  lon = np.linspace(0, 2, N_LON, dtype=np.float32)[None, None, :]
  for start in range(0, N_TIME, 50):
    n = min(50, N_TIME - start)
    t = np.arange(start, start + n, dtype=np.float32)[:, None, None]
    block = np.sin(t / 17.0) + lat * lon
    writer.write_array(
        "temperature",
        (slice(start, start + n), slice(None), slice(None)),
        np.broadcast_to(block, (n, N_LAT, N_LON)).astype(np.float32),
    )
  writer.finish()
  return path


def _jax_baseline_rss(tmp_path) -> int:
  """Baseline RSS including jax + an initialized cpu backend: the scale
  tier's baseline omits jax (its CLIs never import it), but a to_device
  CLI pays ~100 MiB of backend residency that is not a streaming leak."""
  import subprocess
  import sys
  import textwrap

  env = dict(os.environ)
  env["PYTHONPATH"] = REPO
  env["JAX_PLATFORMS"] = "cpu"
  with scale.rss_measurement_lock():
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent("""
            import resource
            from weatherbench2_tpu import utils, xds, flag_utils  # noqa
            import pandas  # noqa
            import jax, jax.numpy as jnp
            jnp.zeros(8).block_until_ready()  # init cpu backend
            print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
        """)],
        capture_output=True, text=True, env=env, timeout=120,
    )
  assert proc.returncode == 0, proc.stderr[-2000:]
  return int(proc.stdout.strip()) * 1024


def test_device_transform_cli_bounded_rss_smoke(smoke_input, tmp_path,
                                                monkeypatch):
  """Spectra CLI (a to_device block streamer) at an 8 MB block budget
  must hold peak RSS far below baseline + whole-input residency."""
  out = str(tmp_path / "spectra.zarr")
  # pin a small block so the bound asserts STREAMING, not luck; the CLI
  # holds one host block + one device copy (jax-cpu: another host
  # buffer) + accumulator — a few block-sizes, never the whole array
  monkeypatch.setenv("WB2_BLOCK_BYTES", str(8 * 2**20))
  peak = scale._run_cli(
      "compute_zonal_energy_spectrum.py",
      [f"--input_path={smoke_input}", f"--output_path={out}",
       "--base_variables=temperature",
       "--time_start=2019-01-01", "--time_stop=2019-06-01",
       "--averaging_dims=time"],
      tmp_path,
  )
  base = _jax_baseline_rss(tmp_path)
  # measured legitimate footprint: ~60 MiB over baseline (a few 8 MB
  # blocks host+device + XLA compile workspace).  A whole-array
  # regression (input + device copy resident) lands at base + ~200 MiB;
  # 3/4-input keeps a real gap on both sides.
  budget = base + 3 * INPUT_BYTES // 4
  assert peak < budget, (
      f"peak RSS {peak/2**20:.0f} MiB exceeds smoke budget "
      f"{budget/2**20:.0f} MiB (baseline {base/2**20:.0f} MiB, "
      f"input {INPUT_BYTES/2**20:.0f} MiB) — streaming residency "
      f"regressed"
  )
  res = xds.open_zarr(out)
  assert "zonal_wavenumber" in res.sizes
