"""Round-5 regression: the structural-NaN audit gate.

The live incident this pins: two north_star drivers ran the same
official13_0p25 segment (2020-01-26:2020-02-01) concurrently; driver
A's post-success store cleanup deleted the zarr inputs driver B's eval
was still reading.  Zarr serves missing chunk files as fill-value NaN,
the masked accumulators saw count=0, and B's result silently lost 14 of
21 leads — yet passed the then-current sanity guard (which only caught
fully all-NaN VARIABLES) and entered the record as "ok".

Three defenses are pinned here:

* ``tools/audit_results.audit_file`` — the structural model: SEEPS is
  defined only for 24h precipitation, vector errors only for MSE
  (reference weatherbench2/metrics.py SEEPS/WindVectorMSE semantics),
  everything else must be NaN-free;
* ``north_star._check_result_sanity`` refuses to record a segment whose
  result fails that audit;
* ``north_star.combine`` refuses to combine over an unhealthy segment,
  and ``north_star._acquire_driver_lock`` serializes whole driver
  invocations so the corruption cannot recur.
"""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from weatherbench2_tpu import xds

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(REPO, "tools"))

import audit_results  # noqa: E402
import north_star  # noqa: E402

_METRICS = ["mse", "acc", "bias", "mae", "seeps_24hr"]
_VARS = ["2m_temperature", "total_precipitation_24hr", "wind_vector"]


def _official_shaped(poison=None, finite_structural=False):
  """A tiny official13-shaped result: (metric, region, lead_time)."""
  rng = np.random.default_rng(0)
  n_reg, n_lead = 3, 6
  ds_vars = {}
  for var in _VARS:
    a = rng.standard_normal((len(_METRICS), n_reg, n_lead)).astype(
        np.float32)
    for i, m in enumerate(_METRICS):
      if audit_results._expected_all_nan(var, m):
        a[i] = np.nan
    ds_vars[var] = xds.Variable(("metric", "region", "lead_time"), a)
  if poison is not None:
    var, mi, lead = poison
    arr = ds_vars[var].data.copy()
    arr[mi, :, lead] = np.nan
    ds_vars[var] = xds.Variable(("metric", "region", "lead_time"), arr)
  if finite_structural:
    arr = ds_vars["wind_vector"].data.copy()
    arr[_METRICS.index("acc"), 0, 0] = 1.0  # finite in an undefined slice
    ds_vars["wind_vector"] = xds.Variable(
        ("metric", "region", "lead_time"), arr)
  return xds.Dataset(
      ds_vars,
      coords={
          "metric": np.asarray(_METRICS, dtype=object),
          "region": np.asarray(["global", "tropics", "extra"],
                               dtype=object),
          "lead_time": np.arange(n_lead),
      },
  )


def test_audit_clean_structural_passes(tmp_path):
  p = str(tmp_path / "clean.nc")
  xds.to_netcdf(_official_shaped(), p)
  assert audit_results.audit_file(p) == []


def test_audit_catches_partial_nan_in_defined_slice(tmp_path):
  # the incident signature: later leads NaN, early leads intact
  p = str(tmp_path / "poisoned.nc")
  xds.to_netcdf(
      _official_shaped(poison=("2m_temperature", _METRICS.index("mse"), 4)),
      p)
  violations = audit_results.audit_file(p)
  assert violations and "2m_temperature[mse]" in violations[0]


def test_audit_catches_finite_value_in_structural_slice(tmp_path):
  p = str(tmp_path / "misindexed.nc")
  xds.to_netcdf(_official_shaped(finite_structural=True), p)
  violations = audit_results.audit_file(p)
  assert violations and "wind_vector[acc]" in violations[0]


def test_audit_no_metric_dim_disallows_any_nan(tmp_path):
  a = np.ones((4, 5), dtype=np.float32)
  a[1, 2] = np.nan
  ds = xds.Dataset(
      {"x": xds.Variable(("a", "b"), a)},
      coords={"a": np.arange(4), "b": np.arange(5)},
  )
  p = str(tmp_path / "plain.nc")
  xds.to_netcdf(ds, p)
  violations = audit_results.audit_file(p)
  assert violations and "x" in violations[0]


def test_check_result_sanity_refuses_poisoned_result(tmp_path):
  d = tmp_path / "seg"
  d.mkdir()
  bad = str(d / "deterministic.nc")
  xds.to_netcdf(
      _official_shaped(poison=("2m_temperature", _METRICS.index("acc"), 3)),
      bad)
  with pytest.raises(RuntimeError, match="structural-NaN audit"):
    north_star._check_result_sanity({"result": bad})
  # and a clean result passes — including one with structural NaN
  ok = str(d / "deterministic.nc")
  xds.to_netcdf(_official_shaped(), ok)
  north_star._check_result_sanity({"result": ok})


def test_combine_refuses_unhealthy_segment(tmp_path, monkeypatch):
  segdir = tmp_path / "segments"
  results = tmp_path / "rows.jsonl"
  seg = "2020-01-26:2020-02-01"
  d = segdir / "official13_0p25" / seg
  d.mkdir(parents=True)
  xds.to_netcdf(
      _official_shaped(poison=("2m_temperature", _METRICS.index("mse"), 5)),
      str(d / "deterministic.nc"))
  results.write_text(
      '{"workload": "official13_0p25", "segment": "%s", '
      '"status": "ok", "wall_s": 1.0, "input_gib": 1.0, '
      '"datagen_s": 0.0}\n' % seg)
  monkeypatch.setattr(north_star, "SEGDIR", str(segdir))
  monkeypatch.setattr(north_star, "RESULTS", str(results))
  with pytest.raises(SystemExit, match="refusing to combine"):
    north_star.combine("official13_0p25", expect_segments=1)


def test_driver_lock_serializes_concurrent_drivers(tmp_path):
  cache = tmp_path / "cache"
  cache.mkdir()
  lock_path = cache / ".driver.lock"
  holder = subprocess.Popen([
      sys.executable, "-c",
      "import fcntl, sys, time\n"
      f"fh = open({str(lock_path)!r}, 'w')\n"
      "fcntl.flock(fh, fcntl.LOCK_EX)\n"
      "print('held', flush=True)\n"
      # long enough to cover the driver's interpreter+import startup on
      # a loaded single-core box; the driver blocks only for the residue
      "time.sleep(12)\n",
  ], stdout=subprocess.PIPE, text=True)
  assert holder.stdout.readline().strip() == "held"
  env = dict(os.environ)
  env.update({
      "WB2_NS_RES": "4",
      "WB2_NORTHSTAR_CACHE": str(cache),
      "WB2_NORTHSTAR_RESULTS": str(tmp_path / "rows.jsonl"),
  })
  (tmp_path / "rows.jsonl").write_text("")
  t0 = time.monotonic()
  # a repair pass over an empty ledger: exits right after the lock
  out = subprocess.run(
      [sys.executable, os.path.join(REPO, "tools", "north_star.py"),
       "run", "det2_0p25", "--pass-id", "2"],
      env=env, capture_output=True, text=True, timeout=120)
  elapsed = time.monotonic() - t0
  holder.wait()
  assert out.returncode == 0, out.stderr
  assert "waiting for the concurrent north_star driver" in out.stdout
  assert elapsed >= 1.0  # actually blocked until the holder released
