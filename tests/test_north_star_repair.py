"""Round-4: repair passes (--pass-id >= 2 with no --seg) re-run only
segments whose persisted results are missing or NaN-poisoned, instead of
re-measuring the whole year (the round-3 det2 store-corruption fix must
not cost 12 months of tunnel budget when 6 persisted months are clean)."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

import north_star  # noqa: E402

from weatherbench2_tpu import xds  # noqa: E402


def _write_result(path, poison_nan=False):
  os.makedirs(os.path.dirname(path), exist_ok=True)
  data = np.arange(12, dtype=np.float32).reshape(3, 4)
  if poison_nan:
    data = data.copy()
    data[1, 2] = np.nan
  ds = xds.Dataset(
      {"acc.z500": xds.Variable(("lead_time", "region"), data)},
      coords={
          "lead_time": xds.Variable(
              ("lead_time",), np.arange(3, dtype=np.int64)),
          "region": xds.Variable(("region",), np.arange(4, dtype=np.int64)),
      },
  )
  xds.to_netcdf(ds, path)


@pytest.fixture()
def seg_layout(tmp_path, monkeypatch):
  segdir = tmp_path / "segments"
  cache = tmp_path / "cache"
  monkeypatch.setattr(north_star, "SEGDIR", str(segdir))
  monkeypatch.setattr(north_star, "CACHE", str(cache))
  wl = "det2_0p25"
  # months 01..03: healthy persisted, NaN-poisoned, missing
  _write_result(str(segdir / wl / "2020-01" / "deterministic.nc"))
  _write_result(str(segdir / wl / "2020-02" / "deterministic.nc"),
                poison_nan=True)
  return wl


def test_segment_health(seg_layout):
  wl = seg_layout
  assert north_star._segment_health(wl, "2020-01") == "ok"
  assert north_star._segment_health(wl, "2020-02").startswith("nan:")
  assert north_star._segment_health(wl, "2020-03") == "missing"


def test_repair_pass_targets_unhealthy_months_only(seg_layout, capsys):
  wl = seg_layout
  segs = north_star._repair_segments(wl, pass_id=2)
  # month 01 is healthy and skipped; 02 (NaN) and 03..12 (missing) run
  assert "2020-01" not in segs
  assert segs[0] == "2020-02"
  assert segs == [f"2020-{m:02d}" for m in range(2, 13)]
  out = capsys.readouterr().out
  assert "skip 2020-01" in out
  # the health string carries the audit detail after the variable name
  # (e.g. "nan:deterministic.nc:acc.z500: 8.3% NaN (none allowed)")
  assert "needs repair (nan:deterministic.nc:acc.z500" in out


def test_repair_pass_all_healthy_runs_nothing(tmp_path, monkeypatch,
                                              capsys):
  segdir = tmp_path / "segments"
  monkeypatch.setattr(north_star, "SEGDIR", str(segdir))
  monkeypatch.setattr(north_star, "CACHE", str(tmp_path / "cache"))
  wl = "det2_0p25"
  for m in range(1, 13):
    _write_result(str(segdir / wl / f"2020-{m:02d}" / "deterministic.nc"))
  # run() with a repair pass and everything healthy must return before
  # touching the workload function (which would start datagen)
  monkeypatch.setitem(north_star.WORKLOADS, wl,
                      lambda seg: pytest.fail("workload ran"))
  north_star.run(wl, segments=None, pass_id=2)
  assert "all segments healthy" in capsys.readouterr().out
