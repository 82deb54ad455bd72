"""NaN audit of every committed north-star artifact under results/.

The round-3 data-integrity incident (a chain kill mid-datagen poisoned a
det2 month and the combined year shipped with 19% NaN geopotential ACC —
NORTHSTAR.md "Data-integrity audit") set the standard this enforces: a
committed artifact may carry ONLY structural NaN, i.e. cells where the
metric is undefined by protocol, mirroring the reference's semantics:

  * SEEPS is defined only for 24h precipitation (reference
    metrics.py SEEPS: per-station climatology thresholds exist only for
    precip) -> `seeps_24hr` must be ALL-NaN for every other variable and
    NaN-free for `total_precipitation_24hr`.
  * Vector errors define only MSE (reference metrics.py
    WindVectorMSE) -> `*wind_vector*` variables must be ALL-NaN on
    every metric except `mse`.
  * Everything else (deterministic stats, the CRPS family, Brier /
    ignorance, spectra, climatology stats): NaN-free, full stop.

A structural slice that is PARTIALLY NaN is also a failure: poisoning
shows up exactly as a defined cell going NaN or an undefined slice
gaining finite values (a mis-indexed write).

Usage: python tools/audit_results.py [results_dir]
Exit status 0 = every artifact clean; 1 = violations (listed).
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO, "/root/.axon_site"):
  if os.path.isdir(_p) and _p not in sys.path:
    sys.path.insert(0, _p)

import numpy as np


def _expected_all_nan(var_name, metric_name):
  """True if (variable, metric) is a protocol-undefined (structural)
  slice that must be ALL-NaN."""
  if metric_name == "seeps_24hr":
    return var_name != "total_precipitation_24hr"
  if "wind_vector" in var_name:
    return metric_name != "mse"
  return False


def audit_file(path):
  """Returns a list of violation strings (empty = clean)."""
  from weatherbench2_tpu import xds

  if path.endswith(".nc"):
    ds = xds.open_netcdf(path)
  else:
    ds = xds.open_zarr(path)
  violations = []
  coords = ds.coords_dict()
  metrics = (
      [str(x) for x in np.asarray(coords["metric"].data)]
      if "metric" in coords else None
  )
  for name, v in ds.variables_dict().items():
    arr = np.asarray(v.data, dtype=np.float64)
    if not arr.size:
      continue
    if metrics is None or "metric" not in v.dims:
      frac = float(np.isnan(arr).mean())
      if frac:
        violations.append(f"{name}: {100 * frac:.1f}% NaN (none allowed)")
      continue
    a = np.moveaxis(arr, list(v.dims).index("metric"), 0)
    for i, metric in enumerate(metrics):
      frac = float(np.isnan(a[i]).mean())
      if _expected_all_nan(name, metric):
        if frac != 1.0:
          violations.append(
              f"{name}[{metric}]: structural slice only "
              f"{100 * frac:.1f}% NaN (finite values in an undefined "
              f"slice = mis-indexed write)")
      elif frac:
        violations.append(
            f"{name}[{metric}]: {100 * frac:.1f}% NaN in a defined slice")
  return violations


def main(root):
  targets = []
  for dirpath, dirnames, filenames in os.walk(root):
    # a .zarr store is one artifact, not a tree to descend
    zarrs = [d for d in dirnames if d.endswith(".zarr")]
    for d in zarrs:
      targets.append(os.path.join(dirpath, d))
      dirnames.remove(d)
    for f in filenames:
      if f.endswith(".nc"):
        targets.append(os.path.join(dirpath, f))
  bad = 0
  for path in sorted(targets):
    rel = os.path.relpath(path, root)
    try:
      violations = audit_file(path)
    except Exception as e:  # noqa: BLE001 - unreadable = failed audit
      print(f"FAIL  {rel}: unreadable ({e})")
      bad += 1
      continue
    if violations:
      print(f"FAIL  {rel}")
      for v in violations:
        print(f"      {v}")
      bad += 1
    else:
      print(f"clean {rel}")
  print(f"\n{len(targets) - bad}/{len(targets)} artifacts clean")
  return 1 if bad else 0


if __name__ == "__main__":
  sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                os.path.join(_REPO, "results")))
