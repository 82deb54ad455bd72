"""Generate the golden regression fixtures (run once, outputs committed).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python tests/golden/generate.py

Writes expected result NetCDFs for fixed-seed mock inputs through
`evaluate_in_memory`.  tests/test_golden.py rebuilds the same inputs and
asserts current results match these files to 1e-5 — pinning numerics
across refactors (the in-sandbox substitute for comparing against the
reference xarray implementation, which is not installed here).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests.golden import common  # noqa: E402


def main():
  out_dir = os.path.dirname(os.path.abspath(__file__))
  results = common.compute_results()
  for name, ds in results.items():
    path = os.path.join(out_dir, f"{name}.nc")
    from weatherbench2_tpu import xds

    xds.to_netcdf(ds, path)
    print("wrote", path)


if __name__ == "__main__":
  main()
