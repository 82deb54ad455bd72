"""Golden regression tests: fixed-seed inputs -> committed expected results.

Fails on ANY numeric drift (1e-5) in the evaluation engine — the
in-sandbox substitute for the reference's in-memory-vs-beam consistency
check (/root/reference/weatherbench2/evaluation_test.py:110-128), since
xarray/Beam are not installed here.  Regenerate deliberately with
tests/golden/generate.py when semantics change ON PURPOSE.
"""
import os

import numpy as np
import pytest

from weatherbench2_tpu import xds
from tests.golden import common

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def fresh_results():
  return common.compute_results()


@pytest.mark.parametrize(
    "name",
    [
        # all 12 reference eval-config shapes, named 1:1 with the
        # config registry (scripts/evaluate.py; reference
        # scripts/evaluate.py:462-651)
        "deterministic", "deterministic_temporal", "probabilistic",
        "ensemble_binary", "gaussian_probabilistic", "gaussian_binary",
        "deterministic_spatial", "deterministic_vs_analysis",
        "probabilistic_spatial", "ensemble_binary_spatial",
        "probabilistic_spatial_histograms",
        "ensemble_forecast_vs_era_experimental_metrics",
    ],
)
def test_golden(name, fresh_results):
  want = xds.open_netcdf(os.path.join(GOLDEN_DIR, f"{name}.nc"))
  got = fresh_results[name]
  assert sorted(got.keys()) == sorted(want.keys())
  for k in want.keys():
    np.testing.assert_allclose(
        got[k].transpose(*want[k].dims).values,
        want[k].values,
        rtol=1e-5,
        atol=1e-7,
        err_msg=f"{name}/{k} drifted from the golden fixture",
    )
