"""Round-4: the data-prep CLIs execute on the accelerator for real.

Round 3's VERDICT found the regrid/spectra/quantiles CLIs computed on
host numpy because nothing on the CLI path ever called device_put (the
docstrings claimed otherwise).  These tests pin the fix: blocks are
device_put inside the CLI loop (xds.stream.to_device), results match the
WB2_NO_DEVICE=1 host path, and the gate itself dispatches correctly.
"""
import numpy as np
import pytest

from weatherbench2_tpu import schema, utils, xds
from weatherbench2_tpu.xds import stream


def _input_store(tmp_path, name="in.zarr"):
  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=["temperature"],
          variables_2d=["2m_temperature"],
          time_start="2020-01-01",
          time_stop="2020-01-05",
          spatial_resolution_in_degrees=30.0,
          time_resolution="6 hours",
      ),
      seed=0,
  )
  path = str(tmp_path / name)
  xds.to_zarr(ds, path)
  return path


def test_to_device_moves_payloads_and_keeps_coords():
  import jax

  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2020-01-01", time_stop="2020-01-03",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  dev = stream.to_device(ds)
  assert isinstance(dev["2m_temperature"].data, jax.Array)
  # coords stay host numpy (label logic is host work)
  assert isinstance(
      np.asarray(dev.coords_dict()["time"].data), np.ndarray
  )
  np.testing.assert_array_equal(
      np.asarray(dev["2m_temperature"].data), ds["2m_temperature"].values
  )


def test_use_device_gate(monkeypatch):
  monkeypatch.setenv("WB2_NO_DEVICE", "1")
  assert stream.use_device() is False
  monkeypatch.delenv("WB2_NO_DEVICE")
  assert stream.use_device() is True  # jax-cpu is importable under tests


@pytest.mark.parametrize("script_mod,args_fn", [
    (
        "compute_zonal_energy_spectrum",
        lambda inp, out: [
            f"--input_path={inp}", f"--output_path={out}",
            "--base_variables=2m_temperature,temperature",
            "--time_start=2020-01-01", "--time_stop=2020-01-04",
            "--levels=500,700,850", "--averaging_dims=time",
        ],
    ),
    (
        "regrid",
        lambda inp, out: [
            f"--input_path={inp}", f"--output_path={out}",
            "--longitude_nodes=6", "--latitude_nodes=4",
            "--regridding_method=conservative",
        ],
    ),
    (
        "compute_quantiles",
        lambda inp, out: [
            f"--input_path={inp}", f"--output_path={out}",
            "--quantiles=0.1,0.9", "--dim=time",
            "--time_start=2020-01-01", "--time_stop=2020-01-04",
            "--name_suffix=_quantile",
        ],
    ),
])
def test_cli_device_matches_host(tmp_path, monkeypatch, script_mod,
                                 args_fn):
  """Device and WB2_NO_DEVICE host paths agree through the real CLIs."""
  import importlib
  import sys
  import os

  sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                  "scripts"))
  mod = importlib.import_module(script_mod)
  inp = _input_store(tmp_path)

  from absl import flags as absl_flags
  from absl.testing import flagsaver

  out_dev = str(tmp_path / "out_dev.zarr")
  out_host = str(tmp_path / "out_host.zarr")

  argv = args_fn(inp, out_dev)
  with flagsaver.flagsaver():
    absl_flags.FLAGS(["prog"] + argv)
    monkeypatch.delenv("WB2_NO_DEVICE", raising=False)
    mod.main([])
  argv = args_fn(inp, out_host)
  with flagsaver.flagsaver():
    absl_flags.FLAGS(["prog"] + argv)
    monkeypatch.setenv("WB2_NO_DEVICE", "1")
    mod.main([])

  dev = xds.open_zarr(out_dev)
  host = xds.open_zarr(out_host)
  assert sorted(dev.keys()) == sorted(host.keys())
  for k in dev.keys():
    np.testing.assert_allclose(
        dev[k].values.astype(np.float64),
        host[k].values.astype(np.float64),
        rtol=2e-5, atol=1e-6,
        err_msg=f"{script_mod}:{k} device/host mismatch",
    )


def test_normalize_stream_coords_semantics():
  """Streamed-dim labels become placeholders; static coords survive."""
  ds = utils.random_like(
      schema.mock_forecast_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2020-01-01", time_stop="2020-01-03",
          lead_start="0 days", lead_stop="1 days",
          spatial_resolution_in_degrees=30.0,
      ),
      seed=0,
  )
  norm = stream.normalize_stream_coords(ds, "time")
  coords = norm.coords_dict()
  # the streamed index coord is an arange placeholder now
  np.testing.assert_array_equal(
      np.asarray(coords["time"].data), np.arange(ds.sizes["time"])
  )
  # coords independent of the streamed dim are untouched
  np.testing.assert_array_equal(
      np.asarray(coords["latitude"].data),
      np.asarray(ds.coords_dict()["latitude"].data),
  )
  # data payloads are untouched
  np.testing.assert_array_equal(
      norm["2m_temperature"].values, ds["2m_temperature"].values
  )


def test_normalize_stream_coords_single_trace():
  """Equal-shaped blocks share ONE jit trace after normalization.

  Coordinate values are static jit aux (xds/tree.py _StaticCoords), so
  without normalization each streamed block's distinct time labels force
  a retrace — the round-4 advisor found the transform CLIs recompiling
  every block over the tunnel because of exactly this.
  """
  import jax

  ds = utils.random_like(
      schema.mock_truth_data(
          variables_3d=[], variables_2d=["2m_temperature"],
          time_start="2020-01-01", time_stop="2020-01-05",
          spatial_resolution_in_degrees=30.0,
          time_resolution="6 hours",
      ),
      seed=0,
  )
  traces = 0

  @jax.jit
  def f(block):
    nonlocal traces
    traces += 1  # trace-time side effect: counts compiles, not calls
    return block + 1.0

  blocks = [ds.isel({"time": slice(0, 4)}),
            ds.isel({"time": slice(4, 8)})]
  for b in blocks:
    f(stream.normalize_stream_coords(b, "time"))
  assert traces == 1, "normalized equal-shaped blocks must share a trace"
  # control: raw blocks carry distinct time labels -> per-block retrace
  for b in blocks:
    f(b)
  assert traces == 3, "raw per-block coords were expected to retrace"
