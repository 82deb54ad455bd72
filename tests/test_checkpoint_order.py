"""Round-5 regression: checkpoint resume must not depend on Dataset
variable ORDER.

The round-4 official13_0p25 resume failed with a pytree mismatch: xds
Datasets flatten with variable names in insertion order, and
``evaluation._add_base_variables`` built the selection through
``list(set(...))`` — hash-randomized PER PROCESS — so a checkpoint saved
by one process could carry a different variable order than the resuming
process's accumulators (observed live: the 13-variable accumulator tree,
cli_error.log of official13_0p25 2020-01-06:2020-01-11).  Two fixes are
pinned here:

* `_add_base_variables` is deterministic and order-preserving;
* the streaming engine realigns a resumed state's Datasets to the
  chunk program's structure (`streaming._reorder_like`), so even an
  already-saved scrambled checkpoint resumes cleanly.
"""
import os

import numpy as np

from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
from weatherbench2_tpu.parallel import streaming
from weatherbench2_tpu.derived_variables import WindSpeed
from weatherbench2_tpu.regions import SliceRegion


def _mk_two_var_data(tmp_path):
  kwargs = dict(
      variables_3d=[],
      variables_2d=["10m_u_component_of_wind", "10m_v_component_of_wind"],
      time_start="2020-01-01",
      time_stop="2020-01-25",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop="2 days", **{**kwargs, "time_stop": "2020-01-13"}
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)
  return truth_path, fc_path


def _data_config(tmp_path, truth_path, fc_path, out, stop="2020-01-10"):
  return config.Data(
      selection=config.Selection(
          variables=["10m_u_component_of_wind",
                     "10m_v_component_of_wind"],
          time_slice=slice("2020-01-01", stop),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / out),
      ),
      by_init=True,
  )


def _configs():
  return {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      ),
  }


def _scramble_state(path):
  """Reverse every accumulator Dataset's variable order in-place —
  simulating a checkpoint saved by a process with a different hash
  seed (the pre-fix failure shape)."""
  st = streaming.StreamingState.load(path)

  def rev(tree):
    if isinstance(tree, dict):
      return {k: rev(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
      return type(tree)(rev(v) for v in tree)
    if isinstance(tree, xds.Dataset):
      names = list(tree.variables_dict())
      if len(names) < 2:
        return tree
      return xds.Dataset(
          {n: tree.variables_dict()[n] for n in reversed(names)},
          coords=dict(tree.coords_dict()), attrs=tree.attrs,
      )
    return tree

  scrambled = 0
  new_configs = {}
  for cname, (sums, counts) in st.configs.items():
    new_configs[cname] = (rev(sums), rev(counts))
    scrambled += 1
  st.configs = new_configs
  st.save(path)
  assert scrambled


def test_add_base_variables_deterministic_and_order_preserving():
  dc = config.Data(
      selection=config.Selection(
          variables=["zebra_var", "alpha_var"],
          time_slice=slice(None),
      ),
      paths=config.Paths(forecast="f", obs="o", output_dir="d"),
  )
  ec = config.Eval(
      metrics={},
      derived_variables={"wind_speed": WindSpeed(
          u_name="10m_u_component_of_wind",
          v_name="10m_v_component_of_wind")},
  )
  out = evaluation._add_base_variables(dc, ec)
  # user-given order preserved, base variables appended sorted
  assert out.selection.variables == [
      "zebra_var", "alpha_var",
      "10m_u_component_of_wind", "10m_v_component_of_wind",
  ]
  # repeated application is a no-op (idempotent)
  out2 = evaluation._add_base_variables(out, ec)
  assert out2.selection.variables == out.selection.variables


def test_resume_from_scrambled_variable_order_checkpoint(tmp_path):
  truth_path, fc_path = _mk_two_var_data(tmp_path)
  chunks = {"init_time": 4}

  dc_full = _data_config(tmp_path, truth_path, fc_path, "full")
  evaluation.evaluate_with_mesh(dc_full, _configs(), input_chunks=chunks)
  want = xds.open_netcdf(str(tmp_path / "full" / "det.nc"))

  # partial run -> checkpoint -> scramble its Dataset variable order
  dc_part = _data_config(tmp_path, truth_path, fc_path, "part",
                         stop="2020-01-08")
  cpath = str(tmp_path / "ck")
  evaluation.evaluate_with_mesh(
      dc_part, _configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  state_file = cpath + ".det"
  assert os.path.exists(state_file)
  _scramble_state(state_file)

  # resume over the full range: pre-fix this raised
  # "Mismatch custom node data" inside the accumulator tree_map
  dc_res = _data_config(tmp_path, truth_path, fc_path, "resumed")
  evaluation.evaluate_with_mesh(
      dc_res, _configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  got = xds.open_netcdf(str(tmp_path / "resumed" / "det.nc"))
  for k in want.keys():
    np.testing.assert_allclose(
        got[k].transpose(*want[k].dims).values, want[k].values, rtol=1e-6
    )
