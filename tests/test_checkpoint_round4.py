"""Round-4 checkpoint/resume coverage: the two north-star shapes.

The reference gets elastic recovery from Dataflow bundle retries for
every pipeline shape (reference evaluation.py:758-828); round 3's
streaming checkpoints excluded exactly the shapes the 0.25-degree
official workloads need — lead_time-chunked runs (official13_0p25) and
grouped multi-config runs (probabilistic + ensemble_binary).  These
tests pin the round-4 generalization: kill mid-run, resume, parity with
an uninterrupted run.
"""
import os
import pickle
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from weatherbench2_tpu import config, evaluation, metrics, schema, utils, xds
from weatherbench2_tpu.parallel import streaming
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_data(tmp_path, n_days=12, lead_stop="3 days"):
  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop=f"2020-01-{n_days + 13:02d}",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=0)
  fc = utils.random_like(
      schema.mock_forecast_data(
          lead_stop=lead_stop,
          **{**kwargs, "time_stop": f"2020-01-{n_days + 1:02d}"},
      ),
      seed=1,
  )
  truth_path = str(tmp_path / "t.zarr")
  fc_path = str(tmp_path / "f.zarr")
  xds.to_zarr(truth, truth_path)
  xds.to_zarr(fc, fc_path)
  return truth_path, fc_path


def _data_config(tmp_path, truth_path, fc_path, out):
  return config.Data(
      selection=config.Selection(
          variables=["2m_temperature"],
          time_slice=slice("2020-01-01", "2020-01-10"),
      ),
      paths=config.Paths(
          forecast=fc_path, obs=truth_path,
          output_dir=str(tmp_path / out),
      ),
      by_init=True,
  )


def _det_configs():
  """Two configs with identical input construction -> one stream group."""
  return {
      "det": config.Eval(
          metrics={"mse": metrics.MSE(), "bias": metrics.Bias()},
          regions={"global": SliceRegion()},
      ),
      "det_extra": config.Eval(
          metrics={"mae": metrics.MAE()},
          regions={"global": SliceRegion(),
                   "extratropics": ExtraTropicalRegion()},
      ),
  }


def _assert_ds_close(got, want):
  for k in want.keys():
    np.testing.assert_allclose(
        got[k].transpose(*want[k].dims).values, want[k].values, rtol=1e-6
    )


def test_lead_chunked_checkpoint_parity(tmp_path):
  """A lead-chunked run WITH checkpointing matches the plain run, and its
  final state carries the lead-slice fingerprint."""
  truth_path, fc_path = _mk_data(tmp_path)
  chunks = {"init_time": 4, "lead_time": 2}  # 3 daily leads -> 2 slices

  dc_plain = _data_config(tmp_path, truth_path, fc_path, "plain")
  evaluation.evaluate_with_mesh(dc_plain, _det_configs(),
                                input_chunks=chunks)
  want = xds.open_netcdf(str(tmp_path / "plain" / "det.nc"))

  dc_ck = _data_config(tmp_path, truth_path, fc_path, "ck")
  cpath = str(tmp_path / "ckpt")
  evaluation.evaluate_with_mesh(
      dc_ck, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  got = xds.open_netcdf(str(tmp_path / "ck" / "det.nc"))
  _assert_ds_close(got, want)

  state = streaming.StreamingState.load(cpath + ".det+det_extra")
  assert state.n_lead_slices == 2
  assert state.lead_index == 1
  assert set(state.configs) == {"det", "det_extra"}
  # completed slices' finalized results ride in the state
  assert len(state.completed_leads) == 1


def test_grouped_config_checkpoint_resume(tmp_path):
  """A grouped 2-config stream checkpoints both configs' accumulators and
  resumes into parity with the uninterrupted run (single-lead shape)."""
  truth_path, fc_path = _mk_data(tmp_path)
  chunks = {"init_time": 4}

  dc_full = _data_config(tmp_path, truth_path, fc_path, "full")
  evaluation.evaluate_with_mesh(dc_full, _det_configs(),
                                input_chunks=chunks)

  # "interrupted": evaluate the first 2 chunks only, with checkpoints
  dc_part = _data_config(tmp_path, truth_path, fc_path, "part")
  dc_part.selection.time_slice = slice("2020-01-01", "2020-01-08")
  cpath = str(tmp_path / "ck")
  evaluation.evaluate_with_mesh(
      dc_part, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  state = streaming.StreamingState.load(cpath + ".det+det_extra")
  assert state.chunk_index == 2
  assert set(state.configs) == {"det", "det_extra"}

  dc_res = _data_config(tmp_path, truth_path, fc_path, "resumed")
  evaluation.evaluate_with_mesh(
      dc_res, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  for cname in ("det", "det_extra"):
    want = xds.open_netcdf(str(tmp_path / "full" / f"{cname}.nc"))
    got = xds.open_netcdf(str(tmp_path / "resumed" / f"{cname}.nc"))
    _assert_ds_close(got, want)


_KILL_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import os
os.environ["JAX_PLATFORMS"] = "cpu"
from weatherbench2_tpu import config, evaluation, metrics
from weatherbench2_tpu.regions import ExtraTropicalRegion, SliceRegion

dc = config.Data(
    selection=config.Selection(
        variables=["2m_temperature"],
        time_slice=slice("2020-01-01", "2020-01-10"),
    ),
    paths=config.Paths(
        forecast={fc!r}, obs={truth!r}, output_dir={out!r},
    ),
    by_init=True,
)
eval_configs = {{
    "det": config.Eval(
        metrics={{"mse": metrics.MSE(), "bias": metrics.Bias()}},
        regions={{"global": SliceRegion()}},
    ),
    "det_extra": config.Eval(
        metrics={{"mae": metrics.MAE()}},
        regions={{"global": SliceRegion(),
                 "extratropics": ExtraTropicalRegion()}},
    ),
}}
evaluation.evaluate_with_mesh(
    dc, eval_configs,
    input_chunks={{"init_time": 2, "lead_time": 2}},
    checkpoint_path={ckpt!r}, checkpoint_every=1,
)
"""


def test_lead_chunked_grouped_kill_resume(tmp_path):
  """SIGKILL a lead-chunked grouped run mid-stream; resuming from its
  checkpoint reproduces the uninterrupted result exactly.

  This is the full north-star failure shape: official13_0p25 streams
  lead_time=7 chunks and prob_0p25 streams a probabilistic +
  ensemble_binary group — a tunnel stall at segment 11 must cost chunks,
  not the segment."""
  truth_path, fc_path = _mk_data(tmp_path)
  chunks = {"init_time": 2, "lead_time": 2}

  dc_plain = _data_config(tmp_path, truth_path, fc_path, "plain")
  evaluation.evaluate_with_mesh(dc_plain, _det_configs(),
                                input_chunks=chunks)

  cpath = str(tmp_path / "kill_ck")
  state_file = cpath + ".det+det_extra"
  runner = _KILL_RUNNER.format(
      repo=REPO, fc=fc_path, truth=truth_path,
      out=str(tmp_path / "killed"), ckpt=cpath,
  )
  script = tmp_path / "runner.py"
  script.write_text(runner)
  env = {**os.environ, "JAX_PLATFORMS": "cpu"}
  env.pop("PYTEST_CURRENT_TEST", None)
  proc = subprocess.Popen(
      [sys.executable, str(script)], env=env,
      stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
  )
  try:
    # wait for mid-run evidence (a checkpoint file), then kill hard.
    # Generous deadline: on a loaded 1-core box the child's jit compiles
    # alone can take minutes (observed: >300 s under a concurrent
    # measurement chain), and a deadline expiry here reads as a bogus
    # "died before any checkpoint" failure.
    deadline = time.time() + 900
    while time.time() < deadline:
      if os.path.exists(state_file):
        break
      if proc.poll() is not None:
        break
      time.sleep(0.2)
    if proc.poll() is None:
      proc.send_signal(signal.SIGKILL)
      proc.wait(timeout=60)
  finally:
    if proc.poll() is None:
      proc.kill()
  assert os.path.exists(state_file), "run died before any checkpoint"
  state = streaming.StreamingState.load(state_file)
  covered = state.lead_index * 100 + state.chunk_index
  assert covered >= 1  # some progress was snapshotted

  # resume through the same CLI path; parity with the uninterrupted run
  dc_res = _data_config(tmp_path, truth_path, fc_path, "resumed")
  evaluation.evaluate_with_mesh(
      dc_res, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  for cname in ("det", "det_extra"):
    want = xds.open_netcdf(str(tmp_path / "plain" / f"{cname}.nc"))
    got = xds.open_netcdf(str(tmp_path / "resumed" / f"{cname}.nc"))
    _assert_ds_close(got, want)


def test_resume_lead_slice_mismatch_raises(tmp_path):
  """The state's lead-slice grid must line up with the run's."""
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path, "o")
  forecast, truth, clim = evaluation.open_forecast_and_truth_datasets(
      dc, config.Eval(metrics={"mse": metrics.MSE()}), lazy=True
  )
  state = streaming.StreamingState(
      chunk_index=1, chunk_size=4, n_lead_slices=2, lead_index=0,
      configs={"": None}, completed_leads=[],
  )
  with pytest.raises(ValueError, match="lead slices"):
    streaming.evaluate_streaming(
        forecast, truth, clim,
        config.Eval(metrics={"mse": metrics.MSE()},
                    regions={"global": SliceRegion()}),
        dc,
        input_chunks={"init_time": 4, "lead_time": 1},  # 7 slices != 2
        state=state,
    )


def test_legacy_state_into_grouped_run_raises(tmp_path):
  """A v1 single-config state must not silently seed a 2-config group."""
  truth_path, fc_path = _mk_data(tmp_path)
  dc = _data_config(tmp_path, truth_path, fc_path, "o")
  forecast, truth, clim = evaluation.open_forecast_and_truth_datasets(
      dc, config.Eval(metrics={"mse": metrics.MSE()}), lazy=True
  )
  legacy = streaming.StreamingState(sums={"x": 1}, counts={"x": 1},
                                    chunk_index=1, chunk_size=4)
  with pytest.raises(ValueError, match="legacy single-config"):
    streaming.evaluate_streaming_multi(
        forecast, truth, clim, _det_configs(), dc,
        input_chunks={"init_time": 4}, state=legacy,
    )


def test_resume_full_state_ragged_final_chunk(tmp_path):
  """A state taken at the final RAGGED chunk (chunk_index * chunk_size >
  total) must resume, not be rejected — chunk_index counts chunks."""
  truth_path, fc_path = _mk_data(tmp_path)
  chunks = {"init_time": 4, "lead_time": 2}  # 10 inits -> 3 chunks of 4

  dc_ck = _data_config(tmp_path, truth_path, fc_path, "ck")
  cpath = str(tmp_path / "ckpt")
  evaluation.evaluate_with_mesh(
      dc_ck, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  want = xds.open_netcdf(str(tmp_path / "ck" / "det.nc"))
  state = streaming.StreamingState.load(cpath + ".det+det_extra")
  assert state.chunk_index * state.chunk_size > state.total  # ragged

  # pure-resume run: every chunk is already covered by the state
  dc_res = _data_config(tmp_path, truth_path, fc_path, "resumed")
  evaluation.evaluate_with_mesh(
      dc_res, _det_configs(), input_chunks=chunks,
      checkpoint_path=cpath, checkpoint_every=1,
  )
  got = xds.open_netcdf(str(tmp_path / "resumed" / "det.nc"))
  _assert_ds_close(got, want)


def test_v1_checkpoint_file_still_loads(tmp_path):
  """Pre-round-4 checkpoint pickles (no version field) load and resume."""
  p = str(tmp_path / "v1.pkl")
  with open(p, "wb") as f:
    pickle.dump({"sums": {"m": 1.0}, "counts": {"m": 2.0},
                 "chunk_index": 3, "chunk_size": 4, "total": 20}, f)
  st = streaming.StreamingState.load(p)
  assert st.chunk_index == 3 and st.configs is None
  assert st.lead_index == 0 and st.completed_leads is None
