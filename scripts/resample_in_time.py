r"""CLI to resample or rolling-aggregate a dataset in time.

Flag-compatible with the reference scripts/resample_in_time.py: per-variable
statistic lists (mean/min/max/sum, "ALL" sentinel), resample vs rolling
methods, left/right labels.  Streams output-time blocks (and optional
--working_chunks dims) through dense binned/windowed reductions into a
zarr template with region writes, so arbitrarily long inputs process with
bounded host memory — the TPU-native equivalent of the reference's
template/chunk Beam logic (/root/reference/scripts/resample_in_time.py:312-451).
"""
from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

_ALL = "ALL"

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
RUNNER = flag_utils.DEFINE_string("runner", None, help="(ignored)")
METHOD = flag_utils.DEFINE_string(
    "method", "resample", help='"resample" or "rolling".')
PERIOD = flag_utils.DEFINE_string(
    "period", "1d", help='pandas.Timedelta string, e.g. "1d" or "1w".')
MEAN_VARS = flag_utils.DEFINE_list(
    "mean_vars", [], help='Variables to mean ("ALL" for all).')
MIN_VARS = flag_utils.DEFINE_list(
    "min_vars", [], help='Variables to min ("ALL" for all).')
MAX_VARS = flag_utils.DEFINE_list(
    "max_vars", [], help='Variables to max ("ALL" for all).')
SUM_VARS = flag_utils.DEFINE_list(
    "sum_vars", [], help='Variables to sum ("ALL" for all).')
ADD_MEAN_SUFFIX = flag_utils.DEFINE_bool(
    "add_mean_suffix", False, 'Add "_mean" suffix to mean variables.')
LABEL_SIDE = flag_utils.DEFINE_string(
    "label_side", "left",
    help='"left": window [T, T+period) labelled T; "right": (T-period, T].')
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", None, help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", None, help="Inclusive stop timestamp")
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs in statistics.")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "",
    help="Streaming block sizes over OUTPUT dims, e.g. "
         '"time=128,longitude=360". Default: time=128, other dims full.')
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunk sizes of the output store.")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")

_DEFAULT_TIME_BLOCK = 128


def _expand_all(list_of_vars, ds):
  if list_of_vars == [_ALL]:
    return [
        str(k)
        for k, v in ds.variables_dict().items()
        if TIME_DIM.value in v.dims
    ]
  if _ALL in list_of_vars:
    raise ValueError(
        f"Cannot specify both {_ALL} and other variables: {list_of_vars}"
    )
  return list(list_of_vars)


def _stat_groups(ds):
  """(statistic, present vars, rename suffix) groups from the var flags."""
  groups = []
  for stat, var_list, suffix in [
      ("mean", _expand_all(MEAN_VARS.value, ds),
       "_mean" if ADD_MEAN_SUFFIX.value else ""),
      ("min", _expand_all(MIN_VARS.value, ds), "_min"),
      ("max", _expand_all(MAX_VARS.value, ds), "_max"),
      ("sum", _expand_all(SUM_VARS.value, ds), "_sum"),
  ]:
    present = [v for v in var_list if v in ds]
    if present:
      groups.append((stat, present, suffix))
  return groups


def _compute_block(ds, groups, time_dim, out_sl, plan, rolling_window):
  """One output-time block: reduce each stat group, merge, return piece."""
  pieces = []
  if plan is not None:  # resample
    label_times, starts, ends = plan
    a, b = out_sl.start, out_sl.stop
    in0 = int(starts[a])
    block = ds.isel({time_dim: slice(in0, int(ends[b - 1]))})
    for stat, present, suffix in groups:
      res = utils.reduce_time_bins(
          block[present], starts[a:b] - in0, ends[a:b] - in0,
          label_times[a:b], stat, skipna=SKIPNA.value, time_dim=time_dim,
      )
      if suffix:
        res = res.rename({v: f"{v}{suffix}" for v in present})
      pieces.append(res)
  else:  # rolling: output times == input times; pull left context
    a, b = out_sl.start, out_sl.stop
    in0 = max(0, a - (rolling_window - 1))
    block = ds.isel({time_dim: slice(in0, b)})
    for stat, present, suffix in groups:
      res = utils.rolling_in_time(
          block[present], rolling_window, stat, skipna=SKIPNA.value,
          time_dim=time_dim,
      ).isel({time_dim: slice(a - in0, b - in0)})
      if suffix:
        res = res.rename({v: f"{v}{suffix}" for v in present})
      pieces.append(res)
  return xds.merge(pieces)


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  period = pd.to_timedelta(utils.normalize_timedelta_str(PERIOD.value))
  time_dim = TIME_DIM.value
  if TIME_START.value is not None or TIME_STOP.value is not None:
    ds = ds.sel({time_dim: slice(TIME_START.value, TIME_STOP.value)})

  groups = _stat_groups(ds)
  keep = sorted({v for _, present, _ in groups for v in present})
  ds = ds[keep]

  times = np.asarray(ds.coords_dict()[time_dim].data)
  if METHOD.value == "resample":
    plan = utils.resample_time_plan(times, period, LABEL_SIDE.value)
    out_times = plan[0]
    rolling_window = None
  elif METHOD.value == "rolling":
    delta_t = pd.to_timedelta(np.diff(times[:2])[0])
    if period % delta_t:
      raise ValueError(
          f"{delta_t=} between times did not evenly divide {period=}"
      )
    plan = None
    rolling_window = period // delta_t
    out_times = times
  else:
    raise ValueError(f"Unhandled method={METHOD.value}")

  # template from a one-step probe (shape/dtype only; no full allocation)
  probe = _compute_block(
      ds, groups, time_dim, slice(0, 1), plan, rolling_window
  )
  full_sizes = {time_dim: len(out_times)}
  coords = {time_dim: xds.Variable((time_dim,), out_times)}
  template = xds.template_dataset(probe, full_sizes, coords=coords)

  stream_chunks = {time_dim: _DEFAULT_TIME_BLOCK}
  stream_chunks.update(WORKING_CHUNKS.value)
  writer = xds.RegionWriter(
      OUTPUT_PATH.value, template, chunks=dict(OUTPUT_CHUNKS.value) or None,
      stream_chunks=stream_chunks,
  )
  for window in xds.iter_windows(template.sizes, stream_chunks):
    out_sl = window.get(time_dim, slice(0, len(out_times)))
    spatial = {d: sl for d, sl in window.items() if d != time_dim}
    sub = ds.isel(spatial) if spatial else ds
    piece = _compute_block(
        sub, groups, time_dim, out_sl, plan, rolling_window
    )
    writer.write(piece, window)
  writer.finish()


if __name__ == "__main__":
  app.run(main)
