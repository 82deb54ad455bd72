r"""CLI for daily/weekly resampling (older variant of resample_in_time).

Flag-compatible with the reference scripts/resample_daily.py, including the
special handling for accumulative precipitation: a -1h shift before the
daily sum so each day covers the accumulation of its own 24 hours.
Output-time blocks stream through dense binned reductions into a zarr
template with region writes (bounded host memory), replacing the
reference's xarray-beam pipeline.
"""
from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

DAILY_ACCUMULATIVE_VARS = ("total_precipitation_24hr",)

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
BEAM_RUNNER = flag_utils.DEFINE_string("beam_runner", None, help="(ignored)")
METHOD = flag_utils.DEFINE_string(
    "method", "resample", help='"resample" or "roll".')
PERIOD = flag_utils.DEFINE_string("period", "1d", help="int + d or w")
STATISTICS = flag_utils.DEFINE_list(
    "statistics", ["mean"], help='From "mean", "min", "max".')
ADD_STATISTIC_SUFFIX = flag_utils.DEFINE_bool(
    "add_statistic_suffix", False,
    "Add statistic suffix to variable names (required for >1 statistic).")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
START_YEAR = flag_utils.DEFINE_integer(
    "start_year", None, help="Start year (inclusive).")
END_YEAR = flag_utils.DEFINE_integer(
    "end_year", None, help="End year (inclusive).")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "",
    help="Streaming block sizes over OUTPUT dims (default time=128).")

_DEFAULT_TIME_BLOCK = 128


def _suffixed(name: str, statistic: str) -> str:
  if ADD_STATISTIC_SUFFIX.value and statistic in ("min", "max"):
    return f"{name}_{statistic}"
  return name


def _compute_block(ds, jobs, out_sl):
  """One output-time block across all (vars, stat, plan) jobs."""
  a, b = out_sl.start, out_sl.stop
  pieces = []
  for variables, compute_stat, name_stat, kind, info, label_times in jobs:
    if kind == "resample":
      starts, ends = info
      in0 = int(starts[a])
      block = ds[variables].isel(time=slice(in0, int(ends[b - 1])))
      res = utils.reduce_time_bins(
          block, starts[a:b] - in0, ends[a:b] - in0, label_times[a:b],
          compute_stat,
      )
    else:  # roll
      window = info
      in0 = max(0, a - (window - 1))
      block = ds[variables].isel(time=slice(in0, b))
      res = utils.rolling_in_time(block, window, compute_stat)
      res = res.isel(time=slice(a - in0, b - in0))
      res = res.assign_coords(time=np.asarray(label_times)[a:b])
    res = res.rename({v: _suffixed(v, name_stat) for v in variables})
    pieces.append(res)
  return xds.merge(pieces)


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if START_YEAR.value is not None and END_YEAR.value is not None:
    ds = ds.sel(time=slice(str(START_YEAR.value), str(END_YEAR.value)))

  if len(STATISTICS.value) > 1 and not ADD_STATISTIC_SUFFIX.value:
    raise ValueError(
        "add_statistic_suffix is required for multiple statistics."
    )

  period = PERIOD.value
  times = np.asarray(ds.coords_dict()["time"].data)
  period_td = pd.to_timedelta(utils.normalize_timedelta_str(period))

  # Build jobs: (variables, statistic, kind, plan-info, label_times)
  jobs = []
  out_times = None
  if METHOD.value == "roll":
    # the reference only supports weekly rolling over DAILY input
    # (reference resample_daily.py:103-115); silently reinterpreting
    # other periods/frequencies would produce wrong windows
    if not period.endswith("w"):
      raise NotImplementedError(
          f"method=roll supports weekly periods only, got {period!r}"
      )
    if len(times) > 1 and not (
        np.diff(times) == np.timedelta64(1, "D")
    ).all():
      raise NotImplementedError("method=roll requires daily input data")
    window = 7 * int(period[:-1])
    out_times = times - np.timedelta64(window - 1, "D")
    for statistic in STATISTICS.value:
      jobs.append((list(ds.keys()), statistic, statistic, "roll", window,
                   out_times))
  else:
    accum = [v for v in ds.keys() if v in DAILY_ACCUMULATIVE_VARS]
    normal = [v for v in ds.keys() if v not in DAILY_ACCUMULATIVE_VARS]
    plan_n = utils.resample_time_plan(times, period_td)
    out_times = plan_n[0]
    if accum:
      # accumulative vars: -1h shift so each day sums its own 24 hours,
      # then ALIGN onto the normal daily labels — the shifted plan gains
      # a partial leading bin on midnight-aligned input, which the
      # reference drops via `.sel(time=daily_times)`
      # (reference resample_daily.py:118-124)
      la, sa, ea = utils.resample_time_plan(
          times - np.timedelta64(1, "h"), period_td
      )
      la_list = la.astype("datetime64[ns]").tolist()
      pos = {t: i for i, t in enumerate(la_list)}
      keep = []
      for t in out_times.astype("datetime64[ns]").tolist():
        if t not in pos:
          raise ValueError(
              "accumulative variables cannot be aligned onto the daily "
              f"axis (missing period {t}); adjust the time range."
          )
        keep.append(pos[t])
      keep = np.asarray(keep)
      plan_a = (out_times, sa[keep], ea[keep])
    for statistic in STATISTICS.value:
      if normal:
        jobs.append((normal, statistic, statistic, "resample",
                     (plan_n[1], plan_n[2]), plan_n[0]))
      if accum:
        # accumulative vars are always daily-summed (suffix still names
        # the requested statistic, matching the reference behavior)
        jobs.append((accum, "sum", statistic, "resample",
                     (plan_a[1], plan_a[2]), plan_a[0]))

  n_out = len(out_times)
  probe = _compute_block(ds, jobs, slice(0, 1))
  template = xds.template_dataset(
      probe, {"time": n_out},
      coords={"time": xds.Variable(("time",), out_times)},
  )
  stream_chunks = {"time": _DEFAULT_TIME_BLOCK}
  stream_chunks.update(WORKING_CHUNKS.value)
  writer = xds.RegionWriter(OUTPUT_PATH.value, template,
                            stream_chunks=stream_chunks)
  for window in xds.iter_windows(template.sizes, stream_chunks):
    out_sl = window.get("time", slice(0, n_out))
    spatial = {d: sl for d, sl in window.items() if d != "time"}
    sub = ds.isel(spatial) if spatial else ds
    writer.write(_compute_block(sub, jobs, out_sl), window)
  writer.finish()


if __name__ == "__main__":
  app.run(main)
