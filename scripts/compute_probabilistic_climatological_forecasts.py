r"""CLI to build probabilistic climatological forecasts.

Samples historical weather segments as ensemble members: for each forecast
initial time, each realization picks a random climatology year and a random
day-of-year perturbation within --day_window_size, then reads the input at
(sampled init + lead) for every lead time.  Flag surface and sampling
semantics follow the reference
scripts/compute_probabilistic_climatological_forecasts.py (edge behaviors
WRAP_YEAR / REFLECT_RANGE / NO_EDGE, sample-hold, with/without replacement,
leave-out-years); the keyed CoGroupByKey scatter is replaced by one
precomputed vectorized gather per init-time chunk (the sampling plan is a
pure function of the seed and flags).
"""
import calendar

from absl import app
from absl import flags
import numpy as np
import pandas as pd

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import utils
from weatherbench2_tpu import xds

REALIZATION = "realization"
DELTA = "prediction_timedelta"
WRAP_YEAR = "WRAP_YEAR"
NO_EDGE = "NO_EDGE"
REFLECT_RANGE = "REFLECT_RANGE"

INPUT_PATH = flag_utils.DEFINE_string(
    "input_path", None, help="Input ground-truth Zarr (daily+ resolution).")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
CLIMATOLOGY_START_YEAR = flag_utils.DEFINE_integer(
    "climatology_start_year", 1990, help="Inclusive start sample year.")
CLIMATOLOGY_END_YEAR = flag_utils.DEFINE_integer(
    "climatology_end_year", 2020, help="Inclusive end sample year.")
LEVELS = flag_utils.DEFINE_list(
    "levels", None, help="Pressure levels to select (default: all).")
VARIABLES = flag_utils.DEFINE_list(
    "variables", None, help="Variables to select (default: all).")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension.")
INITIAL_TIME_START = flag_utils.DEFINE_string(
    "initial_time_start", None, help="First initial time in the output.")
INITIAL_TIME_END = flag_utils.DEFINE_string(
    "initial_time_end", None, help="Last initial time in the output.")
INITIAL_TIME_SPACING = flag_utils.DEFINE_string(
    "initial_time_spacing", "6h", help="Spacing between initial times.")
SAMPLE_HOLD_DAYS = flag_utils.DEFINE_integer(
    "sample_hold_days", 0,
    help="Hold each perturbation constant for this many days (0 = off).")
INITIAL_TIME_EDGE_BEHAVIOR = flag_utils.DEFINE_string(
    "initial_time_edge_behavior", WRAP_YEAR,
    help=f"{WRAP_YEAR} | {NO_EDGE} | {REFLECT_RANGE}")
FORECAST_DURATION = flag_utils.DEFINE_string(
    "forecast_duration", "15 days", help="Length of forecasts.")
TIMEDELTA_SPACING = flag_utils.DEFINE_string(
    "timedelta_spacing", "6h", help="Spacing between lead times.")
ADD_SOURCE_TIME = flag_utils.DEFINE_boolean(
    "add_source_time", False,
    help="Add a source_time variable recording the sampled input times.")
DAY_WINDOW_SIZE = flag_utils.DEFINE_integer(
    "day_window_size", 15,
    help="Width of the day-of-year window to sample from (1..728).")
ENSEMBLE_SIZE = flag_utils.DEFINE_integer(
    "ensemble_size", 2,
    help="-1 means one member per (year, day-perturbation) combination.")
WITH_REPLACEMENT = flag_utils.DEFINE_boolean(
    "with_replacement", True, help="Sample with replacement.")
LEAVE_OUT_IF_IN_CLIMATOLOGY = flag_utils.DEFINE_boolean(
    "leave_out_if_in_climatology", False,
    help="Exclude the init year (+ following years) from the year pool.")
NUM_YEARS_TO_EXCLUDE = flag_utils.DEFINE_integer(
    "num_years_to_exclude", 0,
    help="Extra years after the init year to exclude.")
SEED = flag_utils.DEFINE_integer(
    "seed", 802701, help="Seed for the RNG.")
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunk sizes for the output store.")
REALIZATION_NAME = flag_utils.DEFINE_string(
    "realization_name", REALIZATION, "Name of the ensemble dimension.")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, help="(ignored)")


def day_perturbation_values(day_window_size: int) -> np.ndarray:
  """Possible day offsets: window centered on 0 (left-heavy when even)."""
  half = day_window_size // 2
  return np.arange(-half, day_window_size - half)


def get_sampled_init_times(
    output_times: pd.DatetimeIndex,
    climatology_start_year: int,
    climatology_end_year: int,
    day_window_size: int,
    ensemble_size: int,
    with_replacement: bool,
    sample_hold_days: int,
    initial_time_edge_behavior: str,
    leave_out_if_in_climatology: bool = False,
    num_years_to_exclude: int = 0,
    seed: int = 0,
) -> np.ndarray:
  """Sampled historical init times, shape [ensemble, n_output_times].

  Each output time maps to (random climatology year, random day-of-year
  perturbation on the circular year), with the requested edge behavior.
  Pure function of (flags, seed) — re-runs are deterministic.
  """
  rng = np.random.default_rng(seed)
  if day_window_size <= 0 or day_window_size > 2 * 364:
    raise ValueError(f"{day_window_size=} not in [1, 728].")

  perturbs = day_perturbation_values(day_window_size)
  year_pool = np.arange(climatology_start_year, climatology_end_year + 1)
  n_times = len(output_times)
  if ensemble_size == -1:
    if leave_out_if_in_climatology:
      raise ValueError(
          "ensemble_size=-1 unsupported with leave_out_if_in_climatology."
      )
    ensemble_size = len(perturbs) * len(year_pool)
  shape = (ensemble_size, n_times)

  if with_replacement:
    day_perturbations = rng.choice(perturbs, size=shape, replace=True)
    if leave_out_if_in_climatology:
      years = np.zeros(shape, dtype=int)
      for j, t in enumerate(output_times):
        pool = year_pool[
            (year_pool < t.year)
            | (year_pool > t.year + num_years_to_exclude)
        ]
        if pool.size == 0:
          raise ValueError(
              f"No available climatology years for output time {t}"
          )
        years[:, j] = rng.choice(pool, size=ensemble_size, replace=True)
    else:
      years = rng.choice(year_pool, size=shape, replace=True)
  else:
    # without replacement: each (year, perturbation) combination used at
    # most once per output time
    combos = np.array(
        [(y, d) for y in year_pool for d in perturbs], dtype=int
    )
    if leave_out_if_in_climatology:
      years = np.zeros(shape, dtype=int)
      day_perturbations = np.zeros(shape, dtype=int)
      for j, t in enumerate(output_times):
        mask = (combos[:, 0] < t.year) | (
            combos[:, 0] > t.year + num_years_to_exclude
        )
        pool = combos[mask]
        if len(pool) < ensemble_size:
          raise ValueError(
              f"Not enough (year, day) combinations for output time {t}"
          )
        pick = rng.choice(len(pool), size=ensemble_size, replace=False)
        years[:, j] = pool[pick, 0]
        day_perturbations[:, j] = pool[pick, 1]
    else:
      if ensemble_size > len(combos):
        raise ValueError(
            f"{ensemble_size=} exceeds the {len(combos)} combinations."
        )
      years = np.zeros(shape, dtype=int)
      day_perturbations = np.zeros(shape, dtype=int)
      for j in range(n_times):
        pick = rng.choice(len(combos), size=ensemble_size, replace=False)
        years[:, j] = combos[pick, 0]
        day_perturbations[:, j] = combos[pick, 1]

  dayofyears = output_times.dayofyear.values + day_perturbations

  if initial_time_edge_behavior == WRAP_YEAR:
    for year in np.unique(years):
      mask = years == year
      days_in_year = 365 + calendar.isleap(int(year))
      dayofyears[mask] = (dayofyears[mask] - 1) % days_in_year + 1
  elif initial_time_edge_behavior == REFLECT_RANGE:
    for year in {climatology_start_year, climatology_end_year}:
      mask = years == year
      if not np.any(mask):
        continue
      days_in_year = 365 + calendar.isleap(int(year))
      if year == climatology_start_year:
        dayofyears[mask] = np.where(
            dayofyears[mask] >= 1,
            dayofyears[mask],
            np.abs(dayofyears[mask]) + 2,
        )
      else:
        dayofyears[mask] = np.where(
            dayofyears[mask] <= days_in_year,
            dayofyears[mask],
            2 * days_in_year - dayofyears[mask],
        )
  elif initial_time_edge_behavior != NO_EDGE:
    raise ValueError(f"Unhandled {initial_time_edge_behavior=}")

  sampled = (
      np.array(years - 1970, dtype="datetime64[Y]")
      + np.array(dayofyears - 1, dtype="timedelta64[D]")
      + np.array(output_times.hour, dtype="timedelta64[h]")
  ).astype("datetime64[ns]")

  if sample_hold_days:
    strides = np.unique(np.diff(output_times.values))
    if strides.size > 1:
      raise ValueError("Cannot sample-hold with irregular output times.")
    stride = pd.Timedelta(strides[0])
    hold_stride = pd.Timedelta(f"{sample_hold_days}D") // stride
    if stride * hold_stride != pd.Timedelta(f"{sample_hold_days}D"):
      raise ValueError(
          f"{sample_hold_days=} not a multiple of the output stride."
      )
    hold_idx = np.repeat(
        np.arange(n_times // hold_stride + 1), hold_stride
    )[:n_times]
    # hold the day-offset (in whole days) fixed within each hold period
    delta_days = (
        (sampled - output_times.values[None, :])
        .astype("timedelta64[D]")
        .astype(np.int64)
    )
    first_of_period = np.searchsorted(
        hold_idx, np.arange(n_times // hold_stride + 1)
    )[hold_idx]
    delta_days = delta_days[:, first_of_period]
    sampled = output_times.values[None, :] + delta_days.astype(
        "timedelta64[D]"
    )

  return sampled


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  if LEVELS.value and "level" in ds.sizes:
    ds = ds.sel(level=[float(l) for l in LEVELS.value])

  init_times = pd.date_range(
      INITIAL_TIME_START.value,
      INITIAL_TIME_END.value,
      freq=pd.Timedelta(utils.normalize_timedelta_str(INITIAL_TIME_SPACING.value)),
  )
  lead_times = pd.timedelta_range(
      pd.Timedelta(0),
      pd.Timedelta(utils.normalize_timedelta_str(FORECAST_DURATION.value)),
      freq=pd.Timedelta(utils.normalize_timedelta_str(TIMEDELTA_SPACING.value)),
  ).values

  sampled = get_sampled_init_times(
      init_times,
      CLIMATOLOGY_START_YEAR.value,
      CLIMATOLOGY_END_YEAR.value,
      DAY_WINDOW_SIZE.value,
      ENSEMBLE_SIZE.value,
      WITH_REPLACEMENT.value,
      SAMPLE_HOLD_DAYS.value,
      INITIAL_TIME_EDGE_BEHAVIOR.value,
      LEAVE_OUT_IF_IN_CLIMATOLOGY.value,
      NUM_YEARS_TO_EXCLUDE.value,
      SEED.value,
  )  # [ensemble, n_init]

  # valid times to read: [ensemble, init, lead]
  source_times = sampled[:, :, None] + lead_times[None, None, :]
  in_times = np.asarray(ds.coords_dict()[TIME_DIM.value].data)
  positions = np.searchsorted(in_times, source_times)
  pos_cl = np.clip(positions, 0, len(in_times) - 1)
  found = in_times[pos_cl] == source_times
  if not found.all():
    missing = np.unique(source_times[~found])
    raise ValueError(
        f"{missing.size} sampled times missing from the input, e.g. "
        f"{missing[:4]}"
    )
  positions = pos_cl.astype(np.int64)  # [ensemble, init, lead]
  ens, n_init, n_lead = positions.shape
  realization = REALIZATION_NAME.value
  time_dim = TIME_DIM.value

  # the output is (ensemble * lead)x the input size — stream init-time
  # blocks, reading each block's scattered source steps via clustered
  # bounded gathers (replaces the reference's time-keyed CoGroupByKey
  # scatter, /root/reference/scripts/
  # compute_probabilistic_climatological_forecasts.py:951-1019)
  src_vars = ds.variables_dict()
  coords = {
      k: v
      for k, v in ds.coords_dict().items()
      if time_dim not in v.dims
      and k not in (time_dim, realization, DELTA)
  }
  coords["time"] = xds.Variable(("time",), init_times.values)
  coords[DELTA] = xds.Variable((DELTA,), lead_times)
  coords[realization] = xds.Variable((realization,), np.arange(ens))

  template_vars = {}
  rest_dims = {}
  static_vars = {}
  for name, var in src_vars.items():
    if time_dim not in var.dims:
      # static vars pass through unchanged (ds.sel(time=...) semantics)
      static_vars[name] = var
      template_vars[name] = xds.stub_variable(
          var.dims, var.sizes, var.dtype, var.attrs
      )
      continue
    rest = tuple(d for d in var.dims if d != time_dim)
    rest_dims[name] = rest
    sizes = {realization: ens, "time": n_init, DELTA: n_lead,
             **{d: var.sizes[d] for d in rest}}
    template_vars[name] = xds.stub_variable(
        (realization, "time", DELTA) + rest, sizes, var.dtype, var.attrs
    )
  if ADD_SOURCE_TIME.value:
    template_vars["source_time"] = xds.stub_variable(
        (realization, "time", DELTA),
        {realization: ens, "time": n_init, DELTA: n_lead},
        source_times.dtype,
    )
  template = xds.Dataset(template_vars, coords=coords, attrs=ds.attrs)

  # pick the init block so one block's gathered output stays ~256 MB
  per_init = 0
  for name, rest in rest_dims.items():
    var = src_vars[name]
    rest_elems = 1
    for d in rest:
      rest_elems *= var.sizes[d]
    per_init += np.dtype(var.dtype).itemsize * ens * n_lead * rest_elems
  block = max(1, int(2 ** 28 // max(1, per_init)))
  if len(in_times) > 1:
    steps_per_day = max(
        1, int(np.timedelta64(1, "D") // (in_times[1] - in_times[0]))
    )
  else:
    steps_per_day = 1
  max_gap = max(16, 8 * steps_per_day)

  writer = xds.RegionWriter(
      OUTPUT_PATH.value, template, chunks=dict(OUTPUT_CHUNKS.value) or None,
      stream_chunks={"time": block},
  )
  for name, var in static_vars.items():
    writer.write_array(
        name, tuple(slice(None) for _ in var.dims), np.asarray(var.data)
    )
  for window in xds.iter_windows({"time": n_init}, {"time": block}):
    sl = window.get("time", slice(0, n_init))
    pos_block = positions[:, sl, :]  # (E, B, L)
    clusters = xds.clustered_positions(pos_block.ravel(), max_gap=max_gap)
    # map global input position -> index into the concatenated reads
    remap = np.empty(len(in_times), dtype=np.int64)
    offset = 0
    for cl in clusters:
      n_cl = cl.stop - cl.start
      remap[cl] = np.arange(offset, offset + n_cl)
      offset += n_cl
    local = remap[pos_block]
    for name, rest in rest_dims.items():
      var = src_vars[name]
      t_ax = var.dims.index(time_dim)
      parts = [
          np.asarray(var.data[tuple(
              cl if ax == t_ax else slice(None)
              for ax in range(len(var.dims))
          )])
          for cl in clusters
      ]
      concat = np.concatenate(parts, axis=t_ax)
      gathered = np.take(concat, local, axis=t_ax)
      # np.take put (E, B, L) at the time axis position; normalize to
      # (E, B, L, rest...) with rest in source order
      n_pre = t_ax  # axes before the time axis in the source order
      order = (
          list(range(n_pre, n_pre + 3))
          + list(range(0, n_pre))
          + list(range(n_pre + 3, gathered.ndim))
      )
      gathered = np.transpose(gathered, order)
      writer.write_array(
          name,
          (slice(None), sl, slice(None)) + (slice(None),) * len(rest),
          gathered,
      )
    if ADD_SOURCE_TIME.value:
      writer.write_array(
          "source_time", (slice(None), sl, slice(None)),
          source_times[:, sl, :],
      )
  writer.finish()


if __name__ == "__main__":
  app.run(main)
